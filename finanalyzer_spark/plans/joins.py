"""Join queries (SURVEY.md §2.3).

The reference never writes a SQL JOIN — join semantics appear as
procedural loops: a per-fact dimension lookup
(get_ticker_from_id, findatabase.py:112-117), a per-row existence probe
before insert (set_database_names, findatabase.py:147-161), and an N+1
per-key max-date loop (update_database, findatabase.py:209-229). Each
becomes one declarative join here; Catalyst picks broadcast-hash for
the small dimension sides.

Scale notes: dimension joins are explicitly `F.broadcast` (region 5
rows, nation 25, supplier O(100) — trivially broadcastable even at
100 TB fact scale). The fact-fact joins (orders⋈lineitem) shuffle on
the join key; at cluster scale those tables would be co-bucketed on
orderkey to eliminate the exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.joins import asof_join
from .registry import query


# --------------------------------------------------------------------------
# J1 — FK dimension lookup as broadcast hash join
# (reference: get_ticker_from_id per-fact-fetch, findatabase.py:112-117)
# --------------------------------------------------------------------------
@query(
    "fk_broadcast_lookup",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, r.r_name AS region
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("join", "broadcast"),
)
def fk_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (
        t.supplier.join(
            F.broadcast(t.nation),
            t.supplier.s_nationkey == t.nation.n_nationkey,
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


# --------------------------------------------------------------------------
# J2 — left-anti join (register-if-absent)
# (reference: skip CSV ticker if already present, findatabase.py:147-161)
# --------------------------------------------------------------------------
@query(
    "anti_join_unregistered",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
    tags=("join", "anti"),
)
def anti_join_unregistered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order yet — the reference's per-row
    existence probe before insert (N queries) as ONE left-anti join."""
    t = load(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# P6 — existence test as left-semi join
# (reference: check_exists probe, dataAcquisition.py:70-78)
# --------------------------------------------------------------------------
@query(
    "semi_join_active",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
    tags=("join", "semi"),
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --------------------------------------------------------------------------
# J3 — the N+1 incremental-cursor loop as one aggregate + outer join
# (reference: update_database per-id max-date loop, findatabase.py:209-229)
# --------------------------------------------------------------------------
@query(
    "staleness_report",
    oracle="""
    SELECT c.c_custkey,
           max(o.o_orderdate) AS last_order,
           CASE WHEN max(o.o_orderdate) IS NULL THEN 'never'
                WHEN max(o.o_orderdate) < TIMESTAMP '2001-01-01 00:00:00' THEN 'stale'
                ELSE 'fresh' END AS freshness
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "aggregate", "incremental"),
)
def staleness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heart of update_database: per key, decide {never|stale|fresh}
    from the last-loaded date. The reference does one query per key;
    this is one aggregation + one outer join for ALL keys."""
    t = load(spark, sf_dir)
    last = t.orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_order"))
    return (
        t.customer.join(last, t.customer.c_custkey == last.o_custkey, "left")
        .select(
            "c_custkey",
            "last_order",
            F.when(F.col("last_order").isNull(), "never")
            .when(F.col("last_order") < F.lit("2001-01-01").cast("timestamp"), "stale")
            .otherwise("fresh")
            .alias("freshness"),
        )
    )


# --------------------------------------------------------------------------
# multi-way star join + aggregate (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@query(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    tags=("join", "aggregate", "flagship"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact⋈fact shuffle on orderkey, then broadcast dims.
    The region filter reaches the scan of `region` (5 rows) and prunes
    nations before they ever touch the fact side."""
    t = load(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# range join — equi key + interval predicate
# --------------------------------------------------------------------------
@query(
    "range_join_shipping_delay",
    oracle="""
    SELECT o.o_orderkey, count(*) AS lines_in_90d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def range_join_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with an equi-key: Spark plans the equi part as a hash
    join and evaluates the interval as a post-join filter — linear, not
    the quadratic pure-theta-join case."""
    t = load(spark, sf_dir)
    o, l = t.orders, t.lineitem
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < F.date_add(o.o_orderdate, 90).cast("timestamp")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("lines_in_90d"))
    )


# --------------------------------------------------------------------------
# as-of join — "latest order state at or before each event"
# (the natural finanalyzer extension: latest fundamentals at trade date,
#  SURVEY.md §2.3 closing note)
# --------------------------------------------------------------------------
@query(
    "asof_join_events",
    oracle="""
    SELECT event_id, user_id, last_orderkey, last_totalprice
    FROM (
        SELECT e.event_id, e.user_id,
               o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window composition (operators.joins.asof_join)
    — one shuffle on the key, no per-key Python. DuckDB's native ASOF
    JOIN is the oracle."""
    t = load(spark, sf_dir)
    return asof_join(
        left=t.events.select("event_id", "user_id", "ts"),
        right=t.orders.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        ),
        on="user_id",
        ts="ts",
        right_tiebreak=["last_orderkey"],
    ).select("event_id", "user_id", "last_orderkey", "last_totalprice")


# --------------------------------------------------------------------------
# ext — multi-join + aggregate + top-k (TPC-H Q3 shape): the classic
# "shipping priority" plan that composes J1's dimension join with a
# fact-fact shuffle join and a bounded top-k
# --------------------------------------------------------------------------
@query(
    "top_unshipped_revenue",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "tpch-q3", "topk"),
)
def top_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape. The segment filter prunes customer BEFORE the join
    (pushed to the scan), the customer side is broadcast after
    filtering, and the orders⋈lineitem join shuffles on orderkey —
    co-bucketing both facts on orderkey removes that exchange on a
    cluster. TakeOrderedAndProject bounds the top-k without a global
    sort."""
    t = load(spark, sf_dir)
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t.orders.where(F.col("o_orderdate") < F.lit("1998-06-01").cast("date"))
    li = t.lineitem.where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(
            ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# ext — correlated scalar subquery, decorrelated (TPC-H Q17 shape):
# "lineitems under 50% of their part's average quantity". The oracle
# keeps the CORRELATED form to prove the rewrite is equivalent.
# --------------------------------------------------------------------------
@query(
    "below_avg_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    """,
    tags=("join", "tpch-q17", "subquery-decorrelation"),
)
def below_avg_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The N+1 correlated subquery (the reference's update_database loop
    is the same shape, findatabase.py:209-229) decorrelates into ONE
    per-key aggregate joined back — the aggregate side is tiny
    (one row per partkey) and shuffles partial rows only."""
    t = load(spark, sf_dir)
    li = t.lineitem
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# ext — EXISTS decorrelated to left-semi (TPC-H Q4 shape): order
# priority distribution for orders with at least one late lineitem
# --------------------------------------------------------------------------
@query(
    "priority_count_late",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "tpch-q4", "exists"),
)
def priority_count_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS (with a cross-table date predicate)
    becomes a left-semi join carrying the non-equi condition; the semi
    join deduplicates orderkeys without a distinct. The date filter
    prunes the orders scan (and at 100 TB, its date partitions)."""
    t = load(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        t.orders.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
        )
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# ext — distribution-of-counts (TPC-H Q13 shape): orders-per-customer
# histogram including zero-order customers (left outer + double agg)
# --------------------------------------------------------------------------
@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "tpch-q13", "histogram"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: the join predicate filter lives IN the outer join
    condition (not a post-filter, which would drop the zero-order
    customers), then two aggregations — the second input is one row
    per customer, so the second shuffle is tiny."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(o, t.customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# ext — ratio-to-report: share of global revenue per nation. The
# window-over-aggregate runs on the POST-AGGREGATION frame (25 rows),
# so the empty-partition global window is trivially safe
# --------------------------------------------------------------------------
@query(
    "revenue_share_by_nation",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT nation,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM rev
    """,
    tags=("join", "aggregate", "ratio-to-report", "bounded-window"),
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via an empty-frame window — computed over the
    25-row aggregate, never the fact table (a global window on raw
    rows would funnel 100 TB through one task; on the aggregate it's
    free)."""
    t = load(spark, sf_dir)
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    from pyspark.sql import Window as W

    return rev.select(
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(
            F.col("revenue") / F.sum("revenue").over(W.partitionBy()), 6
        ).alias("share"),
    )


# --------------------------------------------------------------------------
# ext — disjunctive multi-clause predicate join (TPC-H Q19 shape):
# OR-of-ANDs across both join sides — the classic pushdown/CNF test
# --------------------------------------------------------------------------
@query(
    "disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 20)
       OR (p.p_type = 'ECONOMY' AND l.l_discount > 0.08)
    """,
    tags=("join", "tpch-q19", "disjunction"),
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape. Catalyst CNF-converts the OR-of-ANDs so the
    single-side conjuncts (brand/size on part, quantity/discount on
    lineitem) push below the join as partial filters; only the
    residual disjunction evaluates post-join. The filtered part side
    broadcasts."""
    t = load(spark, sf_dir)
    li = t.lineitem
    p = t.part
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 20)
        )
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_discount") > 0.08))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# ext — returned-item ranking (TPC-H Q10 shape): fact-fact join +
# dimension broadcast + top-20 customers by lost revenue
# --------------------------------------------------------------------------
@query(
    "top_returning_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch-q10", "topk"),
)
def top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: the returnflag filter prunes lineitem at the scan,
    the date filter prunes orders (and date partitions at scale), the
    nation dim broadcasts, and TakeOrderedAndProject bounds the
    result without a global sort."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(F.col("l_returnflag") == "R")
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# fuzzy entity matching (edit-distance join against a probe list)
# --------------------------------------------------------------------------
#: probe names with deliberate typos — shared literals on both engines
FUZZY_PROBES: tuple[str, ...] = (
    "Customer#000000019",
    "Customer#0000O0042",   # O for 0 — distance 1 from #42
    "Customer#00000O1O7",   # two O-for-0 typos — distance 2 from #107
)
FUZZY_MAX_DIST = 2

_PROBES_SQL = ", ".join(f"('{p}')" for p in FUZZY_PROBES)


@query(
    "fuzzy_name_match",
    oracle=f"""
    WITH probes(probe) AS (VALUES {_PROBES_SQL})
    SELECT p.probe, c.c_custkey, c.c_name,
           levenshtein(p.probe, c.c_name) AS dist
    FROM probes p
    JOIN customer c ON levenshtein(p.probe, c.c_name) <= {FUZZY_MAX_DIST}
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: match a dirty probe list
    (OCR-style O-for-0 typos) against the customer dimension within
    Levenshtein distance 2. The probe side is tiny and broadcast, so
    the corpus is scanned once with the distance predicate evaluated
    in codegen — the blocking-free form, right whenever |probes| ×
    |corpus| comparisons fit one scan's CPU budget. At larger probe
    sets, block first (length bands / q-gram prefilter, the minhash
    discipline) and verify with the same predicate."""
    t = load(spark, sf_dir)
    probes = spark.createDataFrame(
        [(p,) for p in FUZZY_PROBES], "probe string"
    )
    dist = F.levenshtein(F.col("probe"), F.col("c_name"))
    return (
        t.customer.crossJoin(F.broadcast(probes))
        .where(dist <= FUZZY_MAX_DIST)
        .select("probe", "c_custkey", "c_name", dist.alias("dist"))
    )


# --------------------------------------------------------------------------
# blocked fuzzy matching (q-gram count filtering, the scale path)
# --------------------------------------------------------------------------
FUZZY_BLOCK_MOD = 37    #: every 37th customer contributes a distorted probe
FUZZY_BLOCK_Q = 2       #: gram width
FUZZY_BLOCK_DIST = 2    #: max edit distance
FUZZY_CODE_LEN = 12     #: record-code length (hex chars)
#: q-gram count-filtering bound (Gravano et al., VLDB'01): strings
#: within edit distance d share >= max(|s|,|t|) - 1 - q*d positional
#: q-grams (multiset). Equal fixed lengths here, so T is a constant.
FUZZY_BLOCK_T = FUZZY_CODE_LEN - 1 - FUZZY_BLOCK_Q * FUZZY_BLOCK_DIST

#: chars 4 and 5 transposed — an OCR/typist-style corruption, edit
#: distance <= 2 from the source code; identical expression on both
#: engines.
_TRANSPOSE = "concat(substr({s},1,3), substr({s},5,1), substr({s},4,1), substr({s},6))"


@query(
    "fuzzy_code_match_blocked",
    # Ground-truth oracle: the UNBLOCKED brute-force edit-distance
    # join. The Spark side only ever compares q-gram-blocked candidate
    # pairs — a green hash therefore proves the blocking is lossless
    # on this data, exactly what the count-filtering theorem promises.
    oracle=f"""
    WITH corpus AS (
        SELECT c_custkey,
               substr(md5(CAST(c_custkey AS VARCHAR)), 1, {FUZZY_CODE_LEN}) AS code
        FROM customer
    ),
    probes AS (
        SELECT c_custkey AS probe_id,
               {_TRANSPOSE.format(s='code')} AS probe
        FROM corpus WHERE c_custkey % {FUZZY_BLOCK_MOD} = 0
    )
    SELECT p.probe_id, p.probe, c.c_custkey, c.code AS c_code,
           levenshtein(p.probe, c.code) AS dist
    FROM probes p
    JOIN corpus c ON levenshtein(p.probe, c.code) <= {FUZZY_BLOCK_DIST}
    """,
    tags=("join", "fuzzy", "entity-resolution", "blocked"),
)
def fuzzy_code_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching at scale: the q-gram prefilter variant the
    fuzzy_name_match docstring promises, for probe sets too large to
    broadcast-nested-loop.

    Entities are 12-hex-char record codes derived from md5(c_custkey)
    (high-entropy, deterministic on both engines); probes are every
    37th code with two characters transposed. Pipeline:

    1. explode positional bigrams with multiplicity (transform over a
       sequence — JVM-side, no UDF), count per (id, gram);
    2. candidate generation: BROADCAST the probe grams (tiny side) and
       equi-join on gram — a hash join, no cartesian anywhere — then
       per pair sum(least(count_p, count_c)) and keep pairs sharing
       >= T = len - 1 - q*d grams. Count filtering is lossless for
       edit distance <= d, so no true match can be pruned;
    3. verify survivors only with levenshtein <= d.

    At 100 TB both gram frames shuffle on the gram key (bounded
    alphabet -> bounded skew, and the candidate aggregation is
    map-side combinable); raising q sharpens selectivity for longer
    strings. The broadcast keeps the corpus-side scan shuffle-free
    here; with a huge probe table the same plan runs as a shuffled
    hash join on gram."""
    t = load(spark, sf_dir)
    corpus = t.customer.select(
        "c_custkey",
        F.expr(f"substr(md5(cast(c_custkey as string)), 1, {FUZZY_CODE_LEN})").alias(
            "code"
        ),
    )
    probes = corpus.where(F.col("c_custkey") % FUZZY_BLOCK_MOD == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.expr(_TRANSPOSE.format(s="code")).alias("probe"),
    )

    def grams(df: DataFrame, id_col: str, s_col: str, out: str) -> DataFrame:
        g = F.explode(
            F.expr(
                f"transform(sequence(1, length({s_col})-{FUZZY_BLOCK_Q - 1}),"
                f" i -> substr({s_col}, i, {FUZZY_BLOCK_Q}))"
            )
        )
        return (
            df.select(id_col, g.alias("gram"))
            .groupBy(id_col, "gram")
            .agg(F.count("*").alias(out))
        )

    cand = (
        grams(corpus, "c_custkey", "code", "nc")
        .join(F.broadcast(grams(probes, "probe_id", "probe", "np")), "gram")
        .groupBy("probe_id", "c_custkey")
        .agg(F.sum(F.least("np", "nc")).alias("shared"))
        .where(F.col("shared") >= FUZZY_BLOCK_T)
    )
    dist = F.levenshtein("probe", "code")
    return (
        cand.join(F.broadcast(probes), "probe_id")
        .join(corpus, "c_custkey")
        .where(dist <= FUZZY_BLOCK_DIST)
        .select(
            "probe_id",
            "probe",
            "c_custkey",
            F.col("code").alias("c_code"),
            dist.alias("dist"),
        )
    )


@query(
    "null_safe_join",
    # Spark's <=> (eqNullSafe) and DuckDB's IS NOT DISTINCT FROM share
    # semantics: NULL matches NULL, and a plain = would silently drop
    # those rows — the corner this query pins down.
    oracle="""
    WITH a AS (
        SELECT nullif(l_returnflag, 'N') AS k, count(*) AS n_left
        FROM lineitem GROUP BY 1
    ),
    b AS (
        SELECT nullif(l_linestatus, 'O') AS k, count(*) AS n_right
        FROM lineitem GROUP BY 1
    )
    SELECT coalesce(a.k, '<null>') AS k, a.n_left, b.n_right
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "null-semantics"),
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (SQL IS NOT DISTINCT FROM / Spark <=>):
    grouped keys where the interesting bucket IS the null one — a
    plain equi-join loses it, eqNullSafe keeps it. Catalyst still
    plans this as a hash join (null-safe equality is a valid hash
    key), so the null bucket doesn't cost a nested loop."""
    t = load(spark, sf_dir)
    a = t.lineitem.groupBy(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("k")
    ).agg(F.count("*").alias("n_left"))
    b = t.lineitem.groupBy(
        F.nullif(F.col("l_linestatus"), F.lit("O")).alias("k")
    ).agg(F.count("*").alias("n_right"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        F.coalesce(a["k"], F.lit("<null>")).alias("k"), "n_left", "n_right"
    )


# --------------------------------------------------------------------------
# as-of join, nearest direction — "closest order state to each event,
# either side" (pandas merge_asof(direction='nearest') semantics)
# --------------------------------------------------------------------------
@query(
    "asof_nearest_order",
    oracle="""
    SELECT event_id, user_id, near_orderkey, near_totalprice
    FROM (
        SELECT e.event_id, e.user_id,
               o.o_orderkey AS near_orderkey,
               o.o_totalprice AS near_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY
                     abs(epoch_us(e.ts) - epoch_us(o.o_orderdate::TIMESTAMP)),
                     CASE WHEN o.o_orderdate::TIMESTAMP <= e.ts
                          THEN 0 ELSE 1 END,
                     CASE WHEN o.o_orderdate::TIMESTAMP <= e.ts
                          THEN -o.o_orderkey ELSE o.o_orderkey END
               ) AS rn
        FROM events e
        LEFT JOIN orders o ON e.user_id = o.o_custkey
    )
    WHERE rn = 1
    """,
    tags=("join", "asof", "nearest"),
)
def asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (operators.joins.asof_join,
    direction='nearest'): both candidate frames come from ONE
    (key, time)-sorted window pass — the backward match scans up from
    unbounded-preceding, the forward match down from
    unbounded-following, and a narrow map picks the closer timestamp
    (exact tie prefers backward, the merge_asof convention).

    Scale shape: identical to the backward as-of — one hash shuffle on
    the key, one sort reused by both frames; the oracle's brute
    left-join + row_number over every (event, order) candidate pair is
    exactly the O(n*m) plan this operator avoids."""
    t = load(spark, sf_dir)
    return asof_join(
        left=t.events.select("event_id", "user_id", "ts"),
        right=t.orders.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ts"),
            F.col("o_orderkey").alias("near_orderkey"),
            F.col("o_totalprice").alias("near_totalprice"),
        ),
        on="user_id",
        ts="ts",
        right_tiebreak=["near_orderkey"],
        direction="nearest",
    ).select("event_id", "user_id", "near_orderkey", "near_totalprice")


@query(
    "basket_pair_lift",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_cnt AS (
        SELECT l_partkey, count(*) AS cnt FROM baskets GROUP BY l_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS pair_cnt
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.pair_cnt,
           CAST(p.pair_cnt * n.n_orders * 1000000
                // (ca.cnt * cb.cnt) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN item_cnt ca ON ca.l_partkey = p.part_a
    JOIN item_cnt cb ON cb.l_partkey = p.part_b
    CROSS JOIN n
    """,
    tags=("join", "analytics", "basket"),
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: co-occurrence counts of part pairs
    within an order plus the lift statistic
    P(a,b) / (P(a) P(b)) = pair_cnt * n_orders / (cnt_a * cnt_b) —
    the candidate-pair step of association-rule mining (a-priori),
    with min-support 2. Lift is exact integer ppm (the ratio of small
    integers lands on decimal halves, where float rounding is
    cross-engine-flaky).

    Scale shape: baskets dedup first (one shuffle on orderkey); the
    pair expansion is a self-equi-join on orderkey — co-partitioned,
    so it adds NO extra shuffle after the dedup — and is bounded by
    C(basket_size, 2) with TPC-H basket size <= 7. The canonical
    a < b ordering halves the pairs and makes the output
    deterministic. Item counts broadcast back onto the (much smaller)
    surviving pair list; the order total is a scalar literal join."""
    t = load(spark, sf_dir)
    baskets = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    item_cnt = baskets.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    n_orders = baskets.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(item_cnt.select(F.col("l_partkey").alias("part_a"),
                                        F.col("cnt").alias("cnt_a"))),
            "part_a",
        )
        .join(
            F.broadcast(item_cnt.select(F.col("l_partkey").alias("part_b"),
                                        F.col("cnt").alias("cnt_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr(
                "pair_cnt * n_orders * 1000000 div (cnt_a * cnt_b)"
            ).alias("lift_ppm"),
        )
    )


#: synthetic geography: deterministic milli-degree coordinates derived
#: from the portable md5 hash of the customer key — same literals in
#: both engines (the fixture has no geo columns; the JOIN SHAPE is the
#: thing under test). Grid cell = 1000 mdeg (1 degree); radius 500
#: mdeg, so all matches live in the 3x3 cell neighborhood.
_GEO_CELL = 1000
_GEO_R = 500
_GEO_N = 2000  #: probe set size cap keeps the demo pair count sane


@query(
    "spatial_neighbor_pairs",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               ('0x' || substr(md5('lat|' || c_custkey::VARCHAR), 1, 8))
                   ::BIGINT % 180000 - 90000 AS lat,
               ('0x' || substr(md5('lon|' || c_custkey::VARCHAR), 1, 8))
                   ::BIGINT % 360000 - 180000 AS lon
        FROM customer
        WHERE c_custkey <= {_GEO_N}
    ),
    binned AS (
        SELECT c_custkey, lat, lon,
               (lat + 90000) // {_GEO_CELL} AS cx,
               (lon + 180000) // {_GEO_CELL} AS cy
        FROM pts
    ),
    expanded AS (
        SELECT b.c_custkey, b.lat, b.lon,
               b.cx + dx.v AS nx, b.cy + dy.v AS ny
        FROM binned b
        CROSS JOIN (VALUES (-1), (0), (1)) AS dx(v)
        CROSS JOIN (VALUES (-1), (0), (1)) AS dy(v)
    ),
    pairs AS (
        SELECT e.c_custkey AS a, b.c_custkey AS b
        FROM expanded e
        JOIN binned b ON b.cx = e.nx AND b.cy = e.ny
                     AND e.c_custkey < b.c_custkey
        WHERE (e.lat - b.lat) * (e.lat - b.lat)
              + (e.lon - b.lon) * (e.lon - b.lon)
              <= {_GEO_R} * {_GEO_R}
    ),
    dedup AS (SELECT DISTINCT a, b FROM pairs)
    SELECT count(*) AS n_pairs,
           CAST(coalesce(min(a), -1) AS BIGINT) AS min_a,
           CAST(coalesce(max(b), -1) AS BIGINT) AS max_b
    FROM dedup
    """,
    tags=("join", "spatial", "blocking"),
)
def spatial_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity self-join by GRID BLOCKING: bin points into
    1-degree cells, expand each point into its 3x3 cell neighborhood
    (radius <= cell size guarantees no missed pair), equi-join on the
    cell id, then verify exact distance — the standard plan that
    turns an O(n^2) all-pairs distance join into a hash join with a
    bounded 9x expansion (same blocking discipline as the LSH bands
    and q-gram prefilter, applied to coordinates). Coordinates are
    deterministic integer milli-degrees from the portable hash, so
    the distance test is exact integer arithmetic on both engines.

    Scale shape: explode x9 on the probe side, one equi-join on
    (cx, cy), squared-distance verify in codegen; pair count bounded
    by local density x9, never n^2. At 100 TB you'd bucket the table
    BY cell id so the join co-locates."""
    t = load(spark, sf_dir)

    def u32(prefix: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("c_custkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    pts = t.customer.where(F.col("c_custkey") <= _GEO_N).select(
        "c_custkey",
        (u32("lat|") % 180000 - 90000).alias("lat"),
        (u32("lon|") % 360000 - 180000).alias("lon"),
    )
    binned = pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(f"(lat + 90000) div {_GEO_CELL}").alias("cx"),
        F.expr(f"(lon + 180000) div {_GEO_CELL}").alias("cy"),
    )
    offsets = F.array(*[F.lit(v) for v in (-1, 0, 1)])
    expanded = (
        binned.select(
            F.col("c_custkey").alias("a"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
            "cx",
            "cy",
            F.explode(offsets).alias("dx"),
        )
        .select(
            "a", "alat", "alon", "cx", "cy", "dx",
            F.explode(offsets).alias("dy"),
        )
        .select(
            "a",
            "alat",
            "alon",
            (F.col("cx") + F.col("dx")).alias("nx"),
            (F.col("cy") + F.col("dy")).alias("ny"),
        )
    )
    right = binned.select(
        F.col("c_custkey").alias("b"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        F.col("cx").alias("nx"),
        F.col("cy").alias("ny"),
    )
    d2 = (F.col("alat") - F.col("blat")) * (
        F.col("alat") - F.col("blat")
    ) + (F.col("alon") - F.col("blon")) * (F.col("alon") - F.col("blon"))
    pairs = (
        expanded.join(right, ["nx", "ny"])
        .where((F.col("a") < F.col("b")) & (d2 <= _GEO_R * _GEO_R))
        .select("a", "b")
        .distinct()
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.min("a"), F.lit(-1)).alias("min_a"),
        F.coalesce(F.max("b"), F.lit(-1)).alias("max_b"),
    )


_IIC_TOP = 20
_IIC_SCALE = 1_000_000_000_000  #: cos^2 fixed-point (integer-exact)


@query(
    "item_item_cosine_topk",
    # ordering key is the INTEGER-exact scaled cosine^2
    # (pair_cnt^2 * SCALE // (cnt_a * cnt_b)) so the top-k cut is
    # deterministic in both engines; the float cosine is one rounded
    # sqrt over the same exact integers, derived per-row.
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_cnt AS (
        SELECT l_partkey, count(*) AS cnt FROM baskets GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS pair_cnt
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    scored AS (
        SELECT p.part_a, p.part_b, p.pair_cnt,
               p.pair_cnt * p.pair_cnt * {_IIC_SCALE}
                   // (ca.cnt * cb.cnt) AS cos2_scaled
        FROM pairs p
        JOIN item_cnt ca ON ca.l_partkey = p.part_a
        JOIN item_cnt cb ON cb.l_partkey = p.part_b
    )
    SELECT part_a, part_b, pair_cnt,
           round(sqrt(CAST(cos2_scaled AS DOUBLE) / {_IIC_SCALE}), 6)
               + 0.0 AS cosine
    FROM scored
    ORDER BY cos2_scaled DESC, part_a, part_b
    LIMIT {_IIC_TOP}
    """,
    tags=("join", "analytics", "recsys"),
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering scores (the classic
    Sarwar et al. 2001 item-kNN recommender): cosine over basket
    co-occurrence vectors — pair_cnt / sqrt(cnt_a * cnt_b) — which,
    unlike raw pair counts, doesn't let two merely-popular items crowd
    out genuinely-associated ones; top {_IIC_TOP} pairs.

    Scale shape: identical to basket_pair_lift (basket dedup, one
    co-partitioned self-join bounded by C(basket_size, 2), broadcast
    item counts onto surviving pairs) plus a TakeOrdered cut keyed on
    the INTEGER-exact scaled cosine^2, so the boundary is never
    decided by a float ulp."""
    t = load(spark, sf_dir)
    # r13 NEGATIVE RESULTS, recorded so they aren't re-tried: (a)
    # per-order sort_array(collect_set(..)) arrays with a higher-order-
    # function pair explode (one exchange, no self-join shuffle)
    # measured 2.31 s solo best-of-5 vs 1.52 s for this shape; (b) even
    # just persist()ing the deduped basket frame (re-derived three
    # times below) measured 2.16 s — the InMemoryRelation write +
    # codegen break cost more than two recomputes of a cheap
    # scan+distinct, the same boundary as r12's grid_dbscan persists.
    baskets = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    item_cnt = baskets.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 2)
    )
    ca = F.broadcast(item_cnt.withColumnRenamed("l_partkey", "part_a")
                     .withColumnRenamed("cnt", "ca"))
    cb = F.broadcast(item_cnt.withColumnRenamed("l_partkey", "part_b")
                     .withColumnRenamed("cnt", "cb"))
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a", "part_b", "pair_cnt",
            F.expr(
                f"pair_cnt * pair_cnt * {_IIC_SCALE}"
                f" div (ca * cb)"
            ).alias("cos2_scaled"),
        )
    )
    return (
        scored.orderBy(
            F.col("cos2_scaled").desc(), "part_a", "part_b"
        )
        .limit(_IIC_TOP)
        .select(
            "part_a", "part_b", "pair_cnt",
            (
                F.round(
                    F.sqrt(F.col("cos2_scaled") / F.lit(float(_IIC_SCALE))),
                    6,
                ) + 0.0
            ).alias("cosine"),
        )
    )
