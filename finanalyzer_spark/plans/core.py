"""Core relational queries — scans, projections, filters, aggregates,
sorts, set ops (SURVEY.md §2.1, §2.2, §2.4, §2.6, §2.7, §2.8).

Each query is the Spark-first re-expression of an operator the
reference implements procedurally over SQLite (citations inline).
Floats that aggregate across rows are rounded identically on both the
Spark and oracle side so summation-order ULP drift can't break the
value hash.

Scale notes: every query here is a single declarative plan — Catalyst
pushes the filters/projections into the Parquet scan, does partial
(map-side) aggregation before the shuffle, and AQE coalesces the
post-shuffle partitions. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


# --------------------------------------------------------------------------
# S4 / P1 / P2 — generic scan + projection + equality predicate
# (reference: read_database(table, element, optional),
#  finanalyzer/database/findatabase.py:124-126)
# --------------------------------------------------------------------------
@query(
    "select_project_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
    tags=("scan", "projection", "filter"),
)
def select_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + equality/range predicate; Catalyst pushes both into
    the Parquet scan (PushedFilters + ReadSchema pruning)."""
    t = load(spark, sf_dir)
    return (
        t.orders.where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# P3 — range predicate / retention window
# (reference: DELETE ... WHERE dateAdded < cutoff, findatabase.py:230)
# --------------------------------------------------------------------------
@query(
    "filter_retention_window",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("filter", "retention"),
)
def filter_retention_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention expressed as keep-filter (Spark's DELETE equivalent on
    immutable Parquet is read→filter→overwrite; the filter is this)."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


# --------------------------------------------------------------------------
# P7 — conditional value replacement
# (reference: X["weather"].replace(...), plot_cyclical_feature_engineering.py:108)
# --------------------------------------------------------------------------
@query(
    "conditional_replace",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'HIGH'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'MEDIUM'
                ELSE 'LOW' END AS priority_class
    FROM orders
    """,
    tags=("projection", "case"),
)
def conditional_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HIGH")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "MEDIUM")
        .otherwise("LOW")
        .alias("priority_class"),
    )


# --------------------------------------------------------------------------
# A1 / J3 — per-key max (the incremental-cursor aggregation)
# (reference: check_last_update one key at a time, findatabase.py:68-77;
#  N+1 loop at findatabase.py:209-229 collapsed into ONE groupBy)
# --------------------------------------------------------------------------
@query(
    "groupby_last_update",
    oracle="""
    SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("aggregate",),
)
def groupby_last_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference queries each key's max date in a Python loop (N+1);
    in Spark it's one shuffle with map-side partial aggregation."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A2 / A6 — grouped means / stddev (pricing summary; TPC-H Q1 shape)
# (reference: groupby(["weekday","hour"]).mean(),
#  plot_cyclical_feature_engineering.py:38; mae.mean()+/-std :222-235)
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           round(stddev_samp(l_quantity), 4) AS std_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped wide aggregate: 2 grouping keys, 8 aggregates.
    One shuffle; partial aggregation makes the shuffle tiny at any SF."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# A4 — frequency counts (value_counts)
# (reference: value_counts(), plot_cyclical_feature_engineering.py:101-115)
# --------------------------------------------------------------------------
@query(
    "value_counts",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    tags=("aggregate",),
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.events.groupBy("event_type").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# A5 — histogram (fixed-width bucketing)
# (reference: y.hist(bins=30), plot_cyclical_feature_engineering.py:75)
# --------------------------------------------------------------------------
@query(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket, count(*) AS n
    FROM orders
    GROUP BY 1
    """,
    tags=("aggregate", "histogram"),
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: floor-divide is a single deterministic FP
    op, so bucket ids match the oracle exactly (no summation drift)."""
    t = load(spark, sf_dir)
    return (
        t.orders.select(
            F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# A3 / F7 — global max + min-max rescale
# (reference: df["count"]/df["count"].max(), plot_cyclical_feature_engineering.py:71;
#  MinMaxScaler :259-271)
# --------------------------------------------------------------------------
@query(
    "minmax_scale",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - min(c_acctbal) OVER ())
                 / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 6) AS acctbal_scaled
    FROM customer
    """,
    tags=("window", "scaling"),
)
def minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling via scalar aggregate broadcast-joined back — avoids
    the single-partition global window at scale (an unpartitioned window
    funnels ALL rows through one task; a 2-row broadcast join doesn't)."""
    t = load(spark, sf_dir)
    bounds = t.customer.agg(
        F.min("c_acctbal").alias("_lo"), F.max("c_acctbal").alias("_hi")
    )
    return (
        t.customer.crossJoin(F.broadcast(bounds))
        .select(
            "c_custkey",
            F.round(
                (F.col("c_acctbal") - F.col("_lo")) / (F.col("_hi") - F.col("_lo")), 6
            ).alias("acctbal_scaled"),
        )
    )


# --------------------------------------------------------------------------
# O1 — order-by + top-k
# (reference: ORDER BY dateValue DESC then row 0, findatabase.py:72-75)
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans this as TakeOrderedAndProject — a per-partition
    heap + driver merge, no global sort. Unique tiebreak (o_orderkey)
    makes the selected SET deterministic for the oracle hash."""
    t = load(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


# --------------------------------------------------------------------------
# §2.7 — set operations (UNION / INTERSECT / EXCEPT)
# --------------------------------------------------------------------------
@query(
    "set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    """,
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    building = t.customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big_buyers = (
        t.orders.where(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(big_buyers)


@query(
    "except_all",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
    tags=("setop",),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    ordered = t.orders.select(F.col("o_custkey").alias("c_custkey"))
    negative = t.customer.where(F.col("c_acctbal") < 0).select("c_custkey")
    return ordered.subtract(negative)  # EXCEPT (set) semantics, matches SQL


# --------------------------------------------------------------------------
# W1-W3 as full-row distinct — exact dedup
# (reference: redundancy.sql ROW_NUMBER dedup; dropDuplicates semantics)
# --------------------------------------------------------------------------
@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("dedup", "distinct"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# F1-F3 — date arithmetic / parsing / truncation
# (reference: get_date(), findatabase.py:108-110; strptime+1day :218-219;
#  str(ts)[:10] truncation :170-171)
# --------------------------------------------------------------------------
@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(CAST(o_orderdate AS DATE) + 1, '%Y-%m-%d') AS next_day,
           strftime(CAST(o_orderdate AS DATE) - 3650, '%Y-%m-%d') AS ten_years_back,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_string
    FROM orders
    WHERE o_orderkey < 1000
    """,
    tags=("scalar", "dates"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernel parity: truncation (ts→date), ±N days arithmetic,
    field extraction, ISO formatting — the reference does all of these
    with Python strftime/strptime string math."""
    t = load(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return t.orders.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(d, 1), "yyyy-MM-dd").alias("next_day"),
        F.date_format(F.date_sub(d, 3650), "yyyy-MM-dd").alias("ten_years_back"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_string"),
    )


# --------------------------------------------------------------------------
# F5 — null→0 coercion + JSON extraction
# (reference: missing fundamentals → 0, dataAcquisition.py:59-66;
#  extended surface: events.props JSON)
# --------------------------------------------------------------------------
@query(
    "json_extract_coalesce",
    oracle="""
    SELECT event_type,
           round(sum(coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0)), 2)
               AS sum_k,
           round(sum(coalesce(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0)), 2)
               AS sum_missing
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "coalesce"),
)
def json_extract_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction with the reference's 0-sentinel for missing
    values (never NULL — dataAcquisition.py:59-66 semantics).

    Parses each props string ONCE via from_json (two get_json_object
    calls would parse the JSON twice per row)."""
    t = load(spark, sf_dir)
    parsed = F.from_json("props", "k double, missing double").alias("_p")
    ev = t.events.select("event_type", parsed)
    return ev.groupBy("event_type").agg(
        F.round(F.sum(F.coalesce(F.col("_p.k"), F.lit(0.0))), 2).alias("sum_k"),
        F.round(F.sum(F.coalesce(F.col("_p.missing"), F.lit(0.0))), 2).alias(
            "sum_missing"
        ),
    )


# --------------------------------------------------------------------------
# F6 — cyclical (sin/cos) feature encodings
# (reference: FunctionTransformer sin/cos, plot_cyclical_feature_engineering.py:354-359)
# --------------------------------------------------------------------------
@query(
    "cyclical_features",
    oracle="""
    SELECT o_orderkey,
           round(sin(month(o_orderdate) / 12.0 * 2 * pi()), 6) + 0.0 AS month_sin,
           round(cos(month(o_orderdate) / 12.0 * 2 * pi()), 6) + 0.0 AS month_cos
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("scalar", "ml-features"),
)
def cyclical_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    t = load(spark, sf_dir)
    angle = F.month("o_orderdate") / 12.0 * 2 * math.pi
    return t.orders.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        (F.round(F.sin(angle), 6) + 0.0).alias("month_sin"),
        (F.round(F.cos(angle), 6) + 0.0).alias("month_cos"),
    )


# --------------------------------------------------------------------------
# §2.4 extension — rollup (grouping sets)
# --------------------------------------------------------------------------
@query(
    "rollup_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# pivot (conditional aggregation on the oracle side)
# --------------------------------------------------------------------------
@query(
    "pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "pivot"),
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a PINNED value list, expressed as direct conditional
    aggregation: one scan, one exchange, plain SUM(CASE...) accumulators
    — the exact plan `.pivot(col, values=[...])` lowers to, minus the
    PivotFirst machinery (which benched 4x slower in r3)."""
    t = load(spark, sf_dir)
    out = t.lineitem.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 2
        ).alias("O"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 2
        ).alias("F"),
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


# --------------------------------------------------------------------------
# §2.4 extension — cube (full grouping-set lattice)
# --------------------------------------------------------------------------
@query(
    "cube_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube"),
)
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all four grouping sets in
    one pass (map-side partial aggregation covers every set; no
    re-scan per set)."""
    t = load(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# §2.11 — time-ordered CV fold assignment (P5: positional slicing
# becomes explicit ntile over an explicit time ordering)
# --------------------------------------------------------------------------
@query(
    "time_split_folds",
    oracle="""
    SELECT fold, count(*) AS n_orders,
           min(o_orderdate) AS fold_start, max(o_orderdate) AS fold_end
    FROM (
        SELECT o_orderdate,
               ntile(5) OVER (ORDER BY o_orderdate, o_orderkey) AS fold
        FROM orders
    )
    GROUP BY fold
    """,
    tags=("ml-features", "window", "split"),
)
def time_split_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold time-series split (the reference's positional iloc splits,
    plot_cyclical_feature_engineering.py:131-138, made deterministic):
    ntile over (date, key) — computed by operators/rank.global_ntile
    (range-partitioned global rank + the SQL-standard bucket formula),
    so even a raw-fact-scale split never funnels every row through one
    task the way a native `ntile() OVER (ORDER BY ...)` would."""
    from ..operators.rank import global_ntile

    t = load(spark, sf_dir)
    folds = global_ntile(
        t.orders.select("o_orderdate", "o_orderkey"),
        ["o_orderdate", "o_orderkey"],
        5,
        "fold",
    )
    return folds.groupBy("fold").agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderdate").alias("fold_start"),
        F.max("o_orderdate").alias("fold_end"),
    )


# --------------------------------------------------------------------------
# approximate aggregates — HLL distinct (no oracle: sketch estimate is
# engine-specific; the rows-only check plus the exact twin below bound it)
# --------------------------------------------------------------------------
@query(
    "approx_distinct_users",
    # Sketches aren't exact by definition — the checkable contract is
    # the HLL++ error bound: the oracle asserts the approximation lands
    # within 5% of the exact count (rsd=0.02 → generous margin), so the
    # row is a real verdict without pretending the sketch is exact.
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type next to the exact
    count — at 100 TB the sketch avoids the exact path's per-key
    distinct shuffle (mergeable partials only). The output exposes the
    BOUNDED-ERROR check (|approx − exact| ≤ 5% of exact) rather than
    the raw sketch value, which is engine-internal."""
    t = load(spark, sf_dir)
    agg = t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("approx_within_5pct"),
    )


# --------------------------------------------------------------------------
# §2.4 A6 — mean/stddev metrics (the reference's CV-fold MAE summary,
# plot_cyclical_feature_engineering.py:222-235)
# --------------------------------------------------------------------------
@query(
    "value_stats",
    oracle="""
    SELECT event_type,
           round(avg(value), 4) AS mean_value,
           round(stddev_samp(value), 4) AS std_value,
           round(stddev_pop(value), 4) AS std_pop_value
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "stats"),
)
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.stddev_samp("value"), 4).alias("std_value"),
        F.round(F.stddev_pop("value"), 4).alias("std_pop_value"),
    )


# --------------------------------------------------------------------------
# §2.8 F10 — regex validation filter (the reference's email regex gate,
# newsletter.php:67, generalized to pattern-gated ingestion)
# --------------------------------------------------------------------------
@query(
    "regex_validated_filter",
    oracle="""
    SELECT source, count(*) AS n_valid
    FROM documents
    WHERE regexp_matches(source, '^src1[0-9]$') AND lang IN ('en', 'fr')
    GROUP BY source
    """,
    tags=("filter", "regex"),
)
def regex_validated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rlike-gated scan — the pattern is a pushable predicate (shows up
    under PushedFilters as StringStartsWith where rewritable; the rlike
    itself evaluates inside WholeStageCodegen, never Python)."""
    t = load(spark, sf_dir)
    return (
        t.documents.where(
            F.col("source").rlike("^src1[0-9]$")
            & F.col("lang").isin("en", "fr")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_valid"))
    )


# --------------------------------------------------------------------------
# §3.2 S7 — raw-SQL executor surface: the same registry views the
# DataFrame queries use, addressed through spark.sql (full Catalyst:
# parse → analyze → optimize → execute)
# --------------------------------------------------------------------------
@query(
    "sql_surface",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "scan"),
)
def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole query language is a SQL string template
    (read_database, findatabase.py:124-126). Here the same text runs
    through Catalyst against the catalog's temp views — proving the
    engine's ANSI-SQL front door, not just the DataFrame API."""
    load(spark, sf_dir).register_views(("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# §2.4 extension — exact grouped percentiles. NOT the built-in
# `percentile()` holistic agg (which buffers a whole group in one task
# — 3 tasks for 3 return flags no matter the data size); the
# distributed order-statistics operator keeps parallelism at
# partitions × groups with bounded task memory (operators/percentiles).
# --------------------------------------------------------------------------
@query(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import grouped_exact_percentiles

    t = load(spark, sf_dir)
    out = grouped_exact_percentiles(
        t.lineitem,
        ["l_returnflag"],
        "l_extendedprice",
        [0.5, 0.9, 0.99],
        names=["p50", "p90", "p99"],
    )
    return out.select(
        "l_returnflag",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
    )


# --------------------------------------------------------------------------
# §2.4 extension — distinct + conditional aggregation in one pass
# (count(DISTINCT) expands to a two-stage partial agg under Catalyst;
# conditional sums are filter-free single-pass)
# --------------------------------------------------------------------------
@query(
    "distinct_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
               AS discounted_revenue,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct", "conditional"),
)
def distinct_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(DISTINCT) columns: Catalyst plans an expand +
    two-level aggregate — each distinct column deduplicates map-side
    before the shuffle, so the exchange carries distinct (group, value)
    pairs, not raw rows."""
    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                    0
                )
            ),
            2,
        ).alias("discounted_revenue"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# §2.4 extension — GROUPING SETS (the general form of rollup_qty /
# cube_qty): arbitrary set list in one scan via Expand
# --------------------------------------------------------------------------
@query(
    "grouping_sets_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def grouping_sets_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — one scan, Expand multiplies each row
    into its sets, then a single partial-aggregated shuffle (never one
    scan per set)."""
    t = load(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --------------------------------------------------------------------------
# §2.4 extension — bivariate statistical aggregates (corr, covariance,
# least-squares slope/intercept): one-pass mergeable moments, the
# groundwork for "beta of a stock vs the market" style analytics
# --------------------------------------------------------------------------
@query(
    "price_qty_regression",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "statistics", "regression"),
)
def price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar/regr_* are algebraic aggregates (sum, sum², cross
    moments) — partial-aggregated map-side, one tiny shuffle row per
    (mapper, group); never a holistic buffer."""
    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(
            F.expr("regr_slope(l_extendedprice, l_quantity)"), 6
        ).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# §2.4 extension — unpivot (wide → long): the inverse of pivot_status_qty;
# the reference's 44-column fundamentals snapshot is exactly the wide
# shape a metrics store melts into (metric, value) rows
# --------------------------------------------------------------------------
@query(
    "unpivot_flag_metrics",
    oracle="""
    SELECT * FROM (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 6) AS avg_disc
        FROM lineitem
        GROUP BY l_returnflag
    ) UNPIVOT (val FOR metric IN (sum_qty, sum_price, avg_disc))
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregate → long (metric, val) via the native unpivot
    (Expand under the hood — one pass, rows × metrics output, no
    shuffle beyond the aggregation's own)."""
    t = load(spark, sf_dir)
    wide = t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "avg_disc"], "metric", "val"
    )


# --------------------------------------------------------------------------
# §2.4 extension — TPC-H Q6 shape: pure scan → filter → scalar agg,
# the canonical predicate-pushdown benchmark query
# --------------------------------------------------------------------------
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("aggregate", "tpch-q6", "pushdown"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: every predicate reaches the parquet scan
    (PushedFilters) and only 3 columns are read (ReadSchema) — at
    100 TB the scan skips entire row groups on shipdate min/max
    stats. No shuffle until the single partial-aggregated scalar."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# §2.4 ext — approximate quantile sketch with a bounded-error verdict
# (companion to approx_distinct_users' HLL bound: sketches are graded
# on their error contract, not on bit-equality with the oracle)
# --------------------------------------------------------------------------
@query(
    "approx_quantiles_bounded",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS exact_p50,
           round(quantile_cont(value, 0.95), 4) AS exact_p95,
           TRUE AS p50_within_5pct,
           TRUE AS p95_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "approx", "sketch", "quantile"),
)
def approx_quantiles_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-style quantile sketch (percentile_approx) next to the exact
    interpolated percentile — at 100 TB the sketch is the only sane
    path (mergeable fixed-size partials, one reduce; the exact path is
    a full sort or the range-partitioned scheme in price_percentiles).
    Output exposes the BOUNDED-ERROR verdict (|approx − exact| ≤ 5% of
    |exact|) plus the exact values; the raw sketch estimate is
    engine-internal and not part of the contract."""
    t = load(spark, sf_dir)
    agg = t.events.groupBy("event_type").agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000).alias(
            "_approx"
        ),
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.95))).alias("_exact"),
    )

    def within(i: int) -> F.Column:
        a, e = F.col("_approx")[i], F.col("_exact")[i]
        return F.abs(a - e) <= 0.05 * F.abs(e)

    return agg.select(
        "event_type",
        F.round(F.col("_exact")[0], 4).alias("exact_p50"),
        F.round(F.col("_exact")[1], 4).alias("exact_p95"),
        within(0).alias("p50_within_5pct"),
        within(1).alias("p95_within_5pct"),
    )


# --------------------------------------------------------------------------
# equi-depth histogram (quantile-boundary buckets)
# --------------------------------------------------------------------------
@query(
    "equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS b1,
               round(quantile_cont(o_totalprice, 0.50), 6) AS b2,
               round(quantile_cont(o_totalprice, 0.75), 6) AS b3
        FROM orders
    )
    SELECT CASE WHEN o_totalprice < b1 THEN 0
                WHEN o_totalprice < b2 THEN 1
                WHEN o_totalprice < b3 THEN 2
                ELSE 3 END AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders, b
    GROUP BY 1
    """,
    tags=("aggregate", "histogram", "percentile"),
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-boundary) histogram of order totals — the
    optimizer-statistics companion to the equal-width
    `histogram_totalprice`. Boundaries come from the distributed
    exact-percentile operator (range repartition + broadcast boundary
    filter — never a holistic single-task sort, operators/
    percentiles.py), rounded identically on both engines before the
    strict-< bucket CASE; the 3-boundary frame broadcasts onto the
    scan so bucket assignment is a narrow map."""
    from ..operators.percentiles import grouped_exact_percentiles

    t = load(spark, sf_dir)
    bounds = grouped_exact_percentiles(
        t.orders.select(F.lit(1).alias("_g"), "o_totalprice"),
        ["_g"],
        "o_totalprice",
        [0.25, 0.5, 0.75],
        names=["b1", "b2", "b3"],
    ).select(
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        F.round("b3", 6).alias("b3"),
    )
    x = F.col("o_totalprice")
    bucket = (
        F.when(x < F.col("b1"), 0)
        .when(x < F.col("b2"), 1)
        .when(x < F.col("b3"), 2)
        .otherwise(3)
    )
    return (
        t.orders.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(x), 2).alias("lo"),
            F.round(F.max(x), 2).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# mergeable HLL sketch rollup (datasketches)
# --------------------------------------------------------------------------
@query(
    "hll_mergeable_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           count(DISTINCT l_orderkey) AS n_exact,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY 1
    UNION ALL
    SELECT 'TOTAL', count(DISTINCT l_orderkey), TRUE FROM lineitem
    """,
    tags=("aggregate", "sketch", "hll", "scale-path"),
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned distinct-count sketches with a union-merge total —
    the mergeability property that makes sketch rollups work at 100 TB
    (per-partition HLL sketches union into the global estimate without
    rescanning; naive per-month exact counts can NOT be summed because
    an order ships across months). The driver-checked contract is the
    error bound: every per-month estimate and the merged total must be
    within 5% of exact (the oracle emits the exact counts and a TRUE
    verdict; Spark's row only hash-matches if its sketch verdict is
    also TRUE — same error-contract pattern as
    approx_quantiles_bounded)."""
    t = load(spark, sf_dir)
    month = F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM")
    # ONE fact scan (r13, guide §1.2/§5): the old shape scanned
    # lineitem three times — the per-month aggregate, its unpersisted
    # re-execution under the union-merge, and the global exact count.
    # All three consumers need only the DISTINCT (month, orderkey)
    # pairs: countDistinct is count(*) over them, and an HLL sketch is
    # insertion-duplicate-insensitive, so sketches over the deduped
    # pairs are register-identical to sketches over the raw rows.
    d = (
        t.lineitem.select(month.alias("month"), "l_orderkey")
        .distinct()
        .persist()
    )
    sk = d.groupBy("month").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count("*").alias("n_exact"),
    ).persist()  # 84-row sketch frame, read by per-month AND the merge
    within = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
        / F.col("n_exact")
        <= 0.05
    )
    per_month = sk.select("month", "n_exact", within.alias("within_5pct"))
    merged = sk.agg(F.hll_union_agg("sk").alias("msk"))
    g_exact = d.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    total = (
        merged.crossJoin(g_exact)
        .select(
            F.lit("TOTAL").alias("month"),
            "n_exact",
            (
                F.abs(F.hll_sketch_estimate("msk") - F.col("n_exact"))
                / F.col("n_exact")
                <= 0.05
            ).alias("within_5pct"),
        )
    )
    return per_month.unionByName(total)


# --------------------------------------------------------------------------
# one-pass correlation matrix
# --------------------------------------------------------------------------
@query(
    "corr_matrix_lineitem",
    oracle="""
    SELECT 'quantity_price' AS pair,
           round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS r
    FROM lineitem
    UNION ALL
    SELECT 'quantity_discount', round(corr(l_quantity, l_discount), 6) + 0.0
    FROM lineitem
    UNION ALL
    SELECT 'quantity_tax', round(corr(l_quantity, l_tax), 6) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'price_discount', round(corr(l_extendedprice, l_discount), 6) + 0.0
    FROM lineitem
    UNION ALL
    SELECT 'price_tax', round(corr(l_extendedprice, l_tax), 6) + 0.0
    FROM lineitem
    UNION ALL
    SELECT 'discount_tax', round(corr(l_discount, l_tax), 6) + 0.0 FROM lineitem
    """,
    tags=("aggregate", "statistics", "bivariate"),
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pairwise correlation matrix of the four lineitem
    measures in ONE aggregate pass (six corr accumulators share the
    single scan — map-side partial co-moments, one exchange), then
    unpivoted to (pair, r) rows. The oracle's six scans produce the
    same numbers; Spark's plan does it with one."""
    t = load(spark, sf_dir)
    pairs = [
        ("quantity_price", "l_quantity", "l_extendedprice"),
        ("quantity_discount", "l_quantity", "l_discount"),
        ("quantity_tax", "l_quantity", "l_tax"),
        ("price_discount", "l_extendedprice", "l_discount"),
        ("price_tax", "l_extendedprice", "l_tax"),
        ("discount_tax", "l_discount", "l_tax"),
    ]
    agg = t.lineitem.agg(
        *[
            (F.round(F.corr(a, b), 6) + 0.0).alias(name)
            for name, a, b in pairs
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("pair"), F.col(name).alias("r")
                    )
                    for name, _, _ in pairs
                ]
            )
        ).alias("c")
    ).select("c.*")


# --------------------------------------------------------------------------
# Benford first-digit analysis (fraud screening)
# --------------------------------------------------------------------------
import math as _math

#: expected Benford shares log10(1 + 1/d), folded in Python so both
#: engines consume identical doubles
_BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {v!r}" for d, v in _BENFORD.items()
) + " END"


@query(
    "benford_first_digit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice))))
               AS BIGINT) AS first_digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    counts AS (
        SELECT first_digit, count(*) AS n FROM digits GROUP BY first_digit
    ),
    total AS (SELECT sum(n) AS t FROM counts)
    SELECT first_digit, n,
           round(n * 1.0 / t, 6) AS share,
           round({_BENFORD_CASE}, 6) AS benford,
           round(n * 1.0 / t - {_BENFORD_CASE}, 6) + 0.0 AS deviation
    FROM counts, total
    """,
    tags=("aggregate", "finance", "benford"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screening over order totals — the
    classic forensic-accounting scan. The leading digit comes from
    floor(x / 10^floor(log10 x)) (pure math, no string formatting —
    double-to-string renderings differ across engines, log10/floor do
    not); expected shares are Python-folded literals. One scan, one
    9-group aggregate, a 1-row total broadcast."""
    t = load(spark, sf_dir)
    x = F.col("o_totalprice")
    first_digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast(
        "long"
    )
    counts = (
        t.orders.where(x > 0)
        .groupBy(first_digit.alias("first_digit"))
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    benford_col = F.lit(None).cast("double")
    expr = None
    for d, v in _BENFORD.items():
        expr = (
            F.when(F.col("first_digit") == d, F.lit(v))
            if expr is None
            else expr.when(F.col("first_digit") == d, F.lit(v))
        )
    benford_col = expr
    share = F.col("n") * 1.0 / F.col("t")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(benford_col, 6).alias("benford"),
            (F.round(share - benford_col, 6) + 0.0).alias("deviation"),
        )
    )


_RCTE_SQL = """
    WITH RECURSIVE chain(s_suppkey, root, depth) AS (
        SELECT s_suppkey, s_suppkey AS root, 0 AS depth
        FROM supplier WHERE s_suppkey < 2
        UNION ALL
        SELECT s.s_suppkey, c.root, c.depth + 1
        FROM supplier s JOIN chain c ON s.s_suppkey {div} 2 = c.s_suppkey
        WHERE s.s_suppkey >= 2
    )
    SELECT depth, count(*) AS n_suppliers,
           min(s_suppkey) AS min_key, max(s_suppkey) AS max_key,
           CAST(sum(root) AS BIGINT) AS root_sum
    FROM chain GROUP BY depth
"""


@query(
    "recursive_supplier_chain",
    # DuckDB runs the same recursive CTE with // integer division;
    # identical fixpoint, identical per-depth aggregates.
    oracle=_RCTE_SQL.format(div="//"),
    tags=("sql", "recursive-cte"),
)
def recursive_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 SQL surface): transitive closure of a
    reporting hierarchy (parent(k) = k div 2 — a binary tree over the
    supplier registry, deterministic on both engines). Each recursion
    step is one join of the frontier against the dimension — the
    iterative-join shape Catalyst executes as repeated hash joins with
    the frontier on the build side; depth is logarithmic in the
    registry size. The same closure is what a BOM explosion or an org
    rollup runs at warehouse scale."""
    load(spark, sf_dir).register_views(("supplier",))
    return spark.sql(_RCTE_SQL.format(div="div"))


@query(
    "intersect_all_multiset",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
    tags=("setop", "multiset"),
)
def intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection preserving duplicate
    multiplicity min(n_left, n_right) per value, completing the §2.7
    set-op family (union / intersect / except / exceptAll already
    registered). Catalyst plans it as one aggregate-and-replicate over
    a single shuffle, not a join."""
    t = load(spark, sf_dir)
    r = t.lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    f = t.lineitem.where(F.col("l_linestatus") == "F").select("l_orderkey")
    return r.intersectAll(f)


# --------------------------------------------------------------------------
# Ordered string aggregation (round 9)
# --------------------------------------------------------------------------
@query(
    "string_agg_ordered",
    # deterministic ordered concatenation: DuckDB's ORDER BY inside
    # string_agg twins Spark's array_sort(collect_list(...)) — the
    # collect order is nondeterministic on BOTH engines, the explicit
    # sort is what makes the result well-defined.
    oracle="""
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
           min(n.n_name) AS first_nation,
           max(n.n_name) AS last_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("core", "sql-surface", "agg"),
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg WITHIN GROUP):
    the CSV of nation names per region under an explicit ORDER BY —
    the report-building aggregate every SQL surface carries and the
    canonical trap for engines that collect in partition order
    (collect_list is nondeterministic; array_sort makes it a function).

    Scale shape: broadcast dimension join + one keyed aggregate; the
    sort runs inside each group's collected array (bounded by the
    dimension's fan-out), never as a global sort."""
    t = load(spark, sf_dir)
    j = t.nation.join(
        F.broadcast(t.region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return j.groupBy("r_name").agg(
        F.count("*").alias("n_nations"),
        F.array_join(
            F.array_sort(F.collect_list("n_name")), ","
        ).alias("nations_csv"),
        F.min("n_name").alias("first_nation"),
        F.max("n_name").alias("last_nation"),
    )


# --------------------------------------------------------------------------
# Deterministic per-group mode (round 9)
# --------------------------------------------------------------------------
@query(
    "mode_per_group",
    # native mode() tie-breaking is engine-defined, so the mode is
    # computed the portable way on both sides: count per value, then
    # the (count DESC, value ASC) total order picks one deterministic
    # winner.
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT o_orderstatus, o_orderpriority, n,
               sum(n) OVER (PARTITION BY o_orderstatus) AS n_total,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY n DESC, o_orderpriority
               ) AS rn
        FROM c
    )
    SELECT o_orderstatus,
           o_orderpriority AS modal_priority,
           CAST(n AS BIGINT) AS n_modal,
           CAST(n_total AS BIGINT) AS n_total,
           round(CAST(n AS DOUBLE) / n_total, 6) + 0.0 AS modal_share
    FROM r WHERE rn = 1
    """,
    tags=("core", "sql-surface", "agg"),
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break: the most frequent
    order priority within each order status, ties resolved toward the
    lexicographically smallest value — the portable form of SQL's
    mode() (whose tie behavior is engine-defined, so the naive
    native-function twin would be flaky by construction).

    Scale shape: one map-side-combined (status, priority) count — the
    fact table collapses to a <=15-row frame — then a rank window and
    share arithmetic on that bounded frame."""
    t = load(spark, sf_dir)
    c = t.orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("o_orderstatus")
    r = c.select(
        "o_orderstatus", "o_orderpriority", "n",
        F.sum("n").over(w).alias("n_total"),
        F.row_number().over(
            w.orderBy(F.col("n").desc(), "o_orderpriority")
        ).alias("rn"),
    )
    return r.where(F.col("rn") == 1).select(
        "o_orderstatus",
        F.col("o_orderpriority").alias("modal_priority"),
        F.col("n").cast("long").alias("n_modal"),
        F.col("n_total").cast("long").alias("n_total"),
        (
            F.round(F.col("n").cast("double") / F.col("n_total"), 6)
            + 0.0
        ).alias("modal_share"),
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery surface (round 9)
# --------------------------------------------------------------------------
@query(
    "lateral_topk_per_group",
    # identical SQL text on both engines (the ANSI LATERAL form of
    # top-k-per-group); the inner ORDER BY carries a full tie-break so
    # the per-group cut is deterministic.
    oracle="""
    SELECT n.n_name,
           s.s_name, s.s_acctbal
    FROM nation n,
    LATERAL (
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_name
        LIMIT 3
    ) s
    """,
    tags=("sql", "sql-surface", "lateral"),
)
def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers by account balance per nation via an ANSI
    LATERAL correlated subquery — the second SQL spelling of
    top-k-per-group beside topk_per_group's window form, proving the
    engine's correlated-subquery front door end to end (Catalyst
    decorrelates the LATERAL into a ranked join rather than executing
    it per outer row — the optimization that makes this spelling
    viable at all at scale).

    Scale shape: after decorrelation this is the same
    partition-ranked shape as the window form — no per-row subquery
    execution, no cartesian expansion."""
    cat = load(spark, sf_dir)
    cat.register_views(("nation", "supplier"))
    return spark.sql(
        """
        SELECT n.n_name,
               s.s_name, s.s_acctbal
        FROM nation n,
        LATERAL (
            SELECT s_name, round(s_acctbal, 2) AS s_acctbal
            FROM supplier
            WHERE s_nationkey = n.n_nationkey
            ORDER BY s_acctbal DESC, s_name
            LIMIT 3
        ) s
        """
    )
