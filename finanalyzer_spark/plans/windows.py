"""Window-function queries (SURVEY.md §2.5).

The reference's only window op is ROW_NUMBER-based dedup
(finanalyzer/database/sql/redundancy.sql); its rolling statistics
(fiftyDayAverage, twoHundredDayAverage, fiftyTwoWeekHigh/Low —
sqlrequests.sql:90-95,144-145) are *ingested precomputed* from the
feed. Here we compute them properly with window frames — the flagship
window surface of the new engine.

Scale notes: every window below either partitions by a key (state
bounded per task, standard hash exchange) or runs over a frame
bounded by construction (revenue_decile_profile's 10-row decile
cumsum — tagged `bounded-window` for the lint's INFO tier); all
entity-scale ranks/cumsums/ntiles go through
operators/rank.ordered_scan instead of a global window (round 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.rank import ordered_scan
from .registry import query


# --------------------------------------------------------------------------
# W1 — ROW_NUMBER dedup with deterministic survivor
# (reference: redundancy.sql:1-10 — arbitrary survivor; we order the
#  partition so the survivor is deterministic and oracle-checkable)
# --------------------------------------------------------------------------
@query(
    "window_rownum_dedup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_shipdate DESC, l_linenumber DESC,
                            l_quantity DESC, l_extendedprice DESC
               ) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def window_rownum_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest line per order — the redundancy.sql pattern with an
    explicit ORDER BY so both engines keep the same survivor. The
    fixture injects duplicate (orderkey, linenumber) rows with
    DIFFERENT payloads (the reference's redundancy scenario), so the
    ordering must extend to payload columns for full determinism."""
    t = load(spark, sf_dir)
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_shipdate").desc(),
        F.col("l_linenumber").desc(),
        F.col("l_quantity").desc(),
        F.col("l_extendedprice").desc(),
    )
    return (
        t.lineitem.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --------------------------------------------------------------------------
# W4 — rolling average over a row frame (the 50-day moving average,
# computed instead of ingested; sqlrequests.sql:90-95)
# --------------------------------------------------------------------------
@query(
    "rolling_avg_price",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber,
           sum(round(l_extendedprice * 100)::BIGINT) OVER w
               / (count(*) OVER w * 100.0) AS avg50
    FROM lineitem
    WINDOW w AS (
        PARTITION BY l_partkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber,
                 l_quantity, l_extendedprice
        ROWS BETWEEN 49 PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window", "rolling", "flagship"),
)
def rolling_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50-row trailing average per part (ticker-equivalent).

    Computed exactly: prices are 2-decimal, so the frame sum in CENTS
    is an exact integer (< 2^53) in any engine and the single final
    division is bit-deterministic IEEE — no rounding tolerance needed.
    Ordering extends to payload columns because the fixture injects
    duplicate keys with differing payloads."""
    t = load(spark, sf_dir)
    w = (
        W.partitionBy("l_partkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
        .rowsBetween(-49, 0)
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return t.lineitem.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(cents).over(w) / (F.count("*").over(w) * 100.0)).alias("avg50"),
    )


# --------------------------------------------------------------------------
# W4 — rolling high/low (fiftyTwoWeekHigh/Low analog; sqlrequests.sql:144-145)
# --------------------------------------------------------------------------
@query(
    "rolling_high_low",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber,
           max(l_extendedprice) OVER w AS high252,
           min(l_extendedprice) OVER w AS low252
    FROM lineitem
    WINDOW w AS (
        PARTITION BY l_partkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber,
                 l_quantity, l_extendedprice
        ROWS BETWEEN 251 PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window", "rolling"),
)
def rolling_high_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """252-row trailing extrema — no FP accumulation, so no rounding
    needed: min/max of identical doubles are bit-identical."""
    t = load(spark, sf_dir)
    w = (
        W.partitionBy("l_partkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
        .rowsBetween(-251, 0)
    )
    return t.lineitem.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.max("l_extendedprice").over(w).alias("high252"),
        F.min("l_extendedprice").over(w).alias("low252"),
    )


# --------------------------------------------------------------------------
# lead/lag — day-over-day delta (no reference analog; standard extension)
# --------------------------------------------------------------------------
@query(
    "lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice
                 - lag(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ), 2) + 0.0 AS delta_prev
    FROM orders
    """,
    tags=("window", "lag"),
)
def lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        # +0.0 normalizes IEEE -0.0 (round of a small negative) to +0.0
        # so the value hash is engine-agnostic
        (F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2) + 0.0).alias(
            "delta_prev"
        ),
    )


# --------------------------------------------------------------------------
# running cumulative sum + rank
# --------------------------------------------------------------------------
@query(
    "cumsum_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS spend_to_date,
           rank() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS price_rank
    FROM orders
    """,
    tags=("window", "cumsum", "rank"),
)
def cumsum_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    wtime = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wrank = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(wtime), 2).alias("spend_to_date"),
        F.rank().over(wrank).alias("price_rank"),
    )


# --------------------------------------------------------------------------
# top-k per group (Window + row_number ≤ K — the classic OLAP pattern)
# --------------------------------------------------------------------------
@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. At scale this is one hash shuffle on
    the group key + per-partition sort; no global sort, no collect."""
    t = load(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# ext — the full ranking family in one window pass (rank, dense_rank,
# percent_rank, cume_dist, ntile): all share ONE partition+sort, so
# Catalyst plans a single Window operator (one shuffle, one sort)
# --------------------------------------------------------------------------
@query(
    "rank_analytics",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist() OVER w, 6) AS cdist,
           ntile(4) OVER w AS quartile
    FROM orders
    WHERE o_totalprice > 450000
    WINDOW w AS (
        PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey
    )
    """,
    tags=("window", "ranking"),
)
def rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ranking function over the same window spec — one Window
    physical operator (single shuffle on the partition key, single
    sort), not five. The tie-break on o_orderkey makes rank/ntile
    deterministic so the oracle hash matches."""
    t = load(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.where(F.col("o_totalprice") > 450000).select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# ext — forward fill (gap filling): last_value IGNORE NULLS over an
# ordered window — the canonical sparse-timeseries repair (carry a
# price forward through non-trading gaps)
# --------------------------------------------------------------------------
@query(
    "forward_fill_prices",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           last_value(px IGNORE NULLS) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS px_filled
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
               CASE WHEN l_quantity < 10 THEN NULL ELSE l_extendedprice END AS px
        FROM lineitem
    )
    """,
    tags=("window", "forward-fill", "gap-fill"),
)
def forward_fill_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill = F.last(ignorenulls) over an ordered frame — one
    shuffle on the partition key, one sort, no self-join. (Rows with
    quantity < 10 play the role of gap days in the OHLC analogy.)"""
    t = load(spark, sf_dir)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    px = F.when(F.col("l_quantity") < 10, None).otherwise(F.col("l_extendedprice"))
    return t.lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.last(px, ignorenulls=True).over(w).alias("px_filled"),
    )


# --------------------------------------------------------------------------
# ext — RANGE frame (value/time-interval window): trailing 30-DAY sum
# per supplier — frames defined by the ORDER BY value, not row offsets
# (rows frames are wrong when days are missing; range frames aren't)
# --------------------------------------------------------------------------
@query(
    "trailing_30d_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ), 2) AS rev_30d
    FROM lineitem
    """,
    tags=("window", "range-frame"),
)
def trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween on epoch seconds: the frame covers a 30-day VALUE
    interval regardless of how many rows fall in it — the correct
    trailing-window semantics for sparse time series (rowsBetween(-N)
    silently widens over gaps). Same single shuffle + sort as any
    window."""
    t = load(spark, sf_dir)
    # TIMESTAMP_NTZ → epoch seconds (session tz is UTC, so the two
    # timestamp types agree; rangeBetween needs a numeric ordering)
    epoch = F.col("l_shipdate").cast("timestamp_ltz").cast("long")
    w = W.partitionBy("l_suppkey").orderBy(epoch).rangeBetween(-30 * 86400, 0)
    return t.lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("rev_30d"),
    )


# --------------------------------------------------------------------------
# rolling bivariate correlation
# --------------------------------------------------------------------------
@query(
    "rolling_corr_price_qty",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(corr(l_extendedprice, l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_extendedprice, l_quantity
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW
           ), 5) + 0.0 AS corr_30
    FROM lineitem
    """,
    tags=("window", "timeseries", "bivariate"),
)
def rolling_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-row trailing Pearson correlation between price and quantity
    per supplier — the rolling-beta/pairs-trading window shape. `corr`
    runs as a window aggregate inside the same single (supplier, time)
    sort any other frame stat would use; frames with <2 rows or zero
    variance yield NULL identically on both engines. Rounded to 5
    digits: the co-moment accumulation order differs across engines.

    The ORDER BY carries the PAYLOAD columns too: the fixture's
    (l_orderkey, l_linenumber) is NOT unique (duplicate keys with
    different payloads — FIXTURES.md quirk), and a ROWS frame over a
    tied order gives each engine a different frame multiset for the
    tied rows (caught by the round-5 sf0.1 oracle sweep; at sf0.01 no
    tie happened to land inside a 30-row frame boundary)."""
    t = load(spark, sf_dir)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_quantity",
        )
        .rowsBetween(-29, W.currentRow)
    )
    return t.lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.round(F.corr("l_extendedprice", "l_quantity").over(w), 5) + 0.0).alias(
            "corr_30"
        ),
    )


# --------------------------------------------------------------------------
# SCD2 interval construction (dimension history build)
# --------------------------------------------------------------------------
@query(
    "scd2_order_intervals",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           o_orderstatus,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    )
    """,
    tags=("window", "warehouse", "scd2"),
)
def scd2_order_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: each
    customer's order history becomes half-open validity intervals via
    lead() over the deterministic (date, key) order — valid_to of one
    row is valid_from of the next, the open row is flagged current.
    The standard CDC-to-dimension materialization; one window sort
    keyed by the dimension key, no join, no self-merge. At 100 TB the
    partition key is the natural hash-distribution key and the sort is
    per-key local."""
    t = load(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# period-over-period growth
# --------------------------------------------------------------------------
@query(
    "mom_revenue_growth",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) + 0.0
               AS delta,
           CASE WHEN lag(revenue) OVER (ORDER BY month) > 0
                THEN round((revenue - lag(revenue) OVER (ORDER BY month))
                           / lag(revenue) OVER (ORDER BY month), 6) + 0.0
           END AS growth_rate
    FROM monthly
    """,
    tags=("window", "warehouse", "growth", "bounded-window"),
)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: aggregate first (the window
    runs over ~84 month rows, not the fact table — the ratio-to-report
    discipline), then lag over the month order. The monthly revenue is
    rounded BEFORE the delta/ratio so both engines difference identical
    doubles."""
    t = load(spark, sf_dir)
    monthly = t.orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        (F.round(F.col("revenue") - prev, 2) + 0.0).alias("delta"),
        F.when(
            prev > 0, F.round((F.col("revenue") - prev) / prev, 6) + 0.0
        ).alias("growth_rate"),
    )


# --------------------------------------------------------------------------
# ext — linear interpolation gap fill: forward + backward anchors in one
# pass, exact time-weighted blend between them
# --------------------------------------------------------------------------
@query(
    "linear_interpolate_prices",
    oracle="""
    WITH m AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               (l_shipdate::DATE - DATE '1970-01-01') AS d,
               CASE WHEN l_quantity < 10 THEN NULL ELSE l_extendedprice END AS px
        FROM lineitem
    ),
    a AS (
        SELECT *,
           last_value(px IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN px IS NOT NULL THEN d END IGNORE NULLS)
               OVER wb AS pd,
           first_value(px IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN px IS NOT NULL THEN d END IGNORE NULLS)
               OVER wf AS nd
        FROM m
        WINDOW
          wb AS (PARTITION BY l_suppkey
                 ORDER BY d, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY l_suppkey
                 ORDER BY d, l_orderkey, l_linenumber
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           -- floor-based half-up: bit-identical across engines (native
           -- round() disagrees in the last cent when x*100 straddles .5)
           floor(CASE
               WHEN px IS NOT NULL THEN px
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               WHEN nd = pd THEN pv
               ELSE pv + (nv - pv) * (d - pd) / (nd - pd)
           END * 100 + 0.5) / 100 AS px_interp
    FROM a
    """,
    tags=("window", "gap-fill", "interpolate"),
)
def linear_interpolate_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (time-weighted) interpolation of masked prices: the
    nearest non-null anchor on each side comes from ONE backward and
    ONE forward ignore-nulls window over the same sort, then the blend
    is a narrow arithmetic map — pandas' ``interpolate(method='time')``
    as two window passes, never a self-join.

    Scale shape: Catalyst reuses a single shuffle+sort per frame
    direction within one window spec pair on identical partition/order
    keys; cost is two sorts of the partition, not O(gap) probing.
    Edge rows fall back to the available side (leading gap -> backfill,
    trailing gap -> forward fill), matching pandas' limit_direction=
    'both'."""
    t = load(spark, sf_dir)
    d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
    px = F.when(F.col("l_quantity") < 10, None).otherwise(F.col("l_extendedprice"))
    m = t.lineitem.select(
        "l_suppkey", "l_orderkey", "l_linenumber", d.alias("d"), px.alias("px")
    )
    order = [F.col("d"), F.col("l_orderkey"), F.col("l_linenumber")]
    wb = (
        W.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_d = F.when(F.col("px").isNotNull(), F.col("d"))
    a = m.select(
        "*",
        F.last("px", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_d, ignorenulls=True).over(wb).alias("pd"),
        F.first("px", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_d, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = (
        F.when(F.col("px").isNotNull(), F.col("px"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nd") == F.col("pd"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("d") - F.col("pd"))
            / (F.col("nd") - F.col("pd"))
        )
    )
    return a.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        # floor-based half-up rounding — same doubles as the oracle
        (F.floor(interp * 100 + 0.5) / 100).alias("px_interp"),
    )


@query(
    "abc_customer_classes",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, cents,
               sum(cents) OVER (ORDER BY cents DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(cents) OVER () AS total
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM ranked
    )
    SELECT abc_class,
           count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY abc_class
    """,
    tags=("window", "analytics", "pareto"),
)
def abc_customer_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) customer classification: rank customers by revenue
    descending, take the cumulative share, and split at 80% / 95% —
    the inventory-management classic, and the canonical
    cumulative-share window shape. Class boundaries compare integer
    cents (`cum * 100 <= total * 80`) so no float share is ever
    computed — the 80% cut is exact.

    Scale shape: the fact scan reduces to one integer row per customer
    first; the cumulative revenue then comes from
    operators/rank.ordered_scan — range repartition on (revenue desc,
    custkey) + local running sums + driver-computed partition offsets
    — so the Pareto walk over 1e9 customers is a fully parallel range
    shuffle, never a single-task `Window.orderBy()` sort; the grand
    total rides along as an exact literal. Final aggregate is 3
    rows."""
    t = load(spark, sf_dir)
    rev = (
        t.orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    ranked = ordered_scan(
        rev,
        [F.col("cents").desc(), "o_custkey"],
        running={"cum": "cents"},
        totals={"total": "cents"},
        checkpoint_input=True,
    )
    classed = ranked.select(
        "cents",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("revenue_cents"),
    )


@query(
    "pareto_front_parts",
    oracle="""
    WITH prof AS (
        SELECT l_partkey,
               min(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS px_cents,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_partkey
    ),
    pts AS (
        SELECT px_cents, total_qty, count(*) AS n_parts,
               min(l_partkey) AS example_part
        FROM prof GROUP BY px_cents, total_qty
    )
    -- INDEPENDENT algorithm: brute-force O(n^2) dominance test (a
    -- point is dominated by any cheaper-or-equal point with >= qty,
    -- other than itself) — catches sweep/tie bugs the window form
    -- could share with a same-shaped oracle
    SELECT px_cents, total_qty, n_parts, example_part
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.px_cents <= p.px_cents AND q.total_qty >= p.total_qty
          AND (q.px_cents <> p.px_cents OR q.total_qty <> p.total_qty)
    )
    """,
    tags=("window", "analytics", "skyline"),
)
def pareto_front_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) of parts on (cheapest observed
    price, total traded quantity): a point survives iff no point
    is both cheaper-or-equal and strictly better on quantity. The
    classic O(n log n) sweep: sort by price ascending (quantity
    descending within ties), keep a point iff its quantity strictly
    beats the running max of everything cheaper — NOT the O(n^2)
    dominance self-join.  The strictly-preceding running max comes
    from operators/rank.ordered_scan's `running_max_prev` (max is
    associative, so the partition offset is the max of all earlier
    range partitions), so the sweep over the point set is a parallel
    range shuffle, never a single-task window sort.

    Scale shape: facts reduce to one profile row per part, then to
    distinct (price, qty) points (two keyed aggregates); the sweep
    shuffles only the point set. Integer cents/quantities
    end-to-end."""
    from ..operators.rank import ordered_scan

    t = load(spark, sf_dir)
    prof = t.lineitem.groupBy("l_partkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "px_cents"
        ),
        F.sum("l_quantity").cast("long").alias("total_qty"),
    )
    pts = prof.groupBy("px_cents", "total_qty").agg(
        F.count("*").alias("n_parts"),
        F.min("l_partkey").alias("example_part"),
    )
    sky = ordered_scan(
        pts,
        [F.col("px_cents").asc(), F.col("total_qty").desc()],
        running_max_prev={"best_qty_cheaper": "total_qty"},
    )
    return sky.where(
        F.col("best_qty_cheaper").isNull()
        | (F.col("total_qty") > F.col("best_qty_cheaper"))
    ).drop("best_qty_cheaper")


@query(
    "calendar_spine_fill",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    spine AS (
        SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                      INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    filled AS (
        SELECT spine.d,
               coalesce(daily.cents, 0) AS cents,
               coalesce(daily.n_orders, 0) AS n_orders
        FROM spine LEFT JOIN daily ON daily.d = spine.d
    )
    SELECT count(*) AS n_days,
           CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_days,
           CAST(max(CASE WHEN n_orders = 0
                    THEN strftime(d, '%Y-%m-%d') END) AS VARCHAR)
               AS last_zero_day,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM filled
    """,
    tags=("window", "calendar", "gapfill"),
)
def calendar_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: generate the continuous date spine
    between the first and last order day (`sequence()` + explode —
    the generated dimension every warehouse calendar join needs),
    left-join the daily revenue rollup onto it, and zero-fill missing
    days. Complements forward_fill_prices (which carries values; this
    materializes the missing rows themselves).

    Scale shape: facts reduce to one row per day; the spine explodes
    from a SINGLE two-scalar row (years of days = thousands of rows —
    nothing); the fill join is keyed on day. The final aggregate
    proves the fill (zero-day count + unchanged revenue total)."""
    t = load(spark, sf_dir)
    daily = (
        t.orders.select(
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("cents"), F.count("*").alias("n_orders"))
    )
    spine = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("d")
        )
    )
    filled = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce("cents", F.lit(0)).alias("cents"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )
    return filled.agg(
        F.count("*").alias("n_days"),
        F.sum((F.col("n_orders") == 0).cast("long")).alias("n_zero_days"),
        F.max(
            F.when(
                F.col("n_orders") == 0, F.date_format("d", "yyyy-MM-dd")
            )
        ).alias("last_zero_day"),
        F.sum("cents").alias("total_cents"),
    )


_WINSOR_LO, _WINSOR_HI = 0.05, 0.95


@query(
    "winsorized_price_stats",
    oracle=f"""
    WITH b AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, {_WINSOR_LO}) AS lo,
               quantile_cont(l_extendedprice, {_WINSOR_HI}) AS hi
        FROM lineitem GROUP BY l_returnflag
    ),
    wz AS (
        SELECT l.l_returnflag,
               least(greatest(l.l_extendedprice, b.lo), b.hi) AS px,
               CASE WHEN l.l_extendedprice < b.lo
                      OR l.l_extendedprice > b.hi THEN 1 ELSE 0 END
                   AS clipped
        FROM lineitem l JOIN b ON b.l_returnflag = l.l_returnflag
    )
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(clipped) AS BIGINT) AS n_clipped,
           round(avg(px), 4) + 0.0 AS winsorized_mean,
           round(stddev_samp(px), 4) + 0.0 AS winsorized_std
    FROM wz GROUP BY l_returnflag
    """,
    tags=("window", "robust", "percentile"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p5/p95-clipped) mean and std per return flag — the
    robust-statistics companion to mad_outlier_flags: instead of
    FLAGGING outliers it CLIPS them, the standard de-fat-tailing step
    before training on heavy-tailed features. Exact linear-interpolated
    percentiles (`percentile` == `quantile_cont`) feed a broadcast
    clip-bound join.

    Scale shape: the per-group bounds are a 3-row aggregate broadcast
    back onto the stream; one keyed aggregate after the clip map. At
    100 TB the exact percentile swaps for approx_percentile — same
    plan otherwise."""
    t = load(spark, sf_dir)
    # one holistic buffer for both bounds (array form; cf. the same
    # 2-3x win measured on iqr_outlier_fences)
    b = (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"percentile(l_extendedprice,"
                f" array({_WINSOR_LO}, {_WINSOR_HI}))"
            ).alias("qs")
        )
        .select(
            "l_returnflag",
            F.col("qs")[0].alias("lo"),
            F.col("qs")[1].alias("hi"),
        )
    )
    wz = t.lineitem.join(F.broadcast(b), "l_returnflag").select(
        "l_returnflag",
        F.least(
            F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
        ).alias("px"),
        (
            (F.col("l_extendedprice") < F.col("lo"))
            | (F.col("l_extendedprice") > F.col("hi"))
        )
        .cast("long")
        .alias("clipped"),
    )
    return wz.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("clipped").alias("n_clipped"),
        (F.round(F.avg("px"), 4) + 0.0).alias("winsorized_mean"),
        (F.round(F.stddev_samp("px"), 4) + 0.0).alias("winsorized_std"),
    )


_MED_N = 15


@query(
    "rolling_median_price",
    oracle=f"""
    WITH m AS (
        SELECT l_partkey,
               CAST(quantile_cont(l_extendedprice, 0.5) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN {_MED_N - 1} PRECEDING AND CURRENT ROW
               ) * 200 AS BIGINT) AS med_halfcents
        FROM lineitem
    )
    SELECT l_partkey,
           count(*) AS n_obs,
           CAST(sum(med_halfcents) // count(*) AS BIGINT)
               AS avg_med_halfcents,
           CAST(max(med_halfcents) AS BIGINT) AS max_med_halfcents
    FROM m GROUP BY l_partkey
    """,
    tags=("window", "robust", "percentile"),
)
def rolling_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-row rolling EXACT median per ticker — the robust moving
    center (a median filter rejects single-tick spikes that drag a
    rolling mean), via `percentile` as a WINDOW aggregate (==
    DuckDB's `quantile_cont` over the same frame). The median of
    2-decimal prices is always a whole half-cent, so `* 200` makes it
    an exact integer and the per-ticker rollup divides integers —
    no float rounding anywhere.

    Scale shape: one (ticker, time) window sort; the frame holds 15
    rows of state per position; the rollup groups on the window's own
    partition key. Same single-shuffle shape as rolling_avg_price —
    the holistic median just carries a tiny sorted buffer instead of
    a running sum."""
    t = load(spark, sf_dir)
    w = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-(_MED_N - 1), W.currentRow)
    )
    m = t.lineitem.select(
        "l_partkey",
        F.round(
            F.expr("percentile(l_extendedprice, 0.5)").over(w) * 200, 0
        )
        .cast("long")
        .alias("med_halfcents"),
    )
    return m.groupBy("l_partkey").agg(
        F.count("*").alias("n_obs"),
        F.expr(
            "CAST(sum(med_halfcents) div count(*) AS BIGINT)"
        ).alias("avg_med_halfcents"),
        F.max("med_halfcents").alias("max_med_halfcents"),
    )


@query(
    "revenue_decile_profile",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    d AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
        FROM rev
    ),
    agg AS (
        SELECT decile, count(*) AS n_customers,
               sum(cents) AS cents
        FROM d GROUP BY decile
    ),
    tot AS (SELECT sum(cents) AS total FROM agg)
    SELECT decile,
           n_customers,
           CAST(agg.cents AS BIGINT) AS revenue_cents,
           CAST(agg.cents * 1000000 // tot.total AS BIGINT) AS share_ppm,
           CAST(sum(agg.cents) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // tot.total AS BIGINT) AS cum_share_ppm
    FROM agg CROSS JOIN tot
    """,
    tags=("window", "analytics", "pareto", "bounded-window"),
)
def revenue_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift profile: customers cut into revenue deciles
    (ntile over the aggregated frame), each decile's share and
    cumulative share of total revenue in integer ppm — the
    marketing-analytics decile chart, and the fine-grained sibling of
    abc_customer_classes. The ntile tie-break on customer key makes
    decile assignment deterministic.

    Scale shape: facts reduce to one integer row per customer; the
    decile cut comes from operators/rank.global_ntile (range-
    partitioned rank + bucket formula — never a single-task ntile
    sort); per-decile rollup is 10 rows, over which the cumulative
    window is bounded by construction; the scalar total rides a 1-row
    broadcast. Integer cents end-to-end."""
    from ..operators.rank import global_ntile

    t = load(spark, sf_dir)
    rev = (
        t.orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    d = global_ntile(
        rev, [F.col("cents").desc(), F.col("o_custkey")], 10, "decile"
    ).select("cents", "decile")
    agg = d.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("cents").alias("cents")
    )
    tot = agg.agg(F.sum("cents").alias("total"))
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("cents").alias("revenue_cents"),
            F.expr("cents * 1000000 div total").alias("share_ppm"),
            F.expr(
                "CAST(sum(cents) OVER (ORDER BY decile"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " * 1000000 div total AS BIGINT)"
            ).alias("cum_share_ppm"),
        )
    )
