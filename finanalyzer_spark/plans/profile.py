"""Data-quality profiling — the expectations-style checks a warehouse
migration runs before trusting a table (row counts, key uniqueness,
referential integrity, domain constraints), emitted as one long
(check, value, pass) frame.

Reference parity: the reference validates inputs ad hoc (regex guard
`main.py:23-31`, null→0 coercion `dataAcquisition.py:58-66`); this is
the systematized form a 100 TB lakehouse actually operates with.

Scale notes: every metric folds into ONE pass over `orders` (conditional
aggregates in a single HashAggregate, map-side partials) plus one
broadcast anti-join for the FK orphan count; the per-check rows come
from unpivoting the single aggregate row — no per-check scan, no
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

#: o_orderdate sanity bounds (TPC-H generation window)
DATE_LO, DATE_HI = "1992-01-01", "1998-12-31"


@query(
    "table_profile_checks",
    oracle=f"""
    WITH m AS (
        SELECT count(*) AS row_count,
               count(*) - count(DISTINCT o_orderkey) AS pk_dup_count,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                   AS null_custkey_count,
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                   AS nonpos_totalprice_count,
               sum(CASE WHEN o_orderdate < DATE '{DATE_LO}'
                         OR o_orderdate > DATE '{DATE_HI}'
                        THEN 1 ELSE 0 END) AS date_out_of_range_count,
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) AS bad_status_count
        FROM orders
    ),
    orphan AS (
        SELECT count(*) AS fk_orphan_count
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    )
    SELECT 'row_count' AS check_name, row_count::BIGINT AS value,
           row_count > 0 AS pass FROM m
    UNION ALL
    SELECT 'pk_dup_count', pk_dup_count::BIGINT, pk_dup_count = 0 FROM m
    UNION ALL
    SELECT 'null_custkey_count', null_custkey_count::BIGINT,
           null_custkey_count = 0 FROM m
    UNION ALL
    SELECT 'nonpos_totalprice_count', nonpos_totalprice_count::BIGINT,
           nonpos_totalprice_count = 0 FROM m
    UNION ALL
    SELECT 'date_out_of_range_count', date_out_of_range_count::BIGINT,
           date_out_of_range_count = 0 FROM m
    UNION ALL
    SELECT 'bad_status_count', bad_status_count::BIGINT,
           bad_status_count = 0 FROM m
    UNION ALL
    SELECT 'fk_orphan_count', fk_orphan_count::BIGINT,
           fk_orphan_count = 0 FROM orphan
    """,
    tags=("profile", "quality", "constraints"),
)
def table_profile_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations suite over `orders`: row count, primary-key
    uniqueness, FK null rate, price domain, date range, status domain,
    and customer referential integrity. Six metrics fold into one
    conditional HashAggregate over a single scan; the FK orphan count
    is a broadcast anti-join (customer is the dimension side); the
    (check, value, pass) rows unpivot from the one aggregate row."""
    t = load(spark, sf_dir)
    m = t.orders.agg(
        F.count("*").alias("row_count"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_dup_count"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey_count"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpos_totalprice_count"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit(DATE_LO).cast("date"))
                | (F.col("o_orderdate") > F.lit(DATE_HI).cast("date")),
                1,
            ).otherwise(0)
        ).alias("date_out_of_range_count"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status_count"),
    )
    orphan = (
        t.orders.join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("fk_orphan_count"))
    )
    checks = [
        ("row_count", F.col("row_count"), F.col("row_count") > 0),
        ("pk_dup_count", F.col("pk_dup_count"), F.col("pk_dup_count") == 0),
        (
            "null_custkey_count",
            F.col("null_custkey_count"),
            F.col("null_custkey_count") == 0,
        ),
        (
            "nonpos_totalprice_count",
            F.col("nonpos_totalprice_count"),
            F.col("nonpos_totalprice_count") == 0,
        ),
        (
            "date_out_of_range_count",
            F.col("date_out_of_range_count"),
            F.col("date_out_of_range_count") == 0,
        ),
        (
            "bad_status_count",
            F.col("bad_status_count"),
            F.col("bad_status_count") == 0,
        ),
    ]
    rows = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        val.cast("long").alias("value"),
                        ok.alias("pass"),
                    )
                    for name, val, ok in checks
                ]
            )
        ).alias("c")
    ).select("c.*")
    orphan_row = orphan.select(
        F.lit("fk_orphan_count").alias("check_name"),
        F.col("fk_orphan_count").cast("long").alias("value"),
        (F.col("fk_orphan_count") == 0).alias("pass"),
    )
    return rows.unionByName(orphan_row)


# --------------------------------------------------------------------------
# Exact heavy hitters: Misra-Gries candidates + exact recount
# --------------------------------------------------------------------------
HH_SUPPORT = 0.2

_HH_ORACLE = f"""
WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
n AS (SELECT count(*) AS total FROM events)
SELECT c.event_type, c.cnt
FROM c CROSS JOIN n
WHERE c.cnt > {HH_SUPPORT} * n.total
"""


@query(
    "heavy_hitters_exact",
    oracle=_HH_ORACLE,
    tags=("aggregate", "sketch", "profile", "scale-path"),
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event types with frequency > 20%, found the bounded-memory way:
    per-partition Misra-Gries summaries (operators/heavy.py) generate a
    provably complete candidate set with O(1/support) state and NO
    shuffle, then only candidates are recounted exactly behind a
    broadcast semi-join.  The result is exact — the sketch bounds the
    candidate set, never the reported counts — so a plain GROUP BY twin
    checks it.

    Scale shape: a full groupBy on a hot-key column shuffles every
    distinct key; this shuffles only candidate rows after the semi-join
    filter.  At 100 TB with billions of distinct keys and support 1e-4,
    pass-1 state is 20k counters per task and the recount aggregates
    ~1/support keys — the standard hot-key detector in front of
    operators/skew.salted_join."""
    from ..operators.heavy import heavy_hitters

    t = load(spark, sf_dir)
    return heavy_hitters(t.events, "event_type", support=HH_SUPPORT)
