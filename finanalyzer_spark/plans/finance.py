"""Reference-shaped finance pipeline queries — the heart of the
original system re-expressed on the star schema.

Role mapping (FIXTURES.md): `part` plays the ticker registry
(namesCompanies), `lineitem` plays the OHLC history (valuesFinHistory),
`l_shipdate` plays dateValue, `l_extendedprice` plays close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.ids import positional_ids
from .registry import query


@query(
    "latest_price_per_key",
    oracle="""
    WITH ranked AS (
        SELECT l_partkey,
               strftime(l_shipdate, '%Y-%m-%d') AS last_date,
               l_extendedprice AS last_price,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate DESC, l_orderkey DESC,
                            l_linenumber DESC, l_extendedprice DESC
               ) AS rn,
               count(*) OVER (PARTITION BY l_partkey) AS n_obs
        FROM lineitem
    )
    SELECT p.p_partkey AS key_id, p.p_name AS key_name,
           r.last_date, r.last_price, r.n_obs
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    WHERE r.rn = 1
    """,
    tags=("finance", "flagship"),
)
def latest_price_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: latest close per ticker with dedup + dimension join
    — the decision core of the reference's update_database
    (findatabase.py:203-232: per-key last date → fetch decision), as
    ONE aggregation + ONE broadcast join instead of an N+1 loop.

    `max_by` with a (date, orderkey, linenumber) tuple gives the
    deterministic latest observation; `part` is the broadcast
    dimension (namesCompanies role, findatabase.py:112-117)."""
    t = load(spark, sf_dir)
    latest = t.lineitem.groupBy("l_partkey").agg(
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_date"),
        F.count("*").alias("n_obs"),
        # single-pass max_by: no second shuffle, no self-join; the struct
        # ordering (incl. price) is total because duplicate keys carry
        # different payloads in the fixture
        F.expr(
            "max_by(l_extendedprice,"
            " struct(l_shipdate, l_orderkey, l_linenumber, l_extendedprice))"
        ).alias("last_price"),
    )
    return latest.join(
        F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        F.col("p_partkey").alias("key_id"),
        F.col("p_name").alias("key_name"),
        "last_date",
        "last_price",
        "n_obs",
    )


@query(
    "registry_bootstrap_ids",
    oracle="""
    SELECT row_number() OVER (ORDER BY p_name, p_partkey) AS id,
           p_partkey AS ticker_key, p_name AS name, p_brand AS exchange
    FROM part
    """,
    tags=("finance", "ids"),
)
def registry_bootstrap_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-id generation replacing SQLite AUTOINCREMENT
    (sqlrequests.sql:24-27): deterministic 1-based numbering over an
    explicit ordering — never monotonically_increasing_id, whose values
    depend on partition layout (SURVEY §7 'what's hard' (b)).

    Uses the distributed range-partition + offset recipe
    (operators/ids.positional_ids) rather than a global window, so the
    numbering never funnels all rows through one partition."""
    t = load(spark, sf_dir)
    return positional_ids(t.part, ["p_name", "p_partkey"], id_name="id").select(
        "id",
        F.col("p_partkey").alias("ticker_key"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("exchange"),
    )


@query(
    "idempotent_merge",
    oracle="""
    WITH base AS (
        SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-06-01 00:00:00'
    ),
    incoming AS (  -- re-delivery overlaps the last 90 days already loaded
        SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-03-01 00:00:00'
    ),
    merged AS (
        SELECT DISTINCT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                        l_shipdate
        FROM (SELECT * FROM base UNION ALL SELECT * FROM incoming)
    )
    SELECT count(*) AS n_rows,
           count(DISTINCT (l_orderkey, l_linenumber)) AS n_keys,
           round(sum(l_extendedprice), 2) AS total_price
    FROM merged
    """,
    tags=("finance", "merge", "incremental"),
)
def idempotent_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental load with overlapping re-delivery: union + dedup is
    idempotent (the reference loads first, dedups after —
    redundancy.sql; Spark expresses it as one distinct-union). The
    n_rows == n_keys invariant proves duplicate collapse."""
    t = load(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"]
    base = t.lineitem.where(F.col("l_shipdate") < F.lit("2000-06-01").cast("timestamp"))
    incoming = t.lineitem.where(
        F.col("l_shipdate") >= F.lit("2000-03-01").cast("timestamp")
    )
    merged = base.unionAll(incoming).select(*cols).distinct()
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("n_keys"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "orphan_fk_check",
    oracle="""
    SELECT count(*) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    tags=("finance", "integrity"),
)
def orphan_fk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK integrity as an anti-join count (the reference declares
    FOREIGN KEY but SQLite never checks it on these paths;
    sqlrequests.sql:46-54 → SURVEY §1.2 'orphan check')."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey, "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
    )
