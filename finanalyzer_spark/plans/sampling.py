"""Deterministic sampling / split queries (extended LLM-pipeline
surface; operators/sampling.py).

The oracle SQL is GENERATED from the same md5-bucket arithmetic the
Spark operators use, so DuckDB reproduces the *exact* sample — the
whole point of content-hash sampling (reproducible, engine- and
partitioning-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sampling import (
    _SPACE,
    deterministic_sample,
    hash_bucket_col,
    split_col,
    split_thresholds,
    stratified_sample,
)
from .registry import query

_WEIGHTS = (0.8, 0.1, 0.1)
_NAMES = ("train", "val", "test")
_CUTS = split_thresholds(_WEIGHTS)  # [52428, 58982]


def _duck_bucket(key_sql: str, salt: str = "") -> str:
    return f"('0x' || substr(md5('{salt}' || {key_sql}), 1, 4))::BIGINT"


@query(
    "train_test_split_counts",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang, length(text) AS len,
               {_duck_bucket("doc_id::VARCHAR")} % {_SPACE} AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < {_CUTS[0]} THEN 'train'
                WHEN bucket < {_CUTS[1]} THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           round(avg(len), 4) AS avg_len
    FROM b
    GROUP BY 1
    """,
    tags=("sampling", "split"),
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test by content hash of doc_id: per-row,
    shuffle-free, stable under any repartitioning — a doc's split never
    changes when the corpus grows or the cluster resizes (unlike
    df.randomSplit, whose assignment depends on partition layout)."""
    t = load(spark, sf_dir)
    return (
        t.documents.withColumn(
            "split", split_col(F.col("doc_id").cast("string"), _WEIGHTS, _NAMES)
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.length("text")), 4).alias("avg_len"),
        )
    )


@query(
    "deterministic_sample_stats",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE {_duck_bucket("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")}
          % {_SPACE} < {int(0.05 * _SPACE)}
    GROUP BY l_returnflag
    """,
    tags=("sampling", "deterministic"),
)
def deterministic_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% content-hash sample of lineitem (keyed on the row identity
    (orderkey, linenumber)) — the reproducible alternative to
    df.sample(). The predicate is pure codegen'd expression work
    evaluated at the scan; no shuffle, no state."""
    t = load(spark, sf_dir)
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        deterministic_sample(t.lineitem, key, 0.05)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


_STRATA_RATES = {"1-URGENT": 0.5, "3-MEDIUM": 0.1, "5-LOW": 0.02}


@query(
    "stratified_sample_counts",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE {_duck_bucket("o_orderkey::VARCHAR")} % {_SPACE} <
          CASE o_orderpriority
               WHEN '1-URGENT' THEN {int(0.5 * _SPACE)}
               WHEN '3-MEDIUM' THEN {int(0.1 * _SPACE)}
               WHEN '5-LOW' THEN {int(0.02 * _SPACE)}
               ELSE 0 END
    GROUP BY o_orderpriority
    """,
    tags=("sampling", "stratified"),
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (down-sample the dominant class, keep the rare
    one) — the portable, oracle-checkable analog of df.sampleBy."""
    t = load(spark, sf_dir)
    return (
        stratified_sample(
            t.orders,
            F.col("o_orderpriority"),
            _STRATA_RATES,
            F.col("o_orderkey").cast("string"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


_W_RATE = 0.2
_W_MAX = 50.0  # l_quantity upper bound


@query(
    "weighted_sample_stats",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           round(avg(l_quantity), 4) AS avg_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE {_duck_bucket("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")}
          % {_SPACE} < {_W_RATE} * {_SPACE} / {_W_MAX} * l_quantity
    GROUP BY l_returnflag
    """,
    tags=("sampling", "weighted"),
)
def weighted_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Bernoulli sample: inclusion probability proportional to
    l_quantity (P = 0.2 * qty / 50) — the size-biased sampling a
    training-data pipeline uses to oversample long/high-value records.
    Per-row hash decision at the scan, no shuffle, no state; the
    selected set is identical no matter how the table is partitioned.
    The quantity-tilt shows up as avg_qty well above the population
    mean — the oracle reproduces the exact same selected set."""
    from ..operators.sampling import weighted_sample_col

    t = load(spark, sf_dir)
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        t.lineitem.where(
            weighted_sample_col(key, F.col("l_quantity"), _W_MAX, _W_RATE)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Per-group deterministic k-sample (distributed reservoir equivalent)
# --------------------------------------------------------------------------
_GK = 5


@query(
    "per_group_hash_sample",
    oracle=f"""
    WITH h AS (
        SELECT source, doc_id, n_chars,
               md5('gk' || doc_id::VARCHAR) AS hk
        FROM documents
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY hk, doc_id
        ) AS rn
        FROM h
    )
    SELECT source,
           count(*) AS n_sampled,
           round(avg(n_chars), 4) AS avg_chars,
           min(doc_id) AS min_doc_id
    FROM r WHERE rn <= {_GK}
    GROUP BY source
    """,
    tags=("sampling", "scale-path"),
)
def per_group_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group sample, deterministic and re-runnable: order
    each group by a salted content hash (a uniform permutation) and
    keep the first k — the distributed equivalent of per-group
    reservoir sampling, with identical selections on every rerun /
    backfill because the 'randomness' is the hash, not an RNG.

    Scale shape: one hash-partitioned window per group key (no global
    sort, no collect); groups process independently so the operator
    scales with the widest group, and a skewed group can be pre-capped
    with the same two-stage trick as salted_collect_list.  This is how
    eval/holdout subsets get pinned from a 100 TB corpus without a
    seed-coordination problem across executors."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window as W

    h = t.documents.select(
        "source",
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.lit("gk"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    w = W.partitionBy("source").orderBy("hk", "doc_id")
    r = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _GK)
    return r.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES)
# --------------------------------------------------------------------------
#: sample size for weighted_sample_topk
_WS_K = 50
#: 2^32 — the md5-uniform denominator (8 hex chars)
_WS_SPACE = 4294967296


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, n_chars,
               ln((('0x' || substr(md5('wsamp' || doc_id::VARCHAR), 1, 8))
                       ::BIGINT + 1) / {_WS_SPACE}.0) / n_chars AS lk
        FROM documents WHERE n_chars > 0
    ),
    top AS (SELECT * FROM w ORDER BY lk DESC, doc_id LIMIT {_WS_K})
    SELECT row_number() OVER (ORDER BY lk DESC, doc_id) AS rnk,
           doc_id, source, n_chars
    FROM top
    """,
    tags=("sampling", "weighted", "scale-path"),
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis A-ES one-pass reduction: each row gets key u^(1/w)
    (compared as ln(u)/w) with u a salted md5 uniform and w = n_chars,
    and the k largest keys ARE a weighted sample without replacement —
    the standard way to draw 'sample documents proportional to length/
    quality' from a corpus in one distributed pass, deterministic and
    backfill-stable because the randomness is the content hash, not an
    RNG (the same discipline as deterministic_sample).

    The float key is computed from bit-identical md5 integers in both
    engines and is NEVER emitted — only integer ranks and data columns
    — so a last-ulp ln() divergence between libm implementations
    cannot surface (keys of distinct docs are random doubles, never
    within an ulp of each other).

    Scale shape: narrow codegen key map fused into the scan, then ONE
    bounded top-k (TakeOrderedAndProject — no global sort, no
    shuffle beyond the k-row reduction); the final rank window runs
    over k rows."""
    t = load(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsamp"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = t.documents.where(F.col("n_chars") > 0).select(
        "doc_id",
        "source",
        "n_chars",
        (F.log((h + 1) / F.lit(float(_WS_SPACE))) / F.col("n_chars")).alias(
            "lk"
        ),
    )
    top = w.orderBy(F.col("lk").desc(), "doc_id").limit(_WS_K)
    from pyspark.sql import Window as W

    rnk = F.row_number().over(W.orderBy(F.col("lk").desc(), "doc_id"))
    return top.select(
        rnk.alias("rnk"), "doc_id", "source", "n_chars"
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture sampling plan (round 9)
# --------------------------------------------------------------------------
_MIX_ALPHA = 0.7           #: temperature exponent (multilingual standard)
_MIX_BUDGET = 1_000_000_000  #: planned token budget


@query(
    "mixture_temperature_sampling",
    # token counts per source are exact integers; raw shares are exact
    # ratios; the alpha-power and its 3-6-row normalizing sum are the
    # only float steps (identical pow inputs both engines, tiny-frame
    # sum absorbed by the rounding).
    oracle=rf"""
    WITH per AS (
        SELECT source,
               sum(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END) AS n_tok
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tok) AS t FROM per),
    p AS (
        SELECT source, n_tok,
               CAST(n_tok AS DOUBLE) / t AS raw_share,
               pow(CAST(n_tok AS DOUBLE) / t, {_MIX_ALPHA}) AS w
        FROM per, tot
    ),
    z AS (SELECT sum(w) AS z FROM p)
    SELECT source,
           CAST(n_tok AS BIGINT) AS n_tokens,
           round(raw_share, 6) + 0.0 AS raw_share,
           round(w / z, 6) + 0.0 AS temp_share,
           CAST(round({_MIX_BUDGET} * w / z, 0) AS BIGINT)
               AS planned_tokens,
           round((w / z) / raw_share, 6) + 0.0 AS oversample_factor
    FROM p, z
    """,
    tags=("sampling", "curation", "mixture"),
)
def mixture_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture plan per source: sampling shares
    proportional to (raw token share)^alpha with alpha={_MIX_ALPHA} —
    the standard recipe for flattening a skewed corpus mixture without
    discarding the head (the multilingual-sampling exponent of the
    public large-LM recipes), emitted as planned tokens against a
    {_MIX_BUDGET:,}-token budget plus the per-source oversample factor
    (>1 = this source is repeated, <1 = downsampled). The budgeting
    companion to tokenizer_fertility (chars->tokens) and
    source_quota_cap (hard caps).

    Scale shape + parity: one map-side-combined token-count aggregate
    (text never shuffles), then scalar algebra on the tiny per-source
    frame; the alpha-power runs on identical exact-ratio doubles."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.sum(F.size(tokens_col(F.col("text"))).cast("long")).alias(
            "n_tok"
        )
    )
    tot = per.agg(F.sum("n_tok").alias("t"))
    p = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_tok",
        (F.col("n_tok").cast("double") / F.col("t")).alias("raw_share"),
        F.pow(
            F.col("n_tok").cast("double") / F.col("t"), _MIX_ALPHA
        ).alias("w"),
    )
    z = p.agg(F.sum("w").alias("z"))
    j = p.crossJoin(F.broadcast(z))
    return j.select(
        "source",
        F.col("n_tok").cast("long").alias("n_tokens"),
        (F.round(F.col("raw_share"), 6) + 0.0).alias("raw_share"),
        (F.round(F.col("w") / F.col("z"), 6) + 0.0).alias("temp_share"),
        F.round(_MIX_BUDGET * F.col("w") / F.col("z"), 0)
        .cast("long").alias("planned_tokens"),
        (
            F.round((F.col("w") / F.col("z")) / F.col("raw_share"), 6)
            + 0.0
        ).alias("oversample_factor"),
    )


# --------------------------------------------------------------------------
# Neyman optimal stratified allocation (round 9)
# --------------------------------------------------------------------------
_NEYMAN_BUDGET = 1000  #: total sample size to allocate


@query(
    "neyman_allocation",
    # strata moments are exact DECIMAL cents sums; each stratum's
    # N_h*S_h weight is one identical double, the normalizer is a
    # 3-term sum, and the allocations round half-up identically from
    # identical doubles.
    oracle=f"""
    WITH g AS (
        SELECT l_returnflag AS stratum,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
        FROM lineitem
    ),
    mo AS (
        SELECT stratum,
               CAST(count(*) AS DECIMAL(38,0)) AS n,
               sum(CAST(c AS DECIMAL(38,0))) AS s,
               sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                   AS ss
        FROM g GROUP BY stratum
    ),
    w AS (
        SELECT stratum,
               CAST(n AS DOUBLE) AS n,
               CAST(n AS DOUBLE) * sqrt(
                   (CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1)) / 100.0 AS nh_sh
        FROM mo
    ),
    z AS (SELECT sum(nh_sh) AS tot FROM w)
    SELECT stratum,
           CAST(n AS BIGINT) AS stratum_size,
           round(nh_sh / tot, 6) + 0.0 AS alloc_share,
           CAST(round({_NEYMAN_BUDGET} * nh_sh / tot, 0) AS BIGINT)
               AS alloc_n,
           round({_NEYMAN_BUDGET} * n
                 / (SELECT sum(n) FROM w), 1) + 0.0
               AS proportional_n
    FROM w, z
    """,
    tags=("sampling", "stats"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a {_NEYMAN_BUDGET}-unit sample
    across the return-flag strata: n_h proportional to N_h * S_h
    (stratum size times stratum standard deviation — the allocation
    minimizing the variance of the stratified mean; Neyman 1934),
    reported beside the naive proportional allocation so the query
    SHOWS what exploiting variance heterogeneity buys — the survey-
    sampling design layer above stratified_sample_counts' execution.

    Scale shape + parity: one exact-DECIMAL moments pass per stratum;
    each weight is one identical double expression, and only the
    3-term normalizing sum is a float accumulation (rounded)."""
    t = load(spark, sf_dir)
    dec = "decimal(38,0)"
    g = t.lineitem.select(
        F.col("l_returnflag").alias("stratum"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias(
            "c"
        ),
    )
    mo = g.groupBy("stratum").agg(
        F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("sum(CAST(c AS DECIMAL(38,0)))").alias("s"),
        F.expr("sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))").alias("ss"),
    )
    nD = F.col("n").cast("double")
    w = mo.select(
        "stratum",
        nD.alias("n"),
        (
            nD
            * F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double") / nD
                )
                / (nD - 1)
            )
            / 100.0
        ).alias("nh_sh"),
    )
    z = w.agg(F.sum("nh_sh").alias("tot"), F.sum("n").alias("n_all"))
    j = w.crossJoin(F.broadcast(z))
    return j.select(
        "stratum",
        F.col("n").cast("long").alias("stratum_size"),
        (F.round(F.col("nh_sh") / F.col("tot"), 6) + 0.0).alias(
            "alloc_share"
        ),
        F.round(
            _NEYMAN_BUDGET * F.col("nh_sh") / F.col("tot"), 0
        ).cast("long").alias("alloc_n"),
        (
            F.round(
                _NEYMAN_BUDGET * F.col("n") / F.col("n_all"), 1
            ) + 0.0
        ).alias("proportional_n"),
    )
