"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus with a JVM-side dot product
(`F.zip_with` + `F.aggregate`, no Python in the hot path).

Scale path: random-hyperplane LSH — b sign-bits per vector form a
bucket key; candidates share a bucket (multi-probe = also neighbor
buckets). Turns the 100 TB scan-per-query into a bucket-local join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .sqlexpr import cosine_sql, lsh_bucket_sql


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double
    (float inputs are widened exactly — deterministic up to order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def sq8_reconstruct_col(vec: Column, mns: Column, mxs: Column) -> Column:
    """SQ8 scalar quantization, encode+decode fused into one column
    expression: each dimension of `vec` compresses to an 8-bit code
    against [mns_i, mxs_i] and reconstructs to its bucket midpoint
    (mn + (code + 0.5) * range / 256) — FAISS IndexScalarQuantizer
    QT_8bit. Pure zip_with chains: whole-stage codegen, no UDF.

    Midpoint reconstruction bounds the per-dimension absolute error by
    range/512 for in-range inputs (tests/test_properties.py proves the
    bound over hypothesis-generated vectors); a degenerate dimension
    (mn == mx) reconstructs exactly."""
    d = F.zip_with(vec, mns, lambda x, mn: x.cast("double") - mn)
    rng = F.zip_with(mxs, mns, lambda a, b: a - b)
    code = F.zip_with(
        d,
        rng,
        lambda di, r: F.when(r == 0, F.lit(0.0)).otherwise(
            F.least(
                F.lit(255.0), F.greatest(F.lit(0.0), F.floor(di / r * 256))
            )
        ),
    )
    return F.zip_with(
        F.zip_with(code, rng, lambda c, r: (c + 0.5) * r / 256),
        mns,
        lambda t_, mn: t_ + mn,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 5,
) -> DataFrame:
    """Brute-force top-k by cosine for each query vector.

    Output: (query_id, match_id, cosine). Self-matches excluded.
    Ranking uses the ROUNDED score (+ id tiebreak) so the selected set
    is deterministic and oracle-checkable despite FP ULP drift.

    The query side is broadcast — the corpus is scanned once for all
    queries (one pass over 100 TB, not one per query).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.expr(
                f"round({cosine_sql('_qvec', '_cvec')}, {round_digits})"
                " + 0.0D"
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    label_col: str | None = None,
    planes: list[list[float]] | None = None,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_digits: int = 5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, LSH-bucketed —
    the 100 TB shape for all-pairs similarity (replaces a former
    driver-side `toPandas` + broadcast-matrix kernel; `num_planes=0`
    degenerates to exact all-pairs semantics while still running as a
    distributed join, never a driver collect).

    Candidate generation is an equality self-join on the sign-bit
    hyperplane bucket (hash-partitionable — one shuffle of
    (bucket, id, vec), no all-pairs blowup, no driver materialization);
    exact cosine then verifies only within-bucket candidates, entirely
    in whole-stage codegen (`cosine_col`).  Recall is governed by
    `num_planes` (fewer planes → bigger buckets → higher recall); the
    DuckDB oracle twin interpolates the identical plane literals so the
    bucketed semantics are exactly checkable.

    `bucket_cap`: optional guard that drops buckets with more than this
    many vectors before the quadratic pair join (an adversarial
    all-identical corpus makes one bucket of size n).  The bucket-size
    frame is 2**num_planes rows — broadcast, never a shuffle.

    Emits (id_a, id_b, cosine[, same_label]) with id_a < id_b.
    """
    b = hyperplane_lsh_buckets(df, vec_col, planes, num_planes, dim, seed)
    if bucket_cap is not None:
        keep = (
            b.groupBy("lsh_bucket")
            .agg(F.count("*").alias("_bn"))
            .where(F.col("_bn") <= bucket_cap)
            .select("lsh_bucket")
        )
        b = b.join(F.broadcast(keep), "lsh_bucket")
    la = [F.col(label_col).alias("_la")] if label_col else []
    lb = [F.col(label_col).alias("_lb")] if label_col else []
    left = b.select(
        F.col("lsh_bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), *la
    )
    right = b.select(
        F.col("lsh_bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), *lb
    )
    cos = F.expr(
        f"round({cosine_sql('_va', '_vb')}, {round_digits}) + 0.0D"
    )
    out_cols = [F.col("id_a"), F.col("id_b"), cos.alias("cosine")] + (
        [(F.col("_la") == F.col("_lb")).alias("same_label")] if label_col else []
    )
    return (
        left.join(right, "lsh_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(*out_cols)
        .where(F.col("cosine") > threshold)
    )


def lsh_planes(num_planes: int = 8, dim: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic gaussian hyperplanes — shared by the Spark bucket
    operator and the oracle-SQL generator (plans/similarity.py) so both
    engines project against identical literals."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Attach a sign-bit LSH bucket id: bit_i = (v · plane_i) > 0.

    Planes default to a deterministic pseudo-random set derived from
    `seed` (reproducible across runs — no RNG at execution time).
    Vectors in the same bucket are near-duplicate / high-cosine
    candidates; at scale, join within buckets instead of all-pairs.
    """
    if planes is None:
        planes = lsh_planes(num_planes, dim, seed)
    # one parsed SQL string instead of ~80 py4j round trips per plane —
    # plan construction cost, not execution (operators/sqlexpr, r12)
    return df.withColumn("lsh_bucket", F.expr(lsh_bucket_sql(vec_col, planes)))
