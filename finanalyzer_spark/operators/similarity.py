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
            (
                F.round(cosine_col(F.col("_qvec"), F.col("_cvec")), round_digits) + 0.0
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_all_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    label_col: str | None = None,
    round_digits: int = 5,
) -> DataFrame:
    """All-pairs cosine above a threshold — vectorized BLAS path.

    One side of the O(n²) comparison is broadcast as a dense float64
    matrix; the corpus side streams through `mapInPandas`, and each
    Arrow batch does a single `block @ M.T` matmul. This is the
    sanctioned Python escape hatch (Arrow-batched, never per-row) and
    beats interpreted JVM array-lambda evaluation by ~50×.

    Bounded use: broadcast is n×dim×8 bytes — fine to ~10M vectors.
    Beyond that, use hyperplane_lsh_buckets to restrict pairs to
    buckets first (same kernel within buckets).

    Emits (id_a, id_b, cosine, [same_label]) with id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    cols = [id_col, vec_col] + ([label_col] if label_col else [])
    pdf = df.select(*cols).toPandas()
    order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
    ids = pdf[id_col].to_numpy()[order]
    M = np.array(pdf[vec_col].tolist(), dtype=np.float64)[order]
    norms = np.sqrt((M * M).sum(axis=1))
    labels = pdf[label_col].to_numpy()[order] if label_col else None
    bc = spark.sparkContext.broadcast((ids, M, norms, labels))

    out_fields = "id_a long, id_b long, cosine double" + (
        ", same_label boolean" if label_col else ""
    )

    def gen(batches):
        ids_all, M_all, norms_all, labels_all = bc.value
        for block in batches:
            A = np.array(block[vec_col].tolist(), dtype=np.float64)
            a_ids = block[id_col].to_numpy()
            a_norms = np.sqrt((A * A).sum(axis=1))
            S = (A @ M_all.T) / np.outer(a_norms, norms_all)
            S = np.round(S, round_digits) + 0.0
            ii, jj = np.nonzero((S > threshold) & (a_ids[:, None] < ids_all[None, :]))
            out = {
                "id_a": a_ids[ii],
                "id_b": ids_all[jj],
                "cosine": S[ii, jj],
            }
            if labels_all is not None:
                out["same_label"] = (
                    block[label_col].to_numpy()[ii] == labels_all[jj]
                )
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *([label_col] if label_col else [])).mapInPandas(
        gen, schema=out_fields
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
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(int(2**i)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("lsh_bucket", bucket)
