"""Clustering kernels over embedding columns: nearest-centroid
assignment and one Lloyd (k-means) update step, all as codegen column
expressions — no UDF, no driver-side matrix.

At 100 TB this is the building block for training the IVF coarse
quantizer (plans/similarity.ann_ivf_topk): centroids are a tiny
broadcastable literal table, assignment is a narrow map over the scan,
and the update is one combiner-friendly groupBy. Iterating = re-running
the step with the previous step's centroid output folded into literals
(driver holds k×dim doubles — trivially small).

Distance algebra: ||v - c||^2 = v·v - 2 v·c + c·c, with c·c folded to
a Python-computed literal. Rounding to 5 digits before the argmin makes
the assignment reproducible bit-for-bit in the DuckDB oracle (same
trick as the LSH plane literals in operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .similarity import dot_col


def kmeans_centroids(
    k: int = 4, dim: int = 64, seed: int = 11, scale: float = 0.15
) -> list[list[float]]:
    """Deterministic pseudo-random initial centroids — shared by the
    Spark operator and the oracle-SQL generator so both engines assign
    against identical IEEE doubles."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, scale) for _ in range(dim)] for _ in range(k)]


def sq_dist_cols(
    vec_col: str | Column,
    centroids: list[list[float]],
    round_digits: int = 5,
) -> list[Column]:
    """Rounded squared distance to each centroid. One v·v fold is
    shared; each centroid adds one dot-product fold against its literal
    array (k×dim multiply-adds per row, all inside codegen)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vv = dot_col(v, v)
    out = []
    for c in centroids:
        cc = sum(x * x for x in c)  # exact literal, computed once in Python
        lit = F.array(*[F.lit(float(x)) for x in c])
        out.append(F.round(vv - 2.0 * dot_col(v, lit) + F.lit(cc), round_digits))
    return out


def assign_cluster_col(dists: list[Column]) -> Column:
    """Argmin over the rounded distances; the first centroid wins ties
    (CASE chain on d_i == least(...) — identical semantics in SQL)."""
    m = F.least(*dists)
    expr = F.lit(len(dists) - 1)
    for i in range(len(dists) - 2, -1, -1):
        expr = F.when(dists[i] == m, F.lit(i)).otherwise(expr)
    return expr
