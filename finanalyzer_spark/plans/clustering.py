"""K-means queries over `embeddings` — one oracle-exact Lloyd step
(assign to nearest centroid, emit per-cluster update statistics).

This is the trainer for the IVF coarse quantizer in
plans/similarity.ann_ivf_topk: at 100 TB each iteration is one narrow
map (assignment against broadcast centroid literals) plus one
combiner-friendly groupBy — the driver only ever holds k×dim doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sqlexpr import assign_case_sql, sq_dist_sql
from ..operators.clustering import (
    assign_cluster_col,
    kmeans_centroids,
    sq_dist_cols,
)
from .registry import query

_K, _DIM, _NMEAN = 4, 64, 8


def _kmeans_oracle(k: int = _K, dim: int = _DIM, n_mean: int = _NMEAN) -> str:
    """DuckDB twin: identical centroid literals, identical distance
    algebra (vv - 2 v·c + c·c, rounded to 5), identical first-wins
    argmin — so the assignment, counts, and update means all match."""
    cents = kmeans_centroids(k, dim)
    d_cols = ",\n               ".join(
        f"round(vv - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]) + {sum(x * x for x in c)!r}, 5) AS d{i}"
        for i, c in enumerate(cents)
    )
    least = f"least({', '.join(f'd{i}' for i in range(k))})"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = dm THEN {i}" for i in range(k - 1))
        + f" ELSE {k - 1} END"
    )
    means = ",\n           ".join(
        f"round(avg(v[{j + 1}]), 6) AS mean_{j}" for j in range(n_mean)
    )
    return f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT v, list_dot_product(v, v) AS vv FROM e),
    a AS (SELECT v,
               {d_cols}
          FROM d),
    m AS (SELECT v, {least} AS dm, {case} AS cluster FROM a)
    SELECT cluster,
           count(*) AS n_members,
           round(sum(dm), 3) AS inertia,
           {means}
    FROM m
    GROUP BY cluster
    """


@query(
    "kmeans_lloyd_step",
    oracle=_kmeans_oracle(),
    tags=("clustering", "ml", "similarity", "scale-path"),
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means Lloyd iteration (k=4) from deterministic seed
    centroids: nearest-centroid assignment as a codegen argmin over
    centroid literals, then per-cluster size, inertia, and the first 8
    components of the updated centroid mean.

    Scale shape: assignment is a narrow map fused into the scan (k×dim
    multiply-adds per row, centroids are literals — nothing broadcast,
    nothing shuffled); the update is ONE groupBy with map-side partial
    aggregation. Iterating feeds the means back in as next-step
    literals; the driver never materializes data rows."""
    t = load(spark, sf_dir)
    cents = kmeans_centroids(_K, _DIM)
    ds = [sq_dist_sql("embedding", c) for c in cents]
    assigned = t.embeddings.select(
        F.expr(assign_case_sql(ds)).alias("cluster"),
        F.expr(f"least({', '.join(ds)})").alias("dm"),
        "embedding",
    )
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(F.sum("dm"), 3).alias("inertia"),
        *[
            F.round(F.avg(F.col("embedding")[j].cast("double")), 6).alias(f"mean_{j}")
            for j in range(_NMEAN)
        ],
    )


_GEMM_K = 32


def _gemm_census_oracle(k: int = _GEMM_K, dim: int = _DIM) -> str:
    """DuckDB twin of the GEMM assignment census: same centroid
    literals and rounded-distance argmin as _kmeans_oracle, integer
    outputs only (counts + vec_id sums), so a single assignment flip
    anywhere breaks the hash."""
    cents = kmeans_centroids(k, dim)
    d_cols = ",\n               ".join(
        f"round(vv - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]) + {sum(x * x for x in c)!r}, 5) AS d{i}"
        for i, c in enumerate(cents)
    )
    least = f"least({', '.join(f'd{i}' for i in range(k))})"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {least} THEN {i}" for i in range(k - 1))
        + f" ELSE {k - 1} END"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT vec_id, v, list_dot_product(v, v) AS vv FROM e),
    a AS (SELECT vec_id,
               {d_cols}
          FROM d),
    m AS (SELECT vec_id, {case} AS cluster FROM a)
    SELECT cluster,
           count(*) AS n_members,
           CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
    FROM m
    GROUP BY cluster
    """


@query(
    "ivf_gemm_assignment_census",
    oracle=_gemm_census_oracle(),
    tags=("clustering", "ann", "gemm"),
)
def ivf_gemm_assignment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-list census through the LARGE-k assignment path: k=32
    centroids assigned via operators/clustering.assign_clusters_gemm
    (one Arrow GEMM per batch — the architecture an IVF quantizer
    with 10³-10⁵ lists needs, where literal-fold codegen would melt;
    measured in scripts/bench_growth_sf1.py / SCALE.md).  Integer-only
    outputs (member counts + vec_id sums) make the oracle comparison
    flip-sensitive to a single differing assignment, certifying that
    the BLAS-ordered double math lands on the same rounded distances
    as DuckDB's sequential folds."""
    from ..operators.clustering import assign_clusters_gemm

    t = load(spark, sf_dir)
    cents = kmeans_centroids(_GEMM_K, _DIM)
    assigned = assign_clusters_gemm(
        t.embeddings.select("vec_id", "embedding"), "embedding", cents
    )
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").cast("long").alias("sum_vec_id"),
    )
