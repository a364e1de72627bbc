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
from .sqlexpr import assign_case_sql, sq_dist_sql


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
    array (k×dim multiply-adds per row, all inside codegen).

    Built as ONE parsed SQL string per centroid (operators/sqlexpr):
    the element-by-element Column form cost k×(dim+~20) py4j round
    trips per invocation — plan CONSTRUCTION, not execution, dominated
    the k-means/PQ family bench times (r12, guide §4). The parsed tree
    is node-for-node identical (double literals via repr+D, same fold
    shape), verified by analyzed-plan comparison and oracle parity."""
    if isinstance(vec_col, str):
        return [
            F.expr(sq_dist_sql(vec_col, c, round_digits)) for c in centroids
        ]
    v = vec_col
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


def assign_clusters_gemm(
    df,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "cluster",
    round_digits: int = 5,
):
    """Nearest-centroid assignment as one Arrow-batched GEMM — the
    LARGE-k scale path.  The literal-fold assignment (sq_dist_cols +
    assign_cluster_col) is ideal for small codebooks (k ≤ ~64: fully
    codegen, zero Python), but its codegen cost and task-binary size
    grow with k×dim (measured: k=160, dim=64 → 6.9 MiB task binaries
    and compile-dominated runtime, scripts/bench_growth_sf1.py).  An
    IVF coarse quantizer at corpus scale (k ~ 10³-10⁵ lists) instead
    broadcasts the centroid matrix once and computes all distances as
    one (batch×dim)·(dim×k) matrix multiply per Arrow batch —
    O(n·k·dim) FLOPs in BLAS, constant plan size.

    Bit-parity with the literal-fold path: same double algebra
    (v·v - 2 v·c + c·c), same round-then-argmin with ties to the
    lower cluster id (np.argmin returns the first minimum, matching
    assign_cluster_col's CASE chain) — asserted exactly in
    tests/test_retrieval_clustering.py."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cmat = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cc = (cmat * cmat).sum(axis=1)

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype=np.int32)
                yield pdf
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = (
                (v * v).sum(axis=1, keepdims=True)
                - 2.0 * (v @ cmat.T)
                + cc[None, :]
            )
            pdf[out_col] = np.round(d, round_digits).argmin(axis=1).astype(
                np.int32
            )
            yield pdf

    return df.mapInPandas(assign, schema)


def fit_kmeans(
    df,
    vec_col: str = "embedding",
    k: int = 4,
    dim: int = 64,
    iters: int = 10,
    seed: int = 11,
    tol: float = 1e-6,
) -> tuple[list[list[float]], float]:
    """Lloyd's algorithm to (near-)convergence. Returns (centroids,
    inertia of the final assignment).

    Each iteration is one job: assignment fused into the scan (centroid
    literals — see module docstring), then a single groupBy computing
    per-cluster counts, per-dim sums, and the inertia. The driver
    round-trips k rows of k×dim doubles — never data rows — so the
    loop's cost is O(iters) corpus scans regardless of corpus size.
    Empty clusters keep their previous centroid (standard Lloyd
    degeneracy handling, deterministic).
    """
    cents = kmeans_centroids(k, dim, seed)
    prev_inertia = float("inf")
    inertia = prev_inertia
    for _ in range(iters):
        ds = [sq_dist_sql(vec_col, c) for c in cents]
        assigned = df.select(
            F.expr(assign_case_sql(ds)).alias("cluster"),
            F.expr(f"least({', '.join(ds)})").alias("dm"),
            F.col(vec_col).alias("v"),
        )
        rows = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                F.sum("dm").alias("inertia"),
                *[
                    F.expr(f"sum(CAST(v[{j}] AS DOUBLE))").alias(f"s{j}")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]
        inertia = 0.0
        for r in rows:
            inertia += r["inertia"]
            new_cents[r["cluster"]] = [r[f"s{j}"] / r["n"] for j in range(dim)]
        cents = new_cents
        if prev_inertia - inertia <= tol * max(abs(prev_inertia), 1.0):
            break
        prev_inertia = inertia
    return cents, inertia


def fit_pq_codebooks(
    df,
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    iters: int = 10,
    seed: int = 11,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: an independent k-means per
    subspace slice (FAISS `PQ{m}` training). Returns m codebooks of
    k × sub_dim centroids, ready to fold into the ADC scoring plan
    (plans/similarity.ann_pq_topk uses deterministic stand-ins with the
    identical plan shape).

    Each subspace trains on a narrow `slice()` projection of the same
    scan — Catalyst prunes the untouched dimensions; driver traffic is
    m × k × sub_dim doubles per iteration, never data rows."""
    from pyspark.sql import functions as F

    books = []
    for j in range(m):
        sliced = df.select(
            F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim).alias("_sub")
        )
        cents, _ = fit_kmeans(
            sliced, vec_col="_sub", k=k, dim=sub_dim, iters=iters,
            seed=seed + j,
        )
        books.append(cents)
    return books
