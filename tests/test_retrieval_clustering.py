"""Unit tests for the retrieval (BM25) and clustering (Lloyd-step)
kernels on crafted inputs — semantics checks independent of the DuckDB
oracle parity that tests/test_oracle_queries.py already enforces.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from finanalyzer_spark.operators.clustering import (
    assign_cluster_col,
    kmeans_centroids,
    sq_dist_cols,
)
from finanalyzer_spark.operators.retrieval import (
    bm25_topk,
    corpus_stats,
    term_frequencies,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (0, "spark spark spark window"),
            (1, "spark window"),
            (2, "window window window window"),
            (3, "nothing relevant here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_term_frequencies_counts_and_lengths(spark):
    tf = term_frequencies(_corpus(spark), ("spark", "window")).collect()
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in tf}
    assert got == {
        (0, "spark"): (3, 4),
        (0, "window"): (1, 4),
        (1, "spark"): (1, 2),
        (1, "window"): (1, 2),
        (2, "window"): (4, 4),
    }


def test_corpus_stats_counts_empty_docs(spark):
    row = corpus_stats(_corpus(spark)).collect()[0]
    assert row.n_docs == 5
    # lengths 4, 2, 4, 3, 0 — the empty doc counts toward the average
    assert row.avgdl == pytest.approx(13 / 5)


def test_bm25_matches_hand_computation(spark):
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(_corpus(spark), ("spark", "window"), k=10).collect()
    }
    # doc 3 and the empty doc contain no query term → absent (score 0)
    assert set(got) == {0, 1, 2}

    n_docs, avgdl, k1, b = 5, 13 / 5, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def w(tf, dl, df):
        return idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    # df: spark→2 docs, window→3 docs
    expect = {
        0: round(w(3, 4, 2) + w(1, 4, 3), 6),
        1: round(w(1, 2, 2) + w(1, 2, 3), 6),
        2: round(w(4, 4, 3), 6),
    }
    for doc, score in expect.items():
        assert got[doc] == pytest.approx(score, abs=1e-6)
    # rarer term ('spark', df=2) must outrank the common one at equal tf
    assert got[1] > 0 and got[0] > got[2]


def test_kmeans_assignment_matches_numpy_argmin(spark):
    dim, k = 8, 3
    cents = kmeans_centroids(k=k, dim=dim, seed=5)
    rng = np.random.default_rng(0)
    vecs = rng.normal(0, 0.2, size=(50, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    dists = sq_dist_cols("embedding", cents)
    got = {
        r.vec_id: r.cluster
        for r in df.select("vec_id", assign_cluster_col(dists).alias("cluster")).collect()
    }
    c = np.asarray(cents)
    want = np.argmin(
        ((vecs.astype("float64")[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1
    )
    assert got == {i: int(want[i]) for i in range(len(vecs))}


def test_gemm_assignment_matches_literal_fold_path(spark):
    """assign_clusters_gemm (the large-k Arrow GEMM path) must agree
    EXACTLY with the codegen literal-fold path — same rounded-distance
    algebra, same first-wins tie rule — including at k far beyond
    what the fold path would be used for."""
    from finanalyzer_spark.operators.clustering import (
        assign_clusters_gemm,
    )

    dim, k = 16, 40
    cents = kmeans_centroids(k=k, dim=dim, seed=9)
    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.2, size=(400, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    fold = {
        r.vec_id: r.cluster
        for r in df.select(
            "vec_id",
            assign_cluster_col(sq_dist_cols("embedding", cents)).alias(
                "cluster"
            ),
        ).collect()
    }
    gemm = {
        r.vec_id: r.cluster
        for r in assign_clusters_gemm(df, "embedding", cents)
        .select("vec_id", "cluster")
        .collect()
    }
    assert gemm == fold

    # duplicate-centroid tie: first index wins in BOTH paths
    tie_cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 5.0]]
    tdf = spark.createDataFrame(
        [(0, [1.0, 0.1])], "vec_id long, embedding array<float>"
    )
    assert (
        assign_clusters_gemm(tdf, "embedding", tie_cents)
        .collect()[0]
        .cluster
        == 0
    )


def test_kmeans_first_centroid_wins_exact_ties(spark):
    # two identical centroids: the argmin chain must pick index 0
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 5.0]]
    df = spark.createDataFrame([(0, [1.0, 0.1])], "vec_id long, embedding array<float>")
    cluster = df.select(
        assign_cluster_col(sq_dist_cols("embedding", cents)).alias("c")
    ).collect()[0].c
    assert cluster == 0


def test_fit_kmeans_matches_numpy_lloyd(spark):
    from finanalyzer_spark.operators.clustering import fit_kmeans

    dim, k, iters = 6, 3, 4
    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 0.3, size=(80, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got_cents, got_inertia = fit_kmeans(
        df, "embedding", k=k, dim=dim, iters=iters, seed=5, tol=0.0
    )

    # numpy twin with identical init, rounded-distance argmin (first
    # index wins ties), mean update, and keep-centroid-on-empty
    cents = np.asarray(kmeans_centroids(k=k, dim=dim, seed=5))
    x = vecs.astype("float64")
    inertia = 0.0
    for _ in range(iters):
        d = np.round(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 5)
        assign = np.argmin(d, axis=1)
        inertia = d[np.arange(len(x)), assign].sum()
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    assert got_inertia == pytest.approx(inertia, rel=1e-9)
    np.testing.assert_allclose(np.asarray(got_cents), cents, rtol=1e-9, atol=1e-12)


def test_pagerank_conserves_mass_and_positivity(spark):
    from finanalyzer_spark.plans import REGISTRY

    rows = REGISTRY["pagerank_trade_graph"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    total = sum(r.pr for r in rows)
    # no dangling nodes on a symmetrized graph → rank mass is conserved
    assert total == pytest.approx(1.0, abs=1e-5)
    assert all(r.pr > 0 for r in rows)


def test_mixture_sample_rates_bounded(spark):
    from finanalyzer_spark.plans import REGISTRY

    rows = REGISTRY["source_mixture_sample"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "mixture sample produced no sources"
    for r in rows:
        assert 0.0 <= r.rate <= 1.0
        assert 0 <= r.n_kept <= r.n_docs


def test_count_triangles_known_graphs(spark):
    """K4 has exactly 4 triangles; adding a pendant edge changes
    nothing; an edgeless wedge contributes none."""
    from finanalyzer_spark.operators.graph import count_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "u long, v long")
    assert count_triangles(edges).collect()[0]["n_triangles"] == 4

    wedge = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    assert count_triangles(wedge).collect()[0]["n_triangles"] == 0


def test_fit_pq_codebooks_shapes_and_quality(spark, sf_dir):
    """PQ training: m independent per-subspace k-means runs — correct
    shapes, and each codebook beats the seed centroids' inertia on its
    own slice (training actually improved the quantizer)."""
    import numpy as np
    from pyspark.sql import functions as F

    from finanalyzer_spark.catalog import load
    from finanalyzer_spark.operators.clustering import (
        fit_pq_codebooks,
        kmeans_centroids,
    )

    emb = load(spark, sf_dir).embeddings
    m, sub, k = 4, 16, 4
    books = fit_pq_codebooks(emb, m=m, sub_dim=sub, k=k, iters=5)
    assert len(books) == m
    assert all(len(b) == k and len(b[0]) == sub for b in books)

    vecs = np.array([r["embedding"] for r in emb.collect()], dtype=float)

    def inertia(sub_vecs, cents):
        d = ((sub_vecs[:, None, :] - np.array(cents)[None]) ** 2).sum(-1)
        return d.min(1).sum()

    for j, book in enumerate(books):
        sl = vecs[:, j * sub : (j + 1) * sub]
        seed_book = kmeans_centroids(k, sub, seed=11 + j)
        assert inertia(sl, book) < inertia(sl, seed_book)


# --------------------------------------------------------------------------
# grid-DBSCAN semantics on hand-built geometry
# (plans/similarity.py::grid_dbscan_embeddings, eps=0.02, minPts=5)
# --------------------------------------------------------------------------

def test_grid_dbscan_known_configuration(spark):
    """Five mutually-close points are all core (one cluster); a sixth
    point within eps of the blob but without 5 neighbors of its own is
    a border point; two far-away near-twins are noise; cell-boundary
    neighbors are still found via the 3x3 expansion."""
    import os
    import tempfile

    from pyspark import Row

    from finanalyzer_spark.plans.similarity import grid_dbscan_embeddings

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    pts = [
        # tight blob: ids 1-5 pairwise within 0.006 (eps = 0.02), all
        # core with exactly 5 = minPts members; id 5 sits across the
        # 0.02-cell boundary (cell index changes at x = 0.0200) so
        # only the 3x3 neighborhood expansion can pair it with 1-4
        (1, vec(0.0150, 0.0000)),
        (2, vec(0.0160, 0.0000)),
        (3, vec(0.0170, 0.0010)),
        (4, vec(0.0180, 0.0000)),
        (5, vec(0.0210, 0.0000)),
        # border: within eps of cores 4 and 5 only -> 3 total < minPts
        (6, vec(0.0350, 0.0100)),
        # noise: a far-away pair, each with 2 total < minPts
        (7, vec(0.3000, 0.3000)),
        (8, vec(0.3010, 0.3000)),
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=e, label=0) for i, e in pts]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        rows = sorted(
            grid_dbscan_embeddings(spark, d).collect(),
            key=lambda r: r["cluster"],
        )
    by_cluster = {r["cluster"]: (r["n_core"], r["n_border"]) for r in rows}
    assert by_cluster[-1] == (0, 2)  # ids 7, 8 are noise
    assert by_cluster[1] == (5, 1)   # ids 1-5 core, id 6 border
    assert set(by_cluster) == {-1, 1}
