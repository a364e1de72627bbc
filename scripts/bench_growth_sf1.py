#!/usr/bin/env python
"""Growth curves for the expensive families at sf1-scale volume
(VERDICT r7 #3): graph (pagerank/kcore/triangle/bfs/hits), dedup
(minhash/containment/semantic), ANN (ivfpq + recall eval), and one
media kernel are timed at 1x (sf0.1) and on a 10x synthetic replica,
so the '~linear in scan' 100 TB claims are measured per family, not
design-argued.  Companion to scripts/bench_drift_sf1.py (the drift
family's curve, SCALE.md 'Binned drift certification').

Synthesis (once, into $SPARK_GRAFT_GROWTH_DIR, default /tmp/sfgrowth;
/root/testdata is read-only):

- orders + lineitem: 10 replicas with ALL join keys offset per
  replica (orderkey/custkey/suppkey), producing 10 DISJOINT copies of
  the trade graph — node and edge counts scale 10x, so a ~linear
  family should time ~10x, while an accidentally super-linear one
  (e.g. a densified all-pairs step) shows up immediately.
- documents: 10 replicas, doc_id offset, word order ROTATED per
  replica — rotation rewrites nearly every k-shingle, so replicas are
  new documents to MinHash/SimHash rather than 10-way near-dup
  clusters (which would measure pair explosion, not corpus growth).
- embeddings: 10 replicas, vec_id offset, per-component deterministic
  jitter (~1e-2 scale) so replicas occupy distinct positions in the
  vector space but keep the same global geometry.
- every other table: symlinked from the base sf dir unchanged.

Usage: python scripts/bench_growth_sf1.py [base_sf_dir]
Prints a markdown table — paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from finanalyzer_spark.plans import REGISTRY  # noqa: E402
from finanalyzer_spark.session import get_spark  # noqa: E402

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WARM = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
SYNTH = os.environ.get("SPARK_GRAFT_GROWTH_DIR", "/tmp/sfgrowth")
REPLICAS = int(os.environ.get("SPARK_GRAFT_GROWTH_REPLICAS", "10"))

#: family → queries timed at both scales
FAMILIES: dict[str, list[str]] = {
    "graph": [
        "pagerank_trade_graph",
        "triangle_count_cosupply",
        "kcore_cosupply",
        "bfs_hops_trade_graph",
        "hits_trade_graph",
    ],
    "dedup": [
        "minhash_lsh_candidates",
        "containment_near_superset",
        "semantic_dedup_clusters",
    ],
    "ann": [
        "ann_ivfpq_topk",
        "ann_pq_recall_eval",
    ],
    "media": [
        "media_image_features",
    ],
    "ingest": [
        "warc_html_extraction",
    ],
    # round-8 second wave: LPA rides the 10x-disjoint trade graph;
    # DBSCAN the 10x-jittered vectors; the text/dedup/LM additions the
    # 10x-rotated documents; the trend stats are calendar-bounded BY
    # DESIGN (daily frame size is constant), so their curve should be
    # ~flat — the point being measured, not a bug
    "graph2": ["label_propagation_communities"],
    # round-9: per-node triangle analytics + wedge-based link
    # prediction ride the same 10x-disjoint trade graph
    "graph3": [
        "local_clustering_coefficient",
        "common_neighbor_link_prediction",
    ],
    "density": ["grid_dbscan_embeddings"],
    "text2": [
        "winnowing_candidate_pairs",
        "cdc_chunk_dup_share",
        "kneser_ney_trigram_score",
        "media_g711_audio_stats",
    ],
    # round-9: exact-substring dedup rides the 10x-rotated documents —
    # rotation rewrites the k-grams, so the digest-keyed count/join
    # stream grows 10x with ~no extra cross-replica dup mass; the
    # family claims ~linear-in-scan and this measures it
    "substr": [
        "substring_dup_spans",
        "exact_substring_dedup",
    ],
    "trend": [
        "theil_sen_trend_daily_revenue",
        "mann_kendall_trend",
    ],
    # round-9 second wave: the BQ Hamming scan and the trained-IVF
    # probe ride the 10x-jittered vectors (both claim scan-linear:
    # broadcast queries, integer popcount / probed-list-only rerank);
    # Adamic-Adar rides the 10x-disjoint trade graph (same capped
    # wedge stream as the CN predictor, plus a broadcast weight join)
    "ann2": [
        "ann_bq_topk",
        "ann_ivf_trained_topk",
    ],
    "graph4": [
        "adamic_adar_link_prediction",
    ],
    # round-10: range and filtered vector search ride the 10x-jittered
    # vectors — the radius query's candidate bound is
    # (planes+1)/2^planes of the corpus PER QUERY (query count fixed),
    # and the filtered path joins on the label key, so both claim
    # ~linear-in-corpus
    "ann3": [
        "ann_radius_search",
        "ann_radius_recall_eval",
        "ann_filtered_topk",
        "ann_postfilter_recall_eval",
    ],
    # round-11: the graph-ANN index build rides the 10x-jittered
    # vectors (capped-bucket candidates -> |V|·M edges; NN-descent
    # rounds score |V|·M² candidates — linear in corpus), the IVF
    # drift census is one seed-argmin pass + two codebook aggregates +
    # broadcast re-assignments (linear), and DSIR is token-linear with
    # 256-row feature models riding the 10x-rotated documents
    # ann_graph_build FIRST: with the r12 artifact seam it pays the
    # cold index build at each scale (the build-cost growth claim);
    # ann_graph_topk then measures steady-state search on the warm
    # artifact (the search-cost claim, now separable from the build)
    "ann4": [
        "ann_graph_build",
        "ann_graph_topk",
        "ann_ivf_retrain_drift",
    ],
    "select": [
        "dsir_importance_selection",
    ],
    # round-12: kcenter is k linear corpus passes (flat per pass, loop
    # state one (vec_id, dmin) row per vector); the perceptual dedup is
    # one Arrow decode+hash map pass + a hash-keyed aggregate (linear
    # in blob count); graph-ANN repair prices base build + increment
    # insert + ONE touched-neighborhood repair round + two beam
    # searches (the base build dominates, so the family claim is the
    # build's linearity — the repair round itself is increment-bound)
    "select2": [
        "kcenter_coreset_selection",
    ],
    "media": [
        "media_dhash_cross_format_dedup",
    ],
    "ann5": [
        "ann_graph_repair_recall",
    ],
    # round-13 (VERDICT r12 #5/#8): the ordered_scan / global_ntile
    # percentile pipelines ride the 10x fact tables — the range
    # repartition scales with rows while the driver-offset pass stays
    # <= num_partitions rows by construction; bh_fdr additionally
    # checks the two-level aggregate + checkpoint_input shape
    "percentile": [
        "mad_outlier_flags",
        "isotonic_calibration_bins",
        "bh_fdr_supplier_rates",
    ],
}

LINKED = ["customer", "nation", "part", "region", "supplier", "events"]
OFF = 1 << 32  # per-replica key offset; disjoint at any TPC-H sf


def synthesize(spark) -> None:
    if os.path.exists(os.path.join(SYNTH, "lineitem.parquet")):
        return
    os.makedirs(SYNTH, exist_ok=True)
    for t in LINKED:
        dst = os.path.join(SYNTH, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
    spine = F.broadcast(
        spark.range(REPLICAS).withColumnRenamed("id", "rep")
    )

    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    (
        orders.crossJoin(spine)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * OFF)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * OFF)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(SYNTH, "orders.parquet"))
    )
    lineitem = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    (
        lineitem.crossJoin(spine)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * OFF)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("rep") * OFF)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("rep") * OFF)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(SYNTH, "lineitem.parquet"))
    )

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    words = F.split(F.col("text"), " ")
    k = F.pmod(F.col("rep") * 7 + 3, F.greatest(F.size(words), F.lit(1)))
    rotated = F.concat_ws(
        " ",
        F.flatten(
            F.array(
                F.slice(words, k + 1, F.size(words)),
                F.slice(words, 1, k),
            )
        ),
    )
    (
        docs.crossJoin(spine)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * OFF)
        .withColumn(
            "text", F.when(F.col("rep") == 0, F.col("text")).otherwise(rotated)
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(SYNTH, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    jittered = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + (
            F.pmod(
                F.xxhash64(F.col("vec_id"), F.col("rep"), i), F.lit(201)
            ).cast("float")
            - 100.0
        )
        * F.lit(1e-4)
        * F.col("rep").cast("float"),
    )
    (
        emb.crossJoin(spine)
        .withColumn("embedding", jittered.cast("array<float>"))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * OFF)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(SYNTH, "embeddings.parquet"))
    )


def timed(spark, name: str, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def semantic_dedup_scaled_k(spark, sf_dir: str, k: int):
    """semantic_dedup_clusters with the codebook size scaled to the
    corpus (the production shape the registered query's docstring
    prescribes: k ~ corpus/target-cluster-size, so per-cluster pair
    blocks stay constant and total pair cost stays LINEAR).  The
    registered query pins k=16 for oracle parity; this bench variant
    exists to MEASURE the scaled-k curve the 100 TB argument relies
    on.  Assignment uses assign_clusters_gemm (the large-k Arrow GEMM
    path): the literal-fold assignment is itself O(k·dim) of codegen
    per row, which at k=160 produced 6.9 MiB task binaries and a
    compile-dominated 13.5x ratio — the GEMM path keeps plan size
    constant.  Downstream mirrors
    plans/dedup.semantic_dedup_clusters."""
    from finanalyzer_spark.catalog import load
    from finanalyzer_spark.operators.clustering import (
        assign_clusters_gemm,
        kmeans_centroids,
    )
    from finanalyzer_spark.operators.similarity import norm_col
    from finanalyzer_spark.plans.dedup import (
        SEM_CLUSTER_CAP,
        SEM_DIM,
        SEM_TAU,
        semantic_dedup_report,
    )

    t = load(spark, sf_dir)
    cents = kmeans_centroids(k, SEM_DIM)
    m = assign_clusters_gemm(
        t.embeddings.select("vec_id", "embedding"), "embedding", cents
    ).select(
        "vec_id",
        "cluster",
        F.transform(
            F.col("embedding"),
            lambda e: e.cast("double") / norm_col(F.col("embedding")),
        ).alias("vn"),
    )
    return semantic_dedup_report(m, tau=SEM_TAU, cluster_cap=SEM_CLUSTER_CAP)


def main() -> int:
    # optional family filter: bench_growth_sf1.py [base_sf_dir] [fam,fam2]
    # — re-measure one new family without re-timing the whole matrix
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    # r12: the graph / graph-ANN families materialize build artifacts
    # through plans.artifacts; point the cache at a growth-local dir
    # and wipe it so BOTH scales measure cold builds (first query of
    # each artifact family pays the build at 1x and 10x alike — same
    # placement, so the ratio stays a growth measurement)
    import shutil

    art = os.path.join(SYNTH, ".artifacts")
    os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = art
    shutil.rmtree(art, ignore_errors=True)
    spark = get_spark("bench_growth_sf1")
    synthesize(spark)
    n1 = spark.read.parquet(os.path.join(BASE, "lineitem.parquet")).count()
    n10 = spark.read.parquet(os.path.join(SYNTH, "lineitem.parquet")).count()
    print(f"lineitem rows: base {n1:,} -> synth {n10:,} ({REPLICAS}x)")
    print()
    print("| family | query | 1x sec | 10x sec | ratio |")
    print("|---|---|---|---|---|")
    families = (
        {f: q for f, q in FAMILIES.items() if f in only}
        if only else FAMILIES
    )
    for family, names in families.items():
        for name in names:
            timed(spark, name, WARM)  # JIT/codegen warm-up, tiny SF
            t_base = timed(spark, name, BASE)
            t_big = timed(spark, name, SYNTH)
            print(
                f"| {family} | {name} | {t_base:.2f} | {t_big:.2f} "
                f"| {t_big / t_base:.1f}x |"
            )
    # scaled-k SemDeDup: k grows with the corpus (16 -> 16*REPLICAS),
    # the production shape that keeps per-cluster pair blocks constant
    if only is not None and "dedup" not in only:
        return 0
    import time as _t

    spark.catalog.clearCache()
    t0 = _t.perf_counter()
    semantic_dedup_scaled_k(spark, BASE, 16).write.format("noop").mode(
        "overwrite"
    ).save()
    t_base = _t.perf_counter() - t0
    spark.catalog.clearCache()
    t0 = _t.perf_counter()
    semantic_dedup_scaled_k(
        spark, SYNTH, 16 * REPLICAS
    ).write.format("noop").mode("overwrite").save()
    t_big = _t.perf_counter() - t0
    print(
        f"| dedup | semantic_dedup (k scaled 16->{16 * REPLICAS}) "
        f"| {t_base:.2f} | {t_big:.2f} | {t_big / t_base:.1f}x |"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
