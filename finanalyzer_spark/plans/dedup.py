"""Deduplication queries over `documents` (SURVEY.md §7 Phase 5;
generalizing the reference's redundancy.sql ROW_NUMBER dedup).

The MinHash/Jaccard oracle SQL is GENERATED from the same constants the
Spark operators use (operators/dedup.py: P, B, universal-hash params),
so both engines run bit-identical integer arithmetic — one md5 per
token, everything else mod-P math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import (
    B,
    B2,
    BUCKET_CAP,
    P,
    PACK,
    dedup_by_key,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_params,
    ngram_jaccard,
    ngram_overlap,
    simhash_fingerprints,
)
from .registry import query

NUM_HASHES, BANDS = 16, 8
_R = NUM_HASHES // BANDS
_PARAMS = minhash_params(NUM_HASHES)

# ---- generated oracle-SQL fragments (mirror operators/dedup.py) ----------
_SHINGLE_CTES = rf"""
    toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    th AS (
        SELECT doc_id,
               list_transform(t, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % {P}) AS h,
               len(t) AS n
        FROM toks
    ),
    shv AS (
        SELECT doc_id,
               CASE WHEN n >= 3 THEN list_transform(range(n - 2),
                        i -> ((h[i+1] * {B2}) % {P} + (h[i+2] * {B}) % {P} + h[i+3]) % {P})
                    WHEN n = 2 THEN [((h[1] * {B}) % {P} + h[2]) % {P}]
                    WHEN n = 1 THEN [h[1]]
                    ELSE CAST([] AS BIGINT[]) END AS s
        FROM th
    ),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM shv)
"""

_SIG_CTE = "sig AS (SELECT doc_id, " + ", ".join(
    f"min(({a} * sh + {b}) % {P}) AS m{i}" for i, (a, b) in enumerate(_PARAMS)
) + " FROM ex GROUP BY doc_id)"

_BANDED_CTE = "banded AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {j} AS band, m{j * _R} * {PACK} + m{j * _R + 1} AS bhash FROM sig"
    for j in range(BANDS)
) + ")"

_CAND_SQL = f"""
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
    JOIN (SELECT band, bhash FROM banded GROUP BY band, bhash
          HAVING count(*) <= {BUCKET_CAP}) ok
      ON ok.band = a.band AND ok.bhash = a.bhash
    WHERE a.doc_id < b.doc_id
"""


@query(
    "exact_dedup_groups",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY md5(text)
    """,
    tags=("dedup", "exact"),
)
def exact_dedup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a corpus with injected duplicates (the corpus
    unioned with itself — the fixture corpus is duplicate-free, so this
    proves group-collapse semantics: every group has n_copies=2)."""
    t = load(spark, sf_dir)
    doubled = t.documents.unionAll(t.documents)
    return exact_dedup_groups(doubled, "text", "doc_id")


@query(
    "dedup_by_key_latest",
    oracle="""
    SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_partkey, l_suppkey
                   ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC,
                            l_extendedprice DESC, l_quantity DESC
               ) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
    tags=("dedup", "key"),
)
def dedup_by_key_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """redundancy.sql's key-dedup with a deterministic keep-latest
    survivor (reference keeps an arbitrary row; redundancy.sql:1-10).
    Payload columns in the ordering because the fixture injects
    duplicate keys with different payloads."""
    t = load(spark, sf_dir)
    return dedup_by_key(
        t.lineitem,
        ["l_partkey", "l_suppkey"],
        [
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
            F.col("l_extendedprice").desc(),
            F.col("l_quantity").desc(),
        ],
    ).select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")


@query(
    "minhash_lsh_candidates",
    oracle=f"WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE} {_CAND_SQL}",
    tags=("dedup", "minhash", "lsh"),
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH banding (8 bands × 2 rows): candidate near-dup
    pairs. One md5 per token; mod-P arithmetic for shingles/signatures;
    shuffle is O(docs × bands) longs — never O(docs²)."""
    t = load(spark, sf_dir)
    return minhash_lsh_pairs(
        t.documents, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS, k=3
    )


@query(
    "near_dup_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    dsh AS (SELECT DISTINCT doc_id, sh FROM ex),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS i
        FROM cand c
        JOIN dsh a ON a.doc_id = c.id_a
        JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY c.id_a, c.id_b
    )
    SELECT c.id_a, c.id_b,
           round(coalesce(i.i, 0) * 1.0
                 / greatest(sa.n + sb.n - coalesce(i.i, 0), 1), 6) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    """,
    tags=("dedup", "jaccard"),
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard over the LSH candidates — the verify
    stage runs only on candidates, via explode-joins (no giant array
    intersections)."""
    t = load(spark, sf_dir)
    # candidates feed two joins downstream — persist so the minhash
    # pipeline (scan → shingle → signature → banding) runs once
    pairs = minhash_lsh_pairs(
        t.documents, "text", "doc_id", NUM_HASHES, BANDS, 3
    ).persist()
    out = ngram_jaccard(pairs, t.documents, "text", "doc_id", 3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    cc AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.a AS node, c.label FROM edges e JOIN cc c ON c.node = e.b
    ),
    comp AS (SELECT node AS doc_id, min(label) AS component FROM cc GROUP BY node)
    SELECT c.doc_id, c.component, s.n_docs,
           CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END AS is_canonical
    FROM comp c
    JOIN (SELECT component, count(*) AS n_docs
          FROM comp GROUP BY component) s USING (component)
    """,
    tags=("dedup", "connected-components", "clustering"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS, not just pairs: LSH candidate pairs → exact
    distributed connected components (operators/components.py) →
    per-doc component id, cluster size, and canonical flag (min doc_id
    survives). The oracle re-derives components with a recursive CTE
    (min reachable id), proving the iterative join loop exact."""
    from ..operators.components import connected_components

    t = load(spark, sf_dir)
    pairs = minhash_lsh_pairs(t.documents, "text", "doc_id", NUM_HASHES, BANDS, 3)
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(F.count("*").alias("n_docs"))
    return (
        cc.withColumnRenamed("node", "doc_id")
        .join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            "component",
            "n_docs",
            F.when(F.col("doc_id") == F.col("component"), 1)
            .otherwise(0)
            .alias("is_canonical"),
        )
    )


@query(
    "simhash_fingerprints",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_transform(t, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
        FROM toks
    )
    SELECT doc_id,
           coalesce(list_sum(list_transform(range(32), b ->
               CASE WHEN coalesce(list_sum(list_transform(hs, h ->
                         CASE WHEN (h // power(2, b)::BIGINT) % 2 = 1
                              THEN 1 ELSE -1 END)), 0) > 0
                    THEN power(2, b)::BIGINT ELSE 0 END)), 0)::BIGINT AS simhash32
    FROM hashed
    """,
    tags=("dedup", "simhash"),
)
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (portable md5-derived token hashes),
    computed explode-and-aggregate style (codegen'd sums)."""
    t = load(spark, sf_dir)
    return simhash_fingerprints(t.documents, "text", "doc_id", bits=32)


# --------------------------------------------------------------------------
# incremental snapshot dedup (incoming batch vs existing corpus)
# --------------------------------------------------------------------------
#: incoming batch = top 20% of the id space (stand-in for "today's crawl")
INGEST_MOD, INGEST_CUT = 10, 8
#: span-overlap share above which an incoming doc counts as a near-dup
OVERLAP_CUT = 0.5


@query(
    "incremental_ingest_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ),
    spans AS (
        SELECT doc_id, source,
               unnest(CASE WHEN len(t) >= 3
                      THEN list_transform(range(len(t) - 2),
                           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                      ELSE CAST([] AS VARCHAR[]) END) AS span
        FROM toks
    ),
    existing_spans AS (
        SELECT DISTINCT span FROM spans
        WHERE doc_id % {INGEST_MOD} < {INGEST_CUT}
    ),
    inc_overlap AS (
        SELECT s.doc_id,
               count(*) AS n_spans,
               sum(CASE WHEN e.span IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM spans s LEFT JOIN existing_spans e ON s.span = e.span
        WHERE s.doc_id % {INGEST_MOD} >= {INGEST_CUT}
        GROUP BY s.doc_id
    ),
    exact AS (
        SELECT DISTINCT i.doc_id
        FROM documents i
        JOIN documents x ON md5(i.text) = md5(x.text)
                        AND x.doc_id % {INGEST_MOD} < {INGEST_CUT}
        WHERE i.doc_id % {INGEST_MOD} >= {INGEST_CUT}
    )
    SELECT d.source,
           count(*) AS n_incoming,
           count(e.doc_id) AS n_exact_dup,
           sum(CASE WHEN o.n_spans > 0
                     AND o.n_hit * 1.0 / o.n_spans >= {OVERLAP_CUT}
                    THEN 1 ELSE 0 END)::BIGINT AS n_near_dup,
           sum(CASE WHEN e.doc_id IS NULL
                     AND NOT (o.n_spans > 0
                              AND o.n_hit * 1.0 / o.n_spans >= {OVERLAP_CUT})
                    THEN 1 ELSE 0 END)::BIGINT AS n_new
    FROM documents d
    LEFT JOIN exact e ON d.doc_id = e.doc_id
    LEFT JOIN inc_overlap o ON d.doc_id = o.doc_id
    WHERE d.doc_id % {INGEST_MOD} >= {INGEST_CUT}
    GROUP BY d.source
    """,
    tags=("dedup", "incremental", "ingest"),
)
def incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup of an incoming batch against the existing
    corpus — the asymmetric form every recurring crawl runs (dedup the
    new 0.1% against the 100 TB index, never the index against
    itself). Exact dups via a fingerprint semi-join (16-byte digests
    shuffle, never text); near-dups via the incoming span stream
    LEFT-joined to the existing corpus' distinct-span index with a
    per-doc overlap share. The incoming side is small by construction,
    so at scale its span stream broadcasts against the bucketed span
    index; both verdict flags land in one conditional rollup."""
    from ..operators.text import tokens_col
    from .curation import _ngrams

    t = load(spark, sf_dir)
    is_inc = F.col("doc_id") % INGEST_MOD >= INGEST_CUT
    spans = t.documents.select(
        "doc_id",
        F.explode(_ngrams(tokens_col(F.col("text")), 3)).alias("span"),
    )
    existing_spans = spans.where(~is_inc).select("span").distinct()
    inc_overlap = (
        spans.where(is_inc)
        .join(
            existing_spans.withColumn("_hit", F.lit(1)), "span", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        )
    )
    exact = (
        t.documents.where(is_inc)
        .select("doc_id", F.md5("text").alias("_fp"))
        .join(
            t.documents.where(~is_inc).select(F.md5("text").alias("_fp")).distinct(),
            "_fp",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("_exact", F.lit(1))
    )
    near = (F.col("n_spans") > 0) & (
        F.col("n_hit") / F.col("n_spans") >= OVERLAP_CUT
    )
    base = (
        t.documents.where(is_inc)
        .select("doc_id", "source")
        .join(exact, "doc_id", "left")
        .join(inc_overlap, "doc_id", "left")
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_incoming"),
        F.count("_exact").alias("n_exact_dup"),
        F.sum(F.when(near, 1).otherwise(0)).alias("n_near_dup"),
        F.sum(
            F.when(F.col("_exact").isNull() & ~F.coalesce(near, F.lit(False)), 1)
            .otherwise(0)
        ).alias("n_new"),
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup shape): k-means partition, within-cluster prune
# --------------------------------------------------------------------------
#: cluster count / dim shared with the kmeans trainer; cosine threshold
#: shared with the LSH near-dup band (plans/similarity.py). k=8 (not
#: the trainer's 4): cluster granularity is the quadratic-cost knob —
#: per-cluster candidate pairs scale with (n/k)^2, so k grows with the
#: corpus (see docstring); 16 keeps the fixture's pair block <1M.
SEM_K, SEM_DIM, SEM_TAU = 16, 64, 0.40
#: max cluster size admitted to the quadratic within-cluster pair join —
#: the SemDeDup twin of operators/dedup.BUCKET_CAP: a degenerate cluster
#: (k too small for the corpus, or a pathological embedding collapse) is
#: EXCLUDED from dedup (reported with n_dropped=0 and capped=1) instead
#: of exploding O(n²) pairs on one join key. Mirrored in the oracle.
SEM_CLUSTER_CAP = 10_000


def _semantic_dedup_oracle(k: int = SEM_K, dim: int = SEM_DIM) -> str:
    """DuckDB twin: identical centroid literals and distance algebra as
    the kmeans oracle (plans/clustering.py), identical round-5 cosine
    threshold, identical keep-lowest-id survivor rule. The cosine is
    dot over PRE-NORMALIZED vectors — same per-element divide-then-fold
    order as the Spark side, so the doubles agree bitwise."""
    from ..operators.clustering import kmeans_centroids

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
    a AS (SELECT vec_id, v, vv,
               {d_cols}
          FROM d),
    m AS (SELECT vec_id,
                 list_transform(v, e -> e / sqrt(vv)) AS vn,
                 {case} AS cluster
          FROM a),
    sizes AS (SELECT cluster, count(*) AS n_members FROM m GROUP BY cluster),
    elig AS (SELECT m.* FROM m JOIN sizes USING (cluster)
             WHERE n_members <= {SEM_CLUSTER_CAP}),
    p AS (SELECT x.cluster AS cluster, y.vec_id AS dup_id
          FROM elig x JOIN elig y
            ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          WHERE round(list_dot_product(x.vn, y.vn), 5) > {SEM_TAU}),
    drops AS (SELECT cluster, count(DISTINCT dup_id) AS n_dropped
              FROM p GROUP BY cluster)
    SELECT s.cluster,
           s.n_members,
           coalesce(d.n_dropped, 0) AS n_dropped,
           s.n_members - coalesce(d.n_dropped, 0) AS n_kept,
           CAST(s.n_members > {SEM_CLUSTER_CAP} AS INT) AS capped
    FROM sizes s LEFT JOIN drops d USING (cluster)
    """


@query(
    "semantic_dedup_clusters",
    oracle=_semantic_dedup_oracle(),
    tags=("dedup", "similarity", "clustering", "scale-path"),
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding space with a k-means
    codebook (literal centroids — the trainer is
    operators/clustering.fit_kmeans), then prune near-duplicates ONLY
    within each cluster: a vector is dropped when a lower-id member of
    its own cluster has cosine above the threshold.  Returns per-cluster
    members / dropped / kept counts.

    Scale shape: assignment is a narrow codegen map fused into the scan
    (no broadcast — the k x dim codebook folds into literals); the
    pairwise compare is an equi-join ON CLUSTER, so candidate pairs are
    bounded per-cluster instead of corpus-global — the same
    bucket-bounding idea as the LSH band join, with cluster granularity
    controlled by k (at 100 TB: k ~ corpus/10k so each cluster's pair
    block fits an executor).  Degenerate clusters ARE guarded:
    semantic_dedup_report excludes any cluster above SEM_CLUSTER_CAP
    members from the pair join (reported capped=1, n_dropped=0) — the
    enforced twin of BUCKET_CAP in minhash_lsh_pairs, mirrored in the
    oracle and unit-tested with an oversized cluster
    (tests/test_dedup.py).  Vectors are L2-normalized
    ONCE before the pair join, so each candidate pair costs a single
    dot-product fold instead of dot + two norms — at (n/k)^2 pairs per
    cluster that third is the dominant term."""
    from ..operators.clustering import kmeans_centroids, sq_dist_cols
    from ..operators.sqlexpr import assign_case_sql, norm_sql

    t = load(spark, sf_dir)
    cents = kmeans_centroids(SEM_K, SEM_DIM)
    dists = sq_dist_cols("embedding", cents)
    # each distance fold and the norm land in their OWN projection
    # before the argmin CASE references them: with k=16 the inlined form
    # would expand to k^2 = 256 folds per row and minutes of codegen
    m = (
        t.embeddings.select(
            "vec_id",
            "embedding",
            F.expr(norm_sql("embedding")).alias("nrm"),
            *[d.alias(f"_d{i}") for i, d in enumerate(dists)],
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.expr(
                assign_case_sql([f"_d{i}" for i in range(len(dists))])
            ).alias("cluster"),
        )
        .select(
            "vec_id",
            "cluster",
            F.transform(
                F.col("embedding"), lambda e: e.cast("double") / F.col("nrm")
            ).alias("vn"),
        )
    )
    return semantic_dedup_report(m, tau=SEM_TAU, cluster_cap=SEM_CLUSTER_CAP)


def semantic_dedup_report(
    m: DataFrame, *, tau: float, cluster_cap: int = SEM_CLUSTER_CAP
) -> DataFrame:
    """Within-cluster near-dup report over a member frame
    ``(vec_id, cluster, vn)`` with L2-normalized ``vn``.

    The degenerate-cluster guard is enforced HERE: cluster sizes are
    aggregated first (tiny — one row per cluster), clusters above
    ``cluster_cap`` are excluded from the quadratic pair join via a
    broadcast semi-filter on the eligible cluster ids, and surface in
    the output with ``capped=1`` and ``n_dropped=0``.  Without the cap
    one collapsed cluster is O(n²) pairs landing on a single join key —
    the exact failure mode BUCKET_CAP blocks in minhash_lsh_pairs
    (operators/dedup.py)."""
    from ..operators.similarity import dot_col

    # the member frame feeds FOUR subtrees in the one final action
    # (sizes twice — the eligibility filter and the report join — plus
    # both sides of the pair join); without the persist each recomputes
    # the k-way argmin projection stage (r12 paired A/B: wins all 3
    # pairs, ~0.5-1 s at sf0.1). No matching unpersist: the frame is
    # dropped by the session-level cache clearing every harness run
    # does between queries (bench.py clearCache; the module's other
    # persists rely on the same), so it only lingers in a long-lived
    # interactive session.
    m = m.persist()
    sizes = m.groupBy("cluster").agg(F.count("*").alias("n_members"))
    ok = sizes.where(F.col("n_members") <= cluster_cap).select("cluster")
    elig = m.join(F.broadcast(ok), "cluster")
    x = elig.select(
        "cluster", F.col("vec_id").alias("id_a"), F.col("vn").alias("va")
    )
    y = elig.select(
        "cluster", F.col("vec_id").alias("id_b"), F.col("vn").alias("vb")
    )
    drops = (
        x.join(y, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(dot_col(F.col("va"), F.col("vb")), 5) > tau)
        .groupBy("cluster")
        .agg(F.count_distinct("id_b").alias("n_dropped"))
    )
    return sizes.join(drops, "cluster", "left").select(
        "cluster",
        "n_members",
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        (F.col("n_members") > cluster_cap).cast("int").alias("capped"),
    )


@query(
    "containment_near_superset",
    # Same LSH candidate pipeline as near_dup_jaccard, but scored with
    # Broder's ASYMMETRIC containment coefficients: a short document
    # fully embedded in a long one has high max-containment while its
    # Jaccard resemblance stays low — the quote/excerpt duplication
    # resemblance-only dedup misses.
    oracle=f"""
    WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    dsh AS (SELECT DISTINCT doc_id, sh FROM ex),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS i
        FROM cand c
        JOIN dsh a ON a.doc_id = c.id_a
        JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY c.id_a, c.id_b
    ),
    sc AS (
        SELECT c.id_a, c.id_b,
               sa.n AS na, sb.n AS nb, coalesce(i.i, 0) AS iv
        FROM cand c
        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b,
           round(iv * 1.0 / greatest(na + nb - iv, 1), 6) AS jaccard,
           round(greatest(iv * 1.0 / greatest(na, 1),
                          iv * 1.0 / greatest(nb, 1)), 6)
               AS containment_max,
           CAST(CASE WHEN greatest(iv * 1.0 / greatest(na, 1),
                                   iv * 1.0 / greatest(nb, 1)) >= 0.99
                      AND iv * 1.0 / greatest(na + nb - iv, 1) < 0.95
                     THEN 1 ELSE 0 END AS INT) AS superset_only
    FROM sc
    """,
    tags=("dedup", "containment", "jaccard"),
)
def containment_near_superset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment scoring over the MinHash-LSH candidate
    pairs: C(A,B) = |A∩B|/|A| and its mirror, with the
    `superset_only` flag marking pairs a 0.95-resemblance threshold
    would keep but a 0.99-containment threshold would dedup
    (short-doc-inside-long-doc duplication — Broder 1997's
    'containment' measure).

    Scale shape: identical to near_dup_jaccard — candidate-only
    explode-joins on shingle hashes, integer counts, one division at
    the end. Bounded by the banding BUCKET_CAP upstream."""
    t = load(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "text", "doc_id", NUM_HASHES, BANDS, 3
    ).persist()
    ov = ngram_overlap(pairs, t.documents, "text", "doc_id", 3)
    iv = F.col("inter")
    jac = iv * 1.0 / F.greatest(F.col("na") + F.col("nb") - iv, F.lit(1))
    cmax = F.greatest(
        iv * 1.0 / F.greatest(F.col("na"), F.lit(1)),
        iv * 1.0 / F.greatest(F.col("nb"), F.lit(1)),
    )
    return ov.select(
        "id_a",
        "id_b",
        F.round(jac, 6).alias("jaccard"),
        F.round(cmax, 6).alias("containment_max"),
        ((cmax >= 0.99) & (jac < 0.95)).cast("int").alias(
            "superset_only"
        ),
    )


# --------------------------------------------------------------------------
# content-defined chunking (basic CDC) duplicate-byte share
# --------------------------------------------------------------------------
_CDC_W = 8    #: rolling-window width (chars)
_CDC_D = 32   #: boundary divisor -> expected chunk length


@query(
    "cdc_chunk_dup_share",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source, text,
               list_concat(list_concat([0],
                 list_filter(range({_CDC_W}, length(text) + 1),
                   i -> CAST(('0x' || substr(md5(substr(text, i - {_CDC_W - 1},
                                                        {_CDC_W})), 1, 8))
                             AS BIGINT) % {_CDC_D} = 0)),
                 [length(text)]) AS bounds
        FROM documents
        WHERE length(text) >= {_CDC_W}
    ),
    c AS (
        SELECT doc_id, source,
               unnest(list_filter(
                 list_transform(range(1, len(bounds)),
                   k -> substr(text, bounds[k] + 1,
                               bounds[k + 1] - bounds[k])),
                 s -> length(s) > 0)) AS chunk
        FROM b
    ),
    h AS (
        SELECT doc_id, source, md5(chunk) AS ch,
               length(chunk) AS clen
        FROM c
    ),
    dup AS (
        SELECT ch FROM h GROUP BY ch
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT source,
           count(*) AS n_chunks,
           count(*) FILTER (dup.ch IS NOT NULL) AS n_dup_chunks,
           CAST(sum(clen) AS BIGINT) AS total_bytes,
           round(sum(CASE WHEN dup.ch IS NOT NULL THEN clen ELSE 0 END)
                 * 1.0 / sum(clen), 6) + 0.0 AS dup_byte_share
    FROM h LEFT JOIN dup ON h.ch = dup.ch
    GROUP BY source
    """,
    tags=("dedup", "cdc", "chunking"),
)
def cdc_chunk_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (basic CDC — the
    rolling-hash-boundary scheme behind LBFS/restic/borg and
    storage-level training-corpus dedup): a chunk boundary falls
    wherever the hash of the trailing {_CDC_W}-char window is 0 mod
    {_CDC_D}, so chunk boundaries move WITH the content — an insertion
    shifts at most one chunk, unlike fixed-stride spans
    (crossdoc_span_dup_share) whose grid a one-byte insert destroys.
    Reports, per source, the share of bytes living in chunks whose
    exact content appears in >= 2 documents.

    Scale shape: boundary selection and chunk slicing are one
    higher-order-function codegen expression per document (no per-
    position explode); only whole chunks explode (expected length
    {_CDC_D}, so the chunk stream is ~1/{_CDC_D} of the corpus rows);
    the dup set is a map-side-combined distinct-doc count joined back
    broadcast.  Simplification vs FastCDC: no min/max chunk clamps
    (those make selection sequential); documented, mirrored in the
    oracle."""
    t = load(spark, sf_dir)
    bounds_expr = (
        f"concat(array(0), filter(sequence({_CDC_W}, length(text)), "
        f"i -> cast(conv(substring(md5(substring(text, i - {_CDC_W - 1}, "
        f"{_CDC_W})), 1, 8), 16, 10) AS BIGINT) % {_CDC_D} = 0), "
        f"array(length(text)))"
    )
    chunks_expr = (
        "filter(transform(sequence(1, size(bounds) - 1), "
        "k -> substring(text, element_at(bounds, k) + 1, "
        "element_at(bounds, k + 1) - element_at(bounds, k))), "
        "s -> length(s) > 0)"
    )
    h = (
        t.documents.where(F.length("text") >= _CDC_W)
        .select("doc_id", "source", "text",
                F.expr(bounds_expr).alias("bounds"))
        .select("doc_id", "source",
                F.explode(F.expr(chunks_expr)).alias("chunk"))
        .select(
            "doc_id", "source",
            F.md5("chunk").alias("ch"),
            F.length("chunk").alias("clen"),
        )
        .persist()  # feeds the dup aggregate and the rollup
    )
    dup = (
        h.groupBy("ch")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("ch", F.lit(True).alias("is_dup"))
    )
    return (
        h.join(F.broadcast(dup), "ch", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("is_dup"), 1)).alias("n_dup_chunks"),
            F.sum("clen").cast("long").alias("total_bytes"),
            (
                F.round(
                    F.sum(
                        F.when(F.col("is_dup"), F.col("clen")).otherwise(0)
                    )
                    * 1.0
                    / F.sum("clen"),
                    6,
                )
                + 0.0
            ).alias("dup_byte_share"),
        )
    )


# --------------------------------------------------------------------------
# MinHash-LSH recall evaluation against a blocked exact-Jaccard truth set
# --------------------------------------------------------------------------
_EVAL_RARE_DF = 20     #: rare-shingle blocking: shingles in <= this many docs
_EVAL_J = 0.5          #: truth threshold: exact Jaccard >= this


@query(
    "minhash_recall_eval",
    oracle=f"""
    WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    dsh AS (SELECT DISTINCT doc_id, sh FROM ex),
    rare AS (
        SELECT sh FROM dsh GROUP BY sh
        HAVING count(*) BETWEEN 2 AND {_EVAL_RARE_DF}
    ),
    universe AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM dsh a
        JOIN rare USING (sh)
        JOIN dsh b ON b.sh = a.sh AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT u.id_a, u.id_b, count(*) AS i
        FROM universe u
        JOIN dsh a ON a.doc_id = u.id_a
        JOIN dsh b ON b.doc_id = u.id_b AND b.sh = a.sh
        GROUP BY u.id_a, u.id_b
    ),
    truth AS (
        SELECT u.id_a, u.id_b
        FROM universe u
        JOIN inter i ON i.id_a = u.id_a AND i.id_b = u.id_b
        JOIN sizes sa ON sa.doc_id = u.id_a
        JOIN sizes sb ON sb.doc_id = u.id_b
        WHERE i.i * 1.0 / (sa.n + sb.n - i.i) >= {_EVAL_J}
    ),
    caught AS (
        SELECT t.id_a FROM truth t
        JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM caught) AS n_caught,
           CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0
                ELSE round((SELECT count(*) FROM caught) * 1.0
                           / (SELECT count(*) FROM truth), 6) + 0.0
           END AS recall
    """,
    tags=("dedup", "eval", "minhash"),
)
def minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH candidate generator against an
    INDEPENDENTLY BLOCKED exact-Jaccard benchmark: truth pairs share a
    rare shingle (document frequency <= {_EVAL_RARE_DF} — a different
    blocking scheme than the LSH bands being evaluated) and have exact
    3-shingle Jaccard >= {_EVAL_J}; recall is the fraction the
    {NUM_HASHES}-hash/{BANDS}-band LSH candidates catch — the
    dedup-side companion to ann_recall_eval, pricing the probabilistic
    blocking's miss rate with a measured number instead of the
    (1-(1-s^r)^b) curve.

    Scale shape: both pipelines are the repo's existing bounded ones
    (banded LSH with BUCKET_CAP; rare-shingle blocking is df-capped by
    construction, so the truth join explodes at most {_EVAL_RARE_DF}x
    per shingle); exact Jaccard runs only on the blocked universe via
    explode-joins.  Counts are exact integers; recall is one rounded
    float.  Single lineage (r11): the distinct shingle stream is
    computed ONCE and persisted, and BOTH the exact-Jaccard truth side
    and the LSH candidate side (signatures via the min() aggregate,
    which is multiplicity-insensitive, so distinct shingles yield
    identical signatures) hang off it — the corpus is scanned and
    shingled once instead of once per pipeline."""
    from ..operators.dedup import (
        lsh_pairs_from_signature,
        minhash_signature_from_shingles,
        shingle_rows,
    )

    t = load(spark, sf_dir)
    # the raw stream is persisted PRE-distinct: the signature groupBy
    # consumes it doc_id-partitioned straight from cache (no extra
    # shuffle — min() is multiplicity-insensitive so the duplicates
    # are harmless), while the set-semantics truth side hangs off the
    # distinct()-ed view. Measured at sf0.1: 9.8s vs 11.3s feeding
    # signatures from the distinct frame (whose (doc_id, sh) partition
    # forces a reshuffle) vs 12.6s rebuilding the stream per pipeline.
    stream = shingle_rows(t.documents, "text", "doc_id", 3).persist()
    dsh = (
        stream.distinct()
        # feeds rare-blocking, sizes and the intersection
        .persist()
    )
    rare = (
        dsh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _EVAL_RARE_DF))
        .select("sh")
    )
    a = dsh.join(rare, "sh").select("sh", F.col("doc_id").alias("id_a"))
    b = dsh.select("sh", F.col("doc_id").alias("id_b"))
    universe = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact Jaccard over the blocked universe via per-doc sorted
    # shingle ARRAYS + array_intersect (r11): the prior form explode-
    # joined the ~1M-pair universe against the full shingle stream
    # twice and re-aggregated — measured 8.1s of the query at sf0.1;
    # two array joins (AQE-sized — the doc-array frame is one row per
    # doc) plus a per-pair intersect of short sorted arrays do the
    # same arithmetic in ~1s. The oracle keeps the join formulation —
    # intersection counts are identical either way.
    docs_arr = dsh.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("sh")).alias("shs"),
        F.count("*").alias("n"),
    )
    i_col = F.size(F.array_intersect("shs_a", "shs_b"))
    truth = (
        universe.join(
            docs_arr.select(
                F.col("doc_id").alias("id_a"),
                F.col("shs").alias("shs_a"),
                F.col("n").alias("na"),
            ),
            "id_a",
        )
        .join(
            docs_arr.select(
                F.col("doc_id").alias("id_b"),
                F.col("shs").alias("shs_b"),
                F.col("n").alias("nb"),
            ),
            "id_b",
        )
        .withColumn("i", i_col)
        .where(
            F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
            >= _EVAL_J
        )
        .select("id_a", "id_b")
        .persist()
    )
    sig = minhash_signature_from_shingles(stream, "doc_id", NUM_HASHES)
    cand = lsh_pairs_from_signature(sig, "doc_id", NUM_HASHES, BANDS).select(
        "id_a", "id_b"
    )
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_caught = caught.agg(F.count("*").alias("n_caught"))
    return (
        n_truth.crossJoin(F.broadcast(n_caught))
        .select(
            "n_truth",
            "n_caught",
            F.when(F.col("n_truth") == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.col("n_caught") * 1.0 / F.col("n_truth"), 6
                )
                + 0.0
            )
            .alias("recall"),
        )
    )


@query(
    "minhash_precision_eval",
    oracle=f"""
    WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    dsh AS (SELECT DISTINCT doc_id, sh FROM ex),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS i
        FROM cand c
        JOIN dsh a ON a.doc_id = c.id_a
        JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY c.id_a, c.id_b
    ),
    scored AS (
        SELECT c.id_a,
               coalesce(i.i, 0) * 1.0
                   / greatest(sa.n + sb.n - coalesce(i.i, 0), 1) AS j
        FROM cand c
        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
    )
    SELECT count(*) AS n_candidates,
           count(*) FILTER (j >= {_EVAL_J}) AS n_true,
           CASE WHEN count(*) = 0 THEN 1.0
                ELSE round(count(*) FILTER (j >= {_EVAL_J}) * 1.0
                           / count(*), 6) + 0.0
           END AS precision
    FROM scored
    """,
    tags=("dedup", "eval", "minhash"),
)
def minhash_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision of the MinHash-LSH candidate generator: the fraction
    of banded-LSH candidate pairs whose EXACT 3-shingle Jaccard
    reaches {_EVAL_J} — the companion number to minhash_recall_eval
    (recall prices the misses, precision prices the wasted verify
    work; together they locate the operating point on the
    (1-(1-s^r)^b) curve with measured data).

    Scale shape: exact Jaccard runs only on the LSH candidates via the
    same explode-joins as near_dup_jaccard; one count aggregation on
    top.  Counts exact, precision one rounded float."""
    from ..operators.dedup import minhash_lsh_pairs, ngram_jaccard

    t = load(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "text", "doc_id", NUM_HASHES, BANDS, 3
    ).persist()
    scored = ngram_jaccard(pairs, t.documents, "text", "doc_id", 3)
    return scored.agg(
        F.count("*").alias("n_candidates"),
        F.count(F.when(F.col("jaccard") >= _EVAL_J, 1)).alias("n_true"),
    ).select(
        "n_candidates",
        "n_true",
        F.when(F.col("n_candidates") == 0, F.lit(1.0))
        .otherwise(
            F.round(F.col("n_true") * 1.0 / F.col("n_candidates"), 6)
            + 0.0
        )
        .alias("precision"),
    )


# --------------------------------------------------------------------------
# SimHash Hamming-distance near-dup pairs (Manku et al. 2007)
# --------------------------------------------------------------------------
_SH_BANDS = 4          #: 4 bands x 8 bits of the 32-bit fingerprint
_SH_MAX_HAMMING = 3    #: <= 3 differing bits -> pigeonhole guarantees
#: at least one identical band, so band-equality candidates are
#: EXHAUSTIVE for this radius (the web-dedup table-split technique)
_SH_BAND_CAP = 1000    #: drop degenerate band buckets (BUCKET_CAP twin)

_SIMHASH_SQL = r"""
    toks2 AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    hashed2 AS (
        SELECT doc_id,
               list_transform(t, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
        FROM toks2
    ),
    fp AS (
        SELECT doc_id,
               coalesce(list_sum(list_transform(range(32), b ->
                   CASE WHEN coalesce(list_sum(list_transform(hs, h ->
                             CASE WHEN (h // power(2, b)::BIGINT) % 2 = 1
                                  THEN 1 ELSE -1 END)), 0) > 0
                        THEN power(2, b)::BIGINT ELSE 0 END)), 0)::BIGINT
                   AS sh
        FROM hashed2
    )
"""


@query(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    banded AS (
        SELECT doc_id, sh, band.b AS band,
               (sh // power(256, band.b)::BIGINT) % 256 AS key
        FROM fp CROSS JOIN (SELECT unnest(range({_SH_BANDS})) AS b) band
    ),
    keep AS (
        SELECT band, key FROM banded GROUP BY band, key
        HAVING count(*) BETWEEN 2 AND {_SH_BAND_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sh AS sha, b.sh AS shb
        FROM banded a
        JOIN keep USING (band, key)
        JOIN banded b ON b.band = a.band AND b.key = a.key
                     AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(CAST(xor(sha, shb) AS BIGINT)) AS INT)
               AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(sha, shb) AS BIGINT)) <= {_SH_MAX_HAMMING}
    """,
    tags=("dedup", "simhash", "blocking"),
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — the Manku,
    Jain & Das Sarma (WWW 2007) web-dedup technique: split each 32-bit
    fingerprint into {_SH_BANDS} bands of 8 bits; any pair within
    Hamming distance {_SH_MAX_HAMMING} must agree on at least one band
    (pigeonhole), so band-equality candidates are EXHAUSTIVE for the
    radius and the popcount verify runs only on them.  Complements the
    MinHash family: SimHash preserves cosine/frequency similarity
    where MinHash preserves set resemblance.

    Scale shape: fingerprints via the explode+agg simhash operator
    (codegen sums), a 4x band explode, band-bucket equi-join capped at
    {_SH_BAND_CAP} docs per bucket (the BUCKET_CAP twin, mirrored in
    the oracle), xor+bit_count verify in codegen.  At 64-bit scale
    the same plan splits 64 bits into more bands."""
    from ..operators.dedup import simhash_fingerprints

    t = load(spark, sf_dir)
    fp = simhash_fingerprints(t.documents, "text", "doc_id", bits=32)
    fp = fp.withColumnRenamed("simhash32", "sh").persist()
    bands = spark.range(_SH_BANDS).select(F.col("id").cast("int").alias("band"))
    banded = fp.crossJoin(F.broadcast(bands)).select(
        "doc_id", "sh", "band",
        F.expr(f"(sh div cast(pow(256, band) as bigint)) % 256").alias(
            "key"
        ),
    )
    keep = (
        banded.groupBy("band", "key")
        .agg(F.count("*").alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= _SH_BAND_CAP))
        .select("band", "key")
    )
    a = banded.join(keep, ["band", "key"]).select(
        "band", "key", F.col("doc_id").alias("id_a"), F.col("sh").alias("sha")
    )
    b = banded.select(
        "band", "key", F.col("doc_id").alias("id_b"), F.col("sh").alias("shb")
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sha", "shb")
        .distinct()
    )
    ham = F.expr("bit_count(sha ^ shb)")
    return cand.where(ham <= _SH_MAX_HAMMING).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )


# --------------------------------------------------------------------------
# exact-substring dedup (distributed suffix-group formulation)
# --------------------------------------------------------------------------
#: span length for exact-substring dedup, in tokens. The published
#: training-data dedup uses 50-token spans on web documents; the
#: fixture docs are ~50 tokens total, so 8 keeps the same
#: "long-enough-to-be-non-accidental" role at fixture scale.
_SUBSTR_K = 8
#: packs (doc_id, pos) into one orderable BIGINT for first-occurrence
#: argmin; supports documents up to 2^20 tokens.
_POS_PACK = 1 << 20

#: shared oracle CTE: every k-gram occurrence as (doc_id, pos, 32-char
#: md5 digest). Grouping on the digest keeps the shuffle key 32 bytes
#: regardless of gram text length (the exact-dedup discipline: shuffle
#: digests, never payloads) with a 2^-128-scale collision risk — the
#: "exact" in the name stays honest.
def _substr_gram_cte(k: int = _SUBSTR_K) -> str:
    parts = " || ' ' || ".join(f"t[i + {j + 1}]" for j in range(k))
    return rf"""toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    pos_grams AS (
        SELECT doc_id, i + 1 AS pos, md5({parts}) AS gh
        FROM (SELECT doc_id, t, unnest(range(len(t) - {k - 1})) AS i
              FROM toks WHERE len(t) >= {k})
    )"""


def _pos_grams(docs: DataFrame, k: int = _SUBSTR_K) -> DataFrame:
    """(doc_id, pos, gh) gram-occurrence stream — thin alias over the
    operator (operators/dedup.substring_pos_grams)."""
    from ..operators.dedup import substring_pos_grams

    return substring_pos_grams(docs, "text", "doc_id", k)


@query(
    "substring_dup_spans",
    # maximal repeated spans: runs of CONSECUTIVE positions whose
    # k-gram also occurs elsewhere in the corpus (same doc or another
    # doc) — the detection half of exact-substring dedup. The islands
    # trick (pos - row_number) turns each run into one group.
    oracle=f"""
    WITH {_substr_gram_cte()},
    cnt AS (SELECT gh, count(*) AS n FROM pos_grams GROUP BY gh),
    dup AS (
        SELECT p.doc_id, p.pos
        FROM pos_grams p JOIN cnt c ON p.gh = c.gh
        WHERE c.n > 1
    ),
    isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS grp
        FROM dup
    )
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + {_SUBSTR_K - 1} AS span_end,
           count(*) AS n_dup_grams,
           max(pos) - min(pos) + {_SUBSTR_K} AS span_tokens
    FROM isl
    GROUP BY doc_id, grp
    """,
    tags=("dedup", "substring", "llm-data"),
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated >= k-token spans per document — the detection
    half of exact-substring training-data dedup (the suffix-array
    family of the public dedup literature, re-expressed as distributed
    suffix GROUPS: every k-gram occurrence keyed by its md5 digest, so
    a corpus-wide suffix array is never materialized).

    A position is duplicated when its k-gram occurs anywhere else in
    the corpus (another doc or another offset of the same doc); runs of
    consecutive duplicated positions merge into one maximal span via
    the gaps-and-islands row_number trick. Scale shape: the gram
    stream is one row per corpus token carrying a 32-byte digest; one
    digest-keyed count + join-back (the crossdoc two-shuffle shape),
    then one doc-keyed window bounded by document length. Linear in
    scan; no global windows, no UDFs.

    The reference engine has no substring dedup (extended surface,
    SURVEY.md LLM-pipeline families)."""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    grams = _pos_grams(t.documents.select("doc_id", "text"))
    cnt = grams.groupBy("gh").agg(F.count("*").alias("n"))
    dup = (
        grams.join(cnt.where(F.col("n") > 1), "gh")
        .select("doc_id", "pos")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(_SUBSTR_K - 1)).alias("span_end"),
        F.count("*").alias("n_dup_grams"),
        (F.max("pos") - F.min("pos") + F.lit(_SUBSTR_K)).alias("span_tokens"),
    ).drop("grp")


@query(
    "exact_substring_dedup",
    # the removal TRANSFORM: every duplicated k-gram occurrence except
    # the globally-first (min packed (doc_id, pos)) is cut; coverage
    # intervals [q, q+k-1] merge when they touch (gap <= k), and the
    # cleaned text is the kept tokens re-joined — md5-checked so both
    # engines must reconstruct byte-identical survivors.
    oracle=f"""
    WITH {_substr_gram_cte()},
    agg AS (
        SELECT gh, count(*) AS n,
               min(doc_id * {_POS_PACK} + pos) AS first_k
        FROM pos_grams GROUP BY gh
    ),
    removed AS (
        SELECT p.doc_id, p.pos
        FROM pos_grams p JOIN agg a ON p.gh = a.gh
        WHERE a.n > 1 AND p.doc_id * {_POS_PACK} + p.pos > a.first_k
    ),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) <= {_SUBSTR_K}
                    THEN 0 ELSE 1 END AS b
        FROM removed
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
        FROM brk
    ),
    spans AS (
        SELECT doc_id, min(pos) AS s, max(pos) + {_SUBSTR_K - 1} AS e
        FROM isl GROUP BY doc_id, grp
    ),
    tok_pos AS (
        SELECT doc_id, i + 1 AS pos, t[i + 1] AS w
        FROM (SELECT doc_id, t, unnest(range(len(t))) AS i FROM toks)
    ),
    kept AS (
        SELECT tp.doc_id, tp.pos, tp.w
        FROM tok_pos tp
        WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = tp.doc_id AND tp.pos BETWEEN s.s AND s.e)
    ),
    clean AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS ct
        FROM kept GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id,
               sum(e - s + 1) AS n_removed_tokens,
               count(*) AS n_removed_spans
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.t) AS n_tokens,
           coalesce(st.n_removed_tokens, 0)::BIGINT AS n_removed_tokens,
           coalesce(st.n_removed_spans, 0)::BIGINT AS n_removed_spans,
           md5(coalesce(c.ct, '')) AS clean_md5
    FROM toks t
    LEFT JOIN stats st ON t.doc_id = st.doc_id
    LEFT JOIN clean c ON t.doc_id = c.doc_id
    """,
    tags=("dedup", "substring", "transform", "llm-data"),
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup TRANSFORM (the removal half): every
    occurrence of a repeated >= k-token span is cut except the
    globally-first one (min (doc_id, pos), packed into one orderable
    BIGINT), and each document's cleaned text is rebuilt from the kept
    tokens. Returns per-doc (n_tokens, n_removed_tokens,
    n_removed_spans, clean_md5) — the md5 forces both engines to agree
    on the exact surviving byte sequence, so the transform itself is
    value-checked, not just its row counts.

    Scale shape: the gram stream shuffles 32-byte digests once to find
    (count, first-occurrence) per gram and once to join back; removal
    coverage merges with one doc-keyed window (bounded by doc length);
    the kept-token rebuild is a doc-keyed anti-join against the merged
    span list. Every stage is linear in corpus tokens — no suffix
    array is ever materialized, which is what lets the published
    suffix-array semantics run on a 1000-executor cluster."""
    from ..operators.dedup import exact_substring_transform

    t = load(spark, sf_dir)
    out = exact_substring_transform(
        t.documents.select("doc_id", "text"),
        text_col="text", id_col="doc_id",
        k=_SUBSTR_K, pos_pack=_POS_PACK,
    )
    return out.select(
        "doc_id", "n_tokens", "n_removed_tokens", "n_removed_spans",
        F.md5("clean_text").alias("clean_md5"),
    )


@query(
    "ngram_novelty_rate",
    # per-source novelty of the gram stream in doc_id (crawl) order:
    # an occurrence is a cross-doc REPEAT when the gram's globally
    # first occurrence (min packed (doc_id, pos)) sits in an EARLIER
    # document; same-doc repetition does not count against novelty.
    oracle=f"""
    WITH {_substr_gram_cte()},
    agg AS (
        SELECT gh, min(doc_id * {_POS_PACK} + pos) AS first_k
        FROM pos_grams GROUP BY gh
    ),
    occ AS (
        SELECT p.doc_id,
               CASE WHEN a.first_k // {_POS_PACK} < p.doc_id
                    THEN 1 ELSE 0 END AS is_repeat
        FROM pos_grams p JOIN agg a ON p.gh = a.gh
    )
    SELECT d.source,
           count(*) AS n_grams,
           sum(o.is_repeat)::BIGINT AS n_repeat,
           round(1.0 - sum(o.is_repeat) * 1.0 / count(*), 6) + 0.0
               AS novelty_rate
    FROM occ o JOIN documents d ON o.doc_id = d.doc_id
    GROUP BY d.source
    """,
    tags=("dedup", "substring", "curation", "llm-data"),
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl value metric: treating doc_id order as crawl
    order, what share of each source's {_SUBSTR_K}-gram occurrences is
    NEW text (first seen in this or a later document) vs a repeat of an
    earlier document — the number a data-acquisition team watches to
    decide when another crawl increment stops adding training value.

    Scale shape: same digest-keyed count/argmin + join-back as the
    exact-substring family, then one doc-keyed join to attach source
    and a small rollup — linear in corpus tokens."""
    t = load(spark, sf_dir)
    grams = _pos_grams(t.documents.select("doc_id", "text"))
    packed = F.col("doc_id") * _POS_PACK + F.col("pos")
    agg = grams.groupBy("gh").agg(F.min(packed).alias("first_k"))
    occ = grams.join(agg, "gh").select(
        "doc_id",
        F.when(
            F.floor(F.col("first_k") / _POS_PACK) < F.col("doc_id"),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("is_repeat"),
    )
    src = t.documents.select("doc_id", "source")
    return (
        occ.join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("is_repeat").cast("long").alias("n_repeat"),
            (
                F.round(
                    1.0 - F.sum("is_repeat") / F.count("*"), 6
                ) + 0.0
            ).alias("novelty_rate"),
        )
    )


@query(
    "dedup_method_agreement",
    # both candidate generators' oracle fragments already exist and
    # use disjoint CTE names; the agreement metrics are exact integer
    # counts with three rounded divisions at the end.
    oracle=f"""
    WITH {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    lsh AS ({_CAND_SQL}),
    {_SIMHASH_SQL},
    sbanded AS (
        SELECT doc_id, sh, band.b AS band,
               (sh // power(256, band.b)::BIGINT) % 256 AS key
        FROM fp CROSS JOIN (SELECT unnest(range({_SH_BANDS})) AS b) band
    ),
    skeep AS (
        SELECT band, key FROM sbanded GROUP BY band, key
        HAVING count(*) BETWEEN 2 AND {_SH_BAND_CAP}
    ),
    sim AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sbanded a
        JOIN skeep USING (band, key)
        JOIN sbanded b ON b.band = a.band AND b.key = a.key
                      AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.sh, b.sh) AS BIGINT))
                  <= {_SH_MAX_HAMMING}
    ),
    c AS (
        SELECT (SELECT count(*) FROM lsh) AS n_lsh,
               (SELECT count(*) FROM sim) AS n_simhash,
               (SELECT count(*) FROM lsh JOIN sim USING (id_a, id_b))
                   AS n_both
    )
    SELECT n_lsh, n_simhash, n_both,
           round(n_both * 1.0
                 / greatest(n_lsh + n_simhash - n_both, 1), 6) + 0.0
               AS agreement_jaccard,
           round(n_both * 1.0 / greatest(n_lsh, 1), 6) + 0.0
               AS lsh_covered_share,
           round(n_both * 1.0 / greatest(n_simhash, 1), 6) + 0.0
               AS simhash_covered_share
    FROM c
    """,
    tags=("dedup", "eval", "agreement"),
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much do the two probabilistic near-dup candidate generators
    AGREE? MinHash-LSH (set-resemblance blocking) and SimHash
    (cosine/frequency blocking) answer different similarity questions,
    and a production pipeline choosing between them — or unioning them
    — needs the overlap measured, not assumed: pair-set Jaccard plus
    each method's covered share of the other.

    Scale shape: both pipelines are the registered bounded ones
    (BUCKET_CAP banding, SimHash band caps); the intersection is one
    equi-join of two candidate-pair frames keyed on the pair ids.
    Counts are exact integers; the three shares are rounded
    divisions. Each candidate frame is persisted: it feeds its own
    count AND the intersection join, and without the persist each
    full generator pipeline executed twice more (11 parquet scans in
    the r11 plan — the shingle/signature lineages re-ran per use)."""
    lsh = (
        minhash_lsh_candidates(spark, sf_dir)
        .select("id_a", "id_b").persist()
    )
    sim = (
        simhash_hamming_pairs(spark, sf_dir)
        .select("id_a", "id_b").persist()
    )
    n_lsh = lsh.agg(F.count("*").alias("n_lsh"))
    n_sim = sim.agg(F.count("*").alias("n_simhash"))
    n_both = lsh.join(sim, ["id_a", "id_b"]).agg(
        F.count("*").alias("n_both")
    )
    c = n_lsh.crossJoin(F.broadcast(n_sim)).crossJoin(F.broadcast(n_both))
    return c.select(
        "n_lsh", "n_simhash", "n_both",
        (
            F.round(
                F.col("n_both")
                / F.greatest(
                    F.col("n_lsh") + F.col("n_simhash") - F.col("n_both"),
                    F.lit(1),
                ),
                6,
            ) + 0.0
        ).alias("agreement_jaccard"),
        (
            F.round(
                F.col("n_both") / F.greatest(F.col("n_lsh"), F.lit(1)), 6
            ) + 0.0
        ).alias("lsh_covered_share"),
        (
            F.round(
                F.col("n_both") / F.greatest(F.col("n_simhash"), F.lit(1)),
                6,
            ) + 0.0
        ).alias("simhash_covered_share"),
    )


# --------------------------------------------------------------------------
# Near-dup survivorship accounting by source (round 9)
# --------------------------------------------------------------------------
@query(
    "near_dup_survivorship_by_source",
    # composes the dedup_components closure (same recursive-CTE twin)
    # with the corpus metadata: docs in no candidate pair survive by
    # definition; within a component only the min doc_id survives.
    # All outputs are exact integers and single ratios.
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTES}, {_SIG_CTE}, {_BANDED_CTE},
    cand AS ({_CAND_SQL}),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    cc AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.a AS node, c.label FROM edges e JOIN cc c ON c.node = e.b
    ),
    comp AS (
        SELECT node AS doc_id, min(label) AS component
        FROM cc GROUP BY node
    ),
    verdict AS (
        SELECT d.doc_id, d.source,
               CASE WHEN comp.doc_id IS NULL THEN 1
                    WHEN comp.doc_id = comp.component THEN 1
                    ELSE 0 END AS kept
        FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
           round(sum(kept) * 1.0 / count(*), 6) + 0.0 AS keep_rate
    FROM verdict
    GROUP BY source
    """,
    tags=("dedup", "connected-components", "curation"),
)
def near_dup_survivorship_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup decision as a per-source report: MinHash-LSH
    candidate pairs close into components, the min-doc-id canonical
    survives each cluster, every unpaired doc survives trivially —
    kept/dropped counts and keep rates per source, which is the number
    a curation review actually reads ('how much of source X is
    near-duplicate mass?'), composing dedup_components' exact closure
    with the corpus metadata (the transform-side twin of
    cdc_chunk_dup_share's byte accounting).

    Scale shape: the bounded LSH candidate pipeline + min-label
    closure (localCheckpointed rounds), one LEFT broadcast join of the
    component verdicts onto the corpus scan, one keyed rollup — the
    corpus text never shuffles (only ids and short source strings)."""
    from ..operators.components import connected_components

    t = load(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "text", "doc_id", NUM_HASHES, BANDS, 3
    )
    cc = connected_components(pairs, "id_a", "id_b")
    verdict = (
        t.documents.select("doc_id", "source")
        .join(
            F.broadcast(
                cc.select(
                    F.col("node").alias("doc_id"),
                    F.col("component"),
                )
            ),
            "doc_id",
            "left",
        )
        .select(
            "source",
            F.when(F.col("component").isNull(), 1)
            .when(F.col("doc_id") == F.col("component"), 1)
            .otherwise(0)
            .alias("kept"),
        )
    )
    return verdict.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
        (F.count("*") - F.sum("kept")).cast("long").alias("n_dropped"),
        (
            F.round(F.sum("kept") * 1.0 / F.count("*"), 6) + 0.0
        ).alias("keep_rate"),
    )
