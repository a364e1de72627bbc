"""Deduplication queries over `documents` (SURVEY.md §7 Phase 5;
generalizing the reference's redundancy.sql ROW_NUMBER dedup).

Families: exact (hash-groupBy), deterministic key-dedup,
MinHash+LSH banding, n-gram Jaccard verify, SimHash. Every stage is
built from portable hashes (md5) so the DuckDB oracle can reproduce it
bit-for-bit — see operators/dedup.py for the scale analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import (
    dedup_by_key,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_col,
)
from .registry import query

# Shared CTE text for word-3-shingles in DuckDB, mirroring
# operators.dedup.shingles_col exactly (edge cases included).
_SHINGLES_CTE = r"""
    toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                        THEN list_transform(range(len(t) - 2),
                                            i -> array_to_string(t[i+1:i+3], ' '))
                    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                    ELSE CAST([] AS VARCHAR[]) END AS shingles
        FROM toks
    )
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
    survivor (reference keeps an arbitrary row; redundancy.sql:1-10)."""
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
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id,
               list_transform(range(16),
                   i -> list_min(list_transform(shingles,
                        s -> md5(i::VARCHAR || ':' || s)))) AS signature
        FROM sh
        WHERE len(shingles) > 0
    ),
    banded AS (
        SELECT doc_id, b.band,
               md5(array_to_string(signature[b.band*2+1 : b.band*2+2], '|')) AS bhash
        FROM sig, (SELECT unnest(range(8)) AS band) b
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
    WHERE a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash", "lsh"),
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH banding (8 bands × 2 rows): candidate near-dup
    pairs. Shuffle is O(docs × bands) on 16-byte band hashes — never
    materializes O(n²)."""
    t = load(spark, sf_dir)
    return minhash_lsh_pairs(
        t.documents, "text", "doc_id", num_hashes=16, bands=8, k=3
    )


@query(
    "near_dup_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id,
               list_transform(range(16),
                   i -> list_min(list_transform(shingles,
                        s -> md5(i::VARCHAR || ':' || s)))) AS signature
        FROM sh
        WHERE len(shingles) > 0
    ),
    banded AS (
        SELECT doc_id, b.band,
               md5(array_to_string(signature[b.band*2+1 : b.band*2+2], '|')) AS bhash
        FROM sig, (SELECT unnest(range(8)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
        WHERE a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh)
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.s, sb.s)) * 1.0
                 / greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1), 6)
               AS jaccard
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.id_a
    JOIN sets sb ON sb.doc_id = c.id_b
    """,
    tags=("dedup", "jaccard"),
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification over the LSH candidates —
    the verify stage runs only on candidates, never all pairs."""
    t = load(spark, sf_dir)
    pairs = minhash_lsh_pairs(t.documents, "text", "doc_id", 16, 8, 3)
    out = ngram_jaccard(pairs, t.documents, "text", "doc_id", 3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


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
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (portable md5-derived token hashes)."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id", simhash_col(F.col("text"), bits=32).alias("simhash32")
    )
