"""Full-text retrieval queries over `documents` — BM25 ranking and
term statistics (the lexical half of hybrid search; the embedding half
lives in plans/similarity.py).

Reference parity: the reference engine's query surface is lookup-
oriented (`findatabase.py` read paths); BM25 is part of the extended
LLM-data-pipeline surface (BASELINE.json) — retrieval for curation,
e.g. pulling benchmark-like documents out of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    term_frequencies,
)
from .registry import query

#: Frozen query-term set, shared with the oracle SQL below. Chosen for
#: document-frequency spread in the synthetic corpus ('dup' is rare,
#: the others are common) so idf discrimination is actually exercised.
QUERY_TERMS: tuple[str, ...] = ("spark", "window", "vector", "dup")

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

#: Shared tokenization fragment: whitespace split of trimmed text,
#: empty text → zero-length list (matches operators.text.tokens_col).
_TOKS = r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END AS toks
    FROM documents
"""


@query(
    "term_doc_frequency",
    oracle=f"""
    WITH d AS ({_TOKS}),
    hits AS (
        SELECT doc_id, unnest(toks) AS term FROM d
    )
    SELECT term,
           count(DISTINCT doc_id) AS df,
           count(*) AS total_tf
    FROM hits
    WHERE term IN ({_TERMS_SQL})
    GROUP BY term
    """,
    tags=("retrieval", "text"),
)
def term_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index statistics for the frozen query terms: document
    frequency and total term frequency. The explode is filtered before
    the shuffle — O(matching tokens), not O(corpus tokens)."""
    t = load(spark, sf_dir)
    tf = term_frequencies(t.documents, QUERY_TERMS)
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )


@query(
    "bm25_topk",
    oracle=f"""
    WITH d AS ({_TOKS}),
    stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d
        )
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT doc_id,
           round(sum(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * {BM25_K1 + 1.0})
               / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))
           ), 6) + 0.0 AS bm25
    FROM tf JOIN dfreq USING (term), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    tags=("retrieval", "text", "topk"),
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the frozen term set (k1=1.2, b=0.75).

    Scale shape (operators.retrieval.bm25_topk): filtered explode →
    one combiner-friendly (doc, term) shuffle carrying doc length;
    document frequencies (≤|terms| rows) and corpus stats (1 row) are
    broadcast; final ranking is TakeOrderedAndProject, never a global
    sort. Scores are rounded to 6 digits on both engines so the
    order-insensitive hash is stable across summation orders."""
    t = load(spark, sf_dir)
    return bm25_topk(t.documents, QUERY_TERMS, k=20)


# --------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_DEPTH = 100
_RRF_QVEC = 0  # frozen dense-query vector id


@query(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH d AS ({_TOKS}),
    stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d
        )
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {BM25_K1 + 1.0})
                   / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))
               ), 6) + 0.0 AS bm25
        FROM tf JOIN dfreq USING (term), stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {_RRF_DEPTH}
    ),
    lex AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lr
        FROM bm
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v FROM e WHERE vec_id = {_RRF_QVEC}),
    cos AS (
        SELECT c.vec_id AS doc_id,
               round(list_cosine_similarity(c.v, qv.v), 5) + 0.0 AS cosine
        FROM e c, qv
        WHERE c.vec_id != {_RRF_QVEC}
        ORDER BY cosine DESC, doc_id
        LIMIT {_RRF_DEPTH}
    ),
    den AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY cosine DESC, doc_id) AS dr
        FROM cos
    ),
    fused AS (
        SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
               round(coalesce(1.0 / ({_RRF_K} + l.lr), 0)
                     + coalesce(1.0 / ({_RRF_K} + dn.dr), 0), 6) + 0.0 AS rrf
        FROM lex l FULL OUTER JOIN den dn USING (doc_id)
    )
    SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    tags=("retrieval", "similarity", "hybrid", "topk", "bounded-window"),
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion (Cormack et al. 2009,
    score = Σ 1/(60 + rank)) of the lexical BM25 ranking for the frozen
    term set and the dense cosine ranking around a frozen query vector
    — the standard two-tower retrieval combiner, composed from the
    repo's own bm25_topk and cosine_topk operators.

    Scale shape: both input rankings are depth-bounded (top-100)
    TakeOrdered results, so the rank windows and the full-outer fusion
    join run on k-row frames — the corpus is touched exactly twice
    (one filtered-explode pass for BM25, one scan for cosine), never
    by the fusion itself. Ranks come from ROUNDED scores with id
    tiebreaks so both engines rank identically despite FP drift."""
    from pyspark.sql import Window as W

    from ..operators.similarity import cosine_topk

    t = load(spark, sf_dir)
    lex = bm25_topk(t.documents, QUERY_TERMS, k=_RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("lr"),
    )
    den = cosine_topk(
        corpus=t.embeddings,
        queries=t.embeddings.where(F.col("vec_id") == _RRF_QVEC),
        id_col="vec_id",
        vec_col="embedding",
        k=_RRF_DEPTH,
    ).select(
        F.col("match_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), "match_id"))
        .alias("dr"),
    )
    fused = lex.join(den, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("lr")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("dr")), F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
