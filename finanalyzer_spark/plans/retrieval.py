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


# --------------------------------------------------------------------------
# graded ranking quality: NDCG@k of the BM25 ranking
# --------------------------------------------------------------------------
_NDCG_K = 10


@query(
    "ndcg_retrieval_eval",
    oracle=f"""
    WITH d AS ({_TOKS}),
    rel AS (
        SELECT doc_id, count(DISTINCT term) AS rel FROM (
            SELECT doc_id, unnest(toks) AS term FROM d
        )
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id
    ),
    stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d
        )
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT doc_id,
               round(sum(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {BM25_K1 + 1.0})
                   / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))
               ), 6) + 0.0 AS bm25
        FROM tf JOIN dfreq USING (term), stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {_NDCG_K}
    ),
    ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
        FROM scored
    ),
    dcg AS (
        SELECT sum((pow(2.0, coalesce(rel.rel, 0)) - 1.0)
                   / log2(ranked.pos + 1.0)) AS dcg
        FROM ranked LEFT JOIN rel USING (doc_id)
    ),
    ideal AS (
        SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
        FROM rel ORDER BY rel DESC, doc_id LIMIT {_NDCG_K}
    ),
    idcg AS (
        SELECT sum((pow(2.0, rel) - 1.0) / log2(pos + 1.0)) AS idcg
        FROM ideal
    )
    SELECT {_NDCG_K} AS k,
           (SELECT count(*) FROM rel) AS n_rel_docs,
           round(dcg.dcg, 6) + 0.0 AS dcg,
           round(idcg.idcg, 6) + 0.0 AS idcg,
           round(dcg.dcg / idcg.idcg, 6) + 0.0 AS ndcg
    FROM dcg, idcg
    """,
    tags=("retrieval", "eval", "ranking"),
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against term-coverage relevance
    grades (rel = number of distinct query terms a document contains,
    0-{len(QUERY_TERMS)}): DCG with the standard (2^rel - 1)/log2(pos+1)
    gain over the BM25 top-10, normalized by the ideal ordering's DCG
    — the graded companion to ann_recall_eval, pricing ranking quality
    rather than set overlap (Järvelin & Kekäläinen 2002).

    Scale shape: the ranking is the bm25_topk operator (filtered
    explode, broadcast model frames, TakeOrdered top-k, scores rounded
    to 6 digits before ranking on BOTH engines so positions agree);
    relevance grades are one more filtered-explode aggregate; both
    row_number windows run over <= 10-row frames.  The DCG sums are
    <= 10 doubles rounded to 6."""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    rel = (
        term_frequencies(t.documents, QUERY_TERMS)
        .groupBy("doc_id")
        .agg(F.count("*").alias("rel"))
        .persist()
    )
    ranked = bm25_topk(t.documents, QUERY_TERMS, k=_NDCG_K).select(
        "doc_id",
        "bm25",
        F.row_number()
        .over(W.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("pos"),
    )
    dcg = (
        ranked.join(rel, "doc_id", "left")
        .select(
            (
                (F.pow(F.lit(2.0), F.coalesce(F.col("rel"), F.lit(0)))
                 - 1.0)
                / F.log2(F.col("pos") + 1.0)
            ).alias("g")
        )
        .agg(F.sum("g").alias("dcg"))
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(_NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(W.orderBy(F.col("rel").desc(), "doc_id"))
            .alias("pos"),
        )
    )
    idcg = ideal.select(
        (
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2(F.col("pos") + 1.0)
        ).alias("g")
    ).agg(F.sum("g").alias("idcg"))
    n_rel = rel.agg(F.count("*").alias("n_rel_docs"))
    return (
        dcg.crossJoin(idcg)
        .crossJoin(n_rel)
        .select(
            F.lit(_NDCG_K).cast("int").alias("k"),
            F.col("n_rel_docs"),
            (F.round(F.col("dcg"), 6) + 0.0).alias("dcg"),
            (F.round(F.col("idcg"), 6) + 0.0).alias("idcg"),
            (F.round(F.col("dcg") / F.col("idcg"), 6) + 0.0).alias("ndcg"),
        )
    )
