"""Full-text retrieval kernels: inverted term frequencies and BM25
scoring — the lexical half of a hybrid (BM25 + embedding) search stack
for LLM training-data curation.

Everything is built-in-function composition (split/explode/groupBy)
inside whole-stage codegen; scoring constants are plain literals so a
DuckDB oracle can replicate the exact arithmetic.

Scale notes (100 TB corpus):
* the explode is filtered to the query's terms BEFORE the shuffle, so
  the grouped frame is O(matching docs × |terms|), not O(total tokens);
* document frequencies and corpus stats are one-row/tiny aggregates —
  broadcast, never a wide shuffle;
* the per-(doc, term) aggregation carries the doc length with it
  (max(dl)), avoiding a second join against the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

#: BM25 constants (Robertson/Sparck Jones defaults) — shared with the
#: oracle SQL generator in plans/retrieval.py.
BM25_K1: float = 1.2
BM25_B: float = 0.75


def term_frequencies(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) frequencies for the given term set, with the
    whitespace-token doc length carried along.

    Output: (doc_id, term, tf, dl). Docs containing none of `terms`
    produce no rows (BM25 gives them score 0 — never materialized).
    """
    toks = tokens_col(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).where(F.col("term").isin(*terms))
    return exploded.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row frame (n_docs, avgdl) — the global BM25 normalizers."""
    dl = F.size(tokens_col(F.col(text_col)))
    return docs.agg(
        F.count("*").alias("n_docs"), F.avg(dl).alias("avgdl")
    )


def bm25_idf_col(n_docs: Column, df: Column) -> Column:
    """Robust BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)) — always
    positive, so stop-like terms degrade gracefully instead of flipping
    the score sign."""
    return F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 for a bag-of-terms query.

    Output: (doc_id, bm25), ranked by rounded score desc with doc_id
    as the deterministic tiebreak (TakeOrderedAndProject — no global
    sort materialization).

    Plan shape: one filtered-explode shuffle into the (doc, term)
    aggregation (map-side combine applies), a broadcast join against
    the ≤|terms|-row document-frequency frame, and a broadcast of the
    one-row corpus stats. The tf frame is persisted because both the
    df aggregation and the scoring join consume it.
    """
    tf = term_frequencies(docs, terms, id_col, text_col).persist()
    stats = corpus_stats(docs, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # Mirror the oracle's literal algebra exactly: (1 - b) is folded to
    # a literal on both sides so the fp ops run in the same order.
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    w = (
        bm25_idf_col(F.col("n_docs"), F.col("df"))
        * (F.col("tf") * F.lit(k1 + 1.0))
        / norm
    )
    out = scored.groupBy("doc_id").agg(
        (F.round(F.sum(w), round_digits) + F.lit(0.0)).alias("bm25")
    )
    return out.orderBy(F.col("bm25").desc(), "doc_id").limit(k)
