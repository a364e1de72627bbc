"""Text-analysis queries over `documents` — the LLM-data-pipeline
surface (BASELINE.json north star; SURVEY.md §7 Phase 5).

All hot-path expressions are JVM-side built-ins (split/regexp/md5/
length) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.text import (
    quality_features,
    token_count_col,
    fingerprint_col,
    stopword_ratio_col,
)
from .registry import query


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           n_chars,
           length(text) AS n_chars_check,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char counts (the BPE-ish regex count
    is in `text_quality_score`)."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        "n_chars",
        F.length("text").cast("long").alias("n_chars_check"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                      * 1.0 / length(text) END, 6) AS punct_ratio,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      * 1.0 / len(string_split_regex(trim(text), '\\s+')) END, 6)
               AS stopword_ratio,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE length(trim(text)) * 1.0
                      / len(string_split_regex(trim(text), '\\s+')) END, 4)
               AS avg_token_len
    FROM documents
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: punctuation ratio, stopword ratio, average
    token length — the standard cheap pre-filters for LLM corpora."""
    t = load(spark, sf_dir)
    feats = quality_features(F.col("text"))
    return t.documents.select(
        "doc_id",
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["avg_token_len"], 4).alias("avg_token_len"),
    )


@query(
    "text_langid_agreement",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      * 1.0 / len(string_split_regex(trim(text), '\\s+')) END), 6)
               AS avg_en_stopword_ratio
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "langid"),
)
def text_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic signal: English-stopword density per
    declared language (the n-gram-profile classifier lives in
    operators.text.language_id as the non-oracle scale path)."""
    t = load(spark, sf_dir)
    return t.documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(stopword_ratio_col(F.col("text"))), 6).alias(
            "avg_en_stopword_ratio"
        ),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 — byte-stable across engines)."""
    t = load(spark, sf_dir)
    return t.documents.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
