"""Text-analysis column kernels — all built-in-function compositions
(JVM codegen, no Python), so they run at scan speed on a 100 TB corpus.

These are the engine's LLM-pipeline extensions (BASELINE.json): token
counting, quality scoring, language-ID heuristics, fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword list for the heuristic ratio features (kept
#: deliberately small + frozen so oracle SQL can inline it).
EN_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; empty/whitespace-only text → empty array."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def stopword_ratio_col(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens_col(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def punct_ratio_col(text: Column) -> Column:
    """Share of characters that are not alphanumeric-or-space."""
    n = F.length(text)
    kept = F.length(F.regexp_replace(text, r"[a-zA-Z0-9 ]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(kept * F.lit(1.0) / n)


def avg_token_len_col(text: Column) -> Column:
    """Mean token length including separators folded out: len(trim)/n_tokens."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.trim(text)) * F.lit(1.0) / n
    )


def quality_features(text: Column) -> dict[str, Column]:
    return {
        "punct_ratio": punct_ratio_col(text),
        "stopword_ratio": stopword_ratio_col(text),
        "avg_token_len": avg_token_len_col(text),
    }


def fingerprint_col(text: Column) -> Column:
    """Stable content fingerprint. md5 hex is byte-identical in every
    engine, which makes dedup results oracle-checkable; for pure
    in-Spark use, xxhash64 is ~4x faster."""
    return F.md5(text)


def bpe_ish_token_count_col(text: Column) -> Column:
    """GPT-2-style pre-tokenizer approximation: contractions, letter
    runs, digit runs, punctuation runs each count as a token."""
    pattern = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def language_id_col(text: Column, profiles: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Heuristic language ID: argmax of stopword-profile hit ratios.

    `profiles` maps lang → stopword tuple; defaults cover en/es/fr/de.
    Pure column expression (a chain of ratio comparisons), no UDF.
    """
    profiles = profiles or {
        "en": ("the", "and", "of", "to", "in", "is"),
        "es": ("el", "la", "de", "que", "y", "en"),
        "fr": ("le", "la", "de", "et", "les", "des"),
        "de": ("der", "die", "und", "das", "ist", "von"),
    }
    toks = tokens_col(text)
    langs = list(profiles)

    # ONE aggregate fold with a struct-of-counters accumulator: the
    # token array (and therefore the upstream regex split) is evaluated
    # once per row. The per-profile `filter` form evaluates `toks` once
    # per profile plus once per guard/denominator (~2·k splits per row);
    # this fold's lambda touches only its own variables. Because every
    # hit RATIO shares the same denominator, argmax over ratios equals
    # argmax over raw counts — no division, no zero-guard needed, and
    # ties still resolve to the first profile (strict > to replace),
    # exactly matching the ratio fold the oracle SQL replicates.
    zero = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def _step(acc: Column, w: Column) -> Column:
        return F.struct(
            *[
                (acc[lang] + F.when(w.isin(*profiles[lang]), 1).otherwise(0)).alias(
                    lang
                )
                for lang in langs
            ]
        )

    counts = F.aggregate(toks, zero, _step)
    expr_lang, expr_count = F.lit("und"), F.lit(0)
    for lang in langs:
        take = counts[lang] > expr_count
        expr_lang = F.when(take, F.lit(lang)).otherwise(expr_lang)
        expr_count = F.when(take, counts[lang]).otherwise(expr_count)
    return expr_lang


def word_ngrams_col(toks: Column, k: int) -> Column:
    """Word k-gram strings as a zip of k shifted slices — whole-stage
    codegen, no UDF.

    Deliberately NOT `transform(sequence(...), i -> element_at(toks,
    i+j))`: a lambda that captures `toks` re-evaluates the captured
    expression tree PER ELEMENT (higher-order functions block
    subexpression elimination), which turns an upstream tokenizer
    split into O(k·n²) work per doc — measured 12× slower on the
    harness corpus. The zip form evaluates `toks` O(k) times per ROW:
    the k slices materialize once, and the transform lambda touches
    only its own element. Docs shorter than k yield an empty array
    (slice length `greatest(n-k+1, 0)` — no when-guard needed)."""
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(k)])
    return F.transform(
        zipped,
        lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(k)]),
    )
