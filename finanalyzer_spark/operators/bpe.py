"""BPE vocabulary training and encoding on Spark.

The trainer (`fit_bpe`) is the iterative form of the single-step query
`bpe_top_merges` (plans/textops.py): classic byte-pair encoding
(Sennrich et al. 2016, arXiv:1508.07909) run over the word-frequency
table instead of raw text.

Scale shape per iteration:

* pair counting — codegen transform+explode over the (distinct-word,
  freq) table and ONE map-side-combined groupBy; the corpus itself is
  scanned exactly once, before the loop, to build that table.
* winner selection — `orderBy(count desc, pair).limit(1)`: a bounded
  TakeOrdered; the driver receives ONE row per iteration (same driver
  contract as operators/clustering.fit_kmeans — scalars only).
* merge application — a SQL `aggregate` fold over each symbol array
  (leftmost-greedy, non-overlapping), entirely in codegen; the symbol
  table is `localCheckpoint`ed every few rounds to truncate lineage,
  the standard iterative-Spark hygiene.

The encoder (`bpe_encode`) applies a learned merge list with the
rank-priority algorithm every BPE tokenizer uses. That loop is
dictionary-driven and data-dependent — the one shape SQL expressions
can't do efficiently — so it runs as an Arrow-batched `mapInPandas`
kernel with the merge ranks broadcast by closure, never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_expr(syms_col: str, a: str, b: str) -> str:
    """SQL fold replacing adjacent (a, b) with a||b, leftmost-greedy."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return f"""
    aggregate(
        {syms_col},
        cast(array() as array<string>),
        (out, s) -> CASE
            WHEN size(out) > 0 AND element_at(out, -1) = '{qa}' AND s = '{qb}'
            THEN concat(slice(out, 1, size(out) - 1), array('{qa}{qb}'))
            ELSE concat(out, array(s))
        END
    )
    """


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, f) frequency table — the corpus collapses here ONCE."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )


def fit_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_freq: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn up to `n_merges` BPE merges; returns [(a, b, count), ...]
    in merge order. Ties break deterministically by pair string."""
    wf = word_table(docs, text_col).withColumn(
        "syms", F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    )
    wf = wf.select("f", "syms").persist()
    wf.count()  # materialize before iterating
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        # guard size<2: sequence(1, 0) DESCENDS in Spark — an unguarded
        # transform would fabricate (sym, NULL) pairs for 1-symbol words
        pairs = wf.select(
            "f",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) < 2 THEN "
                    "cast(array() as array<struct<a string, b string>>) "
                    "ELSE transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS a, "
                    "element_at(syms, i + 1) AS b)) END"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("f").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b, cnt = best[0]["p"]["a"], best[0]["p"]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        nxt = wf.select("f", F.expr(_merge_expr("syms", a, b)).alias("syms"))
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        old, wf = wf, nxt.persist()
        wf.count()
        old.unpersist()
    wf.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list: rank-priority BPE, the
    algorithm every deployed tokenizer runs. Output: (id, tokens).

    Arrow-batched kernel; `ranks` ships once per task via closure (at
    real vocab sizes it's a few MB — broadcast territory, not a join).
    """
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) > 1:
            ranked = [
                (ranks.get((syms[i], syms[i + 1])), i)
                for i in range(len(syms) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _, i = min(ranked)
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        return syms

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in str(text).split():
                    if w not in cache:
                        cache[w] = encode_word(w)
                    out.extend(cache[w])
                toks.append(out)
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    src = docs.select(id_col, text_col)
    return src.mapInPandas(kernel, schema=f"{id_col} long, tokens array<string>")
