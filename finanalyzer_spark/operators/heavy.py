"""Exact heavy hitters with bounded memory: per-partition Misra-Gries
candidate generation + exact recount of candidates only.

The scalable alternative to a full ``groupBy(col).count()`` when the
key cardinality is huge and only the frequent tail matters (vocabulary
pruning, hot-key detection before salting, abusive-domain caps):

* **Pass 1** runs the Misra-Gries summary (m counters) independently
  inside every partition via ``mapInPandas`` — O(m) state, one scan,
  no shuffle.  Pigeonhole guarantee: any key with global frequency
  > n/m keeps a surviving counter in at least one partition, so the
  union of per-partition candidates is a superset of every true heavy
  hitter at support >= 1/m.
* **Pass 2** recounts ONLY the candidates exactly: a broadcast
  left-semi join drops the (at scale, overwhelming) non-candidate
  traffic before the one small aggregation shuffle.

Result is EXACT (the sketch only bounds the candidate set, never the
reported counts) — which is what makes it oracle-checkable by a plain
``GROUP BY`` twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_kernel(col: str, m: int):
    """Misra-Gries over an iterator of Arrow batches (one partition)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                if v in counters:
                    counters[v] += int(c)
                elif len(counters) < m:
                    counters[v] = int(c)
                else:
                    # decrement-all by the min counter, batched: the
                    # classic one-decrement loop, amortized
                    dec = min(min(counters.values()), int(c))
                    counters = {
                        k: n - dec for k, n in counters.items() if n - dec > 0
                    }
                    if int(c) - dec > 0 and len(counters) < m:
                        counters[v] = int(c) - dec
        yield pd.DataFrame({col: list(counters.keys())})

    return gen


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float,
    m: int | None = None,
    total: Column | None = None,
) -> DataFrame:
    """Keys of `df[col]` with frequency > support * n, exactly.

    `m` defaults to ceil(2/support) — comfortably above the 1/support
    completeness bound so partition skew never costs a candidate.
    """
    if m is None:
        m = int(2.0 / support) + 1
    src = df.select(col)
    cand = (
        src.mapInPandas(_mg_kernel(col, m), schema=src.schema)
        .distinct()
    )
    counts = (
        src.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    n = df.agg(F.count("*").alias("_n"))
    return (
        counts.crossJoin(F.broadcast(n))
        .where(F.col("cnt") > F.lit(support) * F.col("_n"))
        .select(col, "cnt")
    )
