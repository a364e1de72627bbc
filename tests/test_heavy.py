"""Heavy-hitter operator: exactness and sketch completeness.

The contract under test (operators/heavy.py): the Misra-Gries pass may
produce extra candidates but must never LOSE a key whose global
frequency exceeds the support threshold — and the recount makes the
final (key, cnt) rows exactly equal to the brute-force groupBy answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finanalyzer_spark.operators.heavy import heavy_hitters


def _zipfish(spark, n_hot: int, n_tail: int, n_keys: int):
    """A skewed frame: 3 hot keys with n_hot rows each, a uniform tail."""
    hot = spark.range(3 * n_hot).select(
        F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")).alias("k")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), (F.col("id") % n_keys).cast("string")).alias("k")
    )
    # many partitions so per-partition MG state is genuinely exercised
    return hot.unionAll(tail).repartition(16)


@pytest.mark.parametrize("support,m", [(0.05, None), (0.05, 21), (0.02, None)])
def test_heavy_hitters_match_bruteforce(spark, support, m):
    df = _zipfish(spark, n_hot=2000, n_tail=6000, n_keys=500)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, "k", support=support, m=m).collect()
    }
    n = df.count()
    want = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > support * n)
        .collect()
    }
    assert got == want and len(want) == 3


def test_heavy_hitters_empty_when_uniform(spark):
    df = spark.range(5000).select((F.col("id") % 400).cast("string").alias("k"))
    assert heavy_hitters(df, "k", support=0.1).count() == 0


def test_candidate_state_is_bounded(spark):
    """m defaults to ~2/support + 1; the candidate frame the recount
    broadcasts can never exceed partitions * m rows."""
    df = _zipfish(spark, n_hot=500, n_tail=2000, n_keys=300)
    support = 0.05
    m = int(2.0 / support) + 1
    n_parts = df.rdd.getNumPartitions()
    from finanalyzer_spark.operators.heavy import _mg_kernel

    src = df.select("k")
    cand = src.mapInPandas(_mg_kernel("k", m), schema=src.schema)
    assert cand.count() <= n_parts * m
