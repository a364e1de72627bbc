"""Runtime scale behaviors: AQE skew-join splitting — the mechanism
that keeps one hot key from stalling a 1000-executor join (SCALE.md).
The salting operators (operators/skew.py, tests/test_storage.py) are
the manual fallback; this pins that the AUTOMATIC path actually
engages in this engine's session configuration.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    """A 1-hot-key fact ⋈ dim sort-merge join under AQE with
    test-scaled thresholds: the executed plan must carry a skew=true
    hash join after runtime re-planning."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        # splitting must not be undone by partition coalescing
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # force a sort-merge join (skew splitting targets SMJ); the dim
        # side would otherwise broadcast and hide the mechanism
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        tail = spark.range(20_000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("payload")
        )
        # NOTE: no explicit repartition, and no downstream groupBy on
        # the join key — AQE declines to split a skewed join when the
        # user pinned the partitioning or when a downstream operator
        # reuses the join's hash distribution (the split duplicates
        # build-side rows across the hot partition's halves, which
        # would break both). Those are exactly the situations where
        # the manual salting operators remain necessary.
        fact = hot.unionAll(tail)
        dim = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
        )
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"),
            F.sum((F.col("k") == 0).cast("long")).alias("n_hot"),
        )
        row = joined.collect()[0]
        # correctness under splitting: the hot key keeps every row
        assert row.n_hot == 200_000
        assert row.n == 220_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, (
            "AQE did not split the skewed partition:\n" + final_plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
