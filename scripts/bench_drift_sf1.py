#!/usr/bin/env python
"""Pin the growth curve of the drift family at sf1-scale volume
(VERDICT r5 #6): the certified-interval claim for binned KS/PSI/W1
(SCALE.md 'Binned drift certification') had only been exercised at
sf0.1; this script times the binned monitors against their exact
twins on a 10x-replicated lineitem (~60M rows — sf1-equivalent row
count) so the 'bins don't grow with data' property is measured, not
asserted.

No sf1 fixture exists and /root/testdata is read-only, so the input
is synthesized ONCE into $SPARK_GRAFT_SYNTH_DIR (default
/tmp/sfsynth1): sf0.1's lineitem cross-joined with a 10-row replica
spine, prices jittered per replica by a deterministic ±0.05%-ish
2-decimal offset (hash of replica × orderkey) so the distinct-cents
domain grows realistically for the EXACT variants' distinct-value
walk.  Only the columns the drift family reads are kept.

Usage: python scripts/bench_drift_sf1.py [base_sf_dir]
Appends a markdown row block to stdout — paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from finanalyzer_spark.plans import REGISTRY  # noqa: E402
from finanalyzer_spark.session import get_spark  # noqa: E402

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SYNTH = os.environ.get("SPARK_GRAFT_SYNTH_DIR", "/tmp/sfsynth1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SYNTH_REPLICAS", "10"))

DRIFT_QUERIES = [
    "binned_ks_drift",
    "psi_drift",
    "binned_wasserstein_drift",
    "ks_statistic_returned_vs_kept",
    "mann_whitney_u_returned_vs_kept",
]


def synthesize(spark) -> str:
    out = os.path.join(SYNTH, "lineitem.parquet")
    if os.path.exists(out):
        return SYNTH
    base = spark.read.parquet(os.path.join(BASE, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice", "l_returnflag"
    )
    spine = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    # deterministic 2-decimal jitter: ±(hash % 101 - 50) cents
    jitter = (
        F.pmod(F.xxhash64(F.col("rep"), F.col("l_orderkey")), F.lit(101))
        - 50
    ) / 100.0
    synth = (
        base.crossJoin(F.broadcast(spine))
        .select(
            "l_returnflag",
            F.round(
                F.greatest(F.col("l_extendedprice") + jitter, F.lit(0.01)), 2
            ).alias("l_extendedprice"),
        )
    )
    synth.write.mode("overwrite").parquet(out)
    return SYNTH


def main() -> int:
    spark = get_spark("bench_drift_sf1")
    sf_dir = synthesize(spark)
    n = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    print(f"synthetic lineitem rows: {n:,} (base {BASE} x {REPLICAS})")
    print()
    print("| query | rows | seconds |")
    print("|---|---|---|")
    for name in DRIFT_QUERIES:
        # warm-up on the real sf0.1, then one timed run on the synth
        REGISTRY[name].fn(spark, BASE).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"| {name} | {n:,} | {dt:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
