"""Split per-query bench time into (python plan build, execution) and
count Spark jobs per query — the guide §1 'know where the time goes'
step at per-invocation granularity.

Usage: python scripts/profile_split.py q1,q2,... [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finanalyzer_spark.session import get_spark  # noqa: E402
from finanalyzer_spark.plans import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n] if len(sys.argv) > 1 else []
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_split")
    sc = spark.sparkContext
    for name in names:
        # warm analysis/codegen caches the way bench.py's warmup pass does
        df = REGISTRY[name].fn(spark, WARMUP_DIR)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    print(f"{'query':34s} {'build_s':>8s} {'exec_s':>8s} {'total':>8s} {'jobs':>5s}")
    for name in names:
        best = None
        for _ in range(reps):
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = len(sc.statusTracker().getJobIdsForGroup(None) or []) - j0
            spark.catalog.clearCache()
            row = (t1 - t0, t2 - t1, t2 - t0, jobs)
            if best is None or row[2] < best[2]:
                best = row
        print(f"{name:34s} {best[0]:8.3f} {best[1]:8.3f} {best[2]:8.3f} {best[3]:5d}")


if __name__ == "__main__":
    main()
