"""Paired A/B of one query under a module-level boolean flag —
alternating old/new shapes inside ONE session (the only reliable
protocol on a noisy shared host; see OPTIMIZATION_r12.md).

Usage: python scripts/ab_flag.py <query> <module>:<attr> [pairs]
e.g.   python scripts/ab_flag.py semantic_dedup_clusters \
           finanalyzer_spark.plans.dedup:_SEM_PERSIST 3
"""
from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finanalyzer_spark.session import get_spark  # noqa: E402
from finanalyzer_spark.plans import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    name = sys.argv[1]
    mod_name, attr = sys.argv[2].split(":")
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mod = importlib.import_module(mod_name)
    spark = get_spark("ab_flag")
    a, b = [], []
    # warm both shapes on the tiny SF
    for flag in (False, True):
        setattr(mod, attr, flag)
        run_once(spark, name, WARMUP_DIR)
    for _ in range(pairs):
        setattr(mod, attr, False)
        a.append(run_once(spark, name, SF_DIR))
        setattr(mod, attr, True)
        b.append(run_once(spark, name, SF_DIR))
    fmt = lambda xs: "/".join(f"{x:.2f}" for x in sorted(xs))  # noqa: E731
    print(f"{name} {attr}=False: {fmt(a)}  best {min(a):.2f}")
    print(f"{name} {attr}=True : {fmt(b)}  best {min(b):.2f}")


if __name__ == "__main__":
    main()
