#!/usr/bin/env python
"""Capture .explain('formatted') for a list of registry queries.

Usage: python scripts/capture_plans.py SUFFIX query [query ...]
Writes plans/r12/<query>_<SUFFIX>.txt. sf dir: $SPARK_GRAFT_SF_DIR
(default sf0.1). Note: queries that localCheckpoint intermediates
execute those parts eagerly during plan construction.
"""
import os, sys
sys.path.insert(0, ".")
from finanalyzer_spark.plans import REGISTRY
from finanalyzer_spark.session import get_spark

suffix = sys.argv[1]
names = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("capture_plans")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
os.makedirs(out_dir, exist_ok=True)
for n in names:
    try:
        df = REGISTRY[n].fn(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as exc:
        txt = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
    with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as fh:
        fh.write(txt)
    print("captured", n, flush=True)
    spark.catalog.clearCache()
spark.stop()
