"""Driver simulation per .claude/skills/verify: vanilla SparkSession →
__spark_entry__ protocol → DuckDB oracle on a named sample of queries.

Usage: python scripts/driver_sim_sample.py <sf> q1,q2,...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle import compare  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else []
    sf_dir = f"/root/testdata/sf{sf}"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    qs, osql = e.queries(), e.oracle_sql()
    assert set(qs) == set(osql), "protocol mismatch"
    print(f"protocol: {len(qs)} queries / {len(osql)} oracles")

    con = duckdb.connect()
    import glob
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        tab = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM read_parquet('{p}')"
        )
    bad = 0
    for n in names:
        if not n:
            continue
        try:
            sdf = qs[n](spark, sf_dir).toPandas()
            ddf = con.execute(osql[n]).fetchdf()
            ok, msg = compare(sdf, ddf)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC {exc}"
        print(f"{'ok ' if ok else 'BAD'} {n} {'' if ok else msg[:300]}")
        bad += 0 if ok else 1
    print(f"BAD {bad}/{len(names)}")


if __name__ == "__main__":
    main()
