#!/usr/bin/env python
"""Driver-mimic profiler: run every REGISTRY query AND its DuckDB oracle
at sf0.01 (the driver's correctness scale), timing each side, and report
per-query wall clock sorted slowest-first.

Round-1 lesson: only 50 of 92 queries received a driver verdict — if the
driver works under a wall-clock budget, every second of per-query runtime
matters.  This script is the feedback loop for keeping the full pass fast.

Usage: python scripts/correctness_profile.py [--names q1,q2] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from finanalyzer_spark.plans import REGISTRY  # noqa: E402
from finanalyzer_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duck_connection  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None, help="comma-separated subset")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    names = sorted(args.names.split(",")) if args.names else sorted(REGISTRY)
    spark = get_spark("correctness_profile")
    duck = duck_connection(args.sf_dir)

    rows = []
    t_all = time.perf_counter()
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            spark_pdf = spec.fn(spark, args.sf_dir).toPandas()
            t_spark = time.perf_counter() - t0
        except Exception as exc:
            rows.append({"name": name, "err": f"spark: {exc}"})
            continue
        t1 = time.perf_counter()
        status = "rows_only"
        t_duck = 0.0
        if spec.oracle:
            try:
                duck_pdf = duck.sql(spec.oracle).df()
                t_duck = time.perf_counter() - t1
                ok, msg = compare(spark_pdf, duck_pdf)
                status = "ok" if ok else f"MISMATCH: {msg}"
            except Exception as exc:
                status = f"oracle err: {exc}"
        rows.append(
            {
                "name": name,
                "spark_s": round(t_spark, 2),
                "duck_s": round(t_duck, 2),
                "rows": len(spark_pdf),
                "status": status,
            }
        )
    total = time.perf_counter() - t_all

    rows.sort(key=lambda r: -(r.get("spark_s", 0) + r.get("duck_s", 0)))
    for r in rows:
        print(
            f"{r['name']:35s} spark={r.get('spark_s', '-'):>6} "
            f"duck={r.get('duck_s', '-'):>6} rows={r.get('rows', '-'):>7} "
            f"{r.get('status', r.get('err'))}"
        )
    bad = [r for r in rows if r.get("status") not in ("ok", "rows_only")]
    print(f"\nTOTAL {total:.1f}s over {len(names)} queries; problems: {len(bad)}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
