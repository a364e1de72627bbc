#!/usr/bin/env python
"""Cross-SF oracle sweep: run EVERY registry query against its DuckDB
twin at one or more scale factors and report mismatches.

The driver's correctness gate runs at sf0.01 only; this sweep is the
tool that caught four latent scale-dependent defects at sf0.1 in
round 5 (see SCALE.md 'Cross-SF oracle sweeps') — nondeterministic
range boundaries, window ties, float-rounding straddles, and an
oracle-side OOM. Run it after any change to a shared operator or
ordering convention.

Usage:
    python scripts/oracle_sweep.py [sf_dir ...]
    # default: /root/testdata/sf0.001 /root/testdata/sf0.01

Exit code = number of failing (query, sf) pairs, capped at 125.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    from oracle import compare, duck_connection  # tests/oracle.py

    from finanalyzer_spark.plans import REGISTRY
    from finanalyzer_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = get_spark("oracle_sweep")
    n_bad = 0
    for sf in sf_dirs:
        con = duck_connection(sf)
        t0 = time.monotonic()
        for i, (name, ent) in enumerate(REGISTRY.items()):
            try:
                ok, msg = compare(
                    ent.fn(spark, sf).toPandas(), con.sql(ent.oracle).df()
                )
                if not ok:
                    n_bad += 1
                    print(f"FAIL {sf} {name}: {str(msg)[:200]}", flush=True)
            except Exception as exc:  # noqa: BLE001 — report and continue
                n_bad += 1
                print(
                    f"ERR  {sf} {name}: {type(exc).__name__}: "
                    f"{str(exc)[:150]}",
                    flush=True,
                )
            if (i + 1) % 50 == 0:
                print(f"  [{sf}] {i + 1}/{len(REGISTRY)}...", flush=True)
        print(
            f"[{sf}] done in {time.monotonic() - t0:.0f}s, "
            f"cumulative failures: {n_bad}",
            flush=True,
        )
    spark.stop()
    return min(n_bad, 125)


if __name__ == "__main__":
    sys.exit(main())
