#!/usr/bin/env python
"""Compare two BENCH_QUERIES.json artifacts and flag per-query swings.

Usage:
    python scripts/bench_diff.py OLD.json NEW.json [--factor 2.0]
                                 [--min-sec 0.5]

Prints one line per flagged query (slowdowns above --factor whose new
time also exceeds --min-sec — sub-second jitter is measurement noise,
cf. the deterministic_sample_stats r4 false alarm), then a summary.
Exit code 1 when anything is flagged, so it can gate CI.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument(
        "--allow-cross-methodology", action="store_true",
        help="compare artifacts with different methodology tags anyway",
    )
    args = ap.parse_args()

    with open(args.old) as fh:
        old_doc = json.load(fh)
    with open(args.new) as fh:
        new_doc = json.load(fh)
    # VERDICT r11 #1: a solo best-of-N baseline and an in-suite run are
    # NOT comparable — suite contention inflates cheap queries by
    # multiples (srm_check 0.33→3.49 s with an identical plan), so a
    # cross-methodology diff manufactures phantom regressions. Refuse
    # unless explicitly overridden. Artifacts written before the tag
    # existed count as "unknown" and also refuse against a tagged one.
    m_old = old_doc.get("methodology", "unknown")
    m_new = new_doc.get("methodology", "unknown")
    if m_old != m_new and not args.allow_cross_methodology:
        print(
            f"REFUSED: methodology mismatch ({m_old!r} vs {m_new!r}) — "
            "per-query swings across methodologies are contention "
            "artifacts, not plan deltas. Re-run with matching "
            "methodology or pass --allow-cross-methodology."
        )
        return 2
    old, new = old_doc["queries"], new_doc["queries"]
    # per-rep spreads (recorded by bench.py: loop family since r10,
    # every multi-rep query since r11) — when the new run's OWN reps
    # disagree by more than the flag factor, the host was demonstrably
    # noisy during the measurement, so a same-magnitude old-vs-new
    # swing is annotated instead of flagged. (The r10 form of this
    # test compared t_old against reps[0]; reps[0] IS min(samples) =
    # t_new, so the guard could never fire once the flag condition
    # held — dead code, caught by review.)
    spread = new_doc.get("rep_spread") or new_doc.get(
        "loop_family_spread", {}
    )

    flagged = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            continue  # new query this round — nothing to compare
        if t_old <= 0 or t_new <= 0:
            flagged.append((name, t_old, t_new, "errored run"))
            continue
        if t_new >= args.min_sec and t_new > args.factor * t_old:
            reps = spread.get(name)
            if reps and len(reps) > 1 and reps[-1] > args.factor * reps[0]:
                print(
                    f"NOTE {name}: {t_old:.3f}s -> {t_new:.3f}s but the "
                    f"new run's own rep spread {reps} exceeds the flag "
                    f"factor {args.factor}x — host jitter, not flagged"
                )
                continue
            why = f"{t_new / t_old:.2f}x slower"
            if reps:
                why += f" (rep spread {reps})"
            flagged.append((name, t_old, t_new, why))
    for name, t_old, t_new, why in flagged:
        print(f"FLAG {name}: {t_old:.3f}s -> {t_new:.3f}s ({why})")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    tot_old = sum(v for v in old.values() if v > 0)
    tot_new = sum(v for v in new.values() if v > 0)
    print(
        f"{len(flagged)} flagged; {len(added)} added, {len(gone)} removed; "
        f"total {tot_old:.1f}s -> {tot_new:.1f}s"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
