"""CLI entry point — the reference's runnable surface, Spark-first.

The reference runs as a script: `Findatabase(reinitialize=...)` then
`update_database()` (findatabase.py:246-248). The equivalent here:

    python -m finanalyzer_spark init     --warehouse W --tickers T.csv
    python -m finanalyzer_spark update   --warehouse W [--today D]
    python -m finanalyzer_spark fill     --warehouse W [--today D]
    python -m finanalyzer_spark stream   --warehouse W --start D --end D
    python -m finanalyzer_spark sql      --sf-dir DIR "SELECT ..."
    python -m finanalyzer_spark query    --sf-dir DIR NAME
    python -m finanalyzer_spark queries

`init`/`update`/`fill` map 1:1 onto the reference lifecycle
(initialize_database / update_database / fill_all_data); `stream` is
the continuous form; `sql` is the raw-SQL executor (S7,
findatabase.py:124-126) over the registered table views; `query` runs
any registry entry by name. The feed defaults to the deterministic
FakeFeed — pass --live to use the yfinance adapter (requires the
package and network; never exercised in CI)."""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def _feed(live: bool):
    if live:  # pragma: no cover - needs yfinance + network
        from .sources.fetcher import yfinance_feed

        return yfinance_feed()
    from .sources.fetcher import FakeFeed

    return FakeFeed()


def main(argv: list[str] | None = None, spark=None) -> int:
    """`spark=None` (the CLI path) creates a session and stops it on
    exit; passing a session (tests, notebooks) borrows it and leaves
    its lifecycle to the caller."""
    p = argparse.ArgumentParser(prog="finanalyzer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(cmd: str, **kw):
        sp = sub.add_parser(cmd, **kw)
        sp.add_argument("--cpus", type=int, default=None)
        return sp

    sp = add("init", help="bootstrap the registry from a tickers CSV")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--tickers", required=True, help="tickers CSV path")

    for cmd, hlp in (
        ("update", "incremental history + fundamentals refresh"),
        ("fill", "full 10-year reload"),
    ):
        sp = add(cmd, help=hlp)
        sp.add_argument("--warehouse", required=True)
        sp.add_argument("--today", default=None, help="ISO date, default today")
        sp.add_argument("--live", action="store_true")

    sp = add("stream", help="continuous history ingest over a day range")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--start", required=True)
    sp.add_argument("--end", required=True)
    sp.add_argument("--days-per-batch", type=int, default=1)
    sp.add_argument("--checkpoint", default=None)

    sp = add("sql", help="run raw SQL over the registered table views")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("statement")
    sp.add_argument("--limit", type=int, default=20)

    sp = add("query", help="run a registry query by name")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("name")
    sp.add_argument("--limit", type=int, default=20)

    sp = add("explain", help="print a registry query's physical plan")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("name")
    sp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    sp = add("shards", help="build deduped, packed training shards")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--tokens-per-shard", type=int, default=500)

    sp = add("lint", help="scan registry plans for 100 TB anti-patterns")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("names", nargs="*", help="default: every registry query")
    sp.add_argument("--strict", action="store_true",
                    help="exit 1 on ERROR findings")

    add("queries", help="list registered query names")

    args = p.parse_args(argv)

    if args.cmd == "queries":  # no Spark session needed
        from .plans import REGISTRY

        for name in sorted(REGISTRY):
            print(name)
        return 0

    owns_session = spark is None
    if owns_session:
        from .session import get_spark

        spark = get_spark("finanalyzer_spark_cli", cpus=args.cpus)
    try:
        if args.cmd == "init":
            from .pipeline.finjobs import FinStore, bootstrap_registry

            names = bootstrap_registry(
                FinStore(spark, args.warehouse), args.tickers
            )
            print(f"registry: {names.count()} tickers")
        elif args.cmd in ("update", "fill"):
            from .pipeline.finjobs import (
                FinStore,
                fill_all_history,
                update_fundamentals,
                update_history,
            )

            store = FinStore(spark, args.warehouse)
            today = (
                dt.date.fromisoformat(args.today)
                if args.today
                else dt.date.today()
            )
            feed = _feed(args.live)
            if args.cmd == "update":
                h = update_history(store, today, feed)
                f = update_fundamentals(store, today, feed)
                print(f"history: {h.count()} rows; fundamentals: {f.count()}")
            else:
                h = fill_all_history(store, today, feed)
                print(f"history: {h.count()} rows")
        elif args.cmd == "stream":
            from .pipeline.finjobs import FinStore, stream_update_history

            h = stream_update_history(
                FinStore(spark, args.warehouse),
                dt.date.fromisoformat(args.start),
                dt.date.fromisoformat(args.end),
                days_per_batch=args.days_per_batch,
                checkpoint_dir=args.checkpoint,
            )
            print(f"history: {h.count()} rows")
        elif args.cmd == "sql":
            from .catalog import load

            load(spark, args.sf_dir).register_views()
            spark.sql(args.statement).show(args.limit, truncate=False)
        elif args.cmd == "query":
            from .plans import REGISTRY

            if args.name not in REGISTRY:
                print(f"unknown query {args.name!r}", file=sys.stderr)
                return 2
            REGISTRY[args.name].fn(spark, args.sf_dir).show(
                args.limit, truncate=False
            )
        elif args.cmd == "shards":
            from .catalog import load as _load
            from .pipeline.shards import build_training_shards

            manifest = build_training_shards(
                _load(spark, args.sf_dir).documents,
                args.out,
                tokens_per_shard=args.tokens_per_shard,
            )
            manifest.orderBy("split", "shard_id").show(50, truncate=False)
        elif args.cmd == "explain":
            from .plans import REGISTRY

            if args.name not in REGISTRY:
                print(f"unknown query {args.name!r}", file=sys.stderr)
                return 2
            REGISTRY[args.name].fn(spark, args.sf_dir).explain(args.mode)
        elif args.cmd == "lint":
            from .plans.lint import lint_registry

            findings = lint_registry(
                spark, args.sf_dir, args.names or None
            )
            for f in findings:
                print(f"{f.severity:5s} {f.query}: [{f.rule}] {f.detail}")
            n_err = sum(1 for f in findings if f.severity == "ERROR")
            print(
                f"{len(findings)} findings"
                f" ({n_err} errors) across the scanned plans"
            )
            if args.strict and n_err:
                return 1
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
