"""External feed as a first-class Python DataSource (S2).

`sources/fetcher.fetch_history` maps fetch *tasks* through
`mapInPandas`; this module exposes the same feed through Spark's
Python DataSource API (Spark 4+) so it composes as a reader:

    spark.dataSource.register(FeedDataSource)
    spark.read.format("fake_feed")
         .option("tickers", "AAPL,MSFT")
         .option("start", "2026-08-01").option("end", "2026-08-05")
         .load()

One InputPartition per ticker → each executor fetches its tickers
independently (the reference's serial per-ticker loop with proxy
rotation, dataAcquisition.py:36-51 / findatabase.py:128-133,
parallelized; rate limiting would sit inside `read`, per partition).
Filters on ticker/date could prune partitions at planning time; kept
minimal here since the fixture feed is cheap.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .fetcher import FakeFeed

FEED_SCHEMA = (
    "ticker string, date_value string, open double, high double, "
    "low double, close double"
)


class FeedDataSource(DataSource):
    """Batch reader over the deterministic FakeFeed; a yfinance-backed
    variant would differ only in the feed constructed inside read()."""

    @classmethod
    def name(cls) -> str:
        return "fake_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> "FeedReader":
        return FeedReader(self.options)


class FeedReader(DataSourceReader):
    def __init__(self, options: dict):
        tickers = options.get("tickers", "")
        if not tickers:
            raise ValueError("fake_feed requires option 'tickers' (csv list)")
        self.tickers = [t.strip() for t in tickers.split(",") if t.strip()]
        self.start = options.get("start")
        self.end = options.get("end")
        if not (self.start and self.end):
            raise ValueError("fake_feed requires options 'start' and 'end'")

    def partitions(self) -> list[InputPartition]:
        # one partition per ticker — fetch parallelism == ticker count
        return [InputPartition(t) for t in self.tickers]

    def read(self, partition: InputPartition):
        feed = FakeFeed()
        hist = feed.history(
            partition.value,
            dt.date.fromisoformat(self.start),
            dt.date.fromisoformat(self.end),
        )
        for row in hist.itertuples(index=False):
            yield (
                partition.value,
                row.date_value,
                float(row.open),
                float(row.high),
                float(row.low),
                float(row.close),
            )
