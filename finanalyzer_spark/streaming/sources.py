"""Production-shaped streaming sources beyond the file fixture.

The operator layer (streaming/events.py, streaming/stateful.py) is
source-agnostic: anything that yields the events schema plugs into the
same watermarked graphs. This module adds the built-in `rate` source —
a real unbounded time-based source with per-partition offset tracking,
the closest in-box stand-in for Kafka — mapped deterministically onto
the events schema. A Kafka deployment swaps `read_rate_stream` for
`spark.readStream.format("kafka")` + `from_json(value)`; nothing
downstream changes.

Scale notes: the rate source generates `numPartitions` parallel
sequences with monotonically increasing `value` — exactly Kafka's
partition/offset model, so backpressure, trigger sizing, and
state-store behavior rehearse faithfully against it.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("view", "click", "purchase", "refund")


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 500, partitions: int | None = None
) -> DataFrame:
    """Unbounded rate source: (timestamp, value) rows at a steady
    rate across `partitions` parallel generators."""
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
    )
    if partitions:
        reader = reader.option("numPartitions", str(partitions))
    return reader.load()


def rate_as_events(rate: DataFrame, n_users: int = 100) -> DataFrame:
    """Map the rate source onto the events schema, deterministically
    from `value` (so any assertion about the stream is reproducible):
    event_id = value, user/type/value derived by modulus, props a tiny
    JSON payload. All JVM-side expressions."""
    etype = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]),
        (F.col("value") % len(EVENT_TYPES) + 1).cast("int"),
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_users).alias("user_id"),
        etype.alias("event_type"),
        F.round((F.col("value") % 1000) / 10.0, 2).alias("value"),
        F.to_json(F.struct(F.col("value").alias("seq"))).alias("props"),
    )


def run_until_rows(
    stream_df: DataFrame,
    min_rows: int,
    timeout_sec: float = 60.0,
    output_mode: str = "append",
) -> DataFrame:
    """Drive an UNBOUNDED stream through a memory sink until the sink
    holds at least `min_rows` rows (or timeout), then stop and return
    the materialized batch. Counterpart of events.run_to_completion,
    which only fits finite file-backed streams."""
    import uuid

    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    spark = stream_df.sparkSession
    deadline = time.monotonic() + timeout_sec
    try:
        while time.monotonic() < deadline:
            if spark.table(name).count() >= min_rows:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    return spark.table(name)
