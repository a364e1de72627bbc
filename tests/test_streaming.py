"""Streaming twins vs their batch queries — same aggregation graph,
incremental execution. The parquet fixture drives the stream one file
per micro-batch; complete-mode memory sink materializes final state,
which must equal the batch answer exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.plans import REGISTRY
from finanalyzer_spark.streaming.events import (
    read_events_stream,
    run_to_completion,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
)

from .conftest import SF_DIR

EVENTS_PATH = f"{SF_DIR}/events.parquet"


def _sorted_pdf(df, keys):
    return (
        df.toPandas().sort_values(keys).reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, EVENTS_PATH)


def test_streaming_tumbling_equals_batch(spark, events_stream):
    got = run_to_completion(
        streaming_tumbling_counts(events_stream), output_mode="complete"
    )
    want = REGISTRY["tumbling_hourly"].fn(spark, SF_DIR)
    keys = ["window_start", "event_type"]
    g, w = _sorted_pdf(got, keys), _sorted_pdf(want, keys)
    assert len(g) == len(w) > 0
    assert (g[keys].values == w[keys].values).all()
    assert (g["n"].values == w["n"].values).all()


def test_streaming_sessions_equal_batch(spark, events_stream):
    got = run_to_completion(
        streaming_session_windows(events_stream), output_mode="complete"
    )
    want = REGISTRY["session_windows"].fn(spark, SF_DIR)
    keys = ["user_id", "session_start"]
    g, w = _sorted_pdf(got, keys), _sorted_pdf(want, keys)
    assert len(g) == len(w) > 0
    assert (g["n_events"].values == w["n_events"].values).all()


def test_streaming_ohlc_equals_batch(spark, events_stream):
    from finanalyzer_spark.streaming.events import streaming_ohlc

    got = run_to_completion(streaming_ohlc(events_stream), output_mode="complete")
    want = REGISTRY["ohlc_downsample"].fn(spark, SF_DIR)
    keys = ["user_id", "bucket_start"]
    g, w = _sorted_pdf(got, keys), _sorted_pdf(want, keys)
    assert len(g) == len(w) > 0
    for col in ("open", "high", "low", "close", "n_events", "vol"):
        assert (g[col].values == w[col].values).all(), col


def test_stateful_ewma_matches_pandas_fold(spark, events_stream):
    """Recursive EWMA via applyInPandasWithState: the final state per
    user must equal a pandas fold over the fully-ordered history."""
    from finanalyzer_spark.streaming.stateful import EWMA_ALPHA, running_ewma

    got = run_to_completion(running_ewma(events_stream), output_mode="update")
    latest = got.toPandas().groupby("user_id").last()

    events = load(spark, SF_DIR).events.toPandas().sort_values(["ts", "event_id"])

    def fold(vals):
        e = None
        for x in vals:
            e = x if e is None else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * e
        return round(e, 9)

    want = events.groupby("user_id")["value"].apply(lambda s: fold(s.to_list()))
    assert len(latest) == len(want) > 0
    for uid, row in latest.iterrows():
        assert row["ewma"] == pytest.approx(want[uid], abs=1e-9), uid


def test_streaming_dedup_drops_in_watermark_duplicates(spark, events_stream):
    got = run_to_completion(streaming_dedup(events_stream), output_mode="append")
    events = load(spark, SF_DIR).events
    distinct_ids = events.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == got.count() == distinct_ids


def test_stateful_running_totals_match_batch(spark, events_stream):
    """applyInPandasWithState per-user totals: the last update per user
    must equal the batch groupBy aggregation."""
    from finanalyzer_spark.streaming.stateful import running_user_totals

    got = run_to_completion(running_user_totals(events_stream), output_mode="update")
    # update mode emits one row per (user, batch); keep each user's last
    latest = got.toPandas().groupby("user_id").last()
    want = (
        load(spark, SF_DIR)
        .events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(latest) == len(want) > 0
    joined = latest.join(want, lsuffix="_s", rsuffix="_b")
    assert (joined["n_events_s"] == joined["n_events_b"]).all()
    assert (abs(joined["sum_value_s"] - joined["sum_value_b"]) < 1e-6).all()


def test_stream_static_join_equals_batch(spark, events_stream):
    """Stream-static enrichment: per-segment counts from the stream
    must equal the batch join (customer as the user dimension)."""
    from finanalyzer_spark.streaming.events import streaming_enrich_with_dim

    dim = load(spark, SF_DIR).customer.select("c_custkey", "c_mktsegment")
    enriched = streaming_enrich_with_dim(events_stream, dim)
    got = run_to_completion(
        enriched.groupBy("c_mktsegment").agg(F.count("*").alias("n")),
        output_mode="complete",
    )
    want = (
        load(spark, SF_DIR)
        .events.join(
            dim, F.col("user_id") == F.col("c_custkey"), "left"
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    keys = ["c_mktsegment"]
    g, w = _sorted_pdf(got, keys), _sorted_pdf(want, keys)
    assert len(g) == len(w) > 0
    assert (g["n"].values == w["n"].values).all()


def test_foreach_batch_merge_idempotent(spark, tmp_path):
    """foreachBatch keyed upsert: duplicates across micro-batches and
    full stream replays both collapse to one row per key."""
    from finanalyzer_spark.streaming.events import (
        foreach_batch_merge,
        read_events_stream,
    )

    target = str(tmp_path / "events_merged")
    for _ in range(2):  # second run = full redelivery of every batch
        stream = read_events_stream(spark, EVENTS_PATH)
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(foreach_batch_merge(target, ["event_id"]))
            .option("checkpointLocation", str(tmp_path / f"ck_{_}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    merged = spark.read.parquet(target)
    distinct_ids = (
        load(spark, SF_DIR).events.select("event_id").distinct().count()
    )
    assert merged.count() == merged.select("event_id").distinct().count() == distinct_ids


def test_transform_with_state_matches_batch(spark, events_stream):
    """transformWithStateInPandas (typed-state successor API): final
    per-user totals must equal the batch aggregation, like the
    applyInPandasWithState twin."""
    from finanalyzer_spark.streaming.stateful import running_user_totals_tws

    if running_user_totals_tws is None:
        pytest.skip("transformWithState API unavailable")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        try:
            got = run_to_completion(
                running_user_totals_tws(events_stream), output_mode="update"
            )
        except Exception as exc:  # environment gate, not a correctness pass
            if "driver worker exited unexpectedly" in str(exc):
                # pyspark 4.1.2 in this container crashes the TWS
                # driver-side Python worker even on the canonical
                # rate-source example — API-level environment
                # limitation, not this operator (see module docstring)
                pytest.skip("transformWithState python worker broken here")
            raise
        latest = got.toPandas().groupby("user_id").last()
        want = (
            load(spark, SF_DIR)
            .events.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .toPandas()
            .set_index("user_id")
        )
        assert len(latest) == len(want) > 0
        joined = latest.join(want, lsuffix="_s", rsuffix="_b")
        assert (joined["n_events_s"] == joined["n_events_b"]).all()
        assert (abs(joined["sum_value_s"] - joined["sum_value_b"]) < 1e-6).all()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream join (views ⋈ same-user clicks within
    30 min) must produce exactly the batch join's pairs."""
    from finanalyzer_spark.streaming.events import (
        read_events_stream,
        streaming_view_click_join,
    )

    sv = read_events_stream(spark, EVENTS_PATH)
    sc = read_events_stream(spark, EVENTS_PATH)
    got = run_to_completion(
        streaming_view_click_join(
            sv.where(F.col("event_type") == "view"),
            sc.where(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )

    ev = load(spark, SF_DIR).events
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")),
    )
    assert got.count() == want.count() > 0
    g = set(map(tuple, got.select("view_id", "click_id").collect()))
    w = set(map(tuple, want.select("view_id", "click_id").collect()))
    assert g == w


def test_stream_stream_left_outer_join_equals_batch(spark):
    """Left-outer stream-stream join: matched pairs equal the batch
    inner join; unmatched views emit null-click rows exactly for the
    views the final watermark could CLOSE (view_ts + 30 min behind
    max_ts - lateness) — the no-data micro-batch after the last file is
    what flushes them, so this also pins that eviction semantics."""
    from finanalyzer_spark.streaming.events import (
        read_events_stream,
        streaming_view_click_join,
    )

    sv = read_events_stream(spark, EVENTS_PATH)
    sc = read_events_stream(spark, EVENTS_PATH)
    got = run_to_completion(
        streaming_view_click_join(
            sv.where(F.col("event_type") == "view"),
            sc.where(F.col("event_type") == "click"),
            how="left_outer",
        ),
        output_mode="append",
    )
    g_matched = set(
        map(
            tuple,
            got.where(F.col("click_id").isNotNull())
            .select("view_id", "click_id")
            .collect(),
        )
    )
    g_nulls = {
        r["view_id"] for r in got.where(F.col("click_id").isNull()).collect()
    }

    ev = load(spark, SF_DIR).events
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    inner = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")),
    )
    w_matched = set(map(tuple, inner.select("view_id", "click_id").collect()))
    assert g_matched == w_matched and len(g_matched) > 0

    # expected nulls: views with no click in-window whose join horizon
    # (view_ts + 30 min) the final watermark (max_ts - 1 h) passed
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    closable = (
        v.join(inner.select("view_id"), "view_id", "left_anti")
        .where(
            F.col("view_ts") + F.expr("INTERVAL 30 minutes")
            < F.lit(max_ts) - F.expr("INTERVAL 1 hour")
        )
    )
    w_nulls = {r["view_id"] for r in closable.collect()}
    assert g_nulls == w_nulls and len(w_nulls) > 0


def test_stream_ts_unit_matches_batch(spark, events_stream):
    """Unit-sanity guard: streamed min(ts) must equal batch min(ts).

    A wrong timestamp unit in the streaming reader (us read as ns, or
    vice versa) shifts every event by 1000x toward 1970 — this assert
    makes that class of bug impossible to pass silently."""
    got = run_to_completion(
        events_stream.groupBy().agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts")
        ),
        output_mode="complete",
    ).collect()[0]["min_ts"]
    want = (
        load(spark, SF_DIR)
        .events.agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts")
        )
        .collect()[0]["min_ts"]
    )
    assert got == want


def test_reader_roundtrips_us_and_ns_fixtures(spark, tmp_path):
    """The footer-driven reader must handle both a microsecond- and a
    nanosecond-written events fixture (a driver regeneration flipping
    the unit cannot break the streaming family again)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = {
        "event_id": [1, 2, 3],
        "ts": [base, base + datetime.timedelta(hours=1),
               base + datetime.timedelta(hours=2)],
        "user_id": [10, 11, 10],
        "event_type": ["view", "click", "view"],
        "value": [1.5, 2.5, 3.5],
        "props": ["{}", "{}", "{}"],
    }
    for unit in ("us", "ns"):
        tbl = pa.table(
            {
                k: pa.array(v, type=pa.timestamp(unit) if k == "ts" else None)
                for k, v in rows.items()
            }
        )
        path = str(tmp_path / f"events_{unit}.parquet")
        pq.write_table(tbl, path)
        got = run_to_completion(
            read_events_stream(spark, path).select(
                "event_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            ),
            output_mode="append",
        )
        pdf = got.toPandas().sort_values("event_id")
        assert list(pdf["ts_s"]) == [
            "2024-03-01 12:00:00",
            "2024-03-01 13:00:00",
            "2024-03-01 14:00:00",
        ], unit


def test_rate_source_drives_event_operators(spark):
    """A real unbounded source (built-in rate — Kafka's in-box stand-
    in) mapped onto the events schema drives the same watermarked
    operator graph as the file fixture: deterministic event derivation,
    monotone ids, and the tumbling aggregation consuming it live."""
    from finanalyzer_spark.streaming.events import streaming_tumbling_counts
    from finanalyzer_spark.streaming.sources import (
        rate_as_events,
        read_rate_stream,
        run_until_rows,
    )

    events = rate_as_events(read_rate_stream(spark, rows_per_second=2000,
                                             partitions=4))
    got = run_until_rows(events, min_rows=100, output_mode="append")
    assert got.count() >= 100
    assert set(got.columns) == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }
    rows = got.select("event_id", "user_id", "event_type").collect()
    for r in rows:  # schema-mapping determinism: derived fields from value
        assert r["user_id"] == r["event_id"] % 100
        assert r["event_type"] == ["view", "click", "purchase", "refund"][
            r["event_id"] % 4
        ]

    agg = run_until_rows(
        streaming_tumbling_counts(rate_as_events(
            read_rate_stream(spark, rows_per_second=2000, partitions=4))),
        min_rows=1,
        output_mode="complete",
    )
    assert agg.count() >= 1
    assert agg.agg(F.sum("n")).collect()[0][0] > 0


def test_streaming_checkpoint_resume(spark, tmp_path):
    """State recovery: a windowed aggregation checkpoint survives a
    full stop/restart — the first run sees only part of the data, the
    restarted query ingests the rest on the SAME checkpoint, and the
    final state equals the batch answer over everything (no lost and
    no double-counted micro-batches)."""
    import shutil, glob, os
    from finanalyzer_spark.streaming.events import (
        read_events_stream,
        streaming_tumbling_counts,
    )

    full = load(spark, SF_DIR).events
    staged = tmp_path / "staged"
    full.repartition(6).write.parquet(str(staged))
    parts = sorted(glob.glob(f"{staged}/part-*.parquet"))
    assert len(parts) == 6

    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")
    name = "ckpt_resume_out"

    def run_available():
        stream = read_events_stream(spark, str(src))
        q = (
            streaming_tumbling_counts(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    for f in parts[:3]:
        shutil.copy(f, src / os.path.basename(f))
    run_available()
    partial = spark.table(name).agg(F.sum("n")).collect()[0][0]

    for f in parts[3:]:
        shutil.copy(f, src / os.path.basename(f))
    run_available()

    got = spark.table(name).toPandas().sort_values(
        ["window_start", "event_type"]).reset_index(drop=True)
    want = (
        REGISTRY["tumbling_hourly"].fn(spark, SF_DIR).toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    assert partial < want["n"].sum()  # first run really was partial
    assert len(got) == len(want) > 0
    assert (got["n"].values == want["n"].values).all()
    assert (got["sum_value"].values == want["sum_value"].values).all()


def test_streaming_heavy_hitters_candidates_complete(spark, tmp_path):
    """Bucketed Misra-Gries GroupState: after the stream drains, the
    per-bucket candidate sets contain every true heavy hitter of the
    full data (support 0.2), across multiple micro-batches."""
    import glob
    import os
    import shutil
    from collections import Counter

    from finanalyzer_spark.streaming.stateful import running_heavy_hitters

    full = load(spark, SF_DIR).events
    staged = tmp_path / "staged"
    full.repartition(4).write.parquet(str(staged))
    src = tmp_path / "src"
    src.mkdir()
    for f in sorted(glob.glob(f"{staged}/part-*.parquet")):
        shutil.copy(f, src / os.path.basename(f))

    # last emission per bucket wins (MG counts are not monotone)
    latest: dict = {}

    def sink(df, batch_id):
        rows = df.collect()
        for b in {r["bucket"] for r in rows}:
            latest[b] = {"_batch": batch_id, "items": {}}
        for r in rows:
            latest[r["bucket"]]["items"][r["item"]] = r["count_lb"]

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        running_heavy_hitters(stream, "event_type", support=0.2)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    candidates = {
        item for b in latest.values() for item in b.get("items", {})
    }
    rows = [r["event_type"] for r in full.select("event_type").collect()]
    n = len(rows)
    true_heavy = {v for v, c in Counter(rows).items() if c > 0.2 * n}
    assert true_heavy, "fixture must have heavy hitters at support 0.2"
    assert true_heavy <= candidates
    # state is bounded: every bucket holds at most m = 2/support + 1 items
    m = int(2.0 / 0.2) + 1
    assert all(len(b.get("items", {})) <= m for b in latest.values())


def test_streaming_cms_counters_equal_batch(spark, events_stream):
    """CMS counters maintained incrementally over micro-batches ==
    the one-pass batch sketch (additivity ⇒ exact equality)."""
    from finanalyzer_spark.streaming.events import (
        cms_counter_increments,
        streaming_cms_counters,
    )

    got = run_to_completion(
        streaming_cms_counters(events_stream), output_mode="complete"
    )
    want = (
        cms_counter_increments(spark.read.parquet(EVENTS_PATH))
        .groupBy("i", "b")
        .count()
    )
    keys = ["i", "b"]
    g, w = _sorted_pdf(got, keys), _sorted_pdf(want, keys)
    assert len(g) == len(w) > 0
    assert (g[keys].values == w[keys].values).all()
    assert (g["count"].values == w["count"].values).all()
    # bounded-state invariant: at most d*w counter rows
    assert len(g) <= 4 * 256


def test_watermark_drops_late_beyond_threshold(spark, tmp_path):
    """Append-mode tumbling aggregation with a 1h watermark: a row
    arriving in a later micro-batch with event time BELOW the current
    watermark is dropped — the emitted window count must not include
    it. This pins the LATENESS semantics themselves, not just
    stream == batch on in-order data."""
    import os
    import uuid

    src = tmp_path / "late_src"
    src.mkdir()
    ts = F.to_timestamp

    def write_one_file(rows, name, mtime):
        sub = tmp_path / f"stage_{name}"
        df = spark.createDataFrame(rows, ["ts_s", "user_id"]).select(
            ts("ts_s").alias("ts"), "user_id"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = src / f"{name}.parquet"
        os.rename(sub / part, dst)
        os.utime(dst, (mtime, mtime))

    # batch 1: on-time rows; their max (12:00) sets the 11:00
    # watermark — which takes EFFECT two batches later (empirically,
    # the filter watermark lags the progress-reported one by a batch:
    # a batch-2 row below batch-1's watermark is still admitted)
    write_one_file(
        [("2024-03-01 10:15:00", 1), ("2024-03-01 10:45:00", 2),
         ("2024-03-01 12:00:00", 3)],
        "0001", 1_700_000_000,
    )
    # batch 2: on-time row, advances the future watermark to 12:00
    write_one_file([("2024-03-01 13:00:00", 4)], "0002", 1_700_000_100)
    # batch 3: one LATE row a full window below the NOW-EFFECTIVE
    # 11:00 watermark (the filter drops by window END, strictly) plus
    # an on-time row keeping the stream moving
    write_one_file(
        [("2024-03-01 08:30:00", 5), ("2024-03-01 14:00:00", 6)],
        "0003", 1_700_000_200,
    )

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r.window_start.strftime("%H:%M"): r.n
        for r in spark.table(name).collect()
    }
    # [10:00, 11:00) finalized with its 2 on-time rows; the late
    # 08:30 row was DROPPED — no [08:00) window ever emits
    assert out.get("10:00") == 2, out
    assert "08:00" not in out, out
    # the tail windows ([13,14) and [14,15)) never finalize (the
    # watermark stops at 13:00), so append mode must not emit them
    assert "13:00" not in out and "14:00" not in out, out


def test_stream_feed_resumes_from_batch_cursor_and_restores_freshness(
    spark, tmp_path
):
    """Daily-refresh cursor/freshness parity between the batch and
    streaming ingest paths (VERDICT r5 #8; reference
    findatabase.py:203-232): seed history with the BATCH job at day
    T-3, continue with the rate-limited STREAM from the per-key cursor
    (last_date + 1) to day T, and the result must equal running the
    batch job straight to T — and the freshness plan must report every
    key fresh afterwards, exactly as it does on the batch-only store."""
    import datetime as dt

    from finanalyzer_spark.pipeline.finjobs import (
        FinStore,
        _freshness,
        bootstrap_registry,
        stream_update_history,
        update_history,
    )
    from finanalyzer_spark.sources.fetcher import FakeFeed

    csv = tmp_path / "tickers.csv"
    csv.write_text(
        "Ticker,Name,Exchange\nAAPL,Apple Inc.,NASDAQ\nMSFT,Microsoft,NASDAQ\n"
    )
    today = dt.date(2026, 8, 10)
    t1 = today - dt.timedelta(days=3)

    # batch-only twin: straight to `today`
    ref = FinStore(spark, str(tmp_path / "wh_batch"))
    bootstrap_registry(ref, str(csv))
    want = update_history(ref, today, FakeFeed())

    # batch to T-3, then stream the remaining days from the cursor
    st = FinStore(spark, str(tmp_path / "wh_stream"))
    names = bootstrap_registry(st, str(csv))
    update_history(st, t1, FakeFeed())
    plan = _freshness(st.read("history"), names, today)
    cursors = plan.select("start_date").distinct().collect()
    assert [r["start_date"] for r in cursors] == [
        t1 + dt.timedelta(days=1)
    ], "per-key cursor must resume at last_date + 1"
    assert plan.where("is_fresh").count() == 0  # T-3 is stale at T
    got = stream_update_history(
        st,
        t1 + dt.timedelta(days=1),
        today,
        days_per_batch=1,  # one micro-batch per calendar day
        checkpoint_dir=str(tmp_path / "ckpt"),
        wait_secs=0.01,  # exercise the throttle path end-to-end
    )

    # same rows modulo bookkeeping: date_added differs by design (the
    # ingest day of each path), and the T-3 seed's 10-year backfill
    # window starts 3 days earlier than the batch-only twin's (the
    # reference anchors the empty-history start at today-RETENTION,
    # findatabase.py:211-216) — so compare the data columns over the
    # common window; the stream path must add NOTHING else.
    lower = today - dt.timedelta(days=3650)
    cols = ["names_id", "date_value", "open", "high", "low", "close"]
    g = got.where(F.col("date_value") >= F.lit(lower.isoformat())).select(cols)
    w = want.where(F.col("date_value") >= F.lit(lower.isoformat())).select(cols)
    assert g.exceptAll(w).count() == 0
    assert w.exceptAll(g).count() == 0
    assert got.count() == want.count() + 2 * 3  # the 3-day-earlier seed

    # freshness restored on BOTH stores: every key fresh at T
    for s in (st, ref):
        p = _freshness(s.read("history"), names, today)
        assert p.where("NOT is_fresh").count() == 0


def test_streaming_drift_bins_equal_batch_and_ks(spark, events_stream):
    """Drift monitor: streamed per-bucket population counts equal the
    one-pass batch aggregation row-for-row (additive state, CMS
    shape), and the binned KS computed from the streamed state equals
    the KS computed from the batch bins — drift scoring off streaming
    state, no history rescan."""
    from finanalyzer_spark.catalog import load
    from finanalyzer_spark.streaming.events import (
        drift_bin_increments,
        streaming_drift_bins,
        run_to_completion,
    )

    got = run_to_completion(
        streaming_drift_bins(events_stream), output_mode="complete"
    )
    batch_events = load(spark, SF_DIR).events
    want = (
        drift_bin_increments(batch_events)
        .groupBy("bucket")
        .agg(F.sum("in_a").alias("a"), F.sum("in_b").alias("b"))
    )
    g, w = _sorted_pdf(got, ["bucket"]), _sorted_pdf(want, ["bucket"])
    assert len(g) == len(w) > 0
    for col in ("bucket", "a", "b"):
        assert (g[col].values == w[col].values).all(), col

    def ks_ppm(pdf):
        pdf = pdf.sort_values("bucket")
        ca, cb = pdf["a"].cumsum(), pdf["b"].cumsum()
        na, nb = int(pdf["a"].sum()), int(pdf["b"].sum())
        return int((ca * nb - cb * na).abs().max() * 1_000_000 // (na * nb))

    assert ks_ppm(g) == ks_ppm(w) > 0


def test_state_rows_bounded_under_10x_replay(spark, tmp_path):
    """VERDICT r7 #6: state growth, measured.  Replay the events
    fixture 10× into a file stream and read the state-store row
    counts from the engine's progress telemetry:

    - running_heavy_hitters keeps O(buckets) GroupState rows — one per
      salt bucket, each a bounded Misra-Gries summary — however many
      events pass through;
    - the watermarked tumbling-count keeps O(windows-in-watermark ×
      keys) rows, a function of the covered TIME RANGE, so a 10×
      replay of the same range must not grow it.

    (On a real cluster the state store is RocksDB-backed —
    spark.sql.streaming.stateStore.providerClass — so 'bounded rows'
    is also 'bounded executor memory'; see SCALE.md §Streaming.)"""
    import glob
    import os
    import shutil

    from finanalyzer_spark.streaming.events import (
        read_events_stream,
        streaming_tumbling_counts,
    )
    from finanalyzer_spark.streaming.stateful import running_heavy_hitters

    full = load(spark, SF_DIR).events
    staged = tmp_path / "staged"
    full.repartition(2).write.parquet(str(staged))
    src = tmp_path / "src"
    src.mkdir()
    parts = sorted(glob.glob(f"{staged}/part-*.parquet"))
    for rep in range(10):  # 10× replay, one file per micro-batch
        for f in parts:
            shutil.copy(f, src / f"rep{rep}-{os.path.basename(f)}")

    def state_rows_after(make_query, ck, n_batches_min):
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = make_query(stream).option(
            "checkpointLocation", str(tmp_path / ck)
        ).trigger(availableNow=True).start()
        q.awaitTermination(300)
        totals = [
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in p["stateOperators"]
            if op["numRowsTotal"] > 0
        ]
        q.stop()
        assert len(totals) >= n_batches_min
        return totals

    buckets = 8
    totals_hh = state_rows_after(
        lambda s: running_heavy_hitters(s, "event_type", support=0.2)
        .writeStream.outputMode("update")
        .format("noop"),
        "ck_hh",
        5,
    )
    # O(buckets): one GroupState row per bucket, never per event/key
    assert max(totals_hh) <= buckets
    # ...and flat across the replay, not growing with input volume
    assert totals_hh[-1] <= max(totals_hh)

    totals_win = state_rows_after(
        lambda s: streaming_tumbling_counts(
            s.withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .writeStream.outputMode("update")
        .format("noop"),
        "ck_win",
        5,
    )
    # bound = windows covering the fixture's time range × per-window
    # key cardinality, measured from the batch twin — NOT a function
    # of replay volume
    batch_rows = REGISTRY["tumbling_hourly"].fn(spark, SF_DIR).count()
    assert max(totals_win) <= batch_rows * 1.1 + 8
    # second half of the replay covers the same time range: state must
    # have stopped growing by then (plateau, not a ramp)
    half = len(totals_win) // 2
    assert max(totals_win[:half]) == max(totals_win)
