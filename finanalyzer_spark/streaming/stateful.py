"""Custom stateful streaming operator — applyInPandasWithState.

The built-in windowed aggregations (streaming/events.py) cover the
reference's incremental semantics; this module shows the ESCAPE HATCH
for operators Spark lacks natively: an arbitrary per-key state machine
running inside Structured Streaming, Arrow-batched.

`running_user_totals` keeps (count, sum, last_ts) per user and emits the
updated totals every micro-batch — the online form of
`events.groupBy(user_id).agg(count, sum)`, but with user-defined state
you could extend to OHLC candle building, anomaly flags, or
session-carryover logic that `session_window` can't express.

Scale notes: state lives in the state store partitioned by key (one
shuffle on user_id); each executor holds only its keys' state. With a
timeout (GroupStateTimeout) idle keys evict — bounded state at any key
cardinality. Arrow batches keep the Python boundary vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) with explicit GroupState; emits the
    current totals for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_ALPHA = 0.3


def _update_ewma(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, ewma = state.get if state.exists else (0, None)
    # one group's micro-batch may arrive as several Arrow chunks with no
    # order guarantee across them — concatenate, then impose the
    # deterministic (ts, event_id) order before folding (state size is
    # one double; the transient buffer is one key's batch volume)
    batch = pd.concat(list(pdfs))
    batch = batch.sort_values(["ts", "event_id"])
    for x in batch["value"].to_list():
        ewma = x if ewma is None else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * ewma
        n += 1
    state.update((n, float(ewma)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ewma": [round(float(ewma), 9)]}
    )


def running_ewma(events: DataFrame) -> DataFrame:
    """Per-user RECURSIVE EWMA (e ← αx + (1−α)e) as a stateful
    streaming operator. The recursive form needs a sequential fold no
    window function expresses — exactly the escape-hatch case: state is
    one (n, ewma) pair per user, updated in event-time order within
    each micro-batch. The batch registry query `ewma_anomaly_flags`
    uses the finite-lag approximation because batch SQL has no
    sequential state; this operator is the exact online form."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — the successor stateful API (Spark 4):
# typed state handles (value/list/map state, timers, TTL) instead of a
# single state tuple. Same operator as running_user_totals, new API.
# --------------------------------------------------------------------------
try:  # the processor API needs pyspark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user (count, sum) in a ValueState handle."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            user_id = key[0]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """`transformWithStateInPandas` twin of running_user_totals.
        Requires the RocksDB state store provider (state lives off-heap,
        checkpointed incrementally — the 100 TB-state configuration)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    running_user_totals_tws = None  # type: ignore[assignment]
