"""Custom stateful streaming operator: gap-timeout sessionization via
`applyInPandasWithState`.

Where `F.session_window` (streaming/events.py) covers the built-in
session shape, this operator is the template for session state Spark
can't express declaratively (per-session custom accumulators, emit-on-
close semantics). State per user is one open session (start, end,
count, value sum); arriving batches extend it or close it (emitting the
closed session downstream) when the gap timeout is exceeded; event-time
timeouts flush idle users' sessions.

Scale: state is partitioned by user_id (high cardinality → even spread);
per-key state is O(1) — the operator never buffers raw events.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, end_us, n_events, value_sum = state.get
    else:
        start_us = end_us = None
        n_events, value_sum = 0, 0.0

    closed: list[tuple] = []

    if state.hasTimedOut:
        if start_us is not None:
            closed.append((user_id, start_us, end_us, n_events, value_sum))
        state.remove()
    else:
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(ts.value // 1000)  # pandas ns -> µs
            if start_us is None:
                start_us, end_us, n_events, value_sum = ts_us, ts_us, 1, float(value)
            elif ts_us - end_us > GAP_SECONDS * 1_000_000:
                closed.append((user_id, start_us, end_us, n_events, value_sum))
                start_us, end_us, n_events, value_sum = ts_us, ts_us, 1, float(value)
            else:
                end_us = max(end_us, ts_us)
                n_events += 1
                value_sum += float(value)
        state.update((start_us, end_us, n_events, value_sum))
        state.setTimeoutTimestamp(end_us // 1000 + GAP_SECONDS * 1000)

    if closed:
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "session_value"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        out["session_value"] = out["session_value"].round(4)
        yield out


def sessionize_stateful(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Emit closed sessions as an append stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
