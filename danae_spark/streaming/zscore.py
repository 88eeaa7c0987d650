"""Streaming twin of rolling_zscore_anomaly: event-time anomaly scoring
over an event STREAM, with exact batch parity.

The r7 overlapped-bucket batch rewrite (operators/temporal.py:159)
already proved the property a stream needs: a row's z-score depends
only on its group's rows in the PRECEDING `window_s` seconds. The sink
therefore carries exactly that much state between micro-batches — the
trailing `window_s` seconds of the stream (the "tail") — and scores
each batch by calling THE SAME batch operator on (tail ∪ batch).
Shared impl means parity is structural, not re-derived: the decimal
baseline sums, the round-before-threshold rule, and the
strictly-earlier frame are all literally the same code
(tests/test_streaming_zscore.py pins bit-exact equality against the
batch answer over a micro-batched replay of the events table — the
nb/dsir parity pattern).

Watermark semantics: a row whose event second precedes the previous
batches' high-water mark would score against a baseline that has
already been carried out of state, so the sink DROPS it — a
zero-delay watermark. (The batch operator is the backfill path for
late data, exactly as in the curation twins.) State is bounded by
`window_s` × arrival rate — never the stream history.

Exactly-once: both the emitted anomalies and the tail snapshots land
as `batch_id=`-partitioned parquet via dynamic partition overwrite
(the profile_stream pattern), and a replayed batch reloads the
LATEST snapshot with a batch_id strictly below its own — so
kill-and-replay recomputes from the same inputs and overwrites the
same partitions, byte-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.operators.temporal import (
    ZSCORE_MIN_BASELINE,
    ZSCORE_THRESHOLD,
    ZSCORE_WINDOW_S,
    rolling_zscore_anomaly,
)

_TAIL = "zscore_tail"
_OUT = "zscore_anomalies"


def _sec(ts_col: str):
    # identical epoch-second derivation to the batch operator
    return F.floor(F.col(ts_col).cast("double")).cast("long")


def _latest_snapshot_id(tail_root: str, below: int) -> int | None:
    if not os.path.isdir(tail_root):
        return None
    ids = []
    for name in os.listdir(tail_root):
        if name.startswith("batch_id="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    ids = [i for i in ids if i < below]
    return max(ids) if ids else None


def zscore_anomaly_sink(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    by: tuple[str, ...] = ("event_type",),
    id_col: str = "event_id",
    window_s: int = ZSCORE_WINDOW_S,
    min_baseline: int = ZSCORE_MIN_BASELINE,
    threshold: float = ZSCORE_THRESHOLD,
    query_name: str = "zscore_stream",
):
    """foreachBatch sink scoring each micro-batch with the shared batch
    operator over (carried tail ∪ batch). Anomalies land under
    `state_dir`/zscore_anomalies, tail snapshots under
    `state_dir`/zscore_tail, both batch_id-partitioned. Returns the
    writeStream handle (availableNow trigger set; call `.start()`)."""
    tail_root = os.path.join(state_dir, _TAIL)
    out_root = os.path.join(state_dir, _OUT)
    cols = [id_col, *by, ts_col, value_col]

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        prev = _latest_snapshot_id(tail_root, below=bid)
        batch = batch_df.select(*cols)
        if prev is not None:
            tail = spark.read.parquet(
                os.path.join(tail_root, f"batch_id={prev}")
            ).select(*cols)
            hwm = tail.agg(F.max(_sec(ts_col)).alias("m")).collect()[0].m
        else:
            tail = None
            hwm = None
        if hwm is not None:
            # zero-delay watermark: rows before the carried tail's
            # high-water mark have lost part of their baseline — drop
            batch = batch.filter(_sec(ts_col) >= F.lit(hwm))
        scope = tail.unionByName(batch) if tail is not None else batch
        scored = rolling_zscore_anomaly(
            scope,
            ts_col=ts_col,
            value_col=value_col,
            by=by,
            window_s=window_s,
            min_baseline=min_baseline,
            threshold=threshold,
            id_col=id_col,
        )
        # tail rows were scored (and emitted) by their own batch — emit
        # only this batch's rows
        emitted = scored.join(
            batch.select(id_col).distinct(), id_col, "semi"
        )
        (
            emitted.withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_root)
        )
        # next tail: trailing window_s seconds of everything seen
        new_max = scope.agg(F.max(_sec(ts_col)).alias("m")).collect()[0].m
        new_tail = (
            scope.filter(_sec(ts_col) > F.lit(new_max) - F.lit(window_s))
            if new_max is not None
            else scope
        )
        (
            new_tail.withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(tail_root)
        )

    return (
        events_stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def streamed_zscore_anomalies(spark: SparkSession, state_dir: str) -> DataFrame:
    """All anomalies the stream has emitted so far, batch-shaped (same
    columns and order as the batch operator)."""
    out = spark.read.parquet(os.path.join(state_dir, _OUT))
    return out.drop("batch_id").orderBy("event_id")
