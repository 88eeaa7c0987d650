"""Streaming twin of rolling_zscore_anomaly (streaming/zscore.py):
bit-exact batch parity over a micro-batched replay of the events
table, bounded tail state, and the zero-delay-watermark late-drop."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.operators.temporal import rolling_zscore_anomaly
from danae_spark.streaming.zscore import (
    streamed_zscore_anomalies,
    zscore_anomaly_sink,
)

COLS = ["event_id", "event_type", "ts", "value"]


def _write_time_chunks(ev, src: str, n_chunks: int = 4) -> None:
    """Split at SECOND boundaries (the carried-tail contract: a second
    never straddles two micro-batches) and land the chunks in arrival
    order so maxFilesPerTrigger=1 replays them as separate batches."""
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    qs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = ev.select(
        F.percentile_approx(sec, qs, 10000).alias("q")
    ).collect()[0].q
    edges = [None, *bounds, None]
    for i in range(n_chunks):
        chunk = ev
        if edges[i] is not None:
            chunk = chunk.filter(sec >= edges[i])
        if edges[i + 1] is not None:
            chunk = chunk.filter(sec < edges[i + 1])
        chunk.coalesce(1).write.mode("append").parquet(src)


def _run_stream(spark, src: str, tmp_path, **sink_kwargs) -> str:
    state = str(tmp_path / "state")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = zscore_anomaly_sink(
        stream, state, str(tmp_path / "ckpt"), **sink_kwargs
    ).start()
    q.awaitTermination()
    return state


def test_zscore_stream_exact_parity_with_batch(spark, sf_dir, tmp_path):
    """The sink scores each micro-batch with the SHARED batch operator
    over (carried tail ∪ batch), so the concatenated anomalies must be
    bit-identical to one batch pass over the whole table — including
    the rounded zscore doubles (same decimal sums, same IEEE ops)."""
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    # sf0.001 spreads 1000 events over a month — a 7-day window with a
    # loosened threshold produces a non-trivial answer set (57 rows)
    kw = dict(window_s=7 * 86400, threshold=2.0, min_baseline=5)
    expected = [
        tuple(r) for r in rolling_zscore_anomaly(ev, **kw).collect()
    ]
    assert expected, "events table must produce anomalies for the test"

    src = str(tmp_path / "src")
    _write_time_chunks(ev, src, n_chunks=4)
    state = _run_stream(spark, src, tmp_path, **kw)

    # at least two batches actually emitted (the parity is cross-batch)
    out = spark.read.parquet(os.path.join(state, "zscore_anomalies"))
    assert out.select("batch_id").distinct().count() >= 2

    got = [
        tuple(r) for r in streamed_zscore_anomalies(spark, state).collect()
    ]
    assert got == expected


def test_zscore_stream_tail_state_is_bounded(spark, sf_dir, tmp_path):
    """Carried state never exceeds the trailing window_s seconds of the
    stream — the property that makes the sink run forever."""
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    src = str(tmp_path / "src")
    _write_time_chunks(ev, src, n_chunks=3)
    state = _run_stream(spark, src, tmp_path, window_s=7 * 86400)
    tail = spark.read.parquet(os.path.join(state, "zscore_tail"))
    last = tail.filter(
        F.col("batch_id") == tail.agg(F.max("batch_id")).collect()[0][0]
    )
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    lo, hi = last.agg(F.min(sec), F.max(sec)).collect()[0]
    assert hi - lo <= 7 * 86400


def test_zscore_stream_drops_late_rows(spark, tmp_path):
    """Zero-delay watermark: a row arriving after its second has been
    carried out of the high-water mark is dropped, and on-time rows
    keep scoring against the carried tail (batch-op backfill is the
    late-data path, as with the curation twins)."""
    base = 1_700_000_000
    on_time = [
        (i, "a", float(base + i * 10), 100.0 + (i % 3)) for i in range(40)
    ]
    # a spike late in the stream that the baseline flags
    on_time.append((90, "a", float(base + 400), 500.0))
    late = [(91, "a", float(base + 5), 400.0)]  # precedes batch-1 hwm

    def mk(rows):
        return spark.createDataFrame(
            [(i, t, ts, v) for (i, t, ts, v) in rows],
            "event_id long, event_type string, ts double, value double",
        )

    src = str(tmp_path / "src")
    mk(on_time).coalesce(1).write.mode("append").parquet(src)
    mk(late).coalesce(1).write.mode("append").parquet(src)
    state = _run_stream(spark, src, tmp_path, window_s=300, min_baseline=5)

    got = streamed_zscore_anomalies(spark, state).collect()
    ids = {r.event_id for r in got}
    assert 91 not in ids  # late row never scored
    # on-time expectation: the batch op over the on-time rows only
    expected = {
        r.event_id
        for r in rolling_zscore_anomaly(
            mk(on_time), window_s=300, min_baseline=5
        ).collect()
    }
    assert ids == expected
