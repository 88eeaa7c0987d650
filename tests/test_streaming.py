"""Structured Streaming operators: drain the events file-stream with an
availableNow trigger and check parity with the batch computation."""

from __future__ import annotations

import pytest

from danae_spark.streaming import events as sev


@pytest.fixture(scope="module")
def stream_df(spark, sf_dir):
    return sev.read_events_stream(spark, sf_dir)


def test_windowed_counts_stream_matches_batch(spark, sf_dir, stream_df):
    streamed = sev.run_available_now(
        sev.windowed_counts(stream_df), "t_windowed_counts"
    )
    batch = sev.windowed_counts_batch(spark, sf_dir)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_sessionized_stream_runs(spark, sf_dir, stream_df):
    result = sev.run_available_now(sev.sessionized(stream_df), "t_sessionized")
    rows = result.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1


def test_session_totals_match_batch_events(spark, sf_dir, stream_df):
    result = sev.run_available_now(sev.sessionized(stream_df), "t_session_totals")
    from danae_spark.catalog import load_table

    n_events_total = load_table(spark, sf_dir, "events").count()
    assert result.agg({"n_events": "sum"}).collect()[0][0] == n_events_total


def test_deduped_stream_collapses_redelivery(spark, sf_dir):
    """At-least-once delivery simulated by unioning the file stream with
    itself: dropDuplicatesWithinWatermark must collapse the doubled
    stream back to the batch row count."""
    from danae_spark.catalog import load_table

    a = sev.read_events_stream(spark, sf_dir)
    b = sev.read_events_stream(spark, sf_dir)
    doubled = a.unionByName(b)
    out = sev.deduped_stream(doubled)
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.table("t_dedup_stream").count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n_stream == n_batch
