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


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join drained with availableNow == the batch
    inner interval join over the same data."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table

    out = sev.attribution_join_stream(
        sev.read_events_stream(spark, sf_dir), sev.read_events_stream(spark, sf_dir)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_attr_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table("t_attr_join").collect()}

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    b = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    cond = (
        (p.p_user == b.b_user)
        & (b.b_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (b.b_ts < p.p_ts)
    )
    batch = {
        tuple(r)
        for r in p.join(b, cond, "inner")
        .select("purchase_id", "p_user", "b_id", "b_ts", "b_value")
        .collect()
    }
    assert len(batch) > 0
    # availableNow drains everything; watermark expiry can only drop
    # results for late data, and a single ordered drain has none
    assert streamed == batch
