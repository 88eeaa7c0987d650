"""Structured Streaming over the events stream.

The engine's streaming surface: file-source `readStream` → watermarked
event-time transformations → sink. Three operators:

- `windowed_counts`: tumbling-window aggregation per event_type with a
  late-data watermark — the canonical streaming rollup. Incremental
  state is bounded by (watermark horizon / window size) × #event_types.
- `sessionized`: native session windows (gap timeout) per user via
  `F.session_window` — Spark's built-in stateful session operator, which
  replaces the hand-rolled lag+cumsum batch pattern in streaming mode.
- `run_available_now`: drives any of the above to completion over the
  current file set (used by tests and backfills; the same query with a
  processing-time trigger is the production streaming deployment).

Batch/stream parity: `windowed_counts_batch` computes the identical
result with a batch read — its `queries()` entry gives the streaming
semantics oracle coverage (`stream_window_counts`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table, normalize_temporal, table_path
from danae_spark.functions.rounding import rnd


def events_schema(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(table_path(sf_dir, "events")).schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table; `ts` is normalized to
    session-timezone TIMESTAMP whichever physical type the generator
    wrote (nanos→bigint→µs, or naive-µs NTZ), matching the batch
    loader."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    schema = events_schema(spark, sf_dir)
    # the file source requires a directory: stream the sf dir with a glob
    # pinned to the events table file(s)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    return normalize_temporal(stream)


def windowed_counts(events: DataFrame, window: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), rnd(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), rnd(F.sum("value"), 4).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def attribution_join_stream(
    purchases: DataFrame, behavior: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's click/view events in the preceding hour (the streaming twin
    of the batch `range_join_events` attribution query).

    Both sides carry watermarks and the join condition bounds event time
    on both sides, so Spark can EXPIRE buffered state — the requirement
    for an unbounded stream-stream join to run with bounded memory."""
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    b = (
        behavior.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("event_id").alias("b_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("value").alias("b_value"),
        )
        .withWatermark("b_ts", watermark)
    )
    cond = (
        (p.p_user == b.b_user)
        & (b.b_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (b.b_ts < p.p_ts)
    )
    return p.join(b, cond, "inner").select(
        "purchase_id", "p_user", "b_id", "b_ts", "b_value"
    )


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop re-delivered events by event_id within
    the watermark horizon (`dropDuplicatesWithinWatermark` keeps dedup
    state bounded — old keys are evicted once the watermark passes, so
    state size tracks the event rate × horizon, not the full history; at
    100 TB/day this is the only dedup shape that survives). At-least-once
    sources (Kafka redeliveries, file re-lists) collapse to exactly-once
    semantics downstream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream over all currently-available files into an
    in-memory table; returns the result as a batch DataFrame."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# --------------------------------------------------- batch parity + oracle


def windowed_counts_batch(spark: SparkSession, sf_dir: str, window: str = "10 minutes") -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), rnd(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


WINDOWED_COUNTS_ORACLE = """
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           event_type,
           count(*) AS n_events,
           floor((sum(value)) * power(10, 4) + 0.5001) / power(10, 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """
