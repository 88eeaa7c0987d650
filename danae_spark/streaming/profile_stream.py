"""Streaming maintenance of the incremental profile.

The reference re-runs its whole per-dataset profiling pass on a polling
loop whenever data changes (`/root/reference/ingest/profiling/
profiler.py` — the `while cond:` Elasticsearch poll). The Spark-native
replacement is event-driven and O(new data): a Structured Streaming
query reduces each micro-batch to its MERGEABLE profile state
(profiling/incremental.py — a handful of exact-decimal aggregate rows
per column) and lands it in a parquet state table, partitioned by
batch id. The live profile at any moment is `merge + finalize` over
the accumulated state rows — schema-sized work, never a rescan of the
data.

Exactly-once without a transactional sink: each micro-batch writes via
dynamic partition overwrite of its own `batch_id=` partition, so a
replayed batch (foreachBatch is at-least-once on retry) overwrites its
previous attempt instead of double-counting — the state table is
idempotent per batch id.

At 100 TB: the per-batch state is tiny (columns × ~13 aggregates), the
merge aggregates (#batches × #columns) rows, and because every sum in
the state is exact decimal (associative), the streamed profile is
bit-identical to a one-shot batch profile of the same rows no matter
how the stream was micro-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.profiling import incremental


def quantile_state_dir(state_dir: str) -> str:
    """Sibling directory for the quantile-sample state (kept OUTSIDE
    `state_dir` — the moment state's recursive parquet read must not
    see the differently-schemed sample rows)."""
    return state_dir.rstrip("/") + "_quantiles"


def profile_state_sink(
    stream: DataFrame,
    table: str,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "profile_stream",
    quantile_key_cols: list[str] | None = None,
    k: int = 1024,
):
    """writeStream handle that maintains the profile state table for
    `stream`. Start with `.start()`; use `trigger(availableNow=True)`
    (set here) for drain-and-stop, or swap the trigger for a continuous
    deployment.

    With `quantile_key_cols` (a row key), each batch also lands its
    bottom-k-by-hash quantile sample in the sibling
    `quantile_state_dir(state_dir)` table, so the 7-point search-index
    signature is streamed too (`streamed_signature`)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        def _land(df: DataFrame, where: str) -> None:
            (
                df.withColumn("batch_id", F.lit(int(batch_id)))
                .coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(where)
            )

        _land(incremental.partial_state(batch_df, table), state_dir)
        if quantile_key_cols:
            _land(
                incremental.quantile_sample_state(
                    batch_df, table, quantile_key_cols, k=k
                ),
                quantile_state_dir(state_dir),
            )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def run_profile_stream(
    stream: DataFrame,
    table: str,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "profile_stream",
    quantile_key_cols: list[str] | None = None,
    k: int = 1024,
) -> None:
    """Drain all currently-available stream input into the state table."""
    q = profile_state_sink(
        stream, table, state_dir, checkpoint_dir, query_name,
        quantile_key_cols=quantile_key_cols, k=k,
    ).start()
    q.awaitTermination()


def streamed_profile(
    spark: SparkSession, state_dir: str, extended: bool = False
) -> DataFrame:
    """The live profile from the accumulated state table (merge +
    finalize; `extended=True` adds skewness/kurtosis/CV/missing-pct)."""
    state = spark.read.parquet(state_dir).drop("batch_id")
    merged = incremental.merge_states([state])
    if extended:
        return incremental.finalize_extended(merged)
    return incremental.finalize(merged)


def streamed_signature(
    spark: SparkSession, state_dir: str, k: int = 1024, rounding: int | None = 4
) -> DataFrame:
    """The live 7-point quantile signature from the accumulated sample
    state (requires the sink to have run with `quantile_key_cols`)."""
    state = spark.read.parquet(quantile_state_dir(state_dir)).drop("batch_id")
    merged = incremental.merge_quantile_samples([state], k=k)
    return incremental.finalize_quantile_signature(merged, rounding=rounding)


def compact_profile_state(spark: SparkSession, state_dir: str) -> dict:
    """Fold all accumulated per-batch state partitions into one BASE
    partition (`batch_id=-1`).

    A long-running stream appends one partition per micro-batch; after
    ~10⁵ batches the state read is dominated by file listing, not data.
    Because the state is an exact-decimal monoid, pre-merging batches
    is lossless: the folded base row set finalizes to the identical
    profile. New micro-batches keep landing in their own partitions
    (batch ids are non-negative, so the base never collides) and the
    next compaction folds them in. Safe with a concurrent stream: only
    partitions visible at read time are folded and then deleted."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(conf)
    seen = [
        s.getPath().getName()
        for s in fs.listStatus(root)
        if s.getPath().getName().startswith("batch_id=")
    ]
    if len(seen) <= 1:
        return {"folded": 0, "partitions_before": len(seen)}
    state = spark.read.parquet(
        *[f"{state_dir.rstrip('/')}/{p}" for p in seen]
    )
    merged = incremental.merge_states([state]).withColumn(
        "batch_id", F.lit(-1)
    )
    # write the new base under a batch id no stream will ever use,
    # then drop the folded partitions (base overwrite is last-wins)
    (
        merged.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
    for p in seen:
        if p != "batch_id=-1":
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir.rstrip('/')}/{p}"), True)
    return {"folded": len(seen), "partitions_before": len(seen)}


# ------------------- streamed heavy hitters (bounded term-frequency state)


def hh_state_dir(state_dir: str) -> str:
    """Sibling directory for the Misra-Gries heavy-hitter state (same
    isolation rule as the quantile samples)."""
    return state_dir.rstrip("/") + "_hh"


def heavy_hitter_sink(
    stream: DataFrame,
    table: str,
    state_dir: str,
    checkpoint_dir: str,
    cols: list[str] | None = None,
    k: int | None = None,
    query_name: str = "hh_stream",
):
    """writeStream handle maintaining a BOUNDED streamed frequent-term
    summary: each micro-batch lands its Misra-Gries k-counter state
    (≤ k+1 rows per column — the state table grows by a bounded
    increment per batch regardless of vocabulary) into its own
    batch_id partition via dynamic partition overwrite, replay-safe
    like the profile state. `streamed_heavy_hitters` merges and
    re-compresses for the live view."""
    from danae_spark.profiling.incremental import HH_K, heavy_hitter_state

    k = HH_K if k is None else k

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            heavy_hitter_state(batch_df, table, cols=cols, k=k)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def streamed_heavy_hitters(
    spark: SparkSession, state_dir: str, k: int | None = None, topk: int = 10
) -> DataFrame:
    """Live top-k frequent terms with [freq_low, freq_high] bounds from
    the accumulated per-batch MG states (merge = counter sums + one
    re-compression — schema-sized work, never a rescan)."""
    from danae_spark.profiling.incremental import (
        HH_K,
        finalize_heavy_hitters,
        merge_heavy_hitters,
    )

    k = HH_K if k is None else k
    state = spark.read.parquet(state_dir).drop("batch_id")
    return finalize_heavy_hitters(merge_heavy_hitters([state], k=k), k=topk)
