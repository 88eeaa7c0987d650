"""Streaming profile maintenance: the state table built by the stream
(micro-batch partial states, idempotent per-batch overwrite) finalizes
to EXACTLY the one-shot batch profile of the same rows, regardless of
how the stream was micro-batched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.profiling import incremental
from danae_spark.streaming import profile_stream as ps


def test_streamed_profile_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    events = load_table(spark, sf_dir, "events")
    events.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ps.run_profile_stream(stream, "events", state_dir, ckpt)

    # multiple micro-batches actually happened (the merge is exercised)
    batch_parts = [d for d in os.listdir(state_dir) if d.startswith("batch_id=")]
    assert len(batch_parts) >= 2, batch_parts

    streamed = {
        r["column_name"]: r for r in ps.streamed_profile(spark, state_dir).collect()
    }
    one_shot = {
        r["column_name"]: r
        for r in incremental.finalize(
            incremental.merge_states(
                [incremental.partial_state(spark.read.parquet(src), "events")]
            )
        ).collect()
    }
    assert set(streamed) == set(one_shot) and len(one_shot) > 0
    for c in one_shot:
        for f in ("n", "n_null", "min_v", "max_v", "avg_v", "std_v"):
            assert streamed[c][f] == one_shot[c][f], (c, f)

    ext = {
        r["column_name"]: r
        for r in ps.streamed_profile(spark, state_dir, extended=True).collect()
    }
    assert set(ext) == set(one_shot)
    value = ext["value"]
    assert value["skewness"] is not None and value["kurtosis"] is not None


def test_streamed_signature_matches_one_shot_sample(spark, sf_dir, tmp_path):
    """With a row key, the stream also maintains the quantile sample;
    merged per-batch bottom-k samples equal the one-shot sample exactly
    (bottom-k of a union == bottom-k of the parts' bottom-ks), so the
    streamed signature is identical to the batch one."""
    src = str(tmp_path / "events_src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ps.run_profile_stream(
        stream, "events", state_dir, ckpt, quantile_key_cols=["event_id"], k=256
    )
    streamed = sorted(
        map(tuple, ps.streamed_signature(spark, state_dir, k=256).collect())
    )
    one = sorted(
        map(
            tuple,
            incremental.finalize_quantile_signature(
                incremental.quantile_sample_state(
                    spark.read.parquet(src), "events", ["event_id"], k=256
                )
            ).collect(),
        )
    )
    assert streamed == one and len(one) > 0


def test_compact_profile_state_is_lossless(spark, sf_dir, tmp_path):
    """Folding all batch partitions into the base partition leaves the
    finalized profile IDENTICAL (exact-decimal monoid state)."""
    src = str(tmp_path / "events_src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ps.run_profile_stream(stream, "events", state_dir, ckpt)

    before = sorted(map(tuple, ps.streamed_profile(spark, state_dir, extended=True).collect()))
    stats = ps.compact_profile_state(spark, state_dir)
    assert stats["folded"] >= 2
    parts = [d for d in os.listdir(state_dir) if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"], parts
    after = sorted(map(tuple, ps.streamed_profile(spark, state_dir, extended=True).collect()))
    assert before == after

    # a second compaction is a no-op
    assert ps.compact_profile_state(spark, state_dir)["folded"] == 0


def test_profile_stream_batch_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """A replayed micro-batch (at-least-once foreachBatch) must not
    double-count: the per-batch dynamic partition overwrite makes the
    state table idempotent by batch id."""
    state_dir = str(tmp_path / "state2")
    events = load_table(spark, sf_dir, "events").limit(100)

    def write(batch_id: int) -> None:
        (
            incremental.partial_state(events, "events")
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    write(0)
    write(0)  # replay of the same batch
    out = {
        r["column_name"]: r for r in ps.streamed_profile(spark, state_dir).collect()
    }
    assert out["value"]["n"] == 100


def test_streamed_heavy_hitters_bounds_hold(spark, sf_dir, tmp_path):
    """Stream the documents table through the MG heavy-hitter sink,
    then check the live view's guarantees against exact lake counts:
    presence of everything above the error bound and true counts
    inside [freq_low, freq_high]. State stays bounded per batch."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table, table_path
    from danae_spark.profiling.tfidf import tokenize
    from danae_spark.streaming.profile_stream import (
        heavy_hitter_sink,
        streamed_heavy_hitters,
    )

    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir.rstrip("/"))
    )
    state_dir = str(tmp_path / "hh_state")
    q = heavy_hitter_sink(
        stream, "documents", state_dir, str(tmp_path / "ckpt"),
        cols=["lang", "source"], k=16,
    ).start()
    q.awaitTermination()

    live = streamed_heavy_hitters(spark, state_dir, k=16, topk=5).collect()
    assert live, "no heavy hitters surfaced"
    from danae_spark.profiling.incremental import _HH_ERR_TERM, merge_heavy_hitters

    state = spark.read.parquet(state_dir).drop("batch_id")
    merged = merge_heavy_hitters([state], k=16).collect()
    err = {
        (r.table_name, r.column_name): r.cnt
        for r in merged
        if r.term == _HH_ERR_TERM
    }
    present = {
        (r.column_name, r.term) for r in merged if r.term != _HH_ERR_TERM
    }
    # exact truth per column from the batch table
    docs = load_table(spark, sf_dir, "documents")
    for col in ("lang", "source"):
        truth = {
            r.term: r.cnt
            for r in tokenize(
                docs.select(F.col(col).cast("string").alias("val")), "val"
            ).groupBy("term").agg(F.count("*").alias("cnt")).collect()
        }
        col_err = err.get(("documents", col), 0)
        # THE MG guarantee: anything above the error bound is present
        # (a near-uniform column like `source` may legitimately surface
        # nothing — no term exceeds the bound)
        for t, c in truth.items():
            if c > col_err:
                assert (col, t) in present, (col, t, c, col_err)
        for r in live:
            if r.column_name == col:
                assert r.freq_low <= truth[r.term] <= r.freq_high, dict(r.asDict())
    # lang has 3 values -> exact (no compression): present and collapsed
    lang_rows = [r for r in live if r.column_name == "lang"]
    assert lang_rows and all(r.freq_low == r.freq_high for r in lang_rows)
