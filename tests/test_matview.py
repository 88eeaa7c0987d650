"""Incremental materialized-view maintenance: the streamed Q1 fold is
bit-identical to the batch flagship query."""

from __future__ import annotations


def test_streamed_q1_matches_batch_exactly(spark, sf_dir, tmp_path):
    from danae_spark.queries import load_all
    from danae_spark.streaming.matview import (
        q1_state_sink,
        read_lineitem_stream,
        streamed_q1,
    )

    state = str(tmp_path / "q1_state")
    q = q1_state_sink(
        read_lineitem_stream(spark, sf_dir), state, str(tmp_path / "ckpt"), "t_q1_mv"
    ).start()
    q.awaitTermination()
    folded = [tuple(r) for r in streamed_q1(spark, state).collect()]
    batch = [
        tuple(r)
        for r in load_all()["q1_pricing_summary"].fn(spark, sf_dir).collect()
    ]
    assert folded == batch and len(batch) > 0


def test_streamed_q1_replay_idempotent(spark, sf_dir, tmp_path):
    from danae_spark.streaming.matview import (
        q1_state_sink,
        read_lineitem_stream,
        streamed_q1,
    )

    state = str(tmp_path / "q1_state")

    def drain(ckpt):
        q = q1_state_sink(
            read_lineitem_stream(spark, sf_dir), state, str(tmp_path / ckpt), "t_q1_mv2"
        ).start()
        q.awaitTermination()

    drain("c1")
    v1 = [tuple(r) for r in streamed_q1(spark, state).collect()]
    drain("c2")  # checkpoint loss → batch 0 re-delivered → overwritten
    v2 = [tuple(r) for r in streamed_q1(spark, state).collect()]
    assert v1 == v2
