"""Custom stateful sessionizer (applyInPandasWithState): sessions closed
within the batch must match the batch sessionization, excluding each
user's final (still-open) session."""

from __future__ import annotations

from danae_spark.queries import load_all
from danae_spark.streaming import events as sev
from danae_spark.streaming.stateful import sessionize_stateful


def test_stateful_sessions_match_batch(spark, sf_dir):
    stream = sev.read_events_stream(spark, sf_dir)
    out = sessionize_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t_stateful_sessions").collect()
    }

    import datetime

    # batch sessionize now emits epoch-microsecond longs (hash-stable
    # driver contract); convert back to naive-UTC datetimes to compare
    # with the stateful sessionizer's timestamps
    epoch = datetime.datetime(1970, 1, 1)

    def to_dt(us):
        return epoch + datetime.timedelta(microseconds=us)

    batch = load_all()["sessionize_events"].fn(spark, sf_dir)
    rows = batch.collect()
    last_seq = {}
    max_ts = None
    for r in rows:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
        end_dt = to_dt(r["session_end_us"])
        if max_ts is None or end_dt > max_ts:
            max_ts = end_dt

    watermark = max_ts - datetime.timedelta(hours=1)
    gap = datetime.timedelta(minutes=30)
    margin = datetime.timedelta(seconds=2)

    def key(r):
        return (
            r["user_id"],
            to_dt(r["session_start_us"]),
            to_dt(r["session_end_us"]),
            r["n_events"],
        )

    # a session is emitted if a successor closed it (non-last) or its
    # event-time timeout (end+gap) passed the final watermark
    must_emit = {
        key(r)
        for r in rows
        if r["session_seq"] != last_seq[r["user_id"]]
        or to_dt(r["session_end_us"]) + gap < watermark - margin
    }
    may_emit = {
        key(r)
        for r in rows
        if r["session_seq"] != last_seq[r["user_id"]]
        or to_dt(r["session_end_us"]) + gap <= watermark + margin
    }
    assert must_emit <= emitted <= may_emit
    assert len(emitted) > 0
