"""Generic temporal operators (operators/temporal.py) on synthetic
frames — edge semantics the events-table oracle queries can't pin
down. The events/orders paths are covered by the driver oracle gate
(sessionize_events / asof_join_events / range_join_events delegate
here)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from danae_spark.operators import temporal


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "a", "b"], "t": [5, 10, 20, 5], "lid": [1, 2, 3, 4]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "a", "b"], "t": [4, 10, 15, 9], "price": [1.0, 2.0, 3.0, 9.0]}
        )
    )
    out = {
        r["lid"]: r["asof_price"]
        for r in temporal.asof_join(
            left, right, on="t", by=["k"], values=["price"]
        ).collect()
    }
    assert out[1] == 1.0      # t=5 sees right t=4
    assert out[2] == 2.0      # tie at t=10 is inclusive
    assert out[3] == 3.0      # t=20 sees latest right t=15
    assert out[4] is None     # b@5: no right row at-or-before


def test_asof_join_tie_among_right_rows(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [10], "lid": [1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [10, 10], "v": [7, 3], "ordc": [1, 2]})
    )
    (row,) = temporal.asof_join(
        left, right, on="t", by=["k"], values=["v"], right_order=["ordc"]
    ).collect()
    assert row["asof_v"] == 3  # last by right_order wins


def test_asof_join_name_clash_raises(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [1], "v": [1]}))
    try:
        temporal.asof_join(df, df, on="t", by=["k"], values=["v"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_range_join_window_bounds(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [100], "lid": [1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 4, "rt": [89, 90, 99, 100], "rid": [1, 2, 3, 4]})
    )
    out = (
        temporal.range_join(
            left, right, by=[("k", "k")], on=("t", "rt"),
            lower=F.lit(-10), upper=F.lit(0),
        )
        .select("rid")
        .collect()
    )
    got = sorted(r["rid"] for r in out)
    # [t-10, t) → 90 and 99 in; 89 below; 100 excluded (strict upper)
    assert got == [2, 3]


def test_sessionize_numeric_ts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"] * 4 + ["b"], "t": [0, 10, 1000, 1005, 0], "i": [1, 2, 3, 4, 5]}
        )
    )
    out = {
        r["i"]: r["session_seq"]
        for r in temporal.sessionize(df, "t", ["k"], gap_us=100, tiebreak=["i"]).collect()
    }
    assert out[1] == 1 and out[2] == 1    # gap 10 ≤ 100
    assert out[3] == 2 and out[4] == 2    # gap 990 > 100 → new session
    assert out[5] == 1                    # independent key


def test_rolling_zscore_flags_planted_anomaly(spark):
    """A flat baseline with one spike: exactly the spike is flagged,
    and early rows (thin baseline) are never scored."""
    import datetime

    from pyspark.sql import functions as F

    from danae_spark.operators.temporal import rolling_zscore_anomaly

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # 20 calm events 10s apart, values 10±1 (nonzero variance)
    for i in range(20):
        rows.append((i, t0 + datetime.timedelta(seconds=10 * i), "a",
                     10.0 + (i % 3 - 1)))
    # the spike
    rows.append((100, t0 + datetime.timedelta(seconds=210), "a", 1000.0))
    # a second group with too few events to ever score
    rows.append((200, t0, "b", 5.0))
    rows.append((201, t0 + datetime.timedelta(seconds=5), "b", 9999.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_anomaly(df).collect()
    assert [r.event_id for r in out] == [100]
    assert out[0].zscore > 3 and out[0].n_baseline >= 5

    # lowering the threshold must never flag the thin-baseline group
    out2 = rolling_zscore_anomaly(df, threshold=0.1).collect()
    assert all(r.event_type == "a" for r in out2)


def test_rolling_zscore_threshold_uses_rounded_z(spark):
    """A z landing in [threshold−0.00005, threshold) must be flagged,
    because the oracle filters the 4dp-ROUNDED zscore (review finding:
    filtering the raw z dropped such rows on the Spark side only)."""
    import datetime

    from danae_spark.operators.temporal import rolling_zscore_anomaly

    t0 = datetime.datetime(2024, 1, 1)
    # baseline alternating 0/2 -> mean 1, population std 1;
    # spike value v gives z = v - 1
    rows = [
        (i, t0 + datetime.timedelta(seconds=10 * i), "a", float(i % 2 * 2))
        for i in range(10)
    ]
    rows.append((100, t0 + datetime.timedelta(seconds=100), "a", 1 + 2.99997))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_anomaly(df).collect()
    assert [r.event_id for r in out] == [100]
    assert out[0].zscore == 3.0


def test_rolling_zscore_custom_id_col(spark):
    """id_col parameterizes the output/ordering column (advisor finding:
    'event_id' was hardcoded despite the otherwise generic API)."""
    import datetime

    from danae_spark.operators.temporal import rolling_zscore_anomaly

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0 + datetime.timedelta(seconds=10 * i), "a",
             10.0 + (i % 3 - 1)) for i in range(20)]
    rows.append((100, t0 + datetime.timedelta(seconds=210), "a", 1000.0))
    df = spark.createDataFrame(
        rows, "row_key long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_anomaly(df, id_col="row_key").collect()
    assert [r.row_key for r in out] == [100]


def test_rolling_zscore_bucketed_equals_global(spark):
    """The overlapped-bucket plan must be EXACTLY the global-window
    answer, including spikes whose entire baseline lies in the previous
    bucket (the context-copy path) — here bucket_s is tiny (200 s for a
    100 s window) so the planted data crosses many boundaries."""
    import datetime

    from danae_spark.operators.temporal import rolling_zscore_anomaly

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 200 events 10 s apart: crosses a 200 s bucket every 20 rows
    for i in range(200):
        rows.append((i, t0 + datetime.timedelta(seconds=10 * i), "a",
                     10.0 + (i % 5 - 2)))
    # spikes at positions chosen to sit right AFTER bucket boundaries
    # (lookback fully in the previous bucket) and mid-bucket
    rows.append((1000, t0 + datetime.timedelta(seconds=2001), "a", 500.0))
    rows.append((1001, t0 + datetime.timedelta(seconds=1105), "a", 500.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    glob = rolling_zscore_anomaly(df, window_s=100, bucket_s=None).collect()
    buck = rolling_zscore_anomaly(df, window_s=100, bucket_s=200).collect()
    assert [tuple(r) for r in glob] == [tuple(r) for r in buck]
    assert {r.event_id for r in glob} == {1000, 1001}
    # n_baseline must match exactly too (the context rows count)
    assert all(g.n_baseline == b.n_baseline for g, b in zip(glob, buck))


def test_rolling_zscore_bucket_must_exceed_window(spark):
    import datetime

    import pytest as _pytest

    from danae_spark.operators.temporal import rolling_zscore_anomaly

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), "a", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    with _pytest.raises(ValueError):
        rolling_zscore_anomaly(df, window_s=100, bucket_s=50)
