"""Incremental profiling: merged partial states == whole-table profile."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.profiling import incremental


def test_merge_of_slices_equals_whole(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    slice_a = li.filter(F.col("l_orderkey") % 3 == 0)
    slice_b = li.filter(F.col("l_orderkey") % 3 == 1)
    slice_c = li.filter(F.col("l_orderkey") % 3 == 2)

    merged = incremental.finalize(
        incremental.merge_states(
            [incremental.partial_state(s, "lineitem") for s in (slice_a, slice_b, slice_c)]
        )
    )
    whole = incremental.finalize(
        incremental.merge_states([incremental.partial_state(li, "lineitem")])
    )

    m = {r["column_name"]: r for r in merged.collect()}
    w = {r["column_name"]: r for r in whole.collect()}
    assert set(m) == set(w)
    for c in w:
        assert m[c]["n"] == w[c]["n"]
        assert m[c]["n_null"] == w[c]["n_null"]
        assert m[c]["min_v"] == w[c]["min_v"]
        assert m[c]["max_v"] == w[c]["max_v"]
        # decimal state: merge order can never change the result
        assert m[c]["avg_v"] == w[c]["avg_v"]
        assert m[c]["std_v"] == w[c]["std_v"]


def test_incremental_matches_profiler(spark, sf_dir):
    """finalize(partial) agrees with the one-shot profiler's stats."""
    from danae_spark.profiling import profiler

    li = load_table(spark, sf_dir, "lineitem")
    inc = {
        r["column_name"]: r
        for r in incremental.finalize(
            incremental.merge_states([incremental.partial_state(li, "lineitem")])
        ).collect()
    }
    prof = {
        r["column_name"]: r
        for r in profiler.profile_table_numeric(li, "lineitem").collect()
    }
    for c in prof:
        assert inc[c]["n"] == prof[c]["n"]
        # exact-decimal state reproduces the one-shot profiler bit-for-bit
        assert inc[c]["avg_v"] == prof[c]["avg_v"]
        assert inc[c]["std_v"] == prof[c]["std_v"]


def test_incremental_extended_matches_one_shot(spark, sf_dir):
    """finalize_extended over merged slices == numeric_profile_extended
    (identical formulas on identical exact moment sums — bit-for-bit)."""
    from danae_spark.profiling import profiler

    li = load_table(spark, sf_dir, "lineitem")
    slices = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    inc = {
        r["column_name"]: r
        for r in incremental.finalize_extended(
            incremental.merge_states(
                [incremental.partial_state(s, "lineitem") for s in slices]
            )
        ).collect()
    }
    one = {
        r["column_name"]: r
        for r in profiler.numeric_profile_extended(
            spark, sf_dir, tables=("lineitem",)
        ).collect()
    }
    assert set(inc) == set(one)
    for c in one:
        for f in ("n", "n_null", "missing_pct", "avg_v", "std_v", "cv",
                  "skewness", "kurtosis"):
            assert inc[c][f] == one[c][f], (c, f, inc[c][f], one[c][f])


def test_incremental_large_magnitude_refuses_std(spark):
    """Out-of-decimal-domain columns get NULL std (never a wrong one)."""
    import pandas as pd

    big = spark.createDataFrame(pd.DataFrame({"x": [1.5e12, 2.5e12, 9e12]}))
    out = incremental.finalize(
        incremental.merge_states([incremental.partial_state(big, "t")])
    ).collect()[0]
    assert out["std_v"] is None
    assert out["avg_v"] is not None


def test_incremental_extended_refuses_moments_out_of_domain(spark):
    import pandas as pd

    big = spark.createDataFrame(pd.DataFrame({"x": [1.5e12, 2.5e12, 9e12, 4e12]}))
    out = incremental.finalize_extended(
        incremental.merge_states([incremental.partial_state(big, "t")])
    ).collect()[0]
    assert out["skewness"] is None and out["kurtosis"] is None
    assert out["avg_v"] is not None and out["missing_pct"] == 0.0
