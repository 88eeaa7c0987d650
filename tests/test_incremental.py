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
