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


def test_hll_distinct_mergeable_and_accurate(spark, sf_dir):
    """Merged slice sketches estimate within a whisker of the one-shot
    sketch (the union re-encodes HLL_4 → HLL_8, so estimates can drift
    by ±1 — the registers themselves merge losslessly); the estimate
    tracks the exact distinct count within HLL error (lgK=12 → ~1.6% σ)."""
    li = load_table(spark, sf_dir, "lineitem")
    slices = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    merged = {
        r["column_name"]: r["n_distinct_approx"]
        for r in incremental.finalize(
            incremental.merge_states(
                [incremental.partial_state(s, "lineitem") for s in slices]
            )
        ).collect()
    }
    one = {
        r["column_name"]: r["n_distinct_approx"]
        for r in incremental.finalize(
            incremental.merge_states([incremental.partial_state(li, "lineitem")])
        ).collect()
    }
    assert set(merged) == set(one)
    for c in one:
        assert abs(merged[c] - one[c]) <= max(2, 0.005 * one[c]), (c, merged[c], one[c])
    exact = {
        c: li.select(F.count_distinct(c)).collect()[0][0]
        for c in ("l_quantity", "l_extendedprice", "l_orderkey")
    }
    for c, ex in exact.items():
        assert abs(merged[c] - ex) <= max(2, 0.05 * ex), (c, merged[c], ex)


def test_quantile_sample_exactly_mergeable(spark, sf_dir):
    """bottom-k-by-hash is EXACTLY mergeable: merged slice samples ==
    the one-shot sample, row for row (deterministic, no RNG)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    slices = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    merged = incremental.merge_quantile_samples(
        [incremental.quantile_sample_state(s, "lineitem", key, k=256) for s in slices],
        k=256,
    )
    one = incremental.quantile_sample_state(li, "lineitem", key, k=256)
    m = sorted(map(tuple, merged.collect()))
    o = sorted(map(tuple, one.collect()))
    assert m == o and len(o) > 0


def test_quantile_sample_signature_close_to_exact(spark, sf_dir):
    """Sample-estimated signature quantiles sit within ±3 rank points of
    the exact ones (k=1024 → ~1.5 pp standard rank error)."""
    from danae_spark.profiling.profiler import SIGNATURE_NAMES, SIGNATURE_PS

    li = load_table(spark, sf_dir, "lineitem")
    state = incremental.quantile_sample_state(
        li, "lineitem", ["l_orderkey", "l_linenumber"], k=1024
    )
    est = {
        r["column_name"]: r
        for r in incremental.finalize_quantile_signature(state, rounding=None).collect()
    }
    delta = 0.03
    lo_ps = [max(0.0, p - delta) for p in SIGNATURE_PS]
    hi_ps = [min(1.0, p + delta) for p in SIGNATURE_PS]
    from danae_spark.profiling.profiler import _melt_numeric

    bounds = (
        _melt_numeric(li, "lineitem")
        .groupBy("column_name")
        .agg(
            F.percentile("v", F.lit(lo_ps)).alias("lo"),
            F.percentile("v", F.lit(hi_ps)).alias("hi"),
        )
        .collect()
    )
    assert set(est) == {r["column_name"] for r in bounds}
    for r in bounds:
        e = est[r["column_name"]]
        for i, name in enumerate(SIGNATURE_NAMES):
            assert r["lo"][i] - 1e-9 <= e[name] <= r["hi"][i] + 1e-9, (
                r["column_name"], name, e[name], r["lo"][i], r["hi"][i],
            )


def test_term_counts_mergeable_match_one_shot_topk(spark, sf_dir):
    """Merged per-slice term counts finalize to EXACTLY the one-shot
    categorical_topk (same tokenization, counts are a sum monoid)."""
    from danae_spark.profiling import tfidf

    orders = load_table(spark, sf_dir, "orders")
    slices = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    merged = incremental.merge_term_counts(
        [
            incremental.term_count_state(s, "orders", cols=["o_orderpriority"])
            for s in slices
        ]
    )
    inc = [tuple(r) for r in incremental.finalize_topk_terms(merged, k=5).collect()]
    one = [
        tuple(r)
        for r in tfidf.categorical_topk(
            spark, sf_dir, cols=(("orders", "o_orderpriority"),), k=5
        ).collect()
    ]
    assert inc == one and len(one) > 0


def test_term_counts_min_count_bounds_loss(spark, sf_dir):
    """min_count > 1 only drops terms whose merged count is below
    (min_count-1) x n_slices + 1 — frequent terms are never lost."""
    orders = load_table(spark, sf_dir, "orders")
    slices = [orders.filter(F.col("o_orderkey") % 2 == i) for i in range(2)]
    exact = {
        (r["term"],): r["cnt"]
        for r in incremental.merge_term_counts(
            [
                incremental.term_count_state(s, "orders", cols=["o_orderpriority"])
                for s in slices
            ]
        ).collect()
    }
    lossy = {
        (r["term"],): r["cnt"]
        for r in incremental.merge_term_counts(
            [
                incremental.term_count_state(
                    s, "orders", cols=["o_orderpriority"], min_count=3
                )
                for s in slices
            ]
        ).collect()
    }
    bound = (3 - 1) * 2
    for t, cnt in exact.items():
        if cnt > bound:
            assert t in lossy and exact[t] - lossy[t] <= bound


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


def test_profile_drift_detects_shift_and_schema_change(spark):
    from danae_spark.profiling.incremental import partial_state, profile_drift

    base = spark.createDataFrame(
        [(float(i % 100), float(i % 10)) for i in range(1000)], "x double, y double"
    )
    # current: x shifted by +50 sigma-ish, y unchanged, z added
    cur = spark.createDataFrame(
        [(float(i % 100) + 2000.0, float(i % 10), 1.0) for i in range(1000)],
        "x double, y double, z double",
    )
    drift = profile_drift(partial_state(base, "t"), partial_state(cur, "t"))
    rows = {r.column_name: r for r in drift.collect()}
    assert rows["x"].drifted == 1 and rows["x"].mean_shift_sigma > 3
    assert rows["y"].drifted == 0 and rows["y"].presence == "both"
    assert rows["z"].presence == "added" and rows["z"].drifted == 1


def test_profile_drift_null_rate_and_identity(spark):
    from danae_spark.profiling.incremental import partial_state, profile_drift

    base = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    nully = spark.createDataFrame(
        [((float(i) if i % 2 else None),) for i in range(100)], "x double"
    )
    drift = {r.column_name: r for r in profile_drift(
        partial_state(base, "t"), partial_state(nully, "t")
    ).collect()}
    assert drift["x"].null_rate_delta > 0.4 and drift["x"].drifted == 1
    # identical states: nothing drifts
    same = {r.column_name: r for r in profile_drift(
        partial_state(base, "t"), partial_state(base, "t")
    ).collect()}
    assert same["x"].drifted == 0 and abs(same["x"].n_ratio - 1.0) < 1e-9


def test_heavy_hitters_misra_gries_bounds(spark):
    """Mergeable MG sketch: bounded state, guaranteed heavy hitters,
    and true counts inside [freq_low, freq_high] after merging slices."""
    import random

    from danae_spark.profiling.incremental import (
        _HH_ERR_TERM,
        finalize_heavy_hitters,
        heavy_hitter_state,
        merge_heavy_hitters,
    )

    rng = random.Random(7)
    # skewed vocabulary: a few heavy terms + a long tail
    terms = (
        ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 150
        + [f"tail{i}" for i in range(400) for _ in (0,)]
    )
    rng.shuffle(terms)
    true = {}
    for t in terms:
        true[t] = true.get(t, 0) + 1
    k = 16
    slices = [terms[i::4] for i in range(4)]
    states = [
        heavy_hitter_state(
            spark.createDataFrame([(t,) for t in sl], "val string"),
            "tbl", cols=["val"], k=k,
        )
        for sl in slices
    ]
    merged = merge_heavy_hitters(states, k=k)
    rows = merged.collect()
    data_rows = [r for r in rows if r.term != _HH_ERR_TERM]
    assert len(data_rows) <= k  # bounded state
    err = sum(r.cnt for r in rows if r.term == _HH_ERR_TERM)
    assert err > 0  # the tail forced compression

    final = {r.term: r for r in finalize_heavy_hitters(merged, k=5).collect()}
    # every term with true count > total error is guaranteed present
    for t, c in true.items():
        if c > err:
            assert t in {r.term for r in data_rows}, (t, c, err)
    # bounds hold for the reported terms
    for t, r in final.items():
        assert r.freq_low <= true[t] <= r.freq_high, (t, true[t], dict(r.asDict()))
    # the three planted heavies dominate the ranking
    assert {"alpha", "beta", "gamma"} <= set(final)


def test_heavy_hitters_exact_when_vocab_fits(spark):
    """≤ k distinct terms → no compression: counts are exact, error 0."""
    from danae_spark.profiling.incremental import (
        _HH_ERR_TERM,
        finalize_heavy_hitters,
        heavy_hitter_state,
        merge_heavy_hitters,
    )

    df1 = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "val string")
    df2 = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, "val string")
    merged = merge_heavy_hitters(
        [heavy_hitter_state(d, "t", cols=["val"], k=8) for d in (df1, df2)], k=8
    )
    final = {r.term: r for r in finalize_heavy_hitters(merged).collect()}
    assert final["x"].freq_low == final["x"].freq_high == 7
    assert final["y"].freq_low == 3 and final["z"].freq_low == 4
