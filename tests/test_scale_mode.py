"""The exact=False profiling paths are the 100 TB mode (approx distinct,
approx percentiles, plain double sums). They must run on the same plans
and land near the exact answers — this is the switch the engine flips at
scale, so it gets its own regression coverage."""

from __future__ import annotations

import pytest

from danae_spark.catalog import load_table
from danae_spark.profiling import profiler


def test_approx_profile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["column_name"]: r
        for r in profiler.profile_table_numeric(li, "lineitem", exact=True).collect()
    }
    approx = {
        r["column_name"]: r
        for r in profiler.profile_table_numeric(li, "lineitem", exact=False).collect()
    }
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert a["n"] == e["n"] and a["min_v"] == e["min_v"] and a["max_v"] == e["max_v"]
        # approx_count_distinct: HLL++ default rsd 5%
        assert a["n_distinct"] == pytest.approx(e["n_distinct"], rel=0.15)
        assert a["avg_v"] == pytest.approx(e["avg_v"], rel=1e-6, abs=1e-3)
        assert a["std_v"] == pytest.approx(e["std_v"], rel=1e-6, abs=1e-3)


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    exact = {
        (r["table_name"], r["column_name"]): r
        for r in profiler.quantile_signatures(spark, sf_dir, exact=True).collect()
    }
    approx = {
        (r["table_name"], r["column_name"]): r
        for r in profiler.quantile_signatures(spark, sf_dir, exact=False).collect()
    }
    assert set(exact) == set(approx)
    # percentile_approx returns an ACTUAL data value (no interpolation),
    # so on discrete domains it may sit one value off the interpolated
    # exact percentile — accept anything inside the neighboring exact
    # percentile bracket; endpoints must match exactly.
    brackets = {
        "min_v": ("min_v", "min_v"),
        "p5": ("min_v", "p25"),
        "p25": ("p5", "p50"),
        "p50": ("p25", "p75"),
        "p75": ("p50", "p95"),
        "p95": ("p75", "max_v"),
        "max_v": ("max_v", "max_v"),
    }
    for k in exact:
        for name, (lo, hi) in brackets.items():
            ev, av = exact[k][name], approx[k][name]
            if ev is None:
                assert av is None
                continue
            assert exact[k][lo] - 1e-9 <= av <= exact[k][hi] + 1e-9, (k, name, ev, av)


def test_extended_profile_approx_mode_close_to_exact(spark, sf_dir):
    """exact=False (the 100 TB switch: plain double sums) stays within
    rounding distance of the exact-decimal extended profile."""
    from danae_spark.profiling import profiler

    exact = {
        (r.table_name, r.column_name): r
        for r in profiler.numeric_profile_extended(
            spark, sf_dir, tables=("lineitem",)
        ).collect()
    }
    approx = {
        (r.table_name, r.column_name): r
        for r in profiler.numeric_profile_extended(
            spark, sf_dir, tables=("lineitem",), exact=False
        ).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        for f in ("missing_pct", "avg_v", "std_v", "cv", "skewness", "kurtosis"):
            a, b = exact[k][f], approx[k][f]
            if a is None or b is None:
                assert a == b, (k, f)
            else:
                assert abs(a - b) <= 2e-4 * max(1.0, abs(a)), (k, f, a, b)
