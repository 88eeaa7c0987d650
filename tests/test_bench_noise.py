"""The bench noise model (r9): per-query bands derived from the env
probe's dispatch-latency ratio vs the previous round's artifact, so a
round log only has to discuss queries that moved OUTSIDE host noise."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write_prev(tmp_path, queries, probe):
    rec = {
        "n": 1,
        "parsed": {
            "metric": "headline_query_total",
            "queries": queries,
            "env_probe": probe,
        },
    }
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(rec))


def test_identical_times_and_probe_are_within_band(tmp_path):
    q = {"a": 2.0, "b": 0.4}
    probe = {"jvm_job_ms": 80.0, "python_job_ms": 120.0}
    _write_prev(tmp_path, q, probe)
    nm = bench._noise_model(dict(q), probe, str(tmp_path))
    assert nm["ref"] == "BENCH_r01.json"
    assert nm["jvm_ratio"] == 1.0 and nm["python_ratio"] == 1.0
    assert nm["outliers"] == {}


def test_probe_drift_widens_band_and_absorbs_proportional_slowdown(tmp_path):
    # the r8 signature: probe 1.27-1.38x slower, untouched queries
    # scatter 1.2-1.5x — all inside hi = 1.38 * 1.2 = 1.66
    q = {"grouping_sets": 1.0, "q1": 2.0}
    _write_prev(tmp_path, q, {"jvm_job_ms": 73.8, "python_job_ms": 116.5})
    cur = {"grouping_sets": 1.48, "q1": 2.54}
    nm = bench._noise_model(cur, {"jvm_job_ms": 93.7, "python_job_ms": 160.9}, str(tmp_path))
    assert nm["factor_hi"] > 1.6
    assert nm["outliers"] == {}


def test_genuine_regression_is_flagged(tmp_path):
    q = {"big": 5.0, "small": 0.2}
    probe = {"jvm_job_ms": 80.0, "python_job_ms": 120.0}
    _write_prev(tmp_path, q, probe)
    cur = {"big": 10.0, "small": 0.25}  # 2x on big; small inside abs floor
    nm = bench._noise_model(cur, probe, str(tmp_path))
    assert set(nm["outliers"]) == {"big"}
    lo, hi = nm["outliers"]["big"]["band"]
    assert lo < 5.0 < hi < 10.0


def test_improvement_outside_band_is_flagged_too(tmp_path):
    q = {"lever": 4.0}
    probe = {"jvm_job_ms": 80.0, "python_job_ms": 120.0}
    _write_prev(tmp_path, q, probe)
    nm = bench._noise_model({"lever": 2.0}, probe, str(tmp_path))
    assert set(nm["outliers"]) == {"lever"}


def test_no_previous_artifact_returns_none(tmp_path):
    assert bench._noise_model({"a": 1.0}, {}, str(tmp_path)) is None


def test_cross_sf_artifact_is_not_a_reference(tmp_path):
    # an sf0.1 round artifact must not band an sf0.01 run (times are
    # not comparable across scale factors)
    rec = {"parsed": {"queries": {"a": 1.0}, "sf": 0.1,
                      "env_probe": {"jvm_job_ms": 80.0}}}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(rec))
    assert bench._noise_model({"a": 0.2}, {}, str(tmp_path), sf=0.01) is None
    assert bench._noise_model({"a": 1.0}, {"jvm_job_ms": 80.0},
                              str(tmp_path), sf=0.1) is not None


def test_unparsed_previous_round_is_skipped(tmp_path):
    # r6's artifact had parsed: null — the model must fall through to an
    # older parseable round rather than crash
    q = {"a": 1.0}
    probe = {"jvm_job_ms": 80.0, "python_job_ms": 120.0}
    _write_prev(tmp_path, q, probe)
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": None}))
    nm = bench._noise_model(dict(q), probe, str(tmp_path))
    assert nm is not None and nm["ref"] == "BENCH_r01.json"


def test_majority_outliers_mark_run_unusable(tmp_path):
    """When >40% of comparable entries leave the band, the run itself
    is the outlier (a VM burst the probe missed) — the model must say
    'unusable', not ship a trimmed outlier list (r15 verdict nit)."""
    import json

    import bench

    prev = {q: 1.0 for q in "abcdefghijkl"}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({
        "parsed": {"queries": prev, "sf": 0.1,
                   "env_probe": {"jvm_job_ms": 100.0, "python_job_ms": 100.0}},
    }))
    probe = {"jvm_job_ms": 100.0, "python_job_ms": 100.0}
    burst = {q: (5.0 if i % 2 == 0 else 1.0) for i, q in enumerate(prev)}
    nm = bench._noise_model(burst, probe, str(tmp_path), sf=0.1)
    assert nm["n_compared"] == 12 and len(nm["outliers"]) == 6
    assert nm["verdict"] == "unusable"
    calm = {q: 1.05 for q in prev}
    assert bench._noise_model(calm, probe, str(tmp_path), sf=0.1)["verdict"] == "ok"
