"""B-block sanity: every registered relational query runs on sf0.001 and
returns a stable schema. Full value-level verification against DuckDB is in
tools/check_oracle.py (and the driver's correctness gate)."""

from __future__ import annotations

import pytest

from danae_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None


def test_q1_values(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    rows = {(r["l_returnflag"], r["l_linestatus"]): r for r in df.collect()}
    assert len(rows) >= 1
    for r in rows.values():
        assert r["count_order"] > 0
        assert r["sum_disc_price"] <= r["sum_base_price"]


def test_sessionize_monotonic(spark, sf_dir):
    df = REGISTRY["sessionize_events"].fn(spark, sf_dir)
    sample = df.filter("user_id = 0").collect()
    for r in sample:
        assert r["session_start_us"] <= r["session_end_us"]
        assert r["n_events"] >= 1
