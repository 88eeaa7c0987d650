"""Strict Spark-vs-DuckDB verification of the extra TPC-H analogues
(danae_spark/queries/relational_extra.py) — same comparison semantics as
tools/check_oracle.py (full-precision floats, column-sorted,
order-insensitive rows)."""

from __future__ import annotations

import math

import duckdb
import pytest

from danae_spark.catalog import TABLES, table_path
from danae_spark.queries.relational_extra import EXTRA_QUERIES


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_tpch_matches_oracle(spark, sf_dir, duck, name):
    df, oracle = EXTRA_QUERIES[name](spark, sf_dir)
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _canon(s_rows, s_cols) == _canon(d_rows, d_cols)
    assert len(s_rows) > 0


def test_registry_delegates_in_sync(spark, sf_dir):
    """The driver registry carries each extra query at a post-50 position
    with EXACTLY the oracle SQL the underlying fn returns (drift here
    would silently decouple the gate from the tested query)."""
    from danae_spark.queries import load_all
    from danae_spark.queries.relational_extra import EXTRA_ORACLES

    registry = load_all()
    names = list(registry)
    for name in EXTRA_QUERIES:
        assert name in registry
        assert names.index(name) >= 50
        _, oracle = EXTRA_QUERIES[name](spark, sf_dir)
        assert registry[name].oracle == oracle == EXTRA_ORACLES[name]
