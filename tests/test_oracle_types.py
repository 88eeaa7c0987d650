"""Sweep every registered oracle's DuckDB OUTPUT TYPES.

The r2 driver gate failed 5/50 queries on hash_match with identical
values: an un-CAST integer ``sum()`` makes DuckDB type the column
HUGEINT (INT128), and the driver's Arrow/pandas serialization hashes
HUGEINT differently from Spark's BIGINT (3 vs 3.0).  This test binds
every oracle as a DuckDB relation (bind-time typing, no execution for
most) and fails on any HUGEINT / UHUGEINT / DECIMAL output column, so
a future un-CAST ``sum(int)`` regression is caught in pytest instead
of by the external driver one round later.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.catalog import TABLES, table_path
from danae_spark.queries import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    return c


def _oracle_items():
    return sorted(
        (name, qd.oracle) for name, qd in load_all().items() if qd.oracle
    )


def test_gate_catches_uncast_int_sum(con):
    """Negative control: an un-CAST sum(int) MUST trip the gate."""
    rel = con.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert any(b in str(rel.types[0]).upper() for b in _BANNED)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    errs = mod.oracle_type_errors(rel.columns, rel.types, [("s", "bigint")])
    assert errs and "HUGEINT" in errs[0]
    # and the benign pairings driver-verified in r2 stay silent
    assert not mod.oracle_type_errors(["r"], ["BIGINT"], [("r", "int")])
    assert not mod.oracle_type_errors(["ts"], ["TIMESTAMP"], [("ts", "timestamp_ntz")])


@pytest.mark.parametrize("name,oracle", _oracle_items())
def test_oracle_output_types(con, name, oracle):
    rel = con.sql(oracle)
    bad = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in _BANNED)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-hash-hazard types {bad} — "
        "CAST integer sums to BIGINT / decimals to DOUBLE"
    )
