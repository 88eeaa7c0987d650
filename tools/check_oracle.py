"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf_dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from danae_spark.catalog import TABLES, table_path  # noqa: E402
from danae_spark.queries import load_all  # noqa: E402
from danae_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    """STRICT canonicalization — mirrors the driver's exact value hash.

    Floats compare at FULL precision (repr), not %.9g: the driver hashes
    exact serialized values, so a last-ulp divergence that %.9g hides IS
    a driver failure (the r1 profile_numeric lesson). Timestamps compare
    via str(), which preserves sub-second digits — a ns-vs-µs read
    difference between engines shows up here instead of at the driver.
    """
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


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


# DuckDB output type → Spark dtypes it serializes identically to (via the
# driver's Arrow/pandas hash). Anything NOT in this map is only warned
# about; the _BANNED types are hard failures because Arrow converts them
# to float64/decimal128 and the driver's value hash diverges from Spark's
# BIGINT even when the values are equal (the r2 lesson: 5/50 hash fails,
# all un-CAST integer sum() → HUGEINT).
_INTS = {"tinyint", "smallint", "int", "bigint"}
_DUCK_TO_SPARK = {
    # any-width int ↔ any-width int: r2 evidence — spark int vs oracle
    # BIGINT passed the driver hash on 10+ queries (top_n_per_group etc.);
    # only INT128/DECIMAL diverge
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": {"double"},
    "FLOAT": {"float", "double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    # spark timestamp_ntz vs duckdb TIMESTAMP passed (q3_shipping_priority)
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
}
_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_errors(d_cols, d_types, spark_dtypes):
    """Return a list of per-column type problems for an oracle result.

    d_types: DuckDB relation .types (DuckDBPyType); spark_dtypes:
    df.dtypes pairs. HUGEINT/DECIMAL anywhere → error. A mapped DuckDB
    type whose Spark twin doesn't match → error (serialization mismatch).
    Unmapped types (arrays/structs) are left to the value compare.
    """
    errs = []
    sd = dict(spark_dtypes)
    for c, t in zip(d_cols, d_types):
        ts = str(t).upper()
        if any(b in ts for b in _BANNED):
            errs.append(f"{c}: oracle emits {ts} (Arrow hash hazard — CAST it)")
            continue
        allowed = _DUCK_TO_SPARK.get(ts.split("(")[0])
        spark_t = sd.get(c)
        if allowed is not None and spark_t is not None and spark_t not in allowed:
            errs.append(f"{c}: oracle {ts} vs spark {spark_t}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    registry = load_all()
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    failures = 0
    for name, qd in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(qd.oracle)
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue

        ok = True
        terrs = oracle_type_errors(d_cols, d_types, sdf.dtypes)
        if terrs:
            print(f"FAIL  {name}: oracle type mismatch: {terrs}")
            ok = False
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures += 1

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
