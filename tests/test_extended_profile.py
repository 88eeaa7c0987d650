"""numeric_profile_extended: strict DuckDB parity (the pytest-oracle gate
for this post-window operator) plus definition checks against numpy's
sample skewness/kurtosis on a hand-computable column.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from danae_spark.catalog import TABLES, table_path
from danae_spark.profiling import profiler


def _norm(v):
    if v is None:
        return "NULL"
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


def test_extended_profile_matches_oracle(spark, sf_dir):
    df = profiler.numeric_profile_extended(spark, sf_dir)
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    rel = con.sql(profiler.extended_profile_oracle())
    assert not any(
        b in str(t).upper() for t in rel.types for b in ("HUGEINT", "DECIMAL")
    )
    d_cols, d_rows = list(rel.columns), rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _canon(s_rows, s_cols) == _canon(d_rows, d_cols)


def test_moment_definitions_match_pandas(spark):
    """Sample skewness / excess kurtosis / cv / missing_pct agree with the
    pandas definitions the reference's pandas-profiling emits."""
    import pandas as pd

    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 11.0, 13.0, None]
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf)
    melted = profiler._melt_numeric(sdf, "t")

    from pyspark.sql import functions as F

    from danae_spark.functions.rounding import dmoment_sum, rnd

    v = F.col("v")
    n = F.count(v)
    nd = n.cast("double")
    s1, s2, s3, s4 = (dmoment_sum(v, p) for p in (1, 2, 3, 4))
    mean = s1 / nd
    m2 = s2 / nd - mean * mean
    m3 = s3 / nd - F.lit(3.0) * mean * (s2 / nd) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / nd
        - F.lit(4.0) * mean * (s3 / nd)
        + F.lit(6.0) * mean * mean * (s2 / nd)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    skew = (m3 / (F.sqrt(m2) * m2)) * F.sqrt(nd * (nd - F.lit(1.0))) / (nd - F.lit(2.0))
    kurt = (
        ((nd + F.lit(1.0)) * (m4 / (m2 * m2) - F.lit(3.0)) + F.lit(6.0))
        * (nd - F.lit(1.0))
        / ((nd - F.lit(2.0)) * (nd - F.lit(3.0)))
    )
    row = melted.agg(rnd(skew, 4).alias("s"), rnd(kurt, 4).alias("k")).first()
    s = pd.Series([x for x in vals if x is not None])
    assert row.s == pytest.approx(float(s.skew()), abs=2e-4)
    assert row.k == pytest.approx(float(s.kurt()), abs=2e-4)


def test_dstd_guard_large_magnitude(spark):
    """ADVICE r2 (medium): dsumsq's decimal(18,6) cast silently NULLs
    |v| >= 1e12 with ANSI off, so dstd used to return a wrong (not NULL)
    stddev for epoch-micros-scale columns. It now falls back to the
    double stddev for out-of-range columns."""
    import pandas as pd

    from pyspark.sql import functions as F

    from danae_spark.functions.rounding import dstd

    vals = [1.5e12, 2.5e12, 3.5e12, 9.0e12]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    got = sdf.agg(dstd(F.col("x")).alias("s")).first().s
    assert got == pytest.approx(float(np.std(vals, ddof=1)), rel=1e-9)
    # in-range columns keep the exact decimal path (unchanged values)
    small = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 4.0]}))
    got2 = small.agg(dstd(F.col("x")).alias("s")).first().s
    assert got2 == pytest.approx(float(np.std([1, 2, 4], ddof=1)), rel=1e-12)
