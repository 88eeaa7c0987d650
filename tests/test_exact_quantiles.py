"""Parity tests for the r18 distributed exact-quantile formulation.

`profiler._exact_quantile_signatures` replaces the serial
`F.percentile(v, SIGNATURE_PS)` aggregate with sort-based rank
selection (window idx/n + conditional aggregates + the interpolation
expression). These tests pin RAW (unrounded) value equality against
`F.percentile` itself — the reference implementation — over
duplicate-heavy, tiny-n, all-null, negative and irrational inputs, so
any drift in the interpolation arithmetic (position = p·(n−1), the
floor/ceil pick, the (hi−pos)·lo + (pos−lo)·hi combine, the equal-value
shortcut) fails loudly before the DuckDB oracle ever sees it.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from danae_spark.profiling.profiler import (
    SIGNATURE_NAMES,
    SIGNATURE_PS,
    _exact_quantile_signatures,
)


def _melt(spark, cols: dict[str, list[float | None]]):
    rows = []
    for name, values in cols.items():
        for v in values:
            rows.append(("t", name, v))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, v double"
    )


def _reference(spark, melted):
    q = F.percentile(F.col("v"), F.lit(list(SIGNATURE_PS)))
    return {
        (r["table_name"], r["column_name"]): [r["q"][i] if r["q"] is not None else None for i in range(len(SIGNATURE_PS))]
        for r in melted.groupBy("table_name", "column_name").agg(q.alias("q")).collect()
    }


def _mine(spark, melted):
    return {
        (r["table_name"], r["column_name"]): [r[n] for n in SIGNATURE_NAMES]
        for r in _exact_quantile_signatures(melted, rounding=None).collect()
    }


def _assert_bit_equal(got, want):
    assert set(got) == set(want)
    for key in want:
        for g, w, p in zip(got[key], want[key], SIGNATURE_PS):
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert g is None or math.isnan(g), (key, p, g, w)
            else:
                # bit-for-bit: the driver's value hash allows no ulp slack
                assert g == w and math.copysign(1, g) == math.copysign(1, w), (
                    key, p, g, w,
                )


CASES = {
    "single": [3.25],
    "two": [1.0, 2.0],
    "dups_all_equal": [7.5] * 9,
    "dups_boundary": [1.0, 1.0, 1.0, 2.0, 2.0, 5.0, 5.0, 5.0, 5.0, 9.0],
    "negatives": [-4.5, -1.25, 0.0, 3.5, -4.5, 0.0],
    "irrational": [math.pi, math.e, math.sqrt(2), 1 / 3, 2 / 3, math.pi / 7],
    "with_nulls": [None, 4.0, None, 1.0, 2.0, None],
    "all_null": [None, None, None],
    "tiny_gaps": [1.0, 1.0 + 2**-40, 1.0 + 2**-39, 1.0 + 2**-20],
}


def test_exact_quantiles_bit_parity_edge_cases(spark):
    melted = _melt(spark, CASES)
    _assert_bit_equal(_mine(spark, melted), _reference(spark, melted))


def test_exact_quantiles_bit_parity_pseudorandom(spark):
    # deterministic pseudo-random mixes: heavy duplication + long tails,
    # several n values that make p·(n−1) land on and between integers
    cols = {}
    for n in (1, 2, 3, 4, 5, 7, 16, 20, 21, 99, 100, 101, 1000):
        vals = []
        for i in range(n):
            h = (i * 2654435761) % 2**32
            # ~50% duplicates from a small value pool, rest spread wide
            if h % 2:
                vals.append(float(h % 7))
            else:
                vals.append((h / 2**32 - 0.5) * 1e6)
        cols[f"c{n}"] = vals
    melted = _melt(spark, cols)
    _assert_bit_equal(_mine(spark, melted), _reference(spark, melted))


def test_exact_quantiles_lake_parity(spark, sf_dir):
    """The registered profile_quantiles surface itself: new formulation
    == F.percentile over the real melted lake union, unrounded."""
    from danae_spark.profiling.profiler import (
        NUMERIC_PROFILE_TABLES,
        _melted_union,
    )

    melted = _melted_union(spark, sf_dir, NUMERIC_PROFILE_TABLES)
    _assert_bit_equal(_mine(spark, melted), _reference(spark, melted))
