"""Determinism of the exact-decimal aggregate helpers: the rounded
result must be IDENTICAL regardless of partitioning/summation order —
the property the driver's value hash depends on (r1's profile_numeric
flaked exactly here with plain double sums)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from danae_spark.functions.rounding import davg, dstd, dsum, rnd


def _stats(df):
    row = df.agg(
        rnd(dsum("v"), 4).alias("s"),
        rnd(davg("v"), 4).alias("a"),
        rnd(dstd("v"), 4).alias("d"),
    ).collect()[0]
    return (row.s, row.a, row.d)


def test_decimal_aggregates_partition_invariant(spark):
    rng = random.Random(7)
    # adversarial values: many 2-decimal "money" values whose exact sum
    # lands on rounding half-ties, plus magnitude spread
    vals = [round(rng.uniform(-1000, 1000), 2) for _ in range(20000)]
    vals += [0.005, 123.4565, -7.0005] * 50
    base = spark.createDataFrame([(v,) for v in vals], "v double")
    expected = _stats(base.repartition(1))
    for parts in (2, 7, 32):
        shuffled = base.repartition(parts, F.rand(seed=parts))
        assert _stats(shuffled) == expected, parts


def test_rnd_half_ties_round_up(spark):
    df = spark.createDataFrame([(0.125,), (0.135,), (2.005,)], "v double")
    out = [r.r for r in df.select(rnd("v", 2).alias("r")).collect()]
    assert out == [0.13, 0.14, 2.01]
