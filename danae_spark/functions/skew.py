"""Skew-handling helpers.

AQE's skew-join splitting covers joins; these helpers cover skewed
AGGREGATIONS, where one hot key (a stop-shingle, a bot user_id) funnels
into a single reducer. `salted_agg` runs the classic two-phase plan:
salt the key (fanning the hot key over `buckets` reducers), partially
aggregate per (key, salt), then combine partials — identical results,
bounded per-task input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from a hash of the whole row's
    monotonically increasing id — uniform, no RNG state."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys+salt) -> partial_aggs, then
    groupBy(keys) -> final_aggs over the partials.

    `partial_aggs` must alias columns that `final_aggs` re-aggregate,
    e.g. partial `F.count('*').alias('cnt')` + final
    `F.sum('cnt').alias('cnt')`.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
