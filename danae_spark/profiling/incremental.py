"""Incremental (mergeable) profiling.

At 100 TB you never re-profile the whole lake when a partition lands:
each partition contributes a PARTIAL state of algebraic aggregates
(n, n_null, sum, sum_sq, min, max — all commutative monoids), states
merge associatively, and final stats (mean, sample std) derive from the
merged state. This mirrors how Spark's own partial aggregation works,
lifted to a persistable table so refreshes are O(new data).

Sums accumulate in EXACT DECIMAL (rounding.dsum semantics): decimal
addition is associative and exact, so any slicing/merge order yields the
same state and finalize() reproduces the one-shot profiler BIT-FOR-BIT
— incremental refreshes can never drift from a full re-profile.

The reference re-runs its whole pandas-profiling pass per dataset on
every change (`ingest/profiling/profiler.py` polling loop); this module
is the incremental replacement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from danae_spark.functions.rounding import rnd
from danae_spark.profiling.types import NUMERIC, columns_of_class

STATE_COLS = ("n", "n_null", "s", "s2", "min_v", "max_v")


def partial_state(df: DataFrame, table: str) -> DataFrame:
    """Mergeable per-column state for one slice of a table."""
    cols = columns_of_class(df.schema, NUMERIC)
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.sum(col.cast("decimal(28,6)")).alias(f"{c}__s"),
            F.sum(col.cast("decimal(18,6)") * col.cast("decimal(18,6)")).alias(
                f"{c}__s2"
            ),
            F.min(col).alias(f"{c}__min_v"),
            F.max(col).alias(f"{c}__max_v"),
        ]
    one = df.agg(*aggs)
    groups = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{s}`" for s in STATE_COLS)
        )
        for c in cols
    )
    return one.select(
        F.expr(f"stack({len(cols)}, {groups}) AS (column_name, {', '.join(STATE_COLS)})")
    ).select(F.lit(table).alias("table_name"), "*")


def merge_states(states: list[DataFrame]) -> DataFrame:
    """Associative merge of partial states (union + re-aggregate)."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy("table_name", "column_name").agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive display stats from merged state (identical IEEE double ops
    to profiler._profile_melted, so outputs match it exactly)."""
    n = F.col("n")
    s, s2 = F.col("s").cast("double"), F.col("s2").cast("double")
    var = (s2 - s * s / n) / (n - 1)
    return state.select(
        "table_name",
        "column_name",
        "n",
        "n_null",
        "min_v",
        "max_v",
        rnd(s / n, 4).alias("avg_v"),
        rnd(F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("std_v"),
    ).orderBy("table_name", "column_name")
