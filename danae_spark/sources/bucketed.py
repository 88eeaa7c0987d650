"""Bucketed-table join co-location.

Pre-bucketing fact tables on their join key removes the per-query
shuffle: a `bucketBy(n, key).sortBy(key)` write hash-partitions files by
key, and a later join between tables bucketed the same way runs
exchange-free (Spark aligns bucket files directly). At 100 TB this turns
the biggest recurring cost — re-shuffling lineitem⋈orders for every
query — into a one-time write-side cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
