"""Incremental materialized-view maintenance for relational aggregates.

The flagship TPC-H Q1 pricing summary maintained under APPENDS: each
micro-batch of new lineitem rows lands its per-group partial state —
counts plus the same exact decimal(28,6) sums the batch query
accumulates (rounding.dsum) — as a batch_id-partitioned parquet table
(dynamic partition overwrite, the exactly-once profile_stream pattern).
Decimal addition is associative, so folding the per-batch partials
yields BIT-IDENTICAL results to running the batch query over all data —
no matter how ingestion was micro-batched, and replays are idempotent.

This is the materialized-view story for the relational block: a 100 TB
fact table appends hourly; the summary refreshes in O(new rows) with
exact parity to a full recompute (pytest-enforced against the
registered q1_pricing_summary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import normalize_temporal, table_path
from danae_spark.functions.rounding import DSCALE, rnd

_Q1_CUTOFF = "1998-09-02"


def read_lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream pinned to the lineitem table, with the same
    temporal normalization the batch loader applies."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    schema = spark.read.parquet(table_path(sf_dir, "lineitem")).schema
    return normalize_temporal(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def _q1_partial(batch_df: DataFrame) -> DataFrame:
    """Per-group mergeable partial state for Q1: count + the exact
    decimal sums rounding.dsum would accumulate (kept AS DECIMAL so the
    fold stays exact)."""
    dec = f"decimal(28,{DSCALE})"
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        batch_df.filter(
            F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("l_quantity").cast(dec)).alias("s_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).alias("s_price"),
            F.sum(disc_price.cast(dec)).alias("s_disc_price"),
            F.sum((disc_price * (1 + F.col("l_tax"))).cast(dec)).alias("s_charge"),
            F.sum(F.col("l_discount").cast(dec)).alias("s_disc"),
        )
    )


def q1_state_sink(
    lineitem_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "q1_matview",
):
    """Land each micro-batch's Q1 partial state exactly-once (dynamic
    partition overwrite by batch_id). Returns the writeStream handle
    (availableNow trigger set; call `.start()`)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            _q1_partial(batch_df)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return (
        lineitem_stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def streamed_q1(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the landed partials into the live Q1 summary — bit-identical
    to the batch `q1_pricing_summary` (decimal sums merge exactly; the
    final cast/round/divide are single IEEE ops on identical inputs).
    State is group-count-sized; the refresh never rescans the fact."""
    state = spark.read.parquet(state_dir)
    merged = state.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("n").alias("n"),
        F.sum("s_qty").alias("s_qty"),
        F.sum("s_price").alias("s_price"),
        F.sum("s_disc_price").alias("s_disc_price"),
        F.sum("s_charge").alias("s_charge"),
        F.sum("s_disc").alias("s_disc"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        rnd(dbl("s_qty"), 2).alias("sum_qty"),
        rnd(dbl("s_price"), 2).alias("sum_base_price"),
        rnd(dbl("s_disc_price"), 2).alias("sum_disc_price"),
        rnd(dbl("s_charge"), 2).alias("sum_charge"),
        rnd(dbl("s_qty") / F.col("n"), 4).alias("avg_qty"),
        rnd(dbl("s_price") / F.col("n"), 4).alias("avg_price"),
        rnd(dbl("s_disc") / F.col("n"), 4).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")
