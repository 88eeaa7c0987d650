"""Format-dispatch reader: one entry point over the container formats a
lake actually holds (parquet / ORC / CSV / JSON-lines), picking the
reader from the path and routing CSV through the dialect sniffer.

Parquet and ORC are both native columnar sources (pushdown + pruning
apply identically); CSV goes through `csv_sniff.read_csv_sniffed` so
encoding/separator/header quirks are handled the same way the reference
ingests arbitrary uploads (filters.py:get_separator)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from danae_spark.catalog import normalize_temporal


def read_any(spark: SparkSession, path: str, **options) -> DataFrame:
    """Read a table by extension: .parquet, .orc, .csv(.gz), .json/.jsonl.
    Temporal columns are normalized exactly as `catalog.load_table` does,
    so downstream operators see one timestamp convention regardless of
    the container format."""
    lower = path.rstrip("/").lower()
    if lower.endswith((".csv", ".csv.gz")):
        from danae_spark.sources.csv_sniff import read_csv_sniffed

        return read_csv_sniffed(spark, path, **options)
    if lower.endswith((".json", ".jsonl")):
        reader = spark.read
        if "schema" in options:
            reader = reader.schema(options.pop("schema"))
        return normalize_temporal(reader.json(path, **options))
    if lower.endswith(".orc"):
        return normalize_temporal(spark.read.orc(path, **options))
    # default: parquet (files or directories)
    return normalize_temporal(spark.read.parquet(path, **options))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC publish twin of the parquet sink — same partitioned layout
    semantics apply via the caller's partitionBy on df.write."""
    df.write.mode(mode).orc(path)
