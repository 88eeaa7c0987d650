"""JSON-lines catalog store.

Reference parity: the reference keeps catalog entries as Elasticsearch
documents (`ingest/publishing/publishing_api.py` posts dataset metadata
docs; workers poll them). Spark-first: entries are a schema'd JSON-lines
dataset — appendable, splittable, readable by `spark.read.json` with an
EXPLICIT schema (never schema inference in production: inference costs a
full extra pass and can silently widen types between runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("num_columns", T.IntegerType()),
        T.StructField("num_keywords", T.IntegerType()),
        T.StructField("profile_status", T.StringType()),
    ]
)


def write_catalog_entries(
    spark: SparkSession, entries: list[dict], path: str, mode: str = "overwrite"
) -> None:
    """Persist publish_dataset() entries as JSON lines."""
    rows = [
        tuple(e.get(f.name) for f in CATALOG_SCHEMA.fields) for e in entries
    ]
    spark.createDataFrame(rows, CATALOG_SCHEMA).write.mode(mode).json(path)


def read_catalog_entries(spark: SparkSession, path: str) -> DataFrame:
    """Read the catalog back with the explicit schema (no inference pass)."""
    return spark.read.schema(CATALOG_SCHEMA).json(path)
