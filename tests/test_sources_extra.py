"""JSONL catalog store round-trip and small-file compaction."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from danae_spark.catalog import load_table, publish_dataset
from danae_spark.sources import compaction, jsonl


def test_jsonl_catalog_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "nation")
    entries = [
        publish_dataset(df, str(tmp_path / "nation_pub"), "nations", keywords="geo,dim"),
        publish_dataset(df, str(tmp_path / "nation_pub2"), "nations2", description="copy"),
    ]
    cat_path = str(tmp_path / "catalog_jsonl")
    jsonl.write_catalog_entries(spark, entries, cat_path)
    back = jsonl.read_catalog_entries(spark, cat_path)
    assert back.count() == 2
    rows = {r["title"]: r for r in back.collect()}
    assert rows["nations"]["keywords"] == "geo,dim"
    assert rows["nations"]["num_keywords"] == 2
    assert rows["nations2"]["profile_status"] == "pending"
    # appendable
    jsonl.write_catalog_entries(spark, entries[:1], cat_path, mode="append")
    assert jsonl.read_catalog_entries(spark, cat_path).count() == 3


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_small_files")
    li.repartition(64).write.parquet(path)
    n_before = len(spark.read.parquet(path).inputFiles())
    assert n_before >= 64

    before_sum = spark.read.parquet(path).agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]

    stats = compaction.compact(spark, path, target_mb=128, sort_by=["l_shipdate"])
    assert stats["files_after"] < n_before
    assert stats["files_after"] <= stats["target_files"] + 1

    after = spark.read.parquet(path).agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]
    assert (after["n"], after["s"]) == (before_sum["n"], before_sum["s"])
