"""Catalog: publish sink roundtrip + dataset registry."""

from __future__ import annotations

from danae_spark import catalog


def test_publish_roundtrip(spark, sf_dir, tmp_path):
    df = catalog.load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "published")
    entry = catalog.publish_dataset(
        df, out, title="nations", keywords="geo,reference", partition_by=["n_regionkey"]
    )
    assert entry["num_columns"] == 3
    assert entry["num_keywords"] == 2
    assert entry["profile_status"] == "pending"
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    # partitioned layout on disk
    import os

    assert any(d.startswith("n_regionkey=") for d in os.listdir(out))


def test_catalog_lists_all_tables(spark, sf_dir):
    rows = {r["dataset"]: r for r in catalog.catalog_datasets(spark, sf_dir).collect()}
    assert set(rows) == set(catalog.TABLES)
    assert rows["lineitem"]["num_rows"] > 0


def test_widen_conditional_repartition(spark):
    from danae_spark.catalog import widen

    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    w = widen(narrow)
    assert w.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert w.count() == 1000
    # already-parallel input: no-op (no extra exchange inserted)
    wide = spark.range(1000).repartition(64)
    assert widen(wide) is wide
    # explicit floor
    assert widen(narrow, min_partitions=4).rdd.getNumPartitions() == 4


def test_widen_skips_tiny_scan_inputs(spark, sf_dir):
    """Scan-rooted frames below WIDEN_MIN_BYTES must NOT get an exchange:
    the r6 paired A/B measured the repartition as a 0.8–1.8 s warm loss
    on sub-32MB tables, and the decision must come from file metadata
    (no plan→RDD conversion)."""
    from danae_spark.catalog import load_table, widen

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert widen(docs) is docs
