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


def _file_overlap_fraction(spark, path, col, lo, hi):
    """Fraction of the table's files whose [min, max] range on `col`
    overlaps [lo, hi] — the files a min/max-pruning scan must read."""
    files = spark.read.parquet(path).inputFiles()
    hit = 0
    for f in files:
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        if r[0] is not None and not (r[1] < lo or r[0] > hi):
            hit += 1
    return hit / len(files), len(files)


def test_zorder_compaction_skips_on_both_dimensions(spark, tmp_path):
    """Z-order clustering keeps file-level min/max stats selective on
    BOTH clustered columns; a lexicographic sort only on the first.
    Measured directly: fraction of files a narrow filter on the SECOND
    column would have to read."""
    import hashlib

    import pandas as pd

    n = 40_000
    pdf = pd.DataFrame(
        {"x": [(i * 7919) % n for i in range(n)],
         "y": [(i * 104729) % n for i in range(n)],
         # incompressible padding so the table spans several 1 MB files
         "pad": [
             "".join(
                 hashlib.sha256(f"{i}:{j}".encode()).hexdigest() for j in range(4)
             )
             for i in range(n)
         ]}
    )
    df = spark.createDataFrame(pdf)

    lin = str(tmp_path / "lin")
    zo = str(tmp_path / "zo")
    df.write.parquet(lin)
    df.write.parquet(zo)
    compaction.compact(spark, lin, target_mb=1, sort_by=["x"])
    compaction.compact(spark, zo, target_mb=1, zorder_by=["x", "y"])

    rows = spark.read.parquet(zo).count()
    assert rows == n

    lo, hi = n // 2, n // 2 + n // 50  # a 2% slice of y
    lin_frac, lin_files = _file_overlap_fraction(spark, lin, "y", lo, hi)
    zo_frac, zo_files = _file_overlap_fraction(spark, zo, "y", lo, hi)
    assert zo_files >= 4 and lin_files >= 4
    # x-sorted files are y-random: essentially every file overlaps
    assert lin_frac > 0.9, (lin_frac, lin_files)
    # z-ordered files cover compact y-ranges: most are skippable
    assert zo_frac <= 0.5, (zo_frac, zo_files)


def test_zorder_key_null_and_constant_columns(spark):
    """Degenerate dimensions (all-NULL, constant) contribute cell 0 and
    never error out."""
    import pandas as pd

    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [5.0, 5.0, 5.0]})
    df = spark.createDataFrame(pdf)
    df = df.withColumn("c", F.lit(None).cast("double"))
    out = df.withColumn("k", compaction.zorder_key(df, ["a", "b", "c"])).collect()
    assert all(r["k"] is not None for r in out)
    ks = sorted(r["k"] for r in out)
    assert ks[0] < ks[-1]  # 'a' still orders the key


def test_compact_splits_single_file_for_scan_parallelism(spark, tmp_path):
    """The inverse compaction direction: ONE big single-row-group file
    (scan parallelism 1) rewritten into multiple files so the scan gets
    real splits — the durable fix for what catalog.widen patches
    query-side."""
    import pyspark.sql.functions as F

    from danae_spark.sources.compaction import compact

    p = str(tmp_path / "one_big_file")
    (
        spark.range(400_000)
        .select("id", F.md5(F.col("id").cast("string")).alias("payload"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(p)
    )
    # one physical file: byte-range splits exist but only the one
    # containing the row-group start does real work
    assert len(spark.read.parquet(p).inputFiles()) == 1
    stats = compact(spark, p, target_mb=2)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= 4
    assert df.rdd.getNumPartitions() >= 4
    assert df.count() == 400_000


def test_read_any_orc_roundtrip_and_dispatch(spark, sf_dir, tmp_path):
    from danae_spark.catalog import load_table
    from danae_spark.sources.formats import read_any, write_orc

    nation = load_table(spark, sf_dir, "nation")
    orc_path = str(tmp_path / "nation.orc")
    write_orc(nation, orc_path)
    back = read_any(spark, orc_path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    # parquet dispatch reads the lake file identically
    import os

    pq = read_any(spark, os.path.join(sf_dir, "nation.parquet"))
    assert pq.count() == nation.count()


def test_read_any_csv_and_jsonl_dispatch(spark, tmp_path):
    import os

    from danae_spark.sources.formats import read_any

    csv_path = str(tmp_path / "t.csv")
    with open(csv_path, "w") as f:
        f.write("a;b\n1;x\n2;y\n")
    got = read_any(spark, csv_path)
    rows = sorted(map(tuple, got.collect()))
    assert rows == [("1", "x"), ("2", "y")] or rows == [(1, "x"), (2, "y")]

    jl_path = str(tmp_path / "t.jsonl")
    with open(jl_path, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    jrows = sorted(map(tuple, read_any(spark, jl_path).select("a", "b").collect()))
    assert jrows == [(1, "x"), (2, "y")]
