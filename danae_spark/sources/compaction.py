"""Small-file compaction for lake tables.

Streaming ingest and fine-grained partitioned writes leave parquet
tables as thousands of KB-sized files; at 100 TB that means scan tasks
dominated by open/footer overhead and driver memory burned on file
listings. Compaction rewrites a table to ~target-sized files:

    n_files = ceil(total_bytes / target_bytes)

sized from the REAL on-disk footprint (Hadoop FS content summary — works
for any scheme, not just local paths). The rewrite goes to a temp
location first and swaps in atomically-enough for a lake (rename), so a
failed compaction never corrupts the live table.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact(
    spark: SparkSession, path: str, target_mb: int = 128, sort_by: list[str] | None = None
) -> dict:
    """Rewrite the parquet dataset at `path` into ~target_mb files.

    `sort_by` optionally clusters rows (sortWithinPartitions) so min/max
    parquet statistics stay selective after the rewrite — the layout step
    that keeps predicate pushdown effective post-compaction."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)

    total = _dir_bytes(spark, path)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    before_files = len(df.inputFiles())

    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)

    tmp = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(tmp)

    # validate the rewrite BEFORE touching the live table: a row-count
    # mismatch means the rewrite is corrupt — abort with the source intact
    src_count = df.count()
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    tmp_count = spark.read.parquet(tmp).count()
    if tmp_count != src_count:
        fs.delete(tmp_p, True)
        raise RuntimeError(
            f"compact: rewrite of {path} has {tmp_count} rows, source has "
            f"{src_count} — aborting before swap (source untouched)"
        )

    bak = path.rstrip("/") + "__pre_compact"
    bak_p = jvm.org.apache.hadoop.fs.Path(bak)
    if fs.exists(bak_p):
        fs.delete(bak_p, True)
    # rename-based swap: there is an unavoidable instant where the live
    # path is absent; a failure inside it now restores the backup instead
    # of stranding readers (r2 ADVICE)
    if not fs.rename(src, bak_p):
        raise RuntimeError(f"compact: could not move {path} aside — aborting")
    try:
        if not fs.rename(tmp_p, src):
            raise RuntimeError(f"compact: swap rename into {path} failed")
    except Exception:
        fs.rename(bak_p, src)  # roll the live table back
        raise

    # verification read of the swapped-in files BEFORE forfeiting rollback
    try:
        after_files = len(spark.read.parquet(path).inputFiles())
        after_count = spark.read.parquet(path).count()
        if after_count != src_count:
            raise RuntimeError(
                f"compact: post-swap {path} has {after_count} rows, expected "
                f"{src_count}"
            )
    except Exception:
        fs.delete(src, True)
        fs.rename(bak_p, src)
        raise
    fs.delete(bak_p, True)
    return {
        "path": path,
        "total_bytes": total,
        "files_before": before_files,
        "files_after": after_files,
        "target_files": n_files,
    }
