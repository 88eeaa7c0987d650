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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bits per dimension of the z-order key; 2 dims × 12 bits = a 24-bit
# key — plenty of resolution for file-level (not row-level) clustering
ZORDER_BITS = 12


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Interleaved-bit (Morton / Z-order) sort key over `cols`.

    Each column is linearly bucketed into 2^bits cells between its
    global min and max (one tiny distributed agg; no global sort), and
    the cell ids' bits are interleaved so the key preserves locality in
    EVERY dimension at once. Clustering a table by this key keeps
    parquet file/row-group min-max statistics selective for filters on
    ANY of the dimensions — unlike a lexicographic sort, which skips
    well only on its leading column. All expressions are built-in
    (width_bucket / shift / bitwiseOR): whole-stage codegen, no UDF.

    Returns a Column; NULLs land in cell 0 (sort first)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}__min") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"{c}__max") for c in cols],
    ).collect()[0]
    n_cells = 2**bits
    buckets = []
    for c in cols:
        lo, hi = stats[f"{c}__min"], stats[f"{c}__max"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_cells)
        )
        # width_bucket: 0 below, n+1 above; clamp into [0, n_cells-1]
        buckets.append(
            F.coalesce(
                F.greatest(F.least(b - 1, F.lit(n_cells - 1)), F.lit(0)),
                F.lit(0),
            ).cast("long")
        )
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i, bucket in enumerate(buckets):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * len(buckets) + i,
                )
            )
    return key


def _dir_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet dataset at `path` into ~target_mb files.

    Works in BOTH directions: many small files combine into fewer
    target-sized ones, and a too-FEW-files dataset (e.g. one big
    single-row-group file, which caps scan parallelism at 1 task no
    matter the cluster size — the r5 test-lake failure mode that
    `catalog.widen` works around query-side) splits into enough files
    that every executor gets a scan split. Run this once at ingest and
    the widen repartitions become no-ops.

    `sort_by` optionally clusters rows (sortWithinPartitions) so min/max
    parquet statistics stay selective after the rewrite — the layout step
    that keeps predicate pushdown effective post-compaction.

    `zorder_by` (mutually exclusive with sort_by) range-partitions and
    sorts by an interleaved-bit key over SEVERAL columns instead, so
    data skipping stays effective for filters on any of them."""
    if sort_by and zorder_by:
        raise ValueError("compact: pass sort_by or zorder_by, not both")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)

    total = _dir_bytes(spark, path)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    before_files = len(df.inputFiles())

    if zorder_by:
        # range-partition on the z key so each FILE covers a compact
        # z-range (file-level skipping), then sort inside for row groups
        out = (
            df.withColumn("__zkey", zorder_key(df, zorder_by))
            .repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
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
