"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set fleet-wide on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow on (fast pandas interchange for the few Pandas-UDF operators),
UTC session timezone (deterministic temporal semantics vs the DuckDB
oracle), and shuffle partitions sized to the core count rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "danae_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # lake timestamps are naive µs: read as session-tz LTZ directly
        # (pushdown-friendly) instead of TIMESTAMP_NTZ
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # NOTE: large heaps (≥48g) triple per-stage latency in this
        # container (GC region sizing); 16g is the measured sweet spot.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply engine settings to an externally-provided session (the driver
    hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    try:  # arrow conf is static on some builds; best-effort
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark


def stage_parallelism(spark: SparkSession, floor: int = 32) -> int:
    """Partition count for NUMBERED repartitions ahead of heavy Python
    stages (mapInPandas media decode, the MaxSim interaction join).

    A numbered ``repartition(n, key)`` is exempt from AQE partition
    coalescing — that exemption is the point: the shuffled relation is
    slim (doc ids, terms) so AQE would coalesce it to one task, but the
    downstream per-row work (pixel decode, q×c interaction) is heavy and
    needs the parallelism. A hardcoded ``32``, however, caps those
    stages at local[32]'s width on any larger cluster — the same
    parallelism-ceiling bug class as r7's zscore/profile fixes. Derive
    the number from the session instead: the max of the
    shuffle-partitions conf, ``defaultParallelism`` (executor cores on a
    real cluster), and a local floor.
    """
    try:
        conf_sp = int(spark.conf.get("spark.sql.shuffle.partitions", "0"))
    except Exception:
        conf_sp = 0
    try:
        default_par = spark.sparkContext.defaultParallelism
    except Exception:
        default_par = 0
    return max(conf_sp, default_par, floor)
