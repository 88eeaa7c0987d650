"""Partition pruning through the publish sink: a date-partitioned write
followed by a filtered read must scan only matching partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark import catalog
from danae_spark.plans import audit


def test_partitioned_publish_prunes(spark, sf_dir, tmp_path):
    e = catalog.load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    catalog.publish_dataset(e, out, title="events", partition_by=["day"])

    back = spark.read.parquet(out)
    days = sorted(r["day"] for r in back.select("day").distinct().collect())
    assert len(days) > 3

    one_day = back.filter(F.col("day") == days[0])
    plan = audit.physical_plan(one_day)
    assert "PartitionFilters" in plan
    assert f"isnotnull(day" in plan or "day#" in plan
    # pruned read returns a strict subset
    assert 0 < one_day.count() < back.count()
