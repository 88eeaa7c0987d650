"""Salted two-phase aggregation equals plain aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.functions.skew import salted_agg


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"]): (r["cnt"], round(r["total"], 4))
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        (r["event_type"]): (r["cnt"], round(r["total"], 4))
        for r in salted_agg(
            e,
            ["event_type"],
            [F.count("*").alias("cnt"), F.sum("value").alias("total")],
            [F.sum("cnt").alias("cnt"), F.sum("total").alias("total")],
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_ann_ivf_runs_and_ranks(spark, sf_dir):
    from danae_spark.queries import load_all

    df = load_all()["ann_ivf"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        cosines = [r["cosine"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True)
