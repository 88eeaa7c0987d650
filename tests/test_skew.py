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


def test_simhash_skew_salt_identical_and_salted_plan(spark, sf_dir):
    """skew_salt routes the simhash tf aggregate through the two-phase
    salted plan (visible as the __salt column in the optimized plan)
    without changing a single signature."""
    from danae_spark.operators.dedup import simhash_signatures

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plain = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    salted_df = simhash_signatures(docs, skew_salt=8)
    salted = {r["doc_id"]: r["simhash"] for r in salted_df.collect()}
    assert plain == salted and len(plain) > 0
    plan = salted_df._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan


def test_simhash_pairs_skew_salt_parity(spark, sf_dir):
    from danae_spark.operators.dedup import dedup_simhash, simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    base = {(r["d1"], r["d2"]): r["hamming"] for r in dedup_simhash(spark, sf_dir).collect()}
    salted = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in simhash_pairs(docs, skew_salt=4).collect()
    }
    assert base == salted
