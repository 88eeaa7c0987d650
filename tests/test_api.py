"""Facade smoke: every DataLakeEngine verb returns a working DataFrame."""

from __future__ import annotations

from danae_spark.api import DataLakeEngine


def test_engine_facade_verbs(spark, sf_dir):
    eng = DataLakeEngine(spark, sf_dir)
    assert eng.catalog().count() == 10
    assert eng.table("nation").count() == 25
    assert eng.profile().count() > 0
    assert eng.signatures().count() > 0
    assert eng.dedup("exact").count() > 0
    assert eng.ann("lsh").count() > 0
    assert eng.text_stats().count() > 0
    one = eng.search(dataset="orders", k=2).collect()
    assert 0 < len(one) <= 2
    assert all(r["q_table"] == "orders" for r in one)
    assert eng.metadata_search("spark join", k=5).count() <= 5
