"""Bucketed-table join co-location: same-bucketed tables join without a
shuffle exchange, and results match the plain join."""

from __future__ import annotations

import pytest

from danae_spark.catalog import load_table
from danae_spark.plans import audit
from danae_spark.sources import bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    bucketed.write_bucketed(o, "b_orders", "o_orderkey", 8)
    bucketed.write_bucketed(l, "b_lineitem", "l_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = "b_orders", "b_lineitem"
    joined = bucketed.cobucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    plan = audit.physical_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_cobucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    joined = bucketed.cobucketed_join(
        spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    plain = o.join(l, o.o_orderkey == l.l_orderkey)
    assert joined.count() == plain.count()
