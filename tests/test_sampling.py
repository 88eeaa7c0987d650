"""Token-budget data mixing: strict DuckDB parity + budget semantics."""

from __future__ import annotations

import duckdb

from danae_spark.catalog import TABLES, table_path
from danae_spark.operators import sampling


def test_token_budget_mix_matches_oracle(spark, sf_dir):
    out = sampling.token_budget_mix(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    d_rows = sorted(tuple(r) for r in con.execute(sampling.token_budget_mix_oracle()).fetchall())
    con.close()
    assert s_rows == d_rows and len(s_rows) > 0

    # budget semantics: per source, selected tokens reach the budget and
    # overshoot by at most one document; unbudgeted sources select nothing
    per_source = {}
    for doc_id, source, tokens, tokens_before, selected in s_rows:
        cur = per_source.setdefault(source, {"sel": 0, "max_doc": 0, "n": 0})
        if selected:
            cur["sel"] += tokens
            cur["max_doc"] = max(cur["max_doc"], tokens)
            cur["n"] += 1
    for source, st in per_source.items():
        budget = sampling.DEFAULT_BUDGETS.get(source, 0)
        if budget == 0:
            assert st["n"] == 0, source
        else:
            assert st["sel"] < budget + st["max_doc"], source
            assert st["sel"] >= min(budget, st["sel"] + 1), source


def test_deterministic_split_frame_properties(spark):
    import pytest as _pytest

    from danae_spark.operators.sampling import deterministic_split_frame

    df = spark.range(20000).withColumnRenamed("id", "k")
    out = deterministic_split_frame(df, "k").groupBy("split").count().collect()
    frac = {r["split"]: r["count"] / 20000 for r in out}
    assert set(frac) == {"train", "val", "test"}
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01 and abs(frac["test"] - 0.05) < 0.01

    # determinism + growth stability: a prefix of the corpus gets the
    # identical assignments it had in the full corpus
    small = deterministic_split_frame(df.filter("k < 5000"), "k")
    full = deterministic_split_frame(df, "k").filter("k < 5000")
    assert small.collect() == full.orderBy("k").collect() or (
        sorted(map(tuple, small.collect())) == sorted(map(tuple, full.collect()))
    )

    # different salt decorrelates
    other = deterministic_split_frame(df, "k", salt="other")
    both = (
        deterministic_split_frame(df, "k").withColumnRenamed("split", "a")
        .join(other.withColumnRenamed("split", "b"), "k")
    )
    moved = both.filter("a <> b").count()
    assert moved > 1000

    with _pytest.raises(ValueError):
        deterministic_split_frame(df, "k", splits={"a": 0.5, "b": 0.2})
