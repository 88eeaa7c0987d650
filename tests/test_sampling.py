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
