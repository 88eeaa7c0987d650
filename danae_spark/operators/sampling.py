"""Deterministic corpus sampling / data-mixing operators.

Training-data pipelines rarely take "all of source X": they MIX sources
to target token budgets (so a small high-quality source isn't drowned by
a large crawl). `token_budget_mix` selects, per source, the documents
with the smallest content hash until the source's token budget is
reached — the same content-hash priority order as
`deterministic_sample`, so the selection is reproducible across
runs/engines/cluster sizes and is stable under corpus growth (new docs
only displace selected docs they out-rank).

Plan shape: one shuffle on source; the priority window and the running
token sum reuse that partitioning; the final decision is a row-wise
comparison of the running sum against the broadcast budget map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table

# testdata sources are src0..src19; budget a skewed mix over a subset so
# both selected-and-cut and excluded sources are exercised
DEFAULT_BUDGETS = {
    "src0": 400, "src1": 300, "src2": 200, "src3": 150, "src4": 100,
    "src5": 100, "src6": 50, "src7": 50,
}


def token_budget_mix_frame(
    docs: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Select docs per source until the source's token budget is hit,
    over ANY (id, source, text) frame.

    A doc is selected if the budget was not yet exhausted when its turn
    came (running token sum BEFORE the doc < budget) — so the budget can
    be overshot by at most one document, and the cut point is identical
    on any engine. Sources without a budget entry get 0 (excluded).
    Returns per-doc decisions; aggregate for the mix summary."""
    text = F.col(text_col)
    docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        text.alias("text"),
        F.size(F.expr(f"filter(split({text_col}, ' +'), t -> t <> '')")).alias("tokens"),
    )
    w = W.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    budget = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(b)) for s, b in budgets.items()],
        F.lit(0),
    )
    running_before = F.coalesce(
        F.sum("tokens").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        docs.withColumn("tokens_before", running_before)
        .withColumn("selected", (F.col("tokens_before") < budget).cast("int"))
        .select("doc_id", "source", "tokens", "tokens_before", "selected")
        .orderBy("doc_id")
    )


def token_budget_mix(
    spark: SparkSession,
    sf_dir: str,
    budgets: dict[str, int] | None = None,
) -> DataFrame:
    """The documents-table entry point of `token_budget_mix_frame`."""
    budgets = dict(DEFAULT_BUDGETS if budgets is None else budgets)
    return token_budget_mix_frame(load_table(spark, sf_dir, "documents"), budgets)


def token_budget_mix_oracle(budgets: dict[str, int] | None = None) -> str:
    budgets = dict(DEFAULT_BUDGETS if budgets is None else budgets)
    budget_case = " ".join(f"WHEN source = '{s}' THEN {b}" for s, b in budgets.items())
    return f"""
    WITH d AS (
      SELECT doc_id, source, text,
             len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, tokens,
             coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY md5(text), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM d
    )
    SELECT doc_id, source, tokens, tokens_before,
           CAST(tokens_before < (CASE {budget_case} ELSE 0 END) AS INT) AS selected
    FROM r ORDER BY doc_id
    """
