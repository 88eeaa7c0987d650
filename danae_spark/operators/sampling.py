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
    # alias first, then build the token expression against the alias —
    # interpolating the raw caller-supplied name into F.expr breaks on
    # names needing backticks (matches text_stats_frame's convention)
    docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"),
    ).withColumn("tokens", F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")))
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


# ------------------------- deterministic train/val/test corpus splitting

DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def deterministic_split_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "danae-split",
) -> DataFrame:
    """Reproducible corpus splitting: every row assigned to a named
    split by its content-independent id hash — the same row lands in the
    same split on any engine, any cluster size, any run, and the
    assignment is stable under corpus growth (new ids don't move old
    rows). The standard alternative, `randomSplit`, is neither
    deterministic across executions nor engine-portable.

    `splits` maps name → fraction (must sum to ~1); boundaries are laid
    out on a md5-derived uniform in [0, 1) (portable — the DuckDB oracle
    reproduces assignments exactly). `salt` decorrelates independent
    splits of the same corpus."""
    splits = dict(DEFAULT_SPLITS if splits is None else splits)
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1")
    # md5 prefix → uniform in [0, 1): 8 hex chars / 16^8
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    assign = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        assign = F.when(cond, F.lit(name)) if assign is None else assign.when(cond, F.lit(name))
    assign = F.lit(names[-1]) if assign is None else assign.otherwise(F.lit(names[-1]))
    return df.withColumn("split", assign)


def deterministic_split(
    spark: SparkSession, sf_dir: str, splits: dict[str, float] | None = None
) -> DataFrame:
    """Documents-table entry: per-doc split assignment + a stable
    per-split summary row count (what a pipeline audits before
    training)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        deterministic_split_frame(docs, "doc_id", splits)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


def deterministic_split_oracle(
    splits: dict[str, float] | None = None, salt: str = "danae-split"
) -> str:
    """`salt` must mirror deterministic_split_frame's — parameter-parallel
    so a caller registering a salted split can't silently mismatch."""
    splits = dict(DEFAULT_SPLITS if splits is None else splits)
    names = list(splits)
    u = (
        f"('0x' || substr(md5('{salt}' || '#' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        f" * 1.0 / {float(16**8)}"
    )
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += splits[name]
        cases.append(f"WHEN ({u}) < {acc} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
    SELECT doc_id, {case} AS split FROM documents ORDER BY doc_id
    """
