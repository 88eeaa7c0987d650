"""Column-signature kNN and content similarity scoring.

Reference parity: `search/index.py` (R-tree per column type, kNN via
`nearest`) and `search/content_search.py:72 __search_item` — for a query
column, take the M nearest candidate columns by euclidean distance over
the 7-point quantile signature, derive `kth` = the L-th smallest distance
(skipping leading zeros, content_search.py:88-95), and score each
candidate `sim = w * exp(-decay * dist / kth)` (content_search.py:104).

Spark-first redesign: signatures live in a DataFrame of #columns rows
(tiny even at 100 TB of *data* — the signature count scales with schema
count, not row count), so kNN is a broadcast self-join + window ranking
instead of an R-tree: Catalyst broadcasts the signature table and the
whole search for EVERY query column happens in one shuffle-free pass —
the reference answers one query column at a time.

Distances are rounded to 4dp before ranking so ordering is stable across
engines (ranking on raw doubles would be sensitive to last-ulp noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.functions.rounding import rnd
from danae_spark.profiling.profiler import (
    SIGNATURE_NAMES,
    quantile_signatures,
    quantile_signatures_oracle,
)

DECAY = 0.01


def _pair_distances(sigs: DataFrame) -> DataFrame:
    """All cross-table column pairs with euclidean signature distance."""
    q = sigs.select(
        F.col("table_name").alias("q_table"),
        F.col("column_name").alias("q_column"),
        *[F.col(n).alias(f"q_{n}") for n in SIGNATURE_NAMES],
    )
    c = sigs.select(
        F.col("table_name").alias("cand_table"),
        F.col("column_name").alias("cand_column"),
        *[F.col(n).alias(f"c_{n}") for n in SIGNATURE_NAMES],
    )
    sq = sum(
        (F.col(f"q_{n}") - F.col(f"c_{n}")) * (F.col(f"q_{n}") - F.col(f"c_{n}"))
        for n in SIGNATURE_NAMES
    )
    return (
        q.join(F.broadcast(c), F.col("q_table") != F.col("cand_table"))
        .withColumn("dist", rnd(F.sqrt(sq), 4))
    )


def signature_knn(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """k nearest numeric columns (other tables) per query column."""
    sigs = quantile_signatures(spark, sf_dir)
    pairs = _pair_distances(sigs)
    w = W.partitionBy("q_table", "q_column").orderBy(
        "dist", "cand_table", "cand_column"
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_table", "q_column", "cand_table", "cand_column", "dist", "rank")
        .orderBy("q_table", "q_column", "rank")
    )


def content_similarity(
    spark: SparkSession, sf_dir: str, L: int = 5, M: int = 10
) -> DataFrame:
    """Ranked candidate columns with `exp(-decay·dist/kth)` similarity."""
    sigs = quantile_signatures(spark, sf_dir)
    pairs = _pair_distances(sigs)
    w = W.partitionBy("q_table", "q_column").orderBy("dist", "cand_table", "cand_column")
    wq = W.partitionBy("q_table", "q_column")
    ranked = pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= M)
    # kth per content_search.py:88-95: L-th smallest, skipping leading zeros;
    # all-zero ranked list → epsilon
    with_kth = (
        ranked.withColumn("kth_l", F.max(F.when(F.col("rank") == L, F.col("dist"))).over(wq))
        .withColumn(
            "min_nonzero", F.min(F.when(F.col("dist") > 0, F.col("dist"))).over(wq)
        )
        .withColumn(
            "kth",
            F.when(F.col("kth_l") > 0, F.col("kth_l")).otherwise(
                F.coalesce(F.col("min_nonzero"), F.lit(1e-12))
            ),
        )
    )
    return (
        with_kth.withColumn(
            "sim", rnd(F.exp(-F.lit(DECAY) * F.col("dist") / F.col("kth")), 6)
        )
        .select("q_table", "q_column", "cand_table", "cand_column", "dist", "sim", "rank")
        .orderBy("q_table", "q_column", "rank")
    )


# --------------------------------------------------------- oracle generators


def _pairs_cte() -> str:
    sigs_sql = quantile_signatures_oracle().rsplit(" ORDER BY ", 1)[0]
    sq = " + ".join(
        f"(q.{n} - c.{n}) * (q.{n} - c.{n})" for n in SIGNATURE_NAMES
    )
    return f"""
    WITH sigs AS ({sigs_sql}),
    pairs AS (
      SELECT q.table_name AS q_table, q.column_name AS q_column,
             c.table_name AS cand_table, c.column_name AS cand_column,
             floor((sqrt({sq})) * power(10, 4) + 0.5001) / power(10, 4) AS dist
      FROM sigs q JOIN sigs c ON q.table_name <> c.table_name
    )"""


def signature_knn_oracle(k: int = 3) -> str:
    return f"""{_pairs_cte()}
    SELECT q_table, q_column, cand_table, cand_column, dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_table, q_column
                                   ORDER BY dist, cand_table, cand_column) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY q_table, q_column, rank
    """


def content_similarity_oracle(L: int = 5, M: int = 10) -> str:
    return f"""{_pairs_cte()},
    ranked AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY q_table, q_column
                                     ORDER BY dist, cand_table, cand_column) AS rank
        FROM pairs
      ) WHERE rank <= {M}
    ), with_kth AS (
      SELECT *,
        max(CASE WHEN rank = {L} THEN dist END)
          OVER (PARTITION BY q_table, q_column) AS kth_l,
        min(CASE WHEN dist > 0 THEN dist END)
          OVER (PARTITION BY q_table, q_column) AS min_nonzero
      FROM ranked
    )
    SELECT q_table, q_column, cand_table, cand_column, dist,
           floor((exp(-{DECAY} * dist /
                 (CASE WHEN kth_l > 0 THEN kth_l
                       ELSE coalesce(min_nonzero, 1e-12) END))) * power(10, 6) + 0.5001) / power(10, 6) AS sim,
           rank
    FROM with_kth
    ORDER BY q_table, q_column, rank
    """
