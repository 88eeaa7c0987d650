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
    temporal_profile,
    temporal_profile_oracle,
)

DECAY = 0.01


def typed_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All column signatures with their type class — the reference keeps
    one index per type (index.py: numTree/dateTree/...); here it's one
    DataFrame with a `col_type` column and per-type join predicates."""
    num = quantile_signatures(spark, sf_dir).withColumn("col_type", F.lit("Numeric"))
    tmp = temporal_profile(spark, sf_dir).withColumn("col_type", F.lit("Temporal"))
    return num.unionByName(tmp)


def _pair_distances(sigs: DataFrame) -> DataFrame:
    """Cross-table SAME-TYPE column pairs with euclidean signature
    distance (the reference only compares columns within one type's
    index — content_search.py:72)."""
    q = sigs.select(
        F.col("table_name").alias("q_table"),
        F.col("column_name").alias("q_column"),
        F.col("col_type").alias("q_type"),
        *[F.col(n).alias(f"q_{n}") for n in SIGNATURE_NAMES],
    )
    c = sigs.select(
        F.col("table_name").alias("cand_table"),
        F.col("column_name").alias("cand_column"),
        F.col("col_type").alias("c_type"),
        *[F.col(n).alias(f"c_{n}") for n in SIGNATURE_NAMES],
    )
    sq = sum(
        (F.col(f"q_{n}") - F.col(f"c_{n}")) * (F.col(f"q_{n}") - F.col(f"c_{n}"))
        for n in SIGNATURE_NAMES
    )
    return (
        q.join(
            F.broadcast(c),
            (F.col("q_table") != F.col("cand_table"))
            & (F.col("q_type") == F.col("c_type")),
        )
        .withColumn("dist", rnd(F.sqrt(sq), 4))
        .withColumn("col_type", F.col("q_type"))
    )


def signature_knn(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """k nearest same-type columns (other tables) per query column."""
    sigs = typed_signatures(spark, sf_dir)
    pairs = _pair_distances(sigs)
    w = W.partitionBy("q_table", "q_column").orderBy(
        "dist", "cand_table", "cand_column"
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_table", "q_column", "col_type", "cand_table", "cand_column", "dist", "rank")
        .orderBy("q_table", "q_column", "rank")
    )


def content_similarity(
    spark: SparkSession, sf_dir: str, L: int = 5, M: int = 10
) -> DataFrame:
    """Ranked candidate columns with `exp(-decay·dist/kth)` similarity."""
    sigs = typed_signatures(spark, sf_dir)
    pairs = _pair_distances(sigs)
    w = W.partitionBy("q_table", "q_column").orderBy("dist", "cand_table", "cand_column")
    wq = W.partitionBy("q_table", "q_column")
    ranked = pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= M)
    # kth per content_search.py:88-95: min(L, list-length)-th smallest,
    # skipping leading zeros; all-zero ranked list → epsilon
    with_kth = (
        ranked.withColumn("n_cand", F.count("*").over(wq))
        .withColumn(
            "kth_l",
            F.max(
                F.when(F.col("rank") == F.least(F.lit(L), F.col("n_cand")), F.col("dist"))
            ).over(wq),
        )
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
    num_sql = quantile_signatures_oracle().rsplit(" ORDER BY ", 1)[0]
    tmp_sql = temporal_profile_oracle().rsplit(" ORDER BY ", 1)[0]
    sq = " + ".join(
        f"(q.{n} - c.{n}) * (q.{n} - c.{n})" for n in SIGNATURE_NAMES
    )
    return f"""
    WITH sigs AS (
      SELECT *, 'Numeric' AS col_type FROM ({num_sql})
      UNION ALL
      SELECT *, 'Temporal' AS col_type FROM ({tmp_sql})
    ),
    pairs AS (
      SELECT q.table_name AS q_table, q.column_name AS q_column,
             q.col_type AS col_type,
             c.table_name AS cand_table, c.column_name AS cand_column,
             floor((sqrt({sq})) * power(10, 4) + 0.5001) / power(10, 4) AS dist
      FROM sigs q JOIN sigs c
        ON q.table_name <> c.table_name AND q.col_type = c.col_type
    )"""


def signature_knn_oracle(k: int = 3) -> str:
    return f"""{_pairs_cte()}
    SELECT q_table, q_column, col_type, cand_table, cand_column, dist, rank FROM (
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
    ), counted AS (
      SELECT *, count(*) OVER (PARTITION BY q_table, q_column) AS n_cand
      FROM ranked
    ), with_kth AS (
      SELECT *,
        max(CASE WHEN rank = least({L}, n_cand) THEN dist END)
          OVER (PARTITION BY q_table, q_column) AS kth_l,
        min(CASE WHEN dist > 0 THEN dist END)
          OVER (PARTITION BY q_table, q_column) AS min_nonzero
      FROM counted
    )
    SELECT q_table, q_column, cand_table, cand_column, dist,
           floor((exp(-{DECAY} * dist /
                 (CASE WHEN kth_l > 0 THEN kth_l
                       ELSE coalesce(min_nonzero, 1e-12) END))) * power(10, 6) + 0.5001) / power(10, 6) AS sim,
           rank
    FROM with_kth
    ORDER BY q_table, q_column, rank
    """
