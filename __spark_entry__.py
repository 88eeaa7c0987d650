"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are re-exported from the
``danae_spark.queries`` registry — one entry per implemented operator
from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from danae_spark.queries import load_all  # noqa: E402
from danae_spark.session import tune_for_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    tune_for_session(spark)
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
