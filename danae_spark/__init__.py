"""danae_spark — a PySpark-native data-lake analytics & dataset-similarity
engine with the capabilities of smartdatalake/danae (see SURVEY.md).

Everything is expressed DataFrame-first so Catalyst/Tungsten pick the
physical plan; Python UDFs only where built-ins genuinely can't express
the semantics (and then Arrow-batched).
"""

__version__ = "0.2.0"


def engine(spark, lake_dir: str):
    """Convenience constructor: `danae_spark.engine(spark, dir)` →
    DataLakeEngine (imported lazily to keep bare imports light)."""
    from danae_spark.api import DataLakeEngine

    return DataLakeEngine(spark, lake_dir)
