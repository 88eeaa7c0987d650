"""Column type classification.

Reference parity: `ingest/profiling/filters.py:118 transform_field` maps
pandas-profiling types to {Numeric, Categorical, Temporal, Unsupported}
(+ Spatial for lat/long pairs, profiler.py:90-111). Spark-first: we read
the class straight off the DataFrame schema — parquet is typed, so no
row-level inference pass is needed.
"""

from __future__ import annotations

from pyspark.sql import types as T

NUMERIC = "Numeric"
CATEGORICAL = "Categorical"
TEMPORAL = "Temporal"
UNSUPPORTED = "Unsupported"

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_TEMPORAL_TYPES = (T.TimestampType, T.TimestampNTZType, T.DateType)


def classify(dtype: T.DataType) -> str:
    if isinstance(dtype, _NUMERIC_TYPES):
        return NUMERIC
    if isinstance(dtype, _TEMPORAL_TYPES):
        return TEMPORAL
    if isinstance(dtype, T.StringType):
        return CATEGORICAL
    return UNSUPPORTED


def columns_of_class(schema: T.StructType, klass: str) -> list[str]:
    return [f.name for f in schema.fields if classify(f.dataType) == klass]
