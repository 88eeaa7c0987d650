from danae_spark.profiling.profiler import (  # noqa: F401
    NUMERIC_PROFILE_TABLES,
    numeric_profile,
    quantile_signatures,
    temporal_profile,
)
