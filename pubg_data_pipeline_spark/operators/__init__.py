from pubg_data_pipeline_spark.operators import (
    dedup,
    relational,
    similarity,
    skew,
    timeseries,
    windows,
    zscore,
)

__all__ = ["dedup", "relational", "similarity", "skew", "timeseries", "windows", "zscore"]
