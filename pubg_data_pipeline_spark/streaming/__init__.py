from pubg_data_pipeline_spark.streaming import (
    app,
    etl,
    metrics,
    monitor,
    sinks,
    sources,
    state_inspect,
    stateful,
)

__all__ = [
    "app",
    "etl",
    "metrics",
    "monitor",
    "sinks",
    "sources",
    "state_inspect",
    "stateful",
]
