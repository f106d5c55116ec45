from pubg_data_pipeline_spark.streaming import app, etl, metrics, sinks, sources, stateful

__all__ = ["app", "etl", "metrics", "sinks", "sources", "stateful"]
