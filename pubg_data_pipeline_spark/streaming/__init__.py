from pubg_data_pipeline_spark.streaming import app, etl, sinks, sources

__all__ = ["app", "etl", "sinks", "sources"]
