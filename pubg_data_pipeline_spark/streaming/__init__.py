from pubg_data_pipeline_spark.streaming import etl, sinks, sources

__all__ = ["etl", "sinks", "sources"]
