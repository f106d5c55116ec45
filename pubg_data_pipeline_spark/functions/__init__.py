from pubg_data_pipeline_spark.functions import metrics, text, vectors

__all__ = ["metrics", "text", "vectors"]
