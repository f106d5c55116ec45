from pubg_data_pipeline_spark.functions import metrics, multimodal, text, vectors

__all__ = ["metrics", "multimodal", "text", "vectors"]
