from pubg_data_pipeline_spark.plans.base import QuerySpec, all_specs

__all__ = ["QuerySpec", "all_specs"]
