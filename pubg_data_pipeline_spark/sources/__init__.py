from pubg_data_pipeline_spark.sources import io, schemas
from pubg_data_pipeline_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "io", "load_table", "load_tables", "register_views", "schemas"]
