from pubg_data_pipeline_spark.sources import io, jsonl_sink, rest_source, schemas, snapshots
from pubg_data_pipeline_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "io",
    "jsonl_sink",
    "load_table",
    "load_tables",
    "register_views",
    "rest_source",
    "schemas",
    "snapshots",
]
