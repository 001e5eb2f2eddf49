"""File-format sources, file listing/selection, and connectors."""

from data_ingestion_tool_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
