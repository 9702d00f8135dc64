"""Sources & sinks: parquet/CSV/JSON readers, HTTP connector, secrets."""

from talkdesk_async_etl_spark.sources.io import read_table, read_tables

__all__ = ["read_table", "read_tables"]
