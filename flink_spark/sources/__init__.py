from flink_spark.sources.tables import load_table, load_tables, TABLE_NAMES

__all__ = ["load_table", "load_tables", "TABLE_NAMES"]
