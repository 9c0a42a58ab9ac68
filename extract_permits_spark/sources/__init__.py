from extract_permits_spark.sources.readers import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
