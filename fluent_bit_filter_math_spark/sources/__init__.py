from fluent_bit_filter_math_spark.sources.catalog import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
