from endtoend_etl_openmeteo_spark.sources.tables import TABLES, tbl

__all__ = ["TABLES", "tbl"]
