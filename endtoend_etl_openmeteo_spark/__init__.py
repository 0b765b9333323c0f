"""PySpark-native analytics engine with the capabilities of
a-chmielewski/endtoend-etl-openmeteo (see SURVEY.md).

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst + Tungsten optimize (predicate pushdown, column pruning, broadcast
joins, whole-stage codegen, AQE). Python UDFs are avoided entirely for
reference parity (SURVEY.md §2.10); Pandas UDFs appear only in extension
operators where built-ins cannot express the semantics.
"""

from endtoend_etl_openmeteo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
