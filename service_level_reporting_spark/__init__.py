"""PySpark-native analytics engine with the query/data-processing
capabilities of zalando-zmon/service-level-reporting (SLR), rebuilt
Spark-first per SURVEY.md.

Layout:
    session.py    SparkSession factory / runtime conf normalization
    tables.py     normalized testdata loading (ns-timestamp fix)
    registry.py   query + oracle-SQL registry backing __spark_entry__
    operators/    SLI/SLO aggregations, joins, windows, dedup, similarity, text
    sources/      KairosDB-shaped JSON source, idempotent sinks
    functions/    column-expression helpers (vector math, breach predicates)
    streaming/    Structured Streaming variants of the minute rollups
"""

from service_level_reporting_spark.session import configure, get_spark
from service_level_reporting_spark.tables import load_tables, register_views

__all__ = ["configure", "get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
