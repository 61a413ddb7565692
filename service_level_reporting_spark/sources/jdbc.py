"""JDBC catalog source (SURVEY.md §2.1 S3).

The reference keeps its catalog (ProductGroup → Product → SLO → Target,
Indicator) in Postgres via SQLAlchemy (upstream:app/config.py [H]); the Spark
equivalent is `spark.read.format("jdbc")`. This container ships no JDBC
driver jar and no database, so the registrable-query surface stays
parquet-backed — what lives here is the REAL reader construction an engine
deployment uses, with the scale-relevant options applied:

* partitioned reads (`partitionColumn`/`lowerBound`/`upperBound`/
  `numPartitions`) so a big catalog table scans in parallel instead of one
  executor pulling the whole table through a single cursor;
* `fetchsize` (cursor batch size — the Postgres default of 0 means
  fetch-everything, which OOMs on big tables);
* `pushDownPredicate` left on so Catalyst ships filters into the WHERE
  clause of the generated SQL.

The function is unit-tested for option construction; `.load()` is exercised
only behind an import/driver guard.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(url: str, table: str, *,
                 partition_column: str | None = None,
                 lower_bound: int | None = None,
                 upper_bound: int | None = None,
                 num_partitions: int | None = None,
                 fetchsize: int = 10_000,
                 **extra: Any) -> dict[str, str]:
    """Build the option map for a parallel JDBC scan.

    Partition options are all-or-nothing (Spark requires the quartet
    together); passing only some raises instead of silently producing a
    single-partition scan.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
    }
    partition_args = (partition_column, lower_bound, upper_bound,
                      num_partitions)
    n_set = sum(a is not None for a in partition_args)
    if n_set not in (0, 4):
        raise ValueError(
            "partition_column, lower_bound, upper_bound, num_partitions "
            "must be provided together (Spark ignores partial sets and "
            "falls back to a single-partition scan)")
    if n_set == 4:
        opts.update({
            "partitionColumn": str(partition_column),
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        })
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc_table(spark: SparkSession, url: str, table: str,
                    **kwargs: Any) -> DataFrame:
    """Configured JDBC scan; raises at .load() time if no driver jar is on
    the classpath (expected in this container)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
