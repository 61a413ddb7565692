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


# ---------------------------------------------------------------------------
# Round 2: REAL end-to-end JDBC leg. Spark ships Apache Derby (the embedded
# pure-Java DB backing its Hive metastore) on the classpath, so the full
# write→partitioned-read→join cycle runs with an actual JDBC driver:
# the catalog `target` dim is written INTO Derby with Spark's JDBC writer,
# read back through read_jdbc_table (partitioned on slo_id — the parallel
# cursor shape a real Postgres catalog scan uses), and joined onto events
# for a per-SLO daily breach report. The dim rows are the deterministic
# literals from operators/catalog.py, so the oracle hash-checks the whole
# leg. On a production cluster only the URL/driver change.
# ---------------------------------------------------------------------------

import os as _os
import tempfile as _tempfile

from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(name: str, app_id: str) -> str:
    # Embedded Derby allows ONE JVM per database directory (it takes a
    # db.lck on boot) — suffix the path with the Spark application id so
    # concurrent sessions (e.g. pytest next to a driver run) get disjoint
    # databases instead of a lock collision.
    path = _os.path.join(_tempfile.gettempdir(), f"{name}_{app_id}")
    return f"jdbc:derby:{path};create=true"


def _jdbc_catalog_oracle() -> str:
    from service_level_reporting_spark.operators.catalog import (
        TARGETS, _values_sql)

    return f"""
    WITH target(target_id, slo_id, event_type, lo, hi) AS
        (VALUES {_values_sql(TARGETS)})
    SELECT t.slo_id, e.event_type, strftime(e.ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           count(CASE WHEN e.value < t.lo OR e.value > t.hi THEN 1 END)
               AS breaches
    FROM events e JOIN target t USING (event_type)
    GROUP BY t.slo_id, e.event_type, strftime(e.ts, '%Y-%m-%d')
    """


@register("source_jdbc_catalog", oracle=_jdbc_catalog_oracle())
def source_jdbc_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_level_reporting_spark.operators.catalog import catalog_dims

    url = _derby_url("slr_derby_catalog", spark.sparkContext.applicationId)
    target = catalog_dims(spark)["target"]
    (
        target.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "slr_target")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    slo_ids = [r["slo_id"] for r in target.select("slo_id").collect()]
    cat = read_jdbc_table(
        spark, url, "slr_target",
        partition_column="slo_id",
        lower_bound=min(slo_ids), upper_bound=max(slo_ids) + 1,
        num_partitions=4,
        driver=DERBY_DRIVER,
    ).select("slo_id", "event_type", "lo", "hi")
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    breach = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(cat), "event_type")
        .groupBy("slo_id", "event_type", SF.day_str("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(breach, 1)).alias("breaches"))
    )


