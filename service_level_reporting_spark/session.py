"""SparkSession factory and runtime-config normalization.

The reference (zalando-zmon/service-level-reporting) is a Flask service whose
query processing is delegated to KairosDB/Postgres; here the entire engine is
Spark SQL, so session config is the only "server config" we have.

Two entry modes:

* ``get_spark()`` — build our own local session (tests, bench.py).
* ``configure(spark)`` — the driver hands us a session (``__spark_entry__``);
  we apply the runtime-settable confs it needs (UTC, ns-timestamp handling,
  AQE). All confs used here are runtime-settable SQL confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable and required for correctness on the
# /root/testdata parquet layout (SURVEY.md §1.3).
_RUNTIME_CONFS = {
    # Round-1-style testdata wrote events.ts as parquet timestamp[ns], which
    # Spark 4.x refuses unless read as raw long nanoseconds (converted in
    # tables.load_tables). Harmless when the data is timestamp[us] (current
    # testdata): the conf only affects NANOS-typed columns.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics; matches DuckDB's naive reading.
    "spark.sql.session.timeZone": "UTC",
    # Permissive arithmetic (divide-by-zero -> NULL) to mirror the oracle's
    # explicit NULLIF guards; we still use try_divide in ratio operators.
    "spark.sql.ansi.enabled": "false",
    # Runtime re-planning: coalesce post-shuffle partitions, skew-join
    # splitting, dynamic broadcast switch — the 100 TB posture.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few Pandas-UDF paths (similarity fallback, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Write timestamps as INT64 micros, not legacy INT96: INT96 columns
    # carry NO parquet statistics, which silently disables row-group
    # skipping and the txlog's file-stats MERGE pruning on time columns.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Python DataSource filter pushdown (the txlog source's pushFilters
    # prunes files from the commit log's stats before partition planning).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (driver mode)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment: tables.load_tables has a
            # pyarrow fallback for the ns-timestamp case.
            pass
    return spark


def get_spark(app_name: str = "slr-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session used by tests and bench.

    On a real cluster none of this changes: the engine only relies on
    runtime SQL confs, never on master/deploy specifics.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # r14 (guide §5, measured): this sandbox's guest-memory first-touch
    # costs ~0.8 ms per fault region under host pressure (SCALE.md §9), so
    # a python worker that TRIMS its heap between Arrow batches re-pays
    # gigabytes of faults on every re-run of an allocation-heavy kernel
    # (GEMM tiles, codecs). Pin glibc to retain the heap (trim threshold
    # 256 MB) and serve big temporaries from it (mmap threshold 128 MB):
    # workers keep ~150-200 MB resident each and re-runs stay warm.
    # Inherited by the JVM -> pyspark.daemon -> workers; harmless on a
    # normal host, env-overridable like every knob here.
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 * 1024 * 1024))
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 * 1024 * 1024))
    if shuffle_partitions is None:
        # Local mode: one shuffle partition per core keeps every stage busy
        # without tiny-task overhead at sf<=0.1. On a cluster this is left
        # to AQE (initialPartitionNum high, coalesce down).
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Local mode: every "executor" is this JVM, so locality preference
        # waits (default 3s tiers) only delay task launch. On a cluster this
        # stays default — it's a startup conf, not baked into any plan.
        .config("spark.locality.wait", "0")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
