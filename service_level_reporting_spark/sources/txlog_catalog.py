"""SQL / catalog surface for txlog tables (r11, VERDICT #3).

The Python DataSource API gives ``spark.read.format("txlog")``; this
module closes the remaining gap — a user who lives in ``spark.sql``
can register a lakehouse table once and then query/join it in plain
SQL, including time travel:

* ``register_table(spark, name, path, ...)`` — the documented helper:
  issues ``CREATE OR REPLACE TEMPORARY VIEW name USING txlog
  OPTIONS (path ..., version ...)`` (Spark resolves the USING clause
  straight to the registered Python DataSource, so the view IS the
  native source — log-schema analysis, log-stats pushdown pruning,
  executor-parallel Arrow reads — not a snapshot copy). Time travel
  rides the options: ``version=`` / ``timestamp_as_of=`` pin the view
  to that snapshot (Delta's ``VERSION AS OF`` / ``TIMESTAMP AS OF``,
  spelled at registration because Spark SQL has no AS OF syntax hook
  for source-registered views).
* ``register_table(..., global_view=True)`` — the cross-session form:
  a GLOBAL temp view (``global_temp.name``), visible to every
  SparkSession of the application.
* ``sql_scope(...)`` — context manager that registers N tables and
  drops the views on exit, for one-shot SQL sessions.

**Why there is no metastore-persistent ``CREATE TABLE`` form** (probed
on PySpark 4.1.2): the session catalog ACCEPTS ``CREATE TABLE name
USING txlog OPTIONS (path ...)``, but at SELECT time it hands the
Python DataSource an EMPTY options map — neither OPTIONS nor LOCATION
round-trip through the metastore for Python data sources (verified
with an options-dumping probe source; SHOW CREATE TABLE loses the
USING clause too). Until Spark's Python DataSource API grows catalog
support, persistent registration would silently read nothing;
``register_table`` at session start is the honest equivalent.

**Snapshot semantics**: a view pins the snapshot CURRENT AT
REGISTRATION (the datasource's analysis-time pin — every query over
one view sees one consistent snapshot, Delta's analysis rule).
Re-register (``CREATE OR REPLACE`` under the hood) to advance to
latest, or pass ``version=`` for a reproducible historical pin.
``refresh_table(spark, name)`` (r12, VERDICT #4) is the long-lived
consumer's advance-to-latest: it re-registers the view from its
recorded registration (same path/options, fresh analysis-time pin),
so an interactive SQL session sees commits a concurrent writer landed
after registration — the temp-view analogue of Delta's ``REFRESH
TABLE``. Views pinned to ``version=``/``timestamp_as_of=`` refuse to
refresh (the pin IS their contract); re-register to move a pin.

Scale note: the view is a thin alias for the datasource scan — each
query plans one input partition per live data file of the pinned
snapshot and prunes files from the commit log's stats before planning.
Nothing here materializes data.

Reference: SLR exposes its catalog via SQLAlchemy models over Postgres
(upstream:app/models [H]); the Spark-native equivalent of "the catalog"
is the session catalog + this registration seam.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from service_level_reporting_spark.sources.txlog_datasource import (
    TxLogDataSource)

_IDENT_OK = set("abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _check_ident(name: str) -> str:
    if not name or not set(name) <= _IDENT_OK or name[0].isdigit():
        raise ValueError(f"txlog register_table: {name!r} is not a plain "
                         "SQL identifier")
    return name


def _quote(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _options_clause(path: str, version=None, timestamp_as_of=None,
                    merge_schema=False, with_row_ids=False) -> str:
    opts = [f"path {_quote(path)}"]
    if version is not None and timestamp_as_of is not None:
        raise ValueError("txlog register_table: give version OR "
                         "timestamp_as_of, not both")
    if version is not None:
        opts.append(f"version {_quote(int(version))}")
    if timestamp_as_of is not None:
        opts.append(f"timestampAsOf {_quote(float(timestamp_as_of))}")
    if merge_schema:
        opts.append("mergeSchema 'true'")
    if with_row_ids:
        opts.append("withRowIds 'true'")
    return ", ".join(opts)


def _ensure_registered(spark: SparkSession) -> None:
    """Idempotent datasource registration: same-session re-register is
    a WARN-and-replace, but a sibling session of one application raises
    DATA_SOURCE_ALREADY_EXISTS — the registry is app-wide."""
    try:
        spark.dataSource.register(TxLogDataSource)
    except Exception as e:
        if "ALREADY_EXISTS" not in str(e):
            raise


# r12 (VERDICT #4): registrations recorded per (session, name) so
# refresh_table can re-issue them verbatim. Global views key on the
# app ("global") — they are application-wide by construction.
_REGISTRY: dict[tuple, dict] = {}


def _reg_key(spark: SparkSession, name: str, global_view: bool) -> tuple:
    return ("global" if global_view else id(spark), name)


def register_table(spark: SparkSession, name: str, path: str,
                   version: int | None = None,
                   timestamp_as_of: float | None = None,
                   merge_schema: bool = False,
                   with_row_ids: bool = False,
                   global_view: bool = False) -> DataFrame:
    """Register ``name`` as a TEMPORARY VIEW over the txlog table at
    ``path`` (native datasource — see module docstring); returns the
    view's DataFrame. Re-registering a name replaces the prior view
    (and advances an unversioned view's pinned snapshot to latest).
    ``global_view=True`` registers in ``global_temp`` instead —
    visible to every SparkSession of this application."""
    _check_ident(name)
    _ensure_registered(spark)
    clause = _options_clause(path, version, timestamp_as_of,
                             merge_schema, with_row_ids)
    scope = "GLOBAL TEMPORARY" if global_view else "TEMPORARY"
    spark.sql(f"CREATE OR REPLACE {scope} VIEW {name} "
              f"USING txlog OPTIONS ({clause})")
    _REGISTRY[_reg_key(spark, name, global_view)] = {
        "path": path, "version": version,
        "timestamp_as_of": timestamp_as_of,
        "merge_schema": merge_schema, "with_row_ids": with_row_ids,
        "global_view": global_view}
    return spark.table(f"global_temp.{name}" if global_view else name)


def refresh_table(spark: SparkSession, name: str,
                  global_view: bool = False) -> DataFrame:
    """Advance a registered view's pinned snapshot to the table's
    CURRENT latest (r12, VERDICT #4): re-issues the recorded
    registration, so a long-lived SQL consumer sees commits landed
    after the original ``register_table`` — the temp-view analogue of
    ``REFRESH TABLE``. Raises KeyError for a name this module never
    registered (or another session's temp view) and ValueError for a
    version-/timestamp-pinned view: the pin is the view's
    reproducibility contract — re-register to move it."""
    reg = _REGISTRY.get(_reg_key(spark, name, global_view))
    if reg is None:
        raise KeyError(
            f"txlog refresh_table: {name!r} was not registered by "
            "register_table in this session (temp views are "
            "per-session; pass global_view=True for global_temp ones)")
    if reg["version"] is not None or reg["timestamp_as_of"] is not None:
        raise ValueError(
            f"txlog refresh_table: view {name!r} is pinned "
            f"(version={reg['version']}, "
            f"timestamp_as_of={reg['timestamp_as_of']}) — a pinned "
            "view is a reproducible snapshot by contract; "
            "re-register to move the pin.")
    return register_table(spark, name, **reg)


@contextmanager
def sql_scope(spark: SparkSession, **tables: str):
    """``with sql_scope(spark, a=path1, b=path2): spark.sql('... a JOIN
    b ...')`` — registers each kwarg as a temp view, drops them all on
    exit (exception-safe)."""
    names = []
    try:
        for name, path in tables.items():
            register_table(spark, name, path)
            names.append(name)
        yield spark
    finally:
        for name in names:
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
            _REGISTRY.pop(_reg_key(spark, name, False), None)
