"""SQL / catalog surface for txlog tables (r11, VERDICT #3):
register_table -> CREATE [GLOBAL] TEMPORARY VIEW ... USING txlog,
time travel via options, plain-SQL joins of two lakehouse tables,
cross-session global views, and parity with the Python API. (No
metastore-persistent form: Spark 4.1.2 drops a Python datasource's
OPTIONS at catalog-table read time — see txlog_catalog's docstring.)"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from service_level_reporting_spark.sources.txlog import TxLogTable
from service_level_reporting_spark.sources.txlog_catalog import (
    register_table, sql_scope)


@pytest.fixture()
def table_path():
    p = os.path.join(tempfile.gettempdir(),
                     f"slr_txsql_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(p + "_b", ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int").coalesce(1)


def test_sql_join_of_two_txlog_tables(spark, table_path):
    a = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    a.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    b = TxLogTable(table_path + "_b", key_cols=["k"], stats_col="k")
    b.append(_df(spark, [("b", 20), ("c", 30), ("d", 40)]))

    register_table(spark, "sqlt_a", table_path)
    register_table(spark, "sqlt_b", table_path + "_b")
    got = {(r["k"], r["va"], r["vb"]) for r in spark.sql(
        "SELECT a.k, a.v AS va, b.v AS vb FROM sqlt_a a "
        "JOIN sqlt_b b ON a.k = b.k ORDER BY a.k").collect()}
    assert got == {("b", 2, 20), ("c", 3, 30)}

    # snapshot semantics: the view PINS the registration-time snapshot
    # (consistent reads); a later commit is invisible until re-register
    a.append(_df(spark, [("d", 4)]))
    got2 = {r["k"] for r in spark.sql(
        "SELECT a.k FROM sqlt_a a JOIN sqlt_b b ON a.k = b.k").collect()}
    assert got2 == {"b", "c"}
    register_table(spark, "sqlt_a", table_path)      # advance to latest
    got3 = {r["k"] for r in spark.sql(
        "SELECT a.k FROM sqlt_a a JOIN sqlt_b b ON a.k = b.k").collect()}
    assert got3 == {"b", "c", "d"}
    spark.catalog.dropTempView("sqlt_a")
    spark.catalog.dropTempView("sqlt_b")


def test_version_and_timestamp_as_of_views(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1)]))
    v0 = t.latest_version()
    ts0 = t._commit_ts(v0)
    t.append(_df(spark, [("b", 2)]))
    t.update(F.col("k") == "a", {"v": "100"})

    register_table(spark, "sqlt_v0", table_path, version=v0)
    assert [(r["k"], r["v"]) for r in
            spark.sql("SELECT * FROM sqlt_v0").collect()] == [("a", 1)]
    register_table(spark, "sqlt_ts", table_path, timestamp_as_of=ts0)
    assert [(r["k"], r["v"]) for r in
            spark.sql("SELECT * FROM sqlt_ts").collect()] == [("a", 1)]
    # parity with the Python API at the same pin
    sql_rows = spark.sql("SELECT * FROM sqlt_v0")
    py_rows = t.read(spark, version=v0)
    assert (sql_rows.exceptAll(py_rows)
            .unionAll(py_rows.exceptAll(sql_rows)).count()) == 0
    with pytest.raises(ValueError, match="not both"):
        register_table(spark, "sqlt_bad", table_path,
                       version=v0, timestamp_as_of=ts0)
    spark.catalog.dropTempView("sqlt_v0")
    spark.catalog.dropTempView("sqlt_ts")


def test_global_view_crosses_sessions(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    name = f"txglob_{uuid.uuid4().hex[:8]}"
    try:
        register_table(spark, name, table_path, global_view=True)
        assert spark.sql(f"SELECT count(*) c FROM global_temp.{name}") \
            .collect()[0]["c"] == 2
        # a SECOND session of the same application sees it
        s2 = spark.newSession()
        from service_level_reporting_spark.sources.txlog_datasource \
            import TxLogDataSource
        try:
            s2.dataSource.register(TxLogDataSource)
        except Exception:
            pass
        assert s2.sql(f"SELECT count(*) c FROM global_temp.{name}") \
            .collect()[0]["c"] == 2
    finally:
        spark.catalog.dropGlobalTempView(name)


def test_sql_scope_registers_and_drops(spark, table_path):
    a = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    a.append(_df(spark, [("a", 1)]))
    with sql_scope(spark, scoped_a=table_path):
        assert spark.sql("SELECT count(*) c FROM scoped_a") \
            .collect()[0]["c"] == 1
    with pytest.raises(Exception):
        spark.sql("SELECT * FROM scoped_a").collect()


def test_identifier_guard(spark, table_path):
    TxLogTable(table_path, key_cols=["k"], stats_col="k") \
        .append(_df(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="identifier"):
        register_table(spark, "bad-name; DROP", table_path)
    with pytest.raises(ValueError, match="identifier"):
        register_table(spark, "1leading", table_path)


def test_refresh_table_advances_long_lived_consumer(spark, table_path):
    """r12 (VERDICT #4): a long-lived SQL consumer's view advances to
    commits a concurrent writer landed after registration — via
    refresh_table, without the consumer knowing the table's path."""
    from service_level_reporting_spark.sources.txlog_catalog import (
        refresh_table)

    w = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    w.append(_df(spark, [("a", 1), ("b", 2)]))
    register_table(spark, "refr_t", table_path)
    assert spark.sql("SELECT count(*) c FROM refr_t") \
        .collect()[0]["c"] == 2
    # concurrent writer advances the table: pinned view can't see it
    w.append(_df(spark, [("c", 3)]))
    w.delete("k = 'a'")
    assert spark.sql("SELECT count(*) c FROM refr_t") \
        .collect()[0]["c"] == 2
    refresh_table(spark, "refr_t")
    assert {r["k"] for r in spark.sql(
        "SELECT k FROM refr_t").collect()} == {"b", "c"}
    spark.catalog.dropTempView("refr_t")


def test_refresh_table_guards(spark, table_path):
    from service_level_reporting_spark.sources.txlog_catalog import (
        refresh_table)

    w = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    w.append(_df(spark, [("a", 1)]))
    with pytest.raises(KeyError, match="not registered"):
        refresh_table(spark, "never_registered_view")
    register_table(spark, "refr_pin", table_path, version=0)
    with pytest.raises(ValueError, match="pinned"):
        refresh_table(spark, "refr_pin")
    spark.catalog.dropTempView("refr_pin")
