"""Type widening as a named table feature (r11, VERDICT #4 — Delta
3.x's typeWidening): lossless int/float chain widenings commit as
metadata, files keep their narrow physical type, readers up-cast per
file through BOTH APIs; narrower/cross-chain changes keep raising;
downlevel writers are refused by the feature gate; the widened schema
survives checkpoints and log retention."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from service_level_reporting_spark.sources import txlog as TX
from service_level_reporting_spark.sources.txlog import (
    ProtocolError, SchemaEvolutionError, TxLogTable)


@pytest.fixture()
def table_path():
    p = os.path.join(tempfile.gettempdir(),
                     f"slr_widen_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _t(path):
    return TxLogTable(path, key_cols=["k"], stats_col="k")


def test_widen_column_reads_old_and_new_files(spark, table_path):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)],
                                   "k string, v int").coalesce(1))
    # gate: widening refused before the feature is enabled
    with pytest.raises(ProtocolError, match="typeWidening"):
        t.widen_column("v", "long")
    # an incoming wider frame also refused (actionable message)
    with pytest.raises(SchemaEvolutionError, match="enable_type_widening"):
        t.append(spark.createDataFrame([("c", 3)],
                                       "k string, v long"))
    t.enable_type_widening()
    t.widen_column("v", "long")
    sch, _ = t.table_schema_info()
    assert sch["v"].dataType.simpleString() == "bigint"
    # wide values land; the old narrow file reads up-cast
    t.append(spark.createDataFrame([("c", 2 ** 40)],
                                   "k string, v long").coalesce(1))
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a": 1, "b": 2, "c": 2 ** 40}
    assert dict(t.read(spark).dtypes)["v"] == "bigint"
    # ...and through the registered Spark data source
    from service_level_reporting_spark.sources.txlog_datasource import (
        TxLogDataSource)
    spark.dataSource.register(TxLogDataSource)
    via = spark.read.format("txlog").load(table_path)
    assert dict(via.dtypes)["v"] == "bigint"
    assert {r["k"]: r["v"] for r in via.collect()} == got
    # a NARROW frame still appends (files narrower than schema is the
    # supported widened state)
    t.append(spark.createDataFrame([("d", 4)],
                                   "k string, v int").coalesce(1))
    assert {r["k"]: r["v"] for r in t.read(spark).collect()}["d"] == 4
    # idempotent + already-wide
    assert t.widen_column("v", "long") == t.latest_version()


def test_implicit_widening_on_append(spark, table_path):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 1.5)],
                                   "k string, v float").coalesce(1))
    t.enable_type_widening()
    t.append(spark.createDataFrame([("b", 2.5)],
                                   "k string, v double").coalesce(1))
    sch, _ = t.table_schema_info()
    assert sch["v"].dataType.simpleString() == "double"
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a": 1.5, "b": 2.5}


def test_illegal_changes_keep_raising(spark, table_path):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 2 ** 40)],
                                   "k string, v long").coalesce(1))
    t.enable_type_widening()
    with pytest.raises(SchemaEvolutionError, match="lossless"):
        t.widen_column("v", "int")              # narrowing
    with pytest.raises(SchemaEvolutionError, match="lossless"):
        t.widen_column("v", "double")           # cross-chain
    with pytest.raises(SchemaEvolutionError, match="lossless"):
        t.widen_column("k", "long")             # string -> numeric
    with pytest.raises(SchemaEvolutionError):
        t.append(spark.createDataFrame([("b", "oops")],
                                       "k string, v string"))


def test_downlevel_writer_refused(spark, table_path, monkeypatch):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 1)],
                                   "k string, v int").coalesce(1))
    t.enable_type_widening()
    # a writer that does not speak typeWidening must refuse to write
    monkeypatch.setattr(
        TX, "SUPPORTED_WRITER_FEATURES",
        TX.SUPPORTED_WRITER_FEATURES - {"typeWidening"})
    t2 = TxLogTable.open(table_path)
    with pytest.raises(ProtocolError, match="typeWidening"):
        t2.append(spark.createDataFrame([("b", 2)],
                                        "k string, v int").coalesce(1))
    monkeypatch.setattr(
        TX, "SUPPORTED_READER_FEATURES",
        TX.SUPPORTED_READER_FEATURES - {"typeWidening"})
    with pytest.raises(ProtocolError, match="typeWidening"):
        TxLogTable.open(table_path).read(spark)


def test_widening_survives_checkpoint_and_retention(spark, table_path):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 1)],
                                   "k string, v int").coalesce(1))
    t.enable_type_widening()
    t.widen_column("v", "long")
    for i in range(12):                      # cross a checkpoint
        t.append(spark.createDataFrame([(f"x{i}", 2 ** 40 + i)],
                                       "k string, v long").coalesce(1))
    t.vacuum(retain_versions=3, min_age_sec=0, log_retain_versions=5)
    t2 = TxLogTable.open(table_path)
    sch, _ = t2.table_schema_info()
    assert sch["v"].dataType.simpleString() == "bigint"
    got = {r["k"]: r["v"] for r in t2.read(spark).collect()}
    assert got["a"] == 1 and got["x0"] == 2 ** 40


def test_cdf_and_update_across_widening(spark, table_path):
    t = _t(table_path)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)],
                                   "k string, v int").coalesce(1))
    v0 = t.latest_version()
    t.enable_type_widening()
    t.widen_column("v", "long")
    t.append(spark.createDataFrame([("c", 2 ** 40)],
                                   "k string, v long").coalesce(1))
    t.update(F.col("k") == "a", {"v": "5"})
    ch = t.changes(spark, v0, net=True)
    assert dict(ch.dtypes)["v"] == "bigint"
    net = {(r["k"], r["v"], r["_change_type"]) for r in ch.collect()}
    assert ("a", 5, "insert") in net and ("a", 1, "delete") in net
    assert ("c", 2 ** 40, "insert") in net
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a": 5, "b": 2, "c": 2 ** 40}
