"""Generated columns (r10 s2 — Delta generation expressions): declare
``name GENERATED ALWAYS AS (expr)``; every write computes the column
when omitted and validates it (null-safe) when supplied, at the single
write choke point. Pins: compute/validate/violate on append, the
declare-time legality rules, recompute-through-rewrites (UPDATE of a
referenced column, OPTIMIZE carry), checkpoint/retention survival,
clone carry, the rename/drop dependency guard, and drop-expression
semantics."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from service_level_reporting_spark.sources.txlog import (
    GeneratedColumnViolation, TxLogTable)


@pytest.fixture()
def table_path():
    p = os.path.join(tempfile.gettempdir(),
                     f"slr_gen_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(p + "_clone", ignore_errors=True)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, day string").coalesce(1)


def _raw(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp") \
        .coalesce(1)


TS = "2024-03-0{d} 0{h}:00:00"


def _ts(d, h=1):
    import datetime
    return datetime.datetime(2024, 3, d, h, 0, 0)


def test_compute_validate_violate(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    # empty table: declaration legal before any schema exists
    t.add_generated_column("day", "string",
                           "date_format(ts, 'yyyy-MM-dd')")
    assert t.generated_columns() == {
        "day": {"dtype": "string",
                "expr": "date_format(ts, 'yyyy-MM-dd')"}}

    # omitted -> computed
    t.append(_raw(spark, [("a", _ts(1)), ("b", _ts(2))]))
    got = {r["k"]: r["day"] for r in t.read(spark).collect()}
    assert got == {"a": "2024-03-01", "b": "2024-03-02"}

    # supplied-and-matching -> accepted
    t.append(_frame(spark, [("c", _ts(3), "2024-03-03")]))
    # supplied-and-wrong -> refused, nothing committed
    v = t.latest_version()
    with pytest.raises(GeneratedColumnViolation, match="day"):
        t.append(_frame(spark, [("d", _ts(4), "1999-01-01")]))
    assert t.latest_version() == v
    # NULL ts -> NULL generated value, supplied NULL matches (null-safe)
    t.append(_frame(spark, [("e", None, None)]))
    assert {r["k"]: r["day"] for r in t.read(spark).collect()}["e"] is None


def test_declaration_legality_on_existing_data(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_frame(spark, [("a", _ts(1), "2024-03-01")]))
    # column present + every row validates -> legal
    t.add_generated_column("day", "string",
                           "date_format(ts, 'yyyy-MM-dd')")
    t.drop_generated_column("day")
    # column present + a violating row -> refused
    t.append(_frame(spark, [("bad", _ts(2), "wrong")]))
    with pytest.raises(GeneratedColumnViolation, match="existing rows"):
        t.add_generated_column("day", "string",
                               "date_format(ts, 'yyyy-MM-dd')")
    # column NOT in the recorded schema + data present -> refused with
    # the remedy (old files would read NULL where a value is promised)
    with pytest.raises(ValueError, match="materialized"):
        t.add_generated_column("hour", "int", "hour(ts)")


def test_rewrites_recompute_not_validate(spark, table_path):
    """UPDATE of a referenced column recomputes the generated value
    (Delta's rule); carries through OPTIMIZE/bin-pack stay identical;
    MoR update post-images recompute too."""
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.add_generated_column("day", "string",
                           "date_format(ts, 'yyyy-MM-dd')")
    t.append(_raw(spark, [(f"k{i}", _ts(1 + i % 3)) for i in range(9)]))

    t.update(F.col("k") == "k0", {"ts": "ts + interval 5 days"})
    got = {r["k"]: r["day"] for r in t.read(spark).collect()}
    assert got["k0"] == "2024-03-06"          # recomputed, not stale
    t.update(F.col("k") == "k1", {"ts": "ts + interval 3 days"},
             mode="mor")
    got = {r["k"]: r["day"] for r in t.read(spark).collect()}
    assert got["k1"] == "2024-03-05"
    before = {(r["k"], r["day"]) for r in t.read(spark).collect()}
    t.optimize(target_files=1)
    assert {(r["k"], r["day"])
            for r in t.read(spark).collect()} == before
    # merge upserts compute for the incoming rows as well
    t.merge_into(_raw(spark, [("new", _ts(2, 5))]),
                 [("insert", None, None)])
    got = {r["k"]: r["day"] for r in t.read(spark).collect()}
    assert got["new"] == "2024-03-02"


def test_state_rides_checkpoints_clone_and_guards(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.add_generated_column("day", "string",
                           "date_format(ts, 'yyyy-MM-dd')")
    for i in range(12):                       # cross a checkpoint
        t.append(_raw(spark, [(f"k{i}", _ts(1 + i % 3))]))
    t2 = TxLogTable.open(table_path)          # fresh handle: ckpt seed
    assert "day" in t2.generated_columns()
    # checkpoint state equals full-log replay (validation walker)
    assert t2.generated_columns(use_checkpoint=False) == \
        t2.generated_columns()
    # survives log retention (boundary checkpoint carries the key)
    t2.vacuum(retain_versions=2, min_age_sec=0, log_retain_versions=3)
    assert "day" in TxLogTable.open(table_path).generated_columns()

    # clone carries the expression and keeps enforcing it
    c = t2.clone(table_path + "_clone")
    assert "day" in c.generated_columns()
    with pytest.raises(GeneratedColumnViolation):
        c.append(_frame(spark, [("x", _ts(1), "nope")]))

    # rename/drop guard: the generated column and its referenced inputs
    t2.enable_column_mapping()
    with pytest.raises(ValueError, match="generated column"):
        t2.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="generated column"):
        t2.drop_column("day")
    # dropping the EXPRESSION frees the column (data stays, now plain)
    t2.drop_generated_column("day")
    t2.rename_column("ts", "event_ts")
    assert "event_ts" in {f.name for f in
                          t2.table_schema_info()[0].fields}
    assert "describe" not in t2.generated_columns()
    d = t2.describe_detail()
    assert d["generated_columns"] == {}


def test_concurrent_declaration_gates_staged_writes(spark, table_path):
    """A generation expression committed while an append's files were
    already staged must gate the commit: the staged files were written
    under the old rules, and the append's blind retry loop would land
    rows the new expression never checked (Delta fails these with a
    metadata-changed conflict). The window is the NO-conflict one —
    append claims latest+1 at call time, so the check must run before
    every attempt, not only on VersionConflict."""

    class _Race(TxLogTable):
        fired = False

        def _write_data_files(self, df, **kw):
            adds = super()._write_data_files(df, **kw)
            if not type(self).fired:
                type(self).fired = True
                TxLogTable.open(self.path).add_generated_column(
                    "klen", "int", "length(k)")
            return adds

    def _f(rows):
        return spark.createDataFrame(rows, "k string, klen int") \
            .coalesce(1)

    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_f([("aa", 2), ("bbb", 3)]))        # valid pre-declaration

    # staged values violate the mid-flight declaration -> refused
    _Race.fired = False
    rt = _Race(table_path, key_cols=["k"], stats_col="k")
    v = rt.latest_version()
    with pytest.raises(GeneratedColumnViolation,
                       match="landed concurrently"):
        rt.append(_f([("cccc", 99)]))
    t2 = TxLogTable.open(table_path)
    assert t2.latest_version() == v + 1          # only the declaration
    assert "klen" in t2.generated_columns()

    # staged values that SATISFY the new expression land fine
    t2.drop_generated_column("klen")
    _Race.fired = False
    rt2 = _Race(table_path, key_cols=["k"], stats_col="k")
    rt2.append(_f([("dddd", 4)]))
    got = {r["k"]: r["klen"] for r in t2.read(spark).collect()}
    assert got == {"aa": 2, "bbb": 3, "dddd": 4}
