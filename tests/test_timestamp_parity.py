"""r12 timestamp-parity wrappers: RESTORE TO TIMESTAMP and CDF by
timestamp range resolve through the O(log n) monotonic in-commit-
timestamp search and must equal their version-addressed twins."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from service_level_reporting_spark.sources.txlog import TxLogTable


@pytest.fixture()
def table_path():
    p = os.path.join(tempfile.gettempdir(),
                     f"slr_tsparity_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int").coalesce(1)


def test_changes_between_timestamps_equals_version_range(spark,
                                                         table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1)]))                       # v0
    t.append(_df(spark, [("b", 2)]))                       # v1
    t.delete("k = 'a'")                                    # v2
    t.append(_df(spark, [("c", 3)]))                       # v3
    ts1, ts3 = t._commit_ts(1), t._commit_ts(3)

    by_ts = t.changes_between_timestamps(spark, ts1, ts3, net=True)
    by_v = t.changes(spark, 1, 3, net=True)
    assert by_ts.exceptAll(by_v).unionAll(
        by_v.exceptAll(by_ts)).count() == 0
    # open-ended to_ts defaults to latest, exactly like changes()
    open_ts = t.changes_between_timestamps(spark, ts1)
    open_v = t.changes(spark, 1)
    assert open_ts.exceptAll(open_v).unionAll(
        open_v.exceptAll(open_ts)).count() == 0
    # a timestamp BETWEEN two commits resolves to the earlier one
    # (Delta's TIMESTAMP AS OF rule): strictly-after semantics hold
    mid = (t._commit_ts(1) + t._commit_ts(2)) / 2
    assert t.changes_between_timestamps(spark, mid, net=True) \
        .count() == t.changes(spark, 1, net=True).count()


def test_restore_to_timestamp(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1), ("b", 2)]))             # v0
    want = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    t.delete("k = 'a'")                                    # v1
    t.append(_df(spark, [("c", 3)]))                       # v2
    res = t.restore_to_timestamp(t._commit_ts(0))
    assert res["restored_to"] == 0
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == want
    # a pre-table timestamp raises the documented error
    with pytest.raises(ValueError, match="newer than"):
        t.restore_to_timestamp(t._commit_ts(0) - 10.0)


def test_changes_from_pre_table_timestamp_means_beginning(spark,
                                                          table_path):
    """Delta's startingTimestamp rule: a from_ts older than the first
    commit starts the feed at the beginning (changes from -1)."""
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1)]))
    t.append(_df(spark, [("b", 2)]))
    early = t.changes_between_timestamps(spark, t._commit_ts(0) - 100.0,
                                         net=True)
    full = t.changes(spark, -1, net=True)
    assert early.exceptAll(full).unionAll(
        full.exceptAll(early)).count() == 0
    assert early.count() == 2
