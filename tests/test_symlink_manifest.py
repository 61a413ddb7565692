"""r12 symlink-format manifest export (Delta GENERATE parity): a plain
parquet reader — DuckDB here, standing in for Trino/Hive — reads the
manifest's file list and must see exactly the txlog snapshot. Honest
refusals: live deletion vectors (external readers would resurrect
soft-deleted rows) and column mapping (physical names untranslatable).
"""

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
                     f"slr_manifest_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int").coalesce(1)


def test_duckdb_reads_manifest_snapshot(spark, table_path):
    import duckdb

    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.append(_df(spark, [("c", 3)]))
    t.delete("k = 'a'")                  # CoW: no DV left behind
    res = t.export_symlink_manifest()
    assert res["files"] == 2
    listed = [ln for ln in open(res["manifest"]).read().splitlines()
              if ln]
    assert all(os.path.isabs(p) and os.path.exists(p) for p in listed)
    got = duckdb.connect().execute(
        "SELECT k, v FROM read_parquet(?) ORDER BY k",
        [listed]).fetchall()
    want = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == want

    # point-in-time: a later commit does NOT move the manifest...
    t.append(_df(spark, [("d", 4)]))
    assert [ln for ln in open(res["manifest"]).read().splitlines()
            if ln] == listed
    # ...and re-export atomically replaces it with the new snapshot
    res2 = t.export_symlink_manifest()
    got2 = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet(?)",
        [[ln for ln in open(res2["manifest"]).read().splitlines()
          if ln]]).fetchone()[0]
    assert got2 == t.read(spark).count() == 3


def test_manifest_refuses_dv_and_mapping(spark, table_path):
    t = TxLogTable(table_path, key_cols=["k"], stats_col="k")
    t.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1))
    t.delete("k = 'a'", mode="mor")      # leaves a DV chain
    with pytest.raises(ValueError, match="deletion vector"):
        t.export_symlink_manifest()
    # purging the DV (compaction) makes the export legal again
    t.optimize(target_files=1)
    assert t.export_symlink_manifest()["files"] >= 1
    # column mapping: physical names are untranslatable outside
    t.enable_column_mapping()
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="column mapping"):
        t.export_symlink_manifest()
