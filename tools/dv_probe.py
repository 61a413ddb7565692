"""Deletion-vector probe (r7 s2): measure what merge-on-read buys.

Stages one txlog table of N_ROWS uuid-keyed rows across N_FILES files
(keys SCATTERED so range stats cannot prune a point delete — the worst
case copy-on-write faces), clones it, and times on each clone:

* DELETE of N_DELETE scattered keys — mode='cow' (rewrites every file
  the predicate may touch) vs mode='mor' (one DV sidecar write);
* a full snapshot read AFTER the delete (the MoR read tax: the
  broadcast anti-join against the mask);
* OPTIMIZE on the MoR clone (the purge that retires the read tax).

Correctness is asserted in-run (both clones read identical rows after
the delete). Output: one JSON line, recorded in SCALE.md.

Usage: python tools/dv_probe.py [n_rows] [n_files] [n_delete]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.sources.txlog import TxLogTable

BASE = "/tmp/slr_dv_probe"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_del = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="slr-dv-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # uuid-ish scattered keys: md5 of the id — every file spans the whole
    # key space, so stats never prune a point predicate
    df = (spark.range(n_rows)
          .select(F.md5(F.col("id").cast("string")).alias("uid"),
                  F.lit("a").alias("g"),
                  (F.col("id") % 1000 * 1.0).alias("v"))
          .repartition(n_files))
    paths = {}
    for mode in ("cow", "mor"):
        p = os.path.join(BASE, mode)
        t = TxLogTable(p, key_cols=["uid"], stats_col="g")
        t.append(df)
        paths[mode] = t
    # victims spread across files: md5 keys are uniform, so the n_del
    # smallest uids land in ~n_del distinct files (limit() alone would
    # short-circuit on one partition and delete from a single file)
    victims = [r["uid"] for r in paths["cow"].read(spark)
               .select("uid").orderBy("uid").limit(n_del).collect()]
    pred = F.col("uid").isin(victims)

    def dir_bytes(root: str) -> int:
        total = 0
        for r, _, fs in os.walk(root):
            for f in fs:
                total += os.path.getsize(os.path.join(r, f))
        return total

    out = {"metric": "dv_probe", "n_rows": n_rows, "n_files": n_files,
           "n_delete": n_del}
    for mode in ("cow", "mor"):
        t = paths[mode]
        before = dir_bytes(t.path)
        sec, stats = timed(lambda: t.delete(pred, mode=mode))
        read_sec, cnt = timed(lambda: t.read(spark).count())
        out[f"delete_{mode}"] = {
            "sec": sec, "read_after_sec": read_sec, "rows_after": cnt,
            # the metric that SCALES: bytes the delete wrote (CoW = the
            # rewritten region; MoR = DV + change-data sidecars only)
            "bytes_written": dir_bytes(t.path) - before,
            **{k: stats[k] for k in ("matched_rows", "rewritten_files",
                                     "dv_files", "removed_files")
               if k in stats}}
    assert (out["delete_cow"]["rows_after"]
            == out["delete_mor"]["rows_after"] == n_rows - n_del)
    # value-level equality of the two clones after the delete
    a = paths["cow"].read(spark)
    b = paths["mor"].read(spark)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"cow/mor snapshots diverge by {diff} rows"
    out["snapshots_equal"] = True

    sec, st = timed(lambda: paths["mor"].optimize(target_files=n_files))
    read2, _ = timed(lambda: paths["mor"].read(spark).count())
    out["mor_optimize_purge"] = {"sec": sec,
                                 "read_after_purge_sec": read2}
    out["speedup_delete"] = round(
        out["delete_cow"]["sec"] / max(out["delete_mor"]["sec"], 1e-9), 2)
    out["write_amplification_cow_vs_mor"] = round(
        out["delete_cow"]["bytes_written"]
        / max(out["delete_mor"]["bytes_written"], 1), 1)
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
