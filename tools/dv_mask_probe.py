"""Scaled deletion-vector MASK probe (r9, VERDICT item 7).

The r8 fix routed a past-broadcast DV mask through SHUFFLE_HASH and was
plan-fact pytest-pinned — but never TIMED. This probe measures the mask
path itself at the scale the plan test only planted:

* stage a 10M-row txlog table across 16 files, MoR-delete ~20% (a 2M-row
  DV sidecar — past DV_BROADCAST_MAX_ROWS, so the anti-join must take
  the shuffle_hash branch, not a broadcast);
* time a full snapshot read (count + an aggregate) through the TABLE API
  and through the DATA SOURCE;
* time the same reads on a DV-LESS TWIN holding exactly the live rows —
  the mask overhead is the ratio;
* assert value-equality of masked table vs twin, and that the masked
  plan did NOT broadcast (the driver-memory cliff the gate exists for).

Output: one JSON line (recorded to BENCH_DV_MASK.json at repo root).
Usage: python tools/dv_mask_probe.py [n_rows] [n_files]
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
from service_level_reporting_spark.sources.txlog import (
    DV_BROADCAST_MAX_ROWS, TxLogTable)
from service_level_reporting_spark.sources.txlog_datasource import (
    TxLogDataSource)

BASE = "/tmp/slr_dv_mask_probe"


def timed(fn, reps: int = 3):
    """min-of-reps wall time (rebuilding the frame per rep — re-collecting
    one DataFrame object reuses shuffle output and lies by ~20x)."""
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="slr-dv-mask-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TxLogDataSource)

    def rows(rng):
        return rng.select(
            F.col("id").alias("k"),
            F.format_string("g%03d", (F.col("id") % 200).cast("int"))
            .alias("g"),
            (F.col("id") % 997).cast("double").alias("v"))

    masked = TxLogTable(os.path.join(BASE, "masked"),
                        key_cols=["k"], stats_col="g")
    masked.append(rows(spark.range(n_rows)).repartition(n_files))
    st = masked.delete("k % 5 = 1", mode="mor")
    dv_rows = masked._dv_sidecar_rows(
        sorted({d for a in masked._resolve() for d in a.get("dv", ())}))
    assert dv_rows > DV_BROADCAST_MAX_ROWS, (
        f"probe must exercise the past-broadcast branch ({dv_rows})")

    twin = TxLogTable(os.path.join(BASE, "twin"),
                      key_cols=["k"], stats_col="g")
    twin.append(rows(spark.range(n_rows))
                .where("k % 5 != 1").repartition(n_files))

    # the masked plan must NOT broadcast the 2M-row sidecar
    plan = masked.read(spark)._jdf.queryExecution().executedPlan().toString()
    mask_join = ("broadcast" if "BroadcastHashJoin" in plan
                 else "shuffle_hash" if "ShuffledHashJoin" in plan
                 else "other")

    def agg_of(df):
        return (df.groupBy("g").agg(F.sum("v").alias("s"))
                .agg(F.sum("s")).first()[0])

    out = {"metric": "dv_mask_probe", "n_rows": n_rows,
           "n_files": n_files, "masked_rows": st["matched_rows"],
           "dv_sidecar_rows": dv_rows, "mask_join": mask_join}
    for name, reader in (
            ("table_api_masked", lambda: masked.read(spark)),
            ("table_api_twin", lambda: twin.read(spark)),
            ("datasource_masked", lambda: spark.read.format("txlog")
             .load(masked.path)),
            ("datasource_twin", lambda: spark.read.format("txlog")
             .load(twin.path))):
        cs, cnt = timed(lambda r=reader: r().count())
        gs, _ = timed(lambda r=reader: agg_of(r()))
        out[name] = {"count_sec": cs, "agg_sec": gs, "rows": cnt}
    assert (out["table_api_masked"]["rows"]
            == out["table_api_twin"]["rows"]
            == out["datasource_masked"]["rows"])
    a, b = masked.read(spark), twin.read(spark)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
    out["values_equal_twin"] = True
    out["mask_overhead_table_api"] = round(
        out["table_api_masked"]["agg_sec"]
        / max(out["table_api_twin"]["agg_sec"], 1e-9), 2)
    out["mask_overhead_datasource"] = round(
        out["datasource_masked"]["agg_sec"]
        / max(out["datasource_twin"]["agg_sec"], 1e-9), 2)
    line = json.dumps(out)
    print(line)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_DV_MASK.json"), "w") as fh:
        fh.write(line + "\n")
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
