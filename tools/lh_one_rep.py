"""One lakehouse-bench repetition (bench.py `_lakehouse_block` rep,
verbatim semantics) against WHICHEVER package PYTHONPATH resolves —
the unit the r12 interleaved A/B bisect (tools/lh_bisect.py) alternates
between the r10 worktree and r11 HEAD so both code versions share one
weather window.

Prints ONE JSON line: {"append": s, "merge_into": s, "delete_mor": s,
"changes_fold": s, "root": <resolved package dir>}.
"""
import json
import os
import shutil
import sys
import tempfile
import time
import uuid


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import service_level_reporting_spark as pkg
    from service_level_reporting_spark.operators import matview as MV
    from service_level_reporting_spark.sources.txlog import TxLogTable

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName("slr-lh-bisect")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = int(os.environ.get("SPARK_GRAFT_LH_ROWS", "2000000"))
    m = n // 100
    spec = {"keys": ["g"], "aggs": {"v_sum": ("sum", "v"),
                                    "n_rows": ("count", "*"),
                                    "v_avg": ("avg", "v")}}
    # warm the JVM/codegen path outside the timed ops, mirroring bench.py's
    # plan-shape warmup, so the first timed op isn't paying classloading
    spark.range(1000).groupBy((F.col("id") % 7).alias("g")).count().collect()

    out = {}
    path = os.path.join(tempfile.gettempdir(),
                        f"slr_lh_bisect_{uuid.uuid4().hex[:8]}")
    try:
        t = TxLogTable(path, key_cols=["k"], stats_col="g")

        def g_of(col):
            return F.format_string("g%04d", (col % 500).cast("int"))

        base = spark.range(n).select(
            F.col("id").alias("k"), g_of(F.col("id")).alias("g"),
            (F.col("id") % 997).cast("double").alias("v")).repartition(16)
        t0 = time.perf_counter()
        t.append(base)
        out["append"] = time.perf_counter() - t0
        v_append = t.latest_version()
        state = MV.mv_init(t.read(spark, version=v_append),
                           spec).localCheckpoint(eager=True)

        k = (F.when(F.col("id") % 2 == 0, F.col("id") * 97)
              .otherwise(F.col("id") + n))
        src = spark.range(m).select(
            k.alias("k"), g_of(k).alias("g"),
            (k % 991).cast("double").alias("v")).repartition(4)
        t0 = time.perf_counter()
        t.merge_into(src, [("update", None, {"v": "src_v"}),
                           ("insert", None, None)])
        out["merge_into"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        t.delete("k % 1000 = 7", mode="mor")
        out["delete_mor"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ch = t.changes(spark, v_append, net=True)
        MV.mv_apply_changes(state, ch, spec)["state"].collect()
        out["changes_fold"] = time.perf_counter() - t0

        # structural evidence for the r12 bisect: does this rep's table
        # ever write a checkpoint? (3 commits, CHECKPOINT_EVERY=10 -> no)
        log_dir = os.path.join(path, "_txlog")
        out["ckpt_parts"] = len(
            [f for f in os.listdir(log_dir)
             if ".checkpoint" in f]) if os.path.isdir(log_dir) else -1
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()
    out["root"] = os.path.dirname(os.path.abspath(pkg.__file__))
    print("LHREP " + json.dumps({k: (round(v, 4)
                                     if isinstance(v, float) else v)
                                 for k, v in out.items()}))


if __name__ == "__main__":
    main()
