"""r13 (VERDICT #4) before/after: the two lakehouse utility loops that
ran serially on the driver until r12 —

  (a) CONVERT TO TXLOG's per-file footer/stats reads, measured at
      >= 10^4 plain parquet files;
  (b) DEEP CLONE's byte copies, measured at >= 10 GB over 512 files —

each timed with the shipped executor fan-out (sc.parallelize over the
file list) vs the r12 driver loop (DISTRIBUTE_MIN_FILES monkeypatched
to infinity). Result parity is asserted on (a); (b) asserts the clone's
foreign-reference audit reads 0 both ways. Writes BENCH_CONVERT_CLONE.json.
"""
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVERT_FILES = int(os.environ.get("PROBE_CONVERT_FILES", "10000"))
CLONE_FILES = int(os.environ.get("PROBE_CLONE_FILES", "512"))
CLONE_GB = float(os.environ.get("PROBE_CLONE_GB", "10"))


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from service_level_reporting_spark.sources import txlog as TX

    spark = (SparkSession.builder.master("local[16]")
             .appName("slr-convert-clone-probe")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(),
                        f"slr_cvclone_{uuid.uuid4().hex[:8]}")
    os.makedirs(base)
    out = {"convert": {}, "deep_clone": {}}
    try:
        # ---- (a) convert at 10^4 files -------------------------------
        # numPartitions on range (not repartition): no staging shuffle
        plain = os.path.join(base, "plain")
        (spark.range(0, N_CONVERT_FILES * 100, 1, N_CONVERT_FILES)
         .select(F.concat(F.lit("k"), F.col("id").cast("string"))
                 .alias("k"), F.col("id").alias("v"))
         .write.parquet(plain))
        plain2 = os.path.join(base, "plain2")
        shutil.copytree(plain, plain2)

        t0 = time.perf_counter()
        t_dist = TX.TxLogTable.convert(plain, key_cols=["k"],
                                       stats_col="k")
        dist_sec = time.perf_counter() - t0

        orig_min = TX.DISTRIBUTE_MIN_FILES
        TX.DISTRIBUTE_MIN_FILES = 10**9
        try:
            t0 = time.perf_counter()
            t_drv = TX.TxLogTable.convert(plain2, key_cols=["k"],
                                          stats_col="k")
            drv_sec = time.perf_counter() - t0
        finally:
            TX.DISTRIBUTE_MIN_FILES = orig_min

        strip = (lambda adds: sorted(
            ({**a, "path": os.path.basename(a["path"])} for a in adds),
            key=lambda a: a["path"]))
        assert strip(t_dist._resolve()) == strip(t_drv._resolve())
        out["convert"] = {
            "n_files": N_CONVERT_FILES,
            "driver_sec": round(drv_sec, 2),
            "distributed_sec": round(dist_sec, 2),
            "speedup": round(drv_sec / dist_sec, 2),
            "parity": "add-lists identical",
        }
        print("convert:", json.dumps(out["convert"]), flush=True)
        shutil.rmtree(plain)
        shutil.rmtree(plain2)

        # ---- (b) deep clone at >= 10 GB ------------------------------
        rows = int(CLONE_GB * (1 << 30) / 8 / 1.05)   # ~8B/row parquet
        src = TX.TxLogTable(os.path.join(base, "src"),
                            key_cols=["k"], stats_col="k")
        src.append(spark.range(0, rows, 1, CLONE_FILES)
                   .select(F.col("id").cast("string").alias("k"),
                           (F.rand(7) * 1e9).cast("long").alias("v")))
        gb = sum(os.path.getsize(os.path.join(r, f))
                 for r, _, fs in os.walk(src.path)
                 for f in fs if f.endswith(".parquet")) / (1 << 30)

        t0 = time.perf_counter()
        deep1 = src.clone(os.path.join(base, "deep_dist"), deep=True)
        dist_sec = time.perf_counter() - t0
        assert deep1.verify_references()["foreign"] == 0
        shutil.rmtree(deep1.path)

        TX.DISTRIBUTE_MIN_FILES = 10**9
        try:
            t0 = time.perf_counter()
            deep2 = src.clone(os.path.join(base, "deep_drv"), deep=True)
            drv_sec = time.perf_counter() - t0
        finally:
            TX.DISTRIBUTE_MIN_FILES = orig_min
        assert deep2.verify_references()["foreign"] == 0
        out["deep_clone"] = {
            "n_files": CLONE_FILES, "gb": round(gb, 2),
            "driver_sec": round(drv_sec, 2),
            "distributed_sec": round(dist_sec, 2),
            "speedup": round(drv_sec / dist_sec, 2),
            "parity": "foreign refs 0 both ways",
        }
        print("deep_clone:", json.dumps(out["deep_clone"]), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_CONVERT_CLONE.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
