"""r12 (VERDICT #3) before/after: merge_into over a table whose latest
checkpoint carries 10^5 adds (realistic stats + bloom payloads) — the
prune-driven rewrite resolves the checkpoint COLUMN-SELECTIVELY (no
bloom_json/extra_json chunks) vs the r11 behavior (full part parse).

Interleaved A/B in one process: each rep plants a fresh table, then
times merge_into twice — once with the selective resolve (shipped) and
once with _REWRITE_COLS monkeypatched to None (the r11 full parse) —
order alternating. The payload cache is cleared between timed calls so
each measures a COLD resolve (the cache is the other r12 fix; here we
isolate column selectivity). Writes BENCH_REWRITE_SELECTIVE.json.
"""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ADDS = int(os.environ.get("PROBE_ADDS", "100000"))
REPS = int(os.environ.get("PROBE_REPS", "5"))


def plant(t, spark, n):
    from service_level_reporting_spark.sources.txlog import bloom_build
    for v in range(11):
        t.append(spark.createDataFrame(
            [(f"k{v:03d}", v)], "k string, v long").coalesce(1))
    bloom = bloom_build([f"z{i:06d}" for i in range(2000)])
    fake = [{"path": f"data/fake/{i:06d}.parquet", "rows": 1000,
             "min": f"z{i:06d}", "max": f"z{i + 1:06d}",
             "stats": {"k": {"lo": f"z{i:06d}", "hi": f"z{i + 1:06d}",
                             "nulls": 0},
                       "v": {"lo": i, "hi": i + 1000, "nulls": 0}},
             "bloom": bloom}
            for i in range(n)]
    cp = os.path.join(t.log_dir, "00000000000000000010.checkpoint.json")
    meta = json.load(open(cp))
    allf = t._resolve(10, use_checkpoint=False) + fake
    for i in range(int(meta["files_parts"])):
        os.remove(t._part_path(10, i))
    psz = 30_000
    parts = [allf[i:i + psz] for i in range(0, len(allf), psz)]
    for i, part in enumerate(parts):
        t._write_ckpt_part(t._part_path(10, i), part)
    meta["files_parts"] = len(parts)
    meta["n_files"] = len(allf)
    with open(cp, "w") as fh:
        json.dump(meta, fh)


def main() -> None:
    from pyspark.sql import SparkSession

    from service_level_reporting_spark.sources.txlog import TxLogTable

    spark = (SparkSession.builder.master("local[8]")
             .appName("slr-rwsel-probe")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    orig_resolve = TxLogTable._resolve
    runs = {"selective": [], "full": []}
    ckpt_bytes = None
    for rep in range(REPS):
        path = os.path.join(tempfile.gettempdir(),
                            f"slr_rwsel_probe_{uuid.uuid4().hex[:8]}")
        try:
            t = TxLogTable(path, key_cols=["k"], stats_col="k")
            plant(t, spark, N_ADDS)
            if ckpt_bytes is None:
                ckpt_bytes = sum(
                    os.path.getsize(os.path.join(t.log_dir, f))
                    for f in os.listdir(t.log_dir)
                    if f.endswith(".checkpoint.part"))
            order = ("selective", "full") if rep % 2 == 0 \
                else ("full", "selective")
            for tag in order:
                h = TxLogTable.open(path)     # fresh handle: cold caches
                if tag == "full":
                    # the r11 behavior: every resolve parses every column
                    h._resolve = (lambda version=None, use_checkpoint=True,
                                  columns=None, _h=h:
                                  orig_resolve(_h, version, use_checkpoint,
                                               None))
                src = spark.createDataFrame(
                    [(f"k{rep:03d}", 9000 + rep)], "k string, v long")
                t0 = time.perf_counter()
                h.merge_into(src, [("update", None, {"v": "src_v"}),
                                   ("insert", None, None)])
                runs[tag].append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(path, ignore_errors=True)
    out = {
        "adds": N_ADDS, "reps": REPS,
        "checkpoint_part_bytes": ckpt_bytes,
        "runs": {k: [round(x, 4) for x in v] for k, v in runs.items()},
        "med_sec": {k: round(statistics.median(v), 4)
                    for k, v in runs.items()},
        "speedup_med": round(statistics.median(runs["full"])
                             / statistics.median(runs["selective"]), 3),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_REWRITE_SELECTIVE.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
