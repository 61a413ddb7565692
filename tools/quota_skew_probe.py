"""r13 (VERDICT #3): corpus_source_quota under extreme skew — one
mega-domain owns 50% of a 10^6-doc corpus. A/B the single-window path
(the whole mega-domain sorts in ONE task) against the salted two-phase
top-K (`quota_skew_safe`: per-(source,salt) pre-top-K spreads that sort
over QUOTA_SALTS tasks, then an exact final top-K over the bounded
candidate set). Interleaved order per rep, equality asserted once.
Writes BENCH_QUOTA_SKEW.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [int(s) for s in
          os.environ.get("PROBE_DOCS", "1000000,10000000").split(",")]
N_SMALL_SOURCES = 5000
REPS = int(os.environ.get("PROBE_REPS", "5"))


def one_scale(spark, CU, n_docs):
    from pyspark.sql import functions as F

    # 50% of docs land on source 'mega'; the rest spread over 5k sources.
    # n_chars is a deterministic pseudo-random so top-K is non-trivial.
    docs = (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("mega"))
         .otherwise(F.concat(F.lit("s"),
                             (F.xxhash64("id") % N_SMALL_SOURCES)
                             .cast("string"))).alias("source"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100000))
        .alias("n_chars"))
        .persist())
    docs.count()

    from pyspark.sql import Window

    def window_path():
        w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                                 F.asc("doc_id"))
        kept = F.col("rk") <= CU.SOURCE_QUOTA
        return (docs.select("source", "doc_id", "n_chars")
                .withColumn("rk", F.row_number().over(w))
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(kept.cast("long")).alias("n_kept"),
                     F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
                     .alias("kept_chars")))

    # equality once (sorted collect at 5k+1 sources is tiny)
    a = sorted(map(tuple, window_path().collect()))
    b = sorted(map(tuple, CU.quota_skew_safe(docs).collect()))
    assert a == b, "skew-safe != window on the planted corpus"

    runs = {"window": [], "skew_safe": []}
    for rep in range(REPS):
        order = (("window", "skew_safe") if rep % 2 == 0
                 else ("skew_safe", "window"))
        for tag in order:
            df = window_path() if tag == "window" \
                else CU.quota_skew_safe(docs)
            t0 = time.perf_counter()
            df.count()
            runs[tag].append(time.perf_counter() - t0)

    docs.unpersist()
    # single-task evidence: max task-sort input of the window path is the
    # mega-domain (N/2 rows); the skew-safe phase-1 groups are N/2/SALTS.
    return {
        "n_docs": n_docs, "mega_share": 0.5, "reps": REPS,
        "runs": {k: [round(x, 4) for x in v] for k, v in runs.items()},
        "med_sec": {k: round(statistics.median(v), 4)
                    for k, v in runs.items()},
        "speedup_med": round(statistics.median(runs["window"])
                             / statistics.median(runs["skew_safe"]), 3),
        "max_rows_one_task": {"window": n_docs // 2,
                              "skew_safe": n_docs // 2 // CU.QUOTA_SALTS},
        "equality": "asserted (sorted collect, all sources)",
    }


def main() -> None:
    from pyspark.sql import SparkSession

    from service_level_reporting_spark.operators import curation as CU

    spark = (SparkSession.builder.master("local[8]")
             .appName("slr-quota-skew-probe")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    out = {"quota_salts": CU.QUOTA_SALTS,
           "scales": [one_scale(spark, CU, n) for n in SCALES]}
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_QUOTA_SKEW.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
