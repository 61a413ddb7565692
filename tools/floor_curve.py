"""Floor-amortization curve: the five scan-bound agg headliners measured at
sf0.1 / sf1 / sf10 against live DuckDB, one process, same machine weather.

Why this exists (VERDICT r2, BENCH r3 follow-up): at sf0.1 the five
aggregates sit on Spark's ~0.2-0.3 s per-job scheduling floor, so their
ratios measure the floor, not the plans. The sf1 block in bench.py shows
Spark growing only 1.0-2.0x for 10x data — but DuckDB's own (much smaller)
floor also amortizes, so per-query ratios at sf1 still read 3-7x. This
script extends the curve one more decade (sf10: 60 M lineitem / 10 M
events / 5 M documents) where both engines are data-bound and the
comparison is floor-free. Output: BENCH_SF10.json at the repo root.

sf10 is built from sf1 the same way sf1 is built from sf0.1 (key-shifted
unions; clone-heavy by construction). Only the tables the five aggregates
read are staged at 10x (lineitem orders events documents + dims);
embeddings is NOT staged — the embedding headliners already beat the
baseline at sf0.1 AND sf1 and their exact oracle is O(n^2), which at sf10
measures DuckDB's loop, not our engine.

Usage: python tools/floor_curve.py   (~10 min: one-time build + 3 runs/point)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark import registry
from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import (
    cache_tables, clear_table_cache, load_tables)
from tools import scale_sweep

# Local sizing, same rationale as bench.py: stacking three scales' caches
# in the default 8g driver OOMs the 60M-row sf10 join; one scale resident
# at a time + a bigger local heap. Env still overrides.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

SF10 = "/tmp/slr_sf10"
MARKER = os.path.join(SF10, "_SLR_BUILD_OK")
# sf1 keys reach ~9e9 (sf0.1 base + 9 * 1e9 shifts); a 1e11 stride keeps
# every copy's key space disjoint with long headroom
KEY_SHIFT_10 = 100_000_000_000

AGG_HEADLINERS = ["pricing_summary", "top_revenue_orders",
                  "resample_minute_avg", "slo_daily_health", "dedup_exact"]
N_RUNS = 3


def build_sf10(spark) -> None:
    if os.path.exists(MARKER):
        return
    os.makedirs(SF10, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part"):
        (load_tables(spark, scale_sweep.DST, (name,))[name]
         .write.mode("overwrite").parquet(os.path.join(SF10, f"{name}.parquet")))
    for name, cols in (("orders", ("o_orderkey",)),
                       ("lineitem", ("l_orderkey",)),
                       ("events", ("event_id", "user_id")),
                       ("documents", ("doc_id",))):
        base = load_tables(spark, scale_sweep.DST, (name,))[name]
        copies = [
            base.select(*[
                (F.col(c) + F.lit(i * KEY_SHIFT_10)).alias(c) if c in cols
                else F.col(c) for c in base.columns])
            for i in range(10)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        (df.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(SF10, f"{name}.parquet")))
        print(f"staged sf10 {name}", file=sys.stderr)
    with open(MARKER, "w") as fh:
        fh.write("ok")


def duckdb_best(sf_dir: str, sql: str, n: int = N_RUNS) -> float:
    import duckdb

    def once() -> float:
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents"):
            path = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(path):
                continue
            pat = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{pat}')")
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        con.close()
        return dt

    return round(min(once() for _ in range(n)), 4)


def spark_best(spark, sf_dir: str, name: str, n: int = N_RUNS) -> float:
    qs = registry.aux_queries()
    qs[name](spark, sf_dir).collect()          # warm: broadcasts, AQE, codegen
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    spark = get_spark(app_name="slr-floor-curve", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    scale_sweep.ensure_built(spark)
    build_sf10(spark)

    oracles = registry.all_oracles()
    points = [("sf0.1", "/root/testdata/sf0.1"),
              ("sf1", scale_sweep.DST),
              ("sf10", SF10)]
    curve: dict[str, dict] = {}
    # shuffle sized to the data per point, mirroring bench.py: 8 partitions
    # right-size sf0.1; the sf10 SMJ at 8 leaves 3/4 of the cores idle
    # (measured 6.6s vs 3.5s on top_revenue_orders)
    parts = {"sf0.1": "8", "sf1": "16", "sf10": "32"}
    for label, sf_dir in points:
        spark.conf.set("spark.sql.shuffle.partitions", parts[label])
        clear_table_cache()          # one scale resident at a time
        cache_tables(spark, sf_dir, ("customer", "orders", "lineitem",
                                     "events", "documents"))
        qs_out, base_out = {}, {}
        for name in AGG_HEADLINERS:
            base_out[name] = duckdb_best(sf_dir, oracles[name])
            qs_out[name] = spark_best(spark, sf_dir, name)
            print(f"{label} {name}: spark {qs_out[name]}s "
                  f"duckdb {base_out[name]}s", file=sys.stderr)
        curve[label] = {
            "spark_sec": qs_out,
            "duckdb_sec": base_out,
            "per_query_ratio": {n: round(qs_out[n] / base_out[n], 3)
                                for n in AGG_HEADLINERS},
            "total_ratio": round(sum(qs_out.values())
                                 / sum(base_out.values()), 3),
        }

    out = {
        "metric": "floor_amortization_curve",
        "queries": AGG_HEADLINERS,
        "points": curve,
        "note": ("best-of-3 both engines, one process, same weather; "
                 "sf10 facts = 10x key-shifted sf1 (60M lineitem / 10M "
                 "events / 5M documents); embeddings headliners excluded "
                 "(already sub-baseline at sf0.1 and sf1)"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SF10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
