"""Decade-3 floor point (r5, VERDICT item 9 stretch): one sf100 run of
the two kernel-constant queries (`resample_minute_avg`,
`slo_daily_health`) to confirm the flat ratio holds a third decade.

Both queries read ONLY `events`, so the stage is events alone: 10
key-shifted copies of the sf10 events table (100M rows, ~10 GB parquet)
under /tmp/slr_sf100. Method matches the settled sf30 probe: same
process, engines interleaved pair-by-pair, best-of-N with the run
arrays recorded.

Usage: python tools/sf100_probe.py [n_pairs]   (default 3)
Output: one JSON line; record in SCALE.md §2.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import (
    cache_tables, clear_table_cache, load_tables)
from tools import floor_curve, scale_sweep

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF100 = "/tmp/slr_sf100"
MARKER = os.path.join(SF100, "_SLR_BUILD_OK")
KEY_SHIFT_100 = 1_000_000_000_000_000   # above sf10's ~1e12 reach
QUERIES = ["resample_minute_avg", "slo_daily_health"]


def build_sf100(spark) -> None:
    if os.path.exists(MARKER):
        return
    scale_sweep.ensure_built(spark)
    floor_curve.build_sf10(spark)
    os.makedirs(SF100, exist_ok=True)
    base = load_tables(spark, floor_curve.SF10, ("events",))["events"]
    copies = [
        base.select(*[
            (F.col(c) + F.lit(i * KEY_SHIFT_100)).alias(c)
            if c in ("event_id", "user_id") else F.col(c)
            for c in base.columns])
        for i in range(10)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    (df.repartition(128).write.mode("overwrite")
     .parquet(os.path.join(SF100, "events.parquet")))
    with open(MARKER, "w") as fh:
        fh.write("ok")
    print("staged sf100 events", file=sys.stderr)


def main() -> None:
    from service_level_reporting_spark import registry

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="slr-sf100-probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf100(spark)
    clear_table_cache()
    cache_tables(spark, SF100, ("events",))
    oracles = registry.all_oracles()
    qs = registry.aux_queries()

    out = {"metric": "sf100_floor_probe", "sf": 100, "n_pairs": n_pairs,
           "queries": {}}
    for name in QUERIES:
        qs[name](spark, SF100).collect()          # warm-up
        d_runs, s_runs = [], []
        for _ in range(n_pairs):
            d_runs.append(round(
                floor_curve.duckdb_best(SF100, oracles[name], n=1), 4))
            t0 = time.perf_counter()
            qs[name](spark, SF100).collect()
            s_runs.append(round(time.perf_counter() - t0, 4))
        out["queries"][name] = {
            "spark_runs": s_runs, "duckdb_runs": d_runs,
            "ratio_of_mins": round(min(s_runs) / min(d_runs), 3),
            "ratio_of_medians": round(statistics.median(s_runs)
                                      / statistics.median(d_runs), 3),
        }
        print(f"sf100 {name}: {out['queries'][name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
