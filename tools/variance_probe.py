"""Variance-bounded probe for the two sf10 non-reproductions (r5, VERDICT
item 1): `top_revenue_orders` read 1.77x at r3 and 3.98x at r4 with an
unchanged-or-better plan; `dedup_exact` likewise 1.68x -> 4.19x. A number
that swings 2.4x between rounds cannot support a "crossed under 2x" claim
either way, so this probe measures BOTH engines strictly interleaved
run-by-run (one cold DuckDB run, then one fresh-plan Spark run, repeated
N times — a bad-weather window hits both sides) and reports min, median,
max and the full run arrays, at sf10 and (where staged) sf30.

The verdict rule this feeds (SCALE.md): a query is "crossed" only if
min-ratio <= 2x AND the spread (max/min of the per-PAIR ratios) is small
enough that the claim survives the weather; otherwise it is
kernel-constant — flat ratio across decades with both engines linear —
or genuinely open.

Usage: python tools/variance_probe.py [n_pairs]   (default 7)
Output: one JSON line; record in SCALE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import cache_tables, clear_table_cache
from tools import floor_curve, scale_sweep

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

QUERIES = ["top_revenue_orders", "dedup_exact",
           # controls: one settled-crossed, one settled-kernel-constant —
           # if these move a lot, the window measured weather, not engines
           "pricing_summary", "resample_minute_avg"]


def interleaved(spark, sf_dir: str, name: str, sql: str,
                n_pairs: int) -> dict:
    """n_pairs strictly alternating (duckdb, spark) timed pairs; one
    untimed Spark warm-up first (broadcast builds, codegen)."""
    from service_level_reporting_spark import registry

    qs = registry.aux_queries()
    qs[name](spark, sf_dir).collect()
    d_runs, s_runs = [], []
    for _ in range(n_pairs):
        d_runs.append(round(floor_curve.duckdb_best(sf_dir, sql, n=1), 4))
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        s_runs.append(round(time.perf_counter() - t0, 4))
    pair_ratios = [round(s / d, 3) for s, d in zip(s_runs, d_runs)]
    return {
        "spark_runs": s_runs,
        "duckdb_runs": d_runs,
        "spark_min": min(s_runs), "spark_med": statistics.median(s_runs),
        "duck_min": min(d_runs), "duck_med": statistics.median(d_runs),
        "ratio_of_mins": round(min(s_runs) / min(d_runs), 3),
        "ratio_of_medians": round(statistics.median(s_runs)
                                  / statistics.median(d_runs), 3),
        "pair_ratios": pair_ratios,
        "pair_ratio_spread": round(max(pair_ratios) / min(pair_ratios), 3),
    }


def main() -> None:
    from service_level_reporting_spark import registry

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="slr-variance-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scale_sweep.ensure_built(spark)
    floor_curve.build_sf10(spark)
    oracles = registry.all_oracles()

    out = {"metric": "sf10_variance_probe", "n_pairs": n_pairs,
           "points": {}}
    clear_table_cache()
    cache_tables(spark, floor_curve.SF10,
                 ("customer", "orders", "lineitem", "events", "documents"))
    pt = {}
    for name in QUERIES:
        pt[name] = interleaved(spark, floor_curve.SF10, name,
                               oracles[name], n_pairs)
        print(f"sf10 {name}: min-ratio {pt[name]['ratio_of_mins']} "
              f"med-ratio {pt[name]['ratio_of_medians']} "
              f"spread {pt[name]['pair_ratio_spread']}", file=sys.stderr)
    out["points"]["sf10"] = pt

    print(json.dumps(out))


if __name__ == "__main__":
    main()
