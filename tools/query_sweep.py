"""Time EVERY declared driver query at a given SF (r13 optimization round,
guide §1: measure first). Two timings per query:

* build+collect  — what the driver/bench pays end-to-end (plan + execute).
* noop           — df.write.format("noop") on a rebuilt frame, isolating
                   computation from result collection (guide §1.4).

Queries are labelled (setJobDescription) and run N times; the JSON keeps
cold/min/median per query plus the total.  `spark.catalog.clearCache()` runs
before EVERY rep: a query containing persist() registers its plan in the
CacheManager, and without the clear reps 2+ silently substitute the live
InMemoryRelation and measure cache-hit execution (VERDICT r13 "What's wrong"
item 1 — warm-cache-flattered numbers).  With the clear, every rep pays the
query's full per-invocation cost, which is what the driver pays; `*_cold` is
the first rep (coldest JVM/JIT state), `*_min` the best of the equal-footing
reps. Heavy eager suites can be skipped via
--skip or run at a smaller SF via EAGER_SMALL.

Usage: python tools/query_sweep.py [sf_dir] [reps] [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_level_reporting_spark import registry  # noqa: E402
from service_level_reporting_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else "/tmp/query_sweep.json")
    only = set(sys.argv[4:])
    spark = get_spark(app_name="query-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()          # the driver's 50-row surface
    names = sorted(only or qs)
    out: dict = {"sf_dir": sf_dir, "reps": reps, "queries": {}}
    for name in names:
        rec: dict = {}
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            coll, noop = [], []
            for _ in range(reps):
                spark.catalog.clearCache()   # no warm-cache reps (guide §1)
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                coll.append(time.perf_counter() - t0)
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                (qs[name](spark, sf_dir).write.format("noop")
                 .mode("overwrite").save())
                noop.append(time.perf_counter() - t0)
            rec = {
                "collect_cold": round(coll[0], 3),
                "collect_min": round(min(coll), 3),
                "collect_med": round(statistics.median(coll), 3),
                "noop_cold": round(noop[0], 3),
                "noop_min": round(min(noop), 3),
                "noop_med": round(statistics.median(noop), 3),
            }
        except Exception as exc:  # noqa: BLE001
            rec = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        finally:
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = rec
        print(name, rec, flush=True)
    ok = [r for r in out["queries"].values() if "collect_min" in r]
    out["total_collect_min"] = round(sum(r["collect_min"] for r in ok), 3)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("TOTAL(min):", out["total_collect_min"], "->", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
