"""One-more-decade probe for the floor curve's remaining marginal point:
`pricing_summary` read 2.24x at sf10 (r3 VERDICT: "weak (marginal) —
converging, plan clean"). Same method that settled resample at sf30: stage
a 3x key-shifted union of the sf10 set for ONLY the tables the query reads
(lineitem + dims), then best-of-N fresh-plan runs of BOTH engines in one
process, same weather. top_revenue_orders (already under 2x at sf10) rides
along as the control: if the control's ratio moves a lot, the run measured
weather, not engines.

Usage: python tools/sf30_probe.py      (~6 GB under /tmp/slr_sf30)
Output: one JSON line; record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import (
    cache_tables, clear_table_cache, load_tables)
from tools import floor_curve

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

SF30 = "/tmp/slr_sf30"
MARKER = os.path.join(SF30, "_SLR_BUILD_OK")
KEY_SHIFT_30 = 10_000_000_000_000   # sf10 keys reach ~1e12; stay disjoint
QUERIES = ["pricing_summary", "top_revenue_orders", "dedup_exact"]
N_RUNS = 5


def build_sf30(spark) -> None:
    if os.path.exists(MARKER):
        # r5 incremental: documents joined the probe set after the first
        # stage — backfill it without re-staging orders/lineitem
        doc_path = os.path.join(SF30, "documents.parquet")
        if not os.path.isdir(doc_path):
            floor_curve.build_sf10(spark)
            base = load_tables(spark, floor_curve.SF10,
                               ("documents",))["documents"]
            copies = [
                base.select((F.col("doc_id")
                             + F.lit(i * KEY_SHIFT_30)).alias("doc_id"),
                            *[c for c in base.columns if c != "doc_id"])
                for i in range(3)
            ]
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
            df.repartition(64).write.mode("overwrite").parquet(doc_path)
            print("staged sf30 documents", file=sys.stderr)
        return
    floor_curve.build_sf10(spark)
    os.makedirs(SF30, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part"):
        (load_tables(spark, floor_curve.SF10, (name,))[name]
         .write.mode("overwrite").parquet(os.path.join(SF30, f"{name}.parquet")))
    for name, cols in (("orders", ("o_orderkey",)),
                       ("lineitem", ("l_orderkey",)),
                       ("documents", ("doc_id",))):
        base = load_tables(spark, floor_curve.SF10, (name,))[name]
        copies = [
            base.select(*[
                (F.col(c) + F.lit(i * KEY_SHIFT_30)).alias(c) if c in cols
                else F.col(c) for c in base.columns])
            for i in range(3)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        (df.repartition(64).write.mode("overwrite")
         .parquet(os.path.join(SF30, f"{name}.parquet")))
        print(f"staged sf30 {name}", file=sys.stderr)
    with open(MARKER, "w") as fh:
        fh.write("ok")


def main() -> None:
    from service_level_reporting_spark import registry

    spark = get_spark(app_name="slr-sf30-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf30(spark)
    clear_table_cache()
    cache_tables(spark, SF30, ("lineitem", "orders", "customer",
                               "documents"))
    out = {"sf": 30, "n_runs": N_RUNS, "queries": {}}
    oracles = registry.aux_oracles()
    qs = registry.aux_queries()
    import statistics
    import time as _time
    for name in QUERIES:
        # r5 (VERDICT item 1): engines interleaved pair-by-pair with the
        # run arrays + spread recorded, the same variance-bounded method
        # as tools/variance_probe.py at sf10
        qs[name](spark, SF30).collect()          # warm-up
        d_runs, s_runs = [], []
        for _ in range(N_RUNS):
            d_runs.append(floor_curve.duckdb_best(SF30, oracles[name], n=1))
            t0 = _time.perf_counter()
            qs[name](spark, SF30).collect()
            s_runs.append(round(_time.perf_counter() - t0, 4))
        pair_ratios = [round(s / d, 3) for s, d in zip(s_runs, d_runs)]
        out["queries"][name] = {
            "spark_runs": s_runs, "duckdb_runs": d_runs,
            "ratio_of_mins": round(min(s_runs) / min(d_runs), 3),
            "ratio_of_medians": round(statistics.median(s_runs)
                                      / statistics.median(d_runs), 3),
            "pair_ratio_spread": round(max(pair_ratios)
                                       / min(pair_ratios), 3)}
        print(f"{name}: {out['queries'][name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
