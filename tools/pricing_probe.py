"""pricing_summary variants at sf10, interleaved A/B/C/D — the last
>2x headliner. Hypotheses: (a) the product expressions recompute per
aggregate buffer (pre-projecting disc_price/charge helps), (b) the
2-char string group keys cost more than a packed numeric key."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark import registry
from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import (
    cache_tables, clear_table_cache, load_tables)
from tools import floor_curve, scale_sweep

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
N = 7


def main() -> None:
    spark = get_spark(app_name="slr-pricing-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scale_sweep.ensure_built(spark)
    floor_curve.build_sf10(spark)
    sf = floor_curve.SF10
    clear_table_cache()
    cache_tables(spark, sf, ("lineitem",))
    qs = registry.aux_queries()

    def li():
        return (load_tables(spark, sf, ("lineitem",))["lineitem"]
                .where(F.col("l_shipdate") <= F.lit("2000-09-02")))

    def aggs():
        return [
            SF.r2(F.sum("l_quantity")).alias("sum_qty"),
            SF.r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            SF.r2(F.sum("__dp")).alias("sum_disc_price"),
            SF.r2(F.sum("__ch")).alias("sum_charge"),
            SF.r6(F.avg("l_quantity")).alias("avg_qty"),
            SF.r6(F.avg("l_extendedprice")).alias("avg_price"),
            SF.r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ]

    def preproj():
        base = li().withColumn(
            "__dp", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        base = base.withColumn("__ch", F.col("__dp") * (1 + F.col("l_tax")))
        return (base.groupBy("l_returnflag", "l_linestatus").agg(*aggs()))

    def packed():
        base = li().withColumn(
            "__dp", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        base = base.withColumn("__ch", F.col("__dp") * (1 + F.col("l_tax")))
        key = (F.ascii("l_returnflag") * 256
               + F.ascii("l_linestatus")).alias("__k")
        out = base.groupBy(key).agg(*aggs())
        return out.select(
            F.char(F.floor(F.col("__k") / 256).cast("int"))
            .alias("l_returnflag"),
            F.char((F.col("__k") % 256).cast("int")).alias("l_linestatus"),
            *[c for c in out.columns if c != "__k"])

    makers = {"current": lambda: qs["pricing_summary"](spark, sf),
              "preproj": preproj, "packed": packed}
    for m in makers.values():
        m().collect()
    runs = {k: [] for k in makers}
    for _ in range(N):
        for k, m in makers.items():
            t0 = time.perf_counter()
            m().collect()
            runs[k].append(time.perf_counter() - t0)
    out = {k: {"min": round(min(v), 4),
               "med": round(sorted(v)[len(v) // 2], 4)}
           for k, v in runs.items()}
    # value parity of the winner spellings
    cur = {tuple(r) for r in qs["pricing_summary"](spark, sf).collect()}
    out["preproj_match"] = cur == {tuple(r) for r in preproj().collect()}
    out["packed_match"] = cur == {
        tuple(r) for r in packed().select(*[
            c for c in qs["pricing_summary"](spark, sf).columns
        ]).collect()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
