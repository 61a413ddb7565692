"""10x scale sweep: build a synthetic ~sf1 set from sf0.1 and run every
registered query against it, timing each.

SCALE.md §9 records why this matters: the rounds 1-2 sweeps caught seven
latent scale bugs that sf0.1 could not (CollapseProject blowups, quadratic
candidate materialization, clone-corpus pair inflation, ...). The builder
lived only in session history before; this script makes the recipe
repeatable.

Construction (same shape as the earlier sweeps):

* Fact tables are 10 key-shifted unions of sf0.1 — `orders`/`lineitem`
  shift `o_orderkey`/`l_orderkey` together (FK preserved), `events` shifts
  `event_id` and `user_id` (per-user volume constant, total 1 M rows),
  `documents`/`embeddings` shift only the id — texts and vectors stay
  IDENTICAL, deliberately: the clone-heavy corpus is the adversarial case
  for every dedup/similarity operator (pair output inflates ~100x unless
  the operator computes per distinct payload, which is exactly what the
  round-2 rep-dedup fix does).
* Dims (region nation customer supplier part) are copied once — at real
  scale dims grow sublinearly and stay broadcastable.
* 16 files per fact table so local[32] scan parallelism is real.

Usage:
    python tools/scale_sweep.py build   # stage /tmp/slr_sf1 (~2 min)
    python tools/scale_sweep.py run     # time all queries, print JSON
    python tools/scale_sweep.py both
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
from service_level_reporting_spark.tables import TABLE_NAMES, load_tables

SRC = "/root/testdata/sf0.1"
DST = "/tmp/slr_sf1"
N_COPIES = 10
KEY_SHIFT = 1_000_000_000  # far above any sf0.1 key range

DIMS = ("region", "nation", "customer", "supplier", "part")
# fact table -> columns to shift per copy
SHIFTS = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


MARKER = os.path.join(DST, "_SLR_BUILD_OK")


def ensure_built(spark) -> bool:
    """Build /tmp/slr_sf1 only if missing or staler than its sf0.1 source
    (marker mtime check, same pattern as the streaming staging dir).
    Returns True if a build ran."""
    try:
        src_m = max(os.path.getmtime(os.path.join(SRC, f))
                    for f in os.listdir(SRC))
    except OSError:
        return False
    if os.path.exists(MARKER) and os.path.getmtime(MARKER) >= src_m:
        return False
    build(spark)
    with open(MARKER, "w") as fh:
        fh.write("ok")
    return True


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for name in TABLE_NAMES:
        out = os.path.join(DST, f"{name}.parquet")
        base = load_tables(spark, SRC, (name,))[name]
        if name in DIMS:
            base.write.mode("overwrite").parquet(out)
            continue
        cols = SHIFTS[name]
        copies = [
            base.select(*[
                (F.col(c) + F.lit(i * KEY_SHIFT)).alias(c) if c in cols
                else F.col(c)
                for c in base.columns
            ])
            for i in range(N_COPIES)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(16).write.mode("overwrite").parquet(out)
        print(f"staged {name}", file=sys.stderr)


def run(spark) -> None:
    qs = registry.aux_queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, DST).count()
        except Exception as exc:  # keep sweeping; report at the end
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        dt = round(time.perf_counter() - t0, 2)
        timings[name] = dt
        print(f"{name}: {dt}s rows={n}", file=sys.stderr)
    print(json.dumps({
        "metric": "sf1_sweep_total_sec",
        "value": round(sum(timings.values()), 2),
        "queries": timings,
        "slowest": sorted(timings, key=timings.get, reverse=True)[:5],
        "failures": failures,
    }))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark(app_name="slr-sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("build", "both"):
        build(spark)
    if mode in ("run", "both"):
        run(spark)
    spark.stop()


if __name__ == "__main__":
    main()
