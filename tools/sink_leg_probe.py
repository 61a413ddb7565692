"""Time each sink_suite leg individually (r13, guide §1: find where the
suite's wall time actually goes before touching anything).

Usage: python tools/sink_leg_probe.py [sf_dir] [reps]
Prints per-leg seconds (legs run SERIALLY here — this measures leg cost,
not the suite's pooled wall time) and writes /tmp/sink_leg_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_level_reporting_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="sink-leg-probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from service_level_reporting_spark.sources import sinks as S

    legs = {
        "upsert_merge": S.sink_upsert_merge,
        "bucketed_groupby": S.sink_bucketed_user_stats,
        "incremental": S.incremental_daily_rollup,
        "hll_incremental": S.hll_incremental_rollup,
        "compact": S.compact_small_files,
        "cluster": S.clustered_layout_stats,
        "formats": S.format_roundtrip_stats,
        "codecs": S.compression_codec_stats,
        "zorder": S.zorder_layout_stats,
        "txlog": S.sink_txlog_merge,
        "txlog_rowops": S.sink_txlog_rowops,
    }
    out: dict = {"sf_dir": sf_dir, "reps": reps, "legs": {}}
    for name, fn in legs.items():
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"sinkleg:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["legs"][name] = {"min": min(runs), "runs": runs}
        print(name, out["legs"][name], flush=True)
    with open("/tmp/sink_leg_probe.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
