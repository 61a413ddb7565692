"""Capture .explain("formatted") for every registered query into
plans/$SLR_PLAN_ROUND/<name>_<tag>.txt (default r14, guide §1: record the
plan shape — Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython nodes — before and after each change).

Usage: python tools/plan_capture.py [tag] [name ...]
  tag defaults to "before"; with no names, captures every aux query.

Eager/procedural queries (sink_suite, stream_suite, multimodal, bpe) run
their bodies to produce the returned DataFrame — they are captured at
sf0.001 to keep that cheap; declarative queries capture at sf0.01.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_level_reporting_spark import registry  # noqa: E402
from service_level_reporting_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SLR_PLAN_ROUND", "r14"))

# Queries whose builder runs real work eagerly (writes, streaming, codec
# decode) — capture those on the smallest SF so the capture stays cheap.
EAGER = {"sink_suite", "stream_suite", "multimodal_pipeline",
         "bpe_tokenizer_suite", "source_jdbc_catalog",
         "curation_pipeline_incremental", "ann_index_incremental",
         "dedup_embedding_ann", "similarity_ann_suite", "dedup_semantic"}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="plan-capture", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.aux_queries()
    names = sorted(only or qs)
    for name in names:
        sf_dir = ("/root/testdata/sf0.001" if name in EAGER
                  else "/root/testdata/sf0.01")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"ok   {name}")
        except Exception:  # noqa: BLE001
            with open(path, "w") as fh:
                fh.write("CAPTURE FAILED\n" + traceback.format_exc())
            print(f"FAIL {name}")
    spark.stop()


if __name__ == "__main__":
    main()
