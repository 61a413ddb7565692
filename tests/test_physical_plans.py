"""Physical-plan assertions (SURVEY §4 / §6 scale posture).

Correct results are not enough at 100 TB — these tests pin the plan shapes
that make the operators scale: predicate pushdown into the parquet scan,
broadcast joins for dims, whole-stage codegen on the agg hot path, and
partial (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

# r14: heavy system suite — builder-loop tier (driver fast tier skips it; run with -m "")
pytestmark = __import__('pytest').mark.slow

from service_level_reporting_spark.operators.relational import pricing_summary
from service_level_reporting_spark.operators.report import report_region_revenue
from service_level_reporting_spark.operators.sli import filter_events_suite
from service_level_reporting_spark.tables import events_between

from .conftest import SF_DIR_001


from service_level_reporting_spark.plans import formatted_plan as plan_str


def test_time_range_filter_pushes_to_parquet(spark):
    # the suite's time_range part scans via events_between: the raw int64 ts
    # bounds must appear as pushed gte/lt filters in its scan branch
    p = plan_str(filter_events_suite(spark, SF_DIR_001))
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(ts" in p and "LessThan(ts" in p, p


def test_events_between_prunes_columns(spark):
    p = plan_str(events_between(spark, SF_DIR_001, "2024-01-02", "2024-01-03")
                 .select("event_id", "value"))
    # ReadSchema must not include unused wide columns like props
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and "props" not in read_schema[0], p


def test_region_revenue_broadcasts_dims(spark):
    p = plan_str(report_region_revenue(spark, SF_DIR_001))
    assert p.count("BroadcastHashJoin") >= 3, p  # customer, nation, region
    assert "SortMergeJoin" not in p, p


def test_pricing_summary_codegen_and_partial_agg(spark):
    df = pricing_summary(spark, SF_DIR_001)
    df.collect()  # finalize the AQE plan so codegen ids materialize
    p = plan_str(df)
    assert "codegen id" in p, p  # hot path inside whole-stage codegen
    # partial (map-side) + final HashAggregate around the exchange
    assert p.count("HashAggregate") >= 2, p
    assert "partial_sum" in p and "Exchange" in p


def test_pricing_summary_pushes_shipdate(spark):
    p = plan_str(pricing_summary(spark, SF_DIR_001))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p, p


def test_bucketed_groupby_has_no_exchange(spark):
    """Bucketed-by-key table: groupBy(key) must read the bucket layout
    instead of shuffling (SelectedBucketsCount in scan, no Exchange)."""
    from service_level_reporting_spark.sources.sinks import (
        sink_bucketed_user_stats)

    df = sink_bucketed_user_stats(spark, SF_DIR_001)
    df.collect()
    p = plan_str(df)
    assert "Bucketed: true" in p, p
    # the agg pipeline must not contain a hashpartitioning exchange on
    # user_id — the on-disk buckets already partition by it (the only
    # allowed exchange is the final orderBy's range partitioning)
    assert "hashpartitioning(user_id" not in p, p


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the same key join with zero exchanges."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from service_level_reporting_spark.sources.sinks import write_bucketed
    from service_level_reporting_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    a = ev.select("user_id", "value")
    b = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ta, tb = "slr_bkt_a", "slr_bkt_b"
    write_bucketed(a, ta, os.path.join(tempfile.gettempdir(), ta), "user_id")
    write_bucketed(b, tb, os.path.join(tempfile.gettempdir(), tb), "user_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(ta).join(spark.table(tb), "user_id")
                  .groupBy("user_id")
                  .agg(F.sum("value").alias("s"), F.max("n").alias("n")))
        joined.collect()
        p = plan_str(joined)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p  # bucket layout feeds both join sides
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_registry_wide_plan_lint(spark):
    """Every registered batch query's plan is free of cartesian products
    and row-at-a-time Python eval (the similarity/ANN/kNN paths are
    cross-join-by-construction over block/probe tables and are whitelisted
    explicitly — their Python is Arrow-batched, never BatchEvalPython)."""
    from service_level_reporting_spark import registry
    from service_level_reporting_spark.plans import lint

    ALLOW_CARTESIAN = {
        # broadcast cross joins of a 1-row probe / tiny block table
        "similarity_topk_pairs", "dedup_embedding_cosine",
        "similarity_knn_query", "similarity_ann_suite",
    }
    for name, fn in sorted(registry.aux_queries().items()):
        if name.startswith("stream_") or name.startswith("sink_"):
            continue  # sinks/streams execute eagerly; covered elsewhere
        allow = ("CartesianProduct",) if name in ALLOW_CARTESIAN else ()
        lint(fn(spark, SF_DIR_001), allow=allow)


def test_aqe_splits_skewed_join_partitions(spark):
    """The SCALE.md skew posture is real: a hot-key SMJ gets its oversized
    partition split by AQE (skew=true in the final adaptive plan). Thresholds
    are lowered to trigger at test size; the mechanism is identical at 100 TB
    defaults. Downstream of the join must NOT require the join key's
    partitioning (AQE skips the split when it would break a reuse)."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        hot = spark.range(200_000).select(F.lit(1).alias("k"),
                                          F.col("id").alias("v"))
        cold = spark.range(2_000).select((F.col("id") % 100 + 2).alias("k"),
                                         F.col("id").alias("v"))
        right = spark.range(5_000).select((F.col("id") % 103).alias("k"),
                                          F.rand(7).alias("w"))
        j = (hot.unionByName(cold).join(right, "k")
             .select(F.sum(F.col("v") * F.col("w")).alias("s")))
        j.collect()
        assert "skew=true" in plan_str(j)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_catalog_walk_broadcasts_whole_catalog(spark):
    """The 4-level catalog FK walk must reach the events fact as ONE
    broadcast (all dim⋈dim joins pre-collapsed, no shuffle on the fact
    side before the aggregate)."""
    from service_level_reporting_spark.operators.catalog import (
        report_catalog_walk)

    p = plan_str(report_catalog_walk(spark, SF_DIR_001))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_ann_plan_build_triggers_no_scan_jobs(spark):
    """VERDICT r2 item 3: choosing the tile-join strategy / LSH plane count
    used to cost a full count() SCAN job per query at PLAN BUILD time.
    Corpus size now comes from the parquet footer (driver-side pyarrow, no
    job). The only job spark.read.parquet itself launches is the 1-task
    schema-inference footer read — so 4 plan builds must stay ≤ 4 jobs
    (they were 8 with the strategy counts) and every job must be tiny."""
    from service_level_reporting_spark.operators import similarity as SIM

    sc = spark.sparkContext
    sc.setJobGroup("ann-plan-build", "plan construction only")
    try:
        SIM.similarity_ann_lsh(spark, SF_DIR_001)
        SIM.similarity_topk_pairs(spark, SF_DIR_001)
        SIM.dedup_embedding_cosine(spark, SF_DIR_001)
        SIM.dedup_embedding_ann(spark, SF_DIR_001)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup("ann-plan-build")
        assert len(jobs) <= 4, f"plan build launched {len(jobs)} jobs"
        for jid in jobs:  # footer reads are single-task, not table scans
            for sid in tracker.getJobInfo(jid).stageIds:
                info = tracker.getStageInfo(sid)
                if info is not None:
                    assert info.numTasks <= 1, (jid, sid, info.numTasks)
    finally:
        sc.setJobGroup(None, None)


def test_ivf_suite_shares_one_training_pass(spark):
    """The IVF-flat and IVF-PQ legs must share ONE index: building both
    from a shared index dict launches exactly the bounded driver-side jobs
    (one sample collect + one single-row query lookup per leg), not the
    former 3 count() scans + 2 sample collects."""
    from service_level_reporting_spark.operators import similarity as SIM

    sc = spark.sparkContext
    sc.setJobGroup("ivf-index-build", "shared index build")
    try:
        idx = SIM._ivf_index(spark, SF_DIR_001)
        SIM.similarity_knn_ivf(spark, SF_DIR_001, index=idx)
        SIM.similarity_knn_ivf_pq(spark, SF_DIR_001, index=idx)
        jobs = sc.statusTracker().getJobIdsForGroup("ivf-index-build")
        # 1 schema footer read + 1 sample collect + 2 per-leg .first()
        # lookups = 4 bounded jobs (was 7+ with per-leg training scans)
        assert len(jobs) <= 4, f"index sharing regressed: {len(jobs)} jobs"
    finally:
        sc.setJobGroup(None, None)


def test_slo_daily_health_has_no_expand(spark):
    """The flagship multi-metric daily report must NOT plan the distinct
    user count via Expand (every input row duplicated through the shuffle —
    the one plan that DEGRADED with scale on the r3 floor curve, 6.15x at
    sf10). The r4 rewrite is two chained hash aggregates over a packed
    (user, day) long key; both stages must keep map-side partials."""
    from service_level_reporting_spark.operators.sli import slo_daily_health

    df = slo_daily_health(spark, SF_DIR_001)
    df.collect()  # finalize AQE
    p = plan_str(df)
    # InMemoryRelation build-plan text can legitimately contain anything;
    # only the query's own operators are linted.
    own = p.split("InMemoryRelation")[0]
    assert "Expand" not in own, own
    assert own.count("HashAggregate") >= 4, own   # partial+final x 2 stages
    assert "partial_sum" in own, own


def test_source_quota_single_shuffle_partial_agg(spark):
    """corpus_source_quota (r12): ONE exchange on `source` feeds both
    the rank window and the rollup (same key — Catalyst reuses the
    partitioning), the final agg is partial/final split, and the scan
    reads only the three consumed columns."""
    from service_level_reporting_spark.operators.curation import (
        corpus_source_quota)

    import re

    p = plan_str(corpus_source_quota(spark, SF_DIR_001))
    # exactly ONE Exchange node in the tree: Sort->Window->partial/final
    # HashAggregate all ride the same source-hash partitioning
    assert len(re.findall(r"\+- Exchange", p)) == 1, p
    assert "partial_count" in p or "partial" in p.lower(), p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0], p


def test_quota_skewsafe_no_single_domain_sort(spark):
    """corpus_source_quota_skewsafe (r13): the full-data window sorts by
    (source, salt) — a mega-domain spreads over n_salts tasks — and only
    the bounded candidate set (≤ n_salts·K rows per source) is ever
    sorted by source alone. The scan still prunes to three columns."""
    import re

    from service_level_reporting_spark.operators.curation import (
        corpus_source_quota_skewsafe)

    p = plan_str(corpus_source_quota_skewsafe(spark, SF_DIR_001))
    # phase-1 exchange + the ONLY window spec carry the salt key; phase 2
    # is an array-merge aggregate, not a second window
    assert re.search(r"hashpartitioning\(source#\d+L?, salt#\d+", p), p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert len(specs) == 1 and "salt" in specs[0], p
    # the full-data sort carries salt (formatted plans put the sort spec
    # on an Arguments: line: [source ASC, salt ASC, n_chars DESC, ...]);
    # salt-free sorts exist only downstream of the rk<=K filter
    sort_specs = [ln for ln in p.splitlines()
                  if ln.startswith("Arguments: [") and "NULLS" in ln]
    assert any("salt#" in ln and "n_chars#" in ln for ln in sort_specs), p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("text" not in ln for ln in read_schema), p


def test_split_leakage_safe_no_text_scan(spark):
    """corpus_split_leakage_safe (r12): the split tag is a pure
    projection — the scan must not read `text`, and both rollups
    aggregate map-side (partial) before their exchanges."""
    from service_level_reporting_spark.operators.curation import (
        corpus_split_leakage_safe)

    p = plan_str(corpus_split_leakage_safe(spark, SF_DIR_001))
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("text" not in ln for ln in read_schema), p
    assert "partial_count" in p, p
