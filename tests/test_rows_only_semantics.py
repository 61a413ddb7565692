"""Semantic checks for the rows-only queries (the ones the driver cannot
hash-match against a SQL oracle): approx-vs-exact tolerance, near-dup
recall on a planted synthetic corpus, sink idempotence, source round-trip,
nested-JSON structure, and streaming batch-equivalence for the window
shapes not covered elsewhere."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from service_level_reporting_spark import registry
from service_level_reporting_spark.sources import sinks as SINK
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001

Q = registry.aux_queries()


# --- approx sketches (report_sketch_summary) vs exact ----------------------

def test_sketch_summary_vs_exact(spark):
    sketch = {r["event_type"]: r
              for r in Q["report_sketch_summary"](spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    exact_users = {r["event_type"]: r["n_users"]
                   for r in ev.groupBy("event_type")
                   .agg(F.countDistinct("user_id").alias("n_users")).collect()}
    exact_p95 = {r["event_type"]: r
                 for r in Q["agg_percentile"](spark, SF_DIR_001).collect()}
    assert set(sketch) == set(exact_users)
    for et, n in exact_users.items():
        # HLL at rsd=0.02 against an exact distinct count
        assert abs(sketch[et]["n_users_approx"] - n) <= max(2, 0.15 * n), (
            et, sketch[et]["n_users_approx"], n)
        # approx percentile must land within 10% of the exact value's scale
        # (values are ~0..100 doubles)
        ae, ee = sketch[et]["p95_approx"], exact_p95[et]["p95"]
        assert abs(ae - ee) <= max(2.0, 0.1 * abs(ee)), (et, ae, ee)
        assert sketch[et]["n"] == exact_p95[et]["n"]


# --- near-dup detectors on a planted corpus -------------------------------

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "in spain stays mainly in the plain and the band plays on")


def _synthetic_docs_dir(spark) -> str:
    path = os.path.join(tempfile.gettempdir(), "slr_synth_docs_sf")
    if not os.path.exists(os.path.join(path, "documents.parquet")):
        rows = [
            (0, BASE),
            (1, BASE),                                  # exact dup of 0
            (2, BASE + " tonight"),                     # near dup: one appended
                                                        # word -> J = 21/22
            (3, "completely unrelated text about spark shuffles and "
                "catalyst optimizer internals with many distinct tokens"),
            (4, "another unrelated document mentioning minhash banding "
                "lsh buckets and jaccard similarity estimation theory"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "documents.parquet"))
    return path


def test_near_dup_signatures_find_planted_dups(spark):
    d = _synthetic_docs_dir(spark)
    rows = Q["dedup_near_dup_signatures"](spark, d).collect()
    minhash = {(r["doc_a"], r["doc_b"]): r["score"]
               for r in rows if r["method"] == "minhash"}
    assert (0, 1) in minhash and minhash[(0, 1)] == 1.0  # exact dup: J=1
    assert (0, 2) in minhash or (1, 2) in minhash        # near dup survives LSH
    for a, b in minhash:
        assert {a, b} <= {0, 1, 2}, f"false positive pair {(a, b)}"
    simhash = {(r["doc_a"], r["doc_b"]) for r in rows if r["method"] == "simhash"}
    assert (0, 1) in simhash                             # equal signatures
    for a, b in simhash:
        assert {a, b} <= {0, 1, 2}, f"simhash false positive {(a, b)}"


# --- sink idempotence + key-level merge ------------------------------------

def test_incremental_rollup_state_equals_recompute(spark):
    """Delta processing: after merging the post-cut delta's partial
    aggregates into the initial-load state, the state must be cell-exact
    with a one-shot recompute (the '_mismatches' row), and the mid-day cut
    forces a genuine combine on the cut day."""
    rows = {r["indicator"]: r for r in
            SINK.incremental_daily_rollup(spark, SF_DIR_001).collect()}
    assert rows["_mismatches"]["total_points"] == 0
    indicators = set(rows) - {"_mismatches"}
    assert indicators == {"click", "error", "purchase", "signup", "view"}
    # every indicator's state covers the full 30-day window, incl. cut day
    assert all(rows[i]["n_days"] == 30 for i in indicators)


def test_upsert_sink_idempotent_across_invocations(spark):
    first = {r["indicator"]: r.asDict()
             for r in SINK.sink_upsert_merge(spark, SF_DIR_001).collect()}
    second = {r["indicator"]: r.asDict()
              for r in SINK.sink_upsert_merge(spark, SF_DIR_001).collect()}
    assert first == second
    for row in first.values():
        assert row["n_minutes"] == row["n_distinct_minutes"]


def test_merge_upsert_preserves_untouched_keys_across_days(spark):
    """Key-level MERGE of a half-day window must keep the other half of the
    boundary days intact AND equal the one-shot rollup (zero dup minutes)."""
    import shutil

    from service_level_reporting_spark.sources.sinks import (
        merge_upsert_minutes, minute_rollup, write_minute_rollup)

    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    out = os.path.join(tempfile.gettempdir(), "slr_test_merge_upsert")
    shutil.rmtree(out, ignore_errors=True)
    base = minute_rollup(ev, (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"))
    write_minute_rollup(base, out)
    shifted = minute_rollup(ev, (F.col("ts") >= "2024-01-03 12:00:00")
                            & (F.col("ts") < "2024-01-05 12:00:00"))
    merge_upsert_minutes(shifted, out)
    merged = spark.read.parquet(out).select("indicator", "minute", "value", "n_points")
    want = base.withColumn("minute", F.col("minute").cast("timestamp"))
    got_rows = {tuple(r) for r in merged.withColumn(
        "minute", F.col("minute").cast("timestamp")).collect()}
    want_rows = {tuple(r) for r in want.select(
        "indicator", "minute", "value", "n_points").collect()}
    assert got_rows == want_rows  # merge of identical data is a no-op
    n = merged.count()
    assert n == merged.select("indicator", "minute").distinct().count()


# --- KairosDB source round-trip -------------------------------------------

def test_kairosdb_parse_roundtrip(spark):
    """Parsed points re-aggregated must equal the same aggregation computed
    directly on events — the parse path loses nothing."""
    got = {r["group_key"]: (r["n_points"], r["avg_value"])
           for r in Q["source_kairosdb_json"](spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    want = {r["event_type"]: (r["n"], r["avg_value"])
            for r in ev.where(F.col("ts") < F.lit("2024-01-01 02:00:00"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 6).alias("avg_value")).collect()}
    assert got == want


# --- nested report JSON structure -----------------------------------------

def test_report_nested_json_structure(spark):
    rows = Q["report_sketch_summary"](spark, SF_DIR_001).collect()
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    n_days = ev.select(F.date_format("ts", "yyyy-MM-dd")).distinct().count()
    assert len(rows) == 5  # one per event_type
    for r in rows:
        days = json.loads(r["report_json"])
        assert [d["day"] for d in days] == sorted(d["day"] for d in days)
        assert len(days) == n_days
        assert set(days[0]) == {"day", "avg_value", "n"}


# --- streaming batch equivalence for T2/T4 --------------------------------

def test_sliding_window_batch_equiv(spark):
    from service_level_reporting_spark.streaming.minute_rollup import (
        stream_sliding_window)

    streamed = {(r["win_start"], r["win_end"]): (r["avg_value"], r["n"])
                for r in stream_sliding_window(spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    batch = (
        ev.where((F.col("event_type") == "error") & (F.col("ts") < F.lit("2024-01-02")))
        .groupBy(F.window("ts", "10 minutes", "1 minute"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("s"), F.col("window.end").alias("e"),
                "avg_value", "n")
    )
    want = {(r["s"], r["e"]): (r["avg_value"], r["n"]) for r in batch.collect()}
    assert streamed == want


def test_watermark_append_batch_equiv(spark):
    """Append mode emits only windows finalized by the last watermark
    (max event time − 10 min); those emitted windows must equal the batch
    counts exactly, and nothing finalized may be missing."""
    import datetime as dt

    from service_level_reporting_spark.streaming.minute_rollup import (
        stream_watermark_late)

    streamed = {(r["hour"], r["event_type"]): r["n"]
                for r in stream_watermark_late(spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    filtered = ev.where(F.col("ts") < F.lit("2024-01-02"))
    wm = (filtered.agg(F.max("ts")).collect()[0][0]
          - dt.timedelta(minutes=10))
    batch = (
        filtered
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("hour"),
                F.col("window.end").alias("end"), "event_type", "n")
    )
    want = {(r["hour"], r["event_type"]): r["n"] for r in batch.collect()
            if r["end"] <= wm}
    assert streamed == want


# --- JDBC (embedded Derby) round-trip --------------------------------------

def test_jdbc_derby_roundtrip(spark):
    """The catalog target dim written into embedded Derby and read back via
    a partitioned JDBC scan must equal the in-memory dim exactly."""
    from service_level_reporting_spark.operators.catalog import catalog_dims
    from service_level_reporting_spark.sources.jdbc import (
        DERBY_DRIVER, _derby_url, read_jdbc_table)

    target = catalog_dims(spark)["target"]
    url = _derby_url("slr_derby_test", spark.sparkContext.applicationId)
    (target.write.format("jdbc").option("url", url)
     .option("dbtable", "t_roundtrip").option("driver", DERBY_DRIVER)
     .mode("overwrite").save())
    back = read_jdbc_table(
        spark, url, "t_roundtrip", partition_column="slo_id",
        lower_bound=1, upper_bound=13, num_partitions=3, driver=DERBY_DRIVER)
    assert back.rdd.getNumPartitions() == 3  # parallel cursor shape is real
    want = {tuple(r) for r in target.collect()}
    got = {tuple(r) for r in back.select(*target.columns).collect()}
    assert got == want


def test_compaction_preserves_content_and_shrinks_files(spark):
    """'compact' sink leg: the rewrite must strictly reduce file count while
    keeping row counts and value sums identical."""
    from service_level_reporting_spark.sources.sinks import compact_small_files

    rows = {r["key"]: r for r in compact_small_files(spark, SF_DIR_001).collect()}
    assert rows["files"]["n"] > rows["files"]["n2"] >= 7   # >= 1 file/day kept
    assert rows["rows"]["n"] == rows["rows"]["n2"] > 0
    assert rows["rows"]["v"] == 0.0                        # sum drift


def test_clustered_layout_dominates_scattered_for_skipping(spark):
    """'cluster' sink leg: sorting within partitions by the filter column
    must make strictly more row groups skippable for a point filter than
    the hash-scattered layout (whose groups mix all values)."""
    from service_level_reporting_spark.sources.sinks import (
        clustered_layout_stats)

    rows = {r["key"]: r for r in
            clustered_layout_stats(spark, SF_DIR_001).collect()}
    cl_skip, st_skip = rows["skippable"]["n"], rows["skippable"]["n2"]
    assert cl_skip > st_skip
    assert rows["skippable"]["v"] > 0.5   # most clustered groups skippable


def test_format_roundtrip_content_identical(spark):
    """'formats' sink leg: CSV, JSON-lines, ORC, and parquet round-trips of
    the same rollup must agree on row count, key count, and value sum."""
    from service_level_reporting_spark.sources.sinks import (
        format_roundtrip_stats)

    rows = {r["key"]: r for r in
            format_roundtrip_stats(spark, SF_DIR_001).collect()}
    ref = rows["parquet"]
    assert ref["n"] == ref["n2"] > 0          # rollup keys are unique
    for fmt in ("orc", "json", "csv"):
        assert (rows[fmt]["n"], rows[fmt]["n2"], rows[fmt]["v"]) == \
            (ref["n"], ref["n2"], ref["v"]), fmt


def test_compression_codec_matrix(spark):
    """'codecs' sink leg: every codec must preserve content bit-for-bit
    (same row count + value checksum) while sizes differ — and the
    high-ratio codecs (zstd/gzip) must actually beat the speed codecs
    (snappy/lz4) on bytes, else the leg is measuring nothing."""
    from service_level_reporting_spark.sources.sinks import (
        PARQUET_CODECS, compression_codec_stats)

    rows = {r["key"]: r for r in
            compression_codec_stats(spark, SF_DIR_001).collect()}
    assert set(rows) == set(PARQUET_CODECS)
    counts = {r["n"] for r in rows.values()}
    sums = {r["v"] for r in rows.values()}
    assert len(counts) == 1 and len(sums) == 1       # content identical
    assert all(r["n2"] > 0 for r in rows.values())
    assert min(rows["zstd"]["n2"], rows["gzip"]["n2"]) < \
        min(rows["snappy"]["n2"], rows["lz4"]["n2"])


def test_zorder_layout_skips_on_both_dimensions(spark):
    """'zorder' sink leg: single-column clustering prunes ONE predicate
    dimension; the Morton-interleaved sort must prune meaningfully on
    BOTH, and must beat the scattered layout on each (measured purely
    from parquet footer min/max stats)."""
    from service_level_reporting_spark.sources.sinks import (
        zorder_layout_stats)

    rows = {r["key"]: r for r in
            zorder_layout_stats(spark, "/root/testdata/sf0.01").collect()}
    frac = {k: (r["v"] or 0.0) for k, r in rows.items()}
    # clustered layout: near-total pruning on its own column, none on the other
    assert frac["minute_clustered:minute_idx"] > 0.8
    assert frac["minute_clustered:user_id"] <= 0.1
    # z-order: substantial pruning on BOTH dimensions
    assert frac["zorder:minute_idx"] > 0.5
    assert frac["zorder:user_id"] > 0.3
    # and strictly better than scattered on each
    assert frac["zorder:user_id"] > frac["scattered:user_id"]
    assert frac["zorder:minute_idx"] > frac["scattered:minute_idx"]
