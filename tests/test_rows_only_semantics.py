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
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001

Q = registry.all_queries()


# --- approx aggregates vs exact -------------------------------------------

def test_approx_distinct_within_tolerance(spark):
    exact = {r["day"]: r["n_users"]
             for r in Q["agg_distinct_users"](spark, SF_DIR_001).collect()}
    approx = {r["day"]: r["n_users_approx"]
              for r in Q["agg_distinct_users_approx"](spark, SF_DIR_001).collect()}
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.15 * n), (day, approx[day], n)


def test_approx_percentile_close_to_exact(spark):
    exact = {r["event_type"]: r for r in Q["agg_percentile"](spark, SF_DIR_001).collect()}
    approx = {r["event_type"]: r
              for r in Q["agg_percentile_approx"](spark, SF_DIR_001).collect()}
    assert set(exact) == set(approx)
    for et, er in exact.items():
        ae, ee = approx[et]["p95_approx"], er["p95"]
        # approx percentile must land within 10% of the exact value's scale
        # (values are ~0..100 doubles)
        assert abs(ae - ee) <= max(2.0, 0.1 * abs(ee)), (et, ae, ee)
        assert approx[et]["n"] == er["n"]


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


def test_minhash_lsh_finds_planted_dups(spark):
    d = _synthetic_docs_dir(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
             for r in Q["dedup_minhash_lsh"](spark, d).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact dup: J=1
    assert (0, 2) in pairs or (1, 2) in pairs          # near dup survives LSH
    for a, b in pairs:
        assert {a, b} <= {0, 1, 2}, f"false positive pair {(a, b)}"


def test_simhash_clusters_planted_exact_dups(spark):
    d = _synthetic_docs_dir(spark)
    clusters = Q["dedup_simhash"](spark, d).collect()
    assert len(clusters) == 1
    assert clusters[0]["keeper_doc_id"] == 0
    assert clusters[0]["n_docs"] >= 2  # docs 0 and 1 share the signature


# --- sink idempotence ------------------------------------------------------

def test_upsert_sink_idempotent_across_invocations(spark):
    first = {r["indicator"]: r.asDict()
             for r in Q["sink_upsert_minute"](spark, SF_DIR_001).collect()}
    second = {r["indicator"]: r.asDict()
              for r in Q["sink_upsert_minute"](spark, SF_DIR_001).collect()}
    assert first == second
    for row in first.values():
        assert row["n_minutes"] == row["n_distinct_minutes"]


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
    rows = Q["report_nested_json"](spark, SF_DIR_001).collect()
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
    streamed = {(r["win_start"], r["win_end"]): (r["avg_value"], r["n"])
                for r in Q["stream_sliding_window"](spark, SF_DIR_001).collect()}
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

    streamed = {(r["hour"], r["event_type"]): r["n"]
                for r in Q["stream_watermark_late"](spark, SF_DIR_001).collect()}
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
