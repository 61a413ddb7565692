"""Streaming-vs-batch equivalence (SURVEY §5.3): the same aggregation run
through Structured Streaming (availableNow replay) and as a plain batch
query must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.streaming import minute_rollup as S
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001


def test_tumbling_equals_batch(spark):
    streamed = S.stream_minute_tumbling(spark, SF_DIR_001)
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    batch = (
        ev.where(F.col("ts") < F.lit("2024-01-02"))
        .groupBy(SF.minute("ts").alias("minute"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n"))
    )
    got = {(r["minute"], r["event_type"]): (r["avg_value"], r["n"])
           for r in streamed.collect()}
    want = {(r["minute"], r["event_type"]): (r["avg_value"], r["n"])
            for r in batch.collect()}
    assert got == want


def test_stateful_dedup_equals_batch_distinct(spark):
    streamed = {r["event_type"]: r["n_unique_events"]
                for r in S.stream_stateful_dedup(spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    batch = {
        r["event_type"]: r["n"]
        for r in ev.where(F.col("ts") < F.lit("2024-01-02"))
        .groupBy("event_type").agg(F.countDistinct("event_id").alias("n")).collect()
    }
    assert streamed == batch


def test_session_window_counts_conserve_events(spark):
    out = S.stream_session_window(spark, SF_DIR_001)
    total_in_sessions = out.agg(F.sum("n_events").alias("s")).collect()[0]["s"]
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    n = ev.where(F.col("ts") < F.lit("2024-01-03")).count()
    assert total_in_sessions == n


def test_stateful_compliance_equals_batch(spark):
    """T6 applyInPandasWithState across multiple micro-batches must equal
    the one-shot batch computation of the same compliance."""
    from service_level_reporting_spark.streaming.minute_rollup import (
        STATEFUL_TARGET_HI, STATEFUL_TARGET_LO, stream_stateful_compliance)
    from service_level_reporting_spark.tables import load_tables

    got = {r["event_type"]: (r["n"], r["breaches"], r["compliance_pct"])
           for r in stream_stateful_compliance(spark, SF_DIR_001).collect()}
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"].where(
        F.col("ts") < F.lit("2024-01-08"))
    breach = (F.col("value") < STATEFUL_TARGET_LO) | (F.col("value") > STATEFUL_TARGET_HI)
    want = {r["event_type"]: (r["n"], r["breaches"], r["compliance_pct"])
            for r in ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(breach, 1)).alias("breaches"),
                F.round(100.0 * (1 - F.count(F.when(breach, 1)) / F.count(F.lit(1))), 6)
                .alias("compliance_pct")).collect()}
    assert got == want


def test_checkpointed_sink_exactly_once(spark):
    """Restarting the checkpointed file-sink stream over unchanged input
    must add zero rows, and the sunk rows must equal the batch filter."""
    from service_level_reporting_spark.streaming.minute_rollup import (
        stream_sink_checkpointed)
    from service_level_reporting_spark.tables import load_tables

    row = stream_sink_checkpointed(spark, SF_DIR_001).collect()[0]
    assert row["n_rows"] == row["n_rows_first_run"]  # second start: no dupes
    assert row["n_rows"] == row["n_distinct_ids"]
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    want = ev.where((F.col("event_type") == "error")
                    & (F.col("ts") < F.lit("2024-01-08"))).count()
    assert row["n_rows"] == want


def test_stream_stream_join_equals_batch(spark):
    """T8: the watermarked interval join over two availableNow streams must
    produce exactly the batch self-join's pairs (inner join, bounded
    horizon — no late-drop ambiguity in a single-batch replay)."""
    from service_level_reporting_spark.streaming.minute_rollup import (
        batch_stream_join_twin, stream_stream_join)

    got = stream_stream_join(spark, SF_DIR_001).collect()[0]
    want = batch_stream_join_twin(spark, SF_DIR_001).collect()[0]
    assert got["n_pairs"] == want["n_pairs"] > 0
    assert got["n_users"] == want["n_users"] > 0
    assert got["avg_lag_sec"] == want["avg_lag_sec"]
