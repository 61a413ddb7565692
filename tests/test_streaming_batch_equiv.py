"""Streaming-vs-batch equivalence (SURVEY §5.3): the same aggregation run
through Structured Streaming (availableNow replay) and as a plain batch
query must agree exactly."""

from __future__ import annotations

# r14: heavy system suite — builder-loop tier (driver fast tier skips it; run with -m "")
pytestmark = __import__('pytest').mark.slow

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


def test_streaming_hot_key_skew_bounded(spark, tmp_path):
    """VERDICT r2 stretch item 7: a pathological tenant (ONE user owning
    50% of all events) replayed through the streaming legs must (a) still
    match the batch twin exactly, and (b) keep state-store cardinality
    bounded by GROUP count, not event count — the skew posture SCALE.md §4
    promises (windowed keys don't include user_id; session state is one
    row per active session, and the hot user's burst collapses into few
    sessions)."""
    import service_level_reporting_spark.streaming.minute_rollup as MR

    n = 40_000
    base_epoch = 1_704_067_200                       # 2024-01-01 00:00 UTC
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(base_epoch) + F.col("id") % 21_600).alias("ts"),
        F.when(F.col("id") % 2 == 0, F.lit(7))       # 50% hot user
        .otherwise(1_000 + F.col("id") % 1_000)      # cold ids disjoint
        .cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "error", "purchase", "view")]),
            (F.col("id") % 4 + 1).cast("int")).alias("event_type"),
        (F.col("id") % 100 / 10.0).alias("value"),
        F.lit('{"source":"skew-fixture"}').alias("props"),
    )
    skew_dir = str(tmp_path / "sfskew")
    ev.write.mode("overwrite").parquet(skew_dir + "/events.parquet")

    # T1 tumbling under skew: exact batch equivalence
    got = {(r["minute"], r["event_type"]): (r["avg_value"], r["n"])
           for r in MR.stream_minute_tumbling(spark, skew_dir).collect()}
    want = {(r["minute"], r["event_type"]): (r["avg_value"], r["n"])
            for r in ev.groupBy(F.date_trunc("minute", "ts").alias("minute"),
                                "event_type")
            .agg(F.round(F.avg("value"), 6).alias("avg_value"),
                 F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    # state rows = windows x types (360 minutes x 4), NOT ~n events
    prog = MR.LAST_PROGRESS["t1_tumbling"]
    state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
    assert state_rows == len(got) <= 1500

    # T3 sessions under skew: hot user's 20k events collapse into ONE
    # 5-minute-gap session (events arrive every <=2s); state is bounded by
    # sessions, and totals conserve events
    sess = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in MR.stream_session_window(spark, skew_dir).collect()}
    assert sess[7] == (1, n // 2)
    assert sum(v[1] for v in sess.values()) == n

    # T5 dedup under skew: event_ids are unique -> per-type counts intact
    ded = {r["event_type"]: r["n_unique_events"]
           for r in MR.stream_stateful_dedup(spark, skew_dir).collect()}
    assert ded == {"click": n // 4, "error": n // 4,
                   "purchase": n // 4, "view": n // 4}


def test_kafka_source_options_construction():
    """The Kafka seam (source_factory): real option construction, validated
    without a broker — exactly the jdbc_options pattern."""
    import pytest as _pytest

    from service_level_reporting_spark.streaming.source_factory import (
        kafka_source_options)

    opts = kafka_source_options("broker1:9092,broker2:9092",
                                subscribe="events",
                                starting_offsets="earliest",
                                max_offsets_per_trigger=500_000,
                                min_partitions=64)
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "500000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "false"
    with _pytest.raises(ValueError):
        kafka_source_options("b:9092")                       # no topic
    with _pytest.raises(ValueError):
        kafka_source_options("b:9092", subscribe="a",
                             subscribe_pattern="a.*")        # both
    with _pytest.raises(ValueError):
        kafka_source_options("b:9092", subscribe="a",
                             starting_offsets="sometimes")   # bad offsets
    with _pytest.raises(ValueError):
        kafka_source_options("b:9092", subscribe="a",
                             max_offsets_per_trigger=0)


def test_kafka_value_projection_on_batch_frame(spark):
    """parse_kafka_events is the whole format boundary: JSON value bytes
    land in the normalized events schema (batch frame stand-in — the
    projection is stream/batch agnostic), malformed payloads are dropped,
    and the output schema matches what every downstream leg consumes."""
    import json

    from service_level_reporting_spark.streaming.source_factory import (
        parse_kafka_events)

    good = json.dumps({"event_id": 1, "ts": "2024-01-01 00:00:01",
                       "user_id": 7, "event_type": "click",
                       "value": 1.5, "props": "{}"})
    raw = spark.createDataFrame(
        [(good.encode(),), (b"not json at all",)], "value binary")
    rows = parse_kafka_events(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["event_id"], r["user_id"], r["event_type"], r["value"]) == \
        (1, 7, "click", 1.5)
    assert str(r["ts"]).startswith("2024-01-01 00:00:01")


def test_streamed_lsh_index_equals_batch(spark):
    """T9 incremental index maintenance: bucket populations accumulated
    across micro-batches (maxFilesPerTrigger=1 over 4 chunks) must equal
    the one-shot batch bucketing EXACTLY — per (table, sig), not just in
    aggregate — and the suite summary must conserve vectors per table."""
    from service_level_reporting_spark.streaming.ann_index import (
        batch_bucket_populations, stream_lsh_index_summary,
        streamed_bucket_populations)
    from service_level_reporting_spark.tables import table_row_count

    streamed = {(r["table_idx"], r["sig"]): r["n_vectors"]
                for r in streamed_bucket_populations(spark, SF_DIR_001).collect()}
    batch = {(r["table_idx"], r["sig"]): r["n_vectors"]
             for r in batch_bucket_populations(spark, SF_DIR_001).collect()}
    assert streamed == batch
    n_vecs = table_row_count(SF_DIR_001, "embeddings")
    summary = stream_lsh_index_summary(spark, SF_DIR_001).collect()
    assert len(summary) == 8                       # one row per hash table
    for r in summary:
        assert r["n_vectors"] == n_vecs           # every vector routed
        assert r["max_bucket"] <= n_vecs


def test_maintained_index_drives_batch_ann_identically(spark):
    """r4 (VERDICT item 6): the T9 maintained per-bucket populations feed
    the batch ANN query path — lsh_blocks skips its per-query bucket-stats
    aggregate and sub-tiles from the streamed state instead. Results must
    be IDENTICAL to the self-derived path (same seed/tables: the state is
    exactly the statistic the query would have recomputed), and a stale/
    empty state must degrade to one sub-block per bucket, never drop rows."""
    from service_level_reporting_spark.operators import similarity as SIM
    from service_level_reporting_spark.streaming.ann_index import (
        streamed_bucket_populations)
    from service_level_reporting_spark.tables import load_tables, table_row_count

    pops = streamed_bucket_populations(spark, SF_DIR_001)
    base = sorted((r["vec_a"], r["vec_b"], r["cos_sim"]) for r in
                  SIM.similarity_ann_lsh(spark, SF_DIR_001).collect())
    fed = sorted((r["vec_a"], r["vec_b"], r["cos_sim"]) for r in
                 SIM.similarity_ann_lsh(
                     spark, SF_DIR_001, bucket_populations=pops).collect())
    assert fed == base and base, "maintained-state path diverged"

    # stale-state degradation: an EMPTY population table must not drop any
    # vector from the blocks (left join + coalesce -> single sub-block)
    e = load_tables(spark, SF_DIR_001, ("embeddings",))["embeddings"]
    n = table_row_count(SF_DIR_001, "embeddings")
    empty = spark.createDataFrame(
        [], "table_idx int, sig int, n_vectors long")
    blocks = SIM.lsh_blocks(e, n, n_tables=2, bucket_populations=empty)
    from pyspark.sql import functions as F
    routed = blocks.agg(F.sum(F.size("ids"))).collect()[0][0]
    assert routed == 2 * n                       # every vector, every table


def test_state_store_soak_100_batches(spark):
    """r4 stretch (VERDICT item 8): a 100-micro-batch time-ordered replay
    through the T4/T5 state shapes (watermarked dedup + watermarked
    windowed agg in ONE query, two stateful operators) with trend
    assertions that catch state leaks:

      * state rows must PLATEAU (watermark eviction working): the final
        batch's numRowsTotal stays near the mid-replay median instead of
        climbing to the all-time total;
      * batch durations must not trend up: a leak shows as steadily
        growing per-batch work across 100 batches.

    The replay is staged time-ordered (repartitionByRange on ts; the file
    source consumes parts in path order) so the watermark advances
    gradually and eviction actually runs — a shuffled replay would mark
    almost everything late and test nothing."""
    import os
    import shutil
    import statistics
    import tempfile
    import uuid

    from service_level_reporting_spark.streaming.minute_rollup import (
        NORMALIZED_EVENTS_SCHEMA)
    from service_level_reporting_spark.tables import load_tables

    n_chunks = 100
    stage = os.path.join(tempfile.gettempdir(),
                         f"slr_soak_{uuid.uuid4().hex[:8]}")
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    (ev.repartitionByRange(n_chunks, "ts")
     .write.mode("overwrite").parquet(stage))
    try:
        s = (spark.readStream.schema(NORMALIZED_EVENTS_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(stage)
             .withWatermark("ts", "10 minutes")
             .dropDuplicatesWithinWatermark(["event_id"]))          # T5 state
        agg = (s.groupBy(F.window("ts", "1 hour"), "event_type")    # T4 state
               .agg(F.count(F.lit(1)).alias("n")))
        name = f"soak_{uuid.uuid4().hex[:8]}"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_prog = spark.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates", "100")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                           str(n_chunks + 50))
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination()
            progress = list(q.recentProgress)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                           prev_prog)

        runs = [p for p in progress if p["numInputRows"] > 0]
        assert len(runs) >= 95, f"only {len(runs)} data batches ran"

        # ---- state plateau per operator (dedup + windowed agg) ----
        n_ops = len(runs[0]["stateOperators"])
        assert n_ops == 2, runs[0]["stateOperators"]
        for op in range(n_ops):
            series = [p["stateOperators"][op]["numRowsTotal"] for p in runs]
            mid = statistics.median(series[len(series) // 4:
                                           3 * len(series) // 4])
            final, peak = series[-1], max(series)
            # leak signature: final ~= peak ~= sum of all keys ever seen,
            # far above the steady in-watermark population
            assert final <= 2 * mid + 50, (
                f"op{op} state climbing: final={final} mid-median={mid} "
                f"series tail={series[-10:]}")
            assert peak <= 4 * mid + 50, (
                f"op{op} state peaked {peak} vs mid-median {mid}")

        # ---- batch-duration trend (generous: shared container) ----
        durs = [p["batchDuration"] for p in runs]
        q1 = statistics.median(durs[:len(durs) // 4])
        q4 = statistics.median(durs[-len(durs) // 4:])
        assert q4 <= max(3 * q1, q1 + 1000), (
            f"batch durations trending up: first-quartile median {q1}ms "
            f"-> last-quartile median {q4}ms")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_txlog_ingest_exactly_once(spark):
    """T10: chunked replay ingested into a TxLog table via foreachBatch +
    txn markers must hold the source EXACTLY once (row-level equality, not
    just counts), a re-applied final batch must be skipped before any data
    lands, and every batch's marker must be in the log."""
    from service_level_reporting_spark.sources.txlog import TxLogTable
    from service_level_reporting_spark.streaming.txlog_sink import (
        TXN_WRITER, ingest_events_txlog)
    from service_level_reporting_spark.tables import load_tables

    table, n_batches, replay_applied = ingest_events_txlog(spark, SF_DIR_001)
    assert n_batches >= 4
    assert replay_applied is False                 # retry skipped

    got = sorted((r["event_id"], r["event_type"], r["value"])
                 for r in table.read(spark).collect())
    src = sorted((r["event_id"], r["event_type"], r["value"])
                 for r in load_tables(spark, SF_DIR_001,
                                      ("events",))["events"].collect())
    assert got == src                              # no loss, no dup

    assert table.last_txn_batch(TXN_WRITER) == n_batches - 1
    assert table.last_txn_batch("other_writer") == -1

    # a fresh-but-stale writer retry of EVERY batch id lands nothing
    one = table.read(spark).limit(1)
    for b in range(n_batches):
        assert table.txn_append(one, TXN_WRITER, b) is False
    assert table.read(spark).count() == len(src)


def test_socket_source_live_network_ingestion(spark):
    """The message-transport seam against a LIVE network source: real
    events serialized as JSON lines, served over a local TCP socket,
    consumed through streaming_source(kind='socket') — the same
    parse_kafka_events projection the Kafka branch uses — and aggregated.
    Per-type counts must equal the batch twin over the same payloads, and
    an injected malformed line must be dropped, not poison the stream."""
    import json
    import socket
    import threading
    import time
    import uuid

    from service_level_reporting_spark.streaming.source_factory import (
        streaming_source)
    from service_level_reporting_spark.tables import load_tables

    rows = (load_tables(spark, SF_DIR_001, ("events",))["events"]
            .orderBy("event_id").limit(200).collect())
    lines = [json.dumps({
        "event_id": r["event_id"], "ts": str(r["ts"]),
        "user_id": r["user_id"], "event_type": r["event_type"],
        "value": r["value"], "props": r["props"]}) for r in rows]
    lines.insert(50, "not json at all {{{")            # must be dropped
    expected = {}
    for r in rows:
        expected[r["event_type"]] = expected.get(r["event_type"], 0) + 1

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(timeout=90)                      # hold the connection
        finally:
            conn.close()
            srv.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    name = f"socket_agg_{uuid.uuid4().hex[:8]}"
    parsed = streaming_source(spark, kind="socket", port=port)
    agg = parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").start())
    try:
        deadline = time.time() + 75
        got = {}
        while time.time() < deadline:
            got = {r["event_type"]: r["n"]
                   for r in spark.table(name).collect()}
            if sum(got.values()) >= len(rows):
                break
            time.sleep(1.0)
        assert got == expected, f"got {got} want {expected}"
    finally:
        q.stop()
        stop.set()


# --- T11: transformWithStateInPandas seam (Spark 4 arbitrary-state API) ----

class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def test_tws_processor_state_fold_is_slicing_invariant(spark):
    """T11 semantics without the (environmental) protobuf runtime: drive
    DistinctMinuteProcessor.handleInputRows through a fake handle in two
    different micro-batch slicings — final state and emitted summary must
    be BIT-EXACT equal to each other and to the shared batch-fold code."""
    import numpy as np
    import pandas as pd

    from service_level_reporting_spark.streaming import tws_state as TWS

    minutes = np.array([1000 + (i * 37) % 500 for i in range(2000)],
                       dtype=np.int64)

    def run(slices):
        handle = _FakeHandle()            # kept to read final state back
        proc = TWS.DistinctMinuteProcessor()
        proc.init(handle)
        out = None
        for sl in slices:
            pdfs = iter([pd.DataFrame({"minute": sl})])
            out = list(proc.handleInputRows(("error",), pdfs, None))[-1]
        proc.close()
        return handle.states["hll_regs"].get()[0], out

    regs_a, out_a = run([minutes])                          # one batch
    regs_b, out_b = run([minutes[:700], minutes[700:1400],  # three batches
                         minutes[1400:]])
    assert regs_a == regs_b
    assert out_a["approx_minutes"].iloc[0] == out_b["approx_minutes"].iloc[0]
    assert out_a["reg_checksum"].iloc[0] == out_b["reg_checksum"].iloc[0]
    # and both equal the shared batch fold
    regs = np.zeros(1 << TWS.HLL_P, dtype=np.int64)
    TWS.update_minute_registers(regs, minutes)
    est, crc = TWS.registers_summary(regs)
    assert list(regs) == list(regs_a)
    assert (est, crc) == (out_a["approx_minutes"].iloc[0],
                          out_a["reg_checksum"].iloc[0])
    # estimate is sane: ~500 distinct minutes planted
    exact = len(set(minutes.tolist()))
    assert abs(est - exact) / exact < 0.05


def test_tws_streaming_runtime_is_environmental(spark):
    """The real streaming query is constructed and started; in this
    container it must fail with the documented protobuf ImportError (the
    transformWithState driver worker's dependency), NOT silently degrade.
    If the runtime ever appears, the batch-twin equality must hold."""
    import pytest as _pytest

    from service_level_reporting_spark.streaming import tws_state as TWS

    batch = {r["event_type"]: r for r in
             TWS.batch_distinct_minutes(spark, SF_DIR_001).collect()}
    assert len(batch) == 5 and all(r["approx_minutes"] > 0
                                   for r in batch.values())
    if TWS.tws_runtime_available():
        streamed = {r["event_type"]: r for r in
                    TWS.stream_tws_distinct_minutes(spark, SF_DIR_001)
                    .collect()}
        assert {k: (v["approx_minutes"], v["reg_checksum"])
                for k, v in streamed.items()} == \
               {k: (v["approx_minutes"], v["reg_checksum"])
                for k, v in batch.items()}
    else:
        with _pytest.raises(Exception) as ei:
            TWS.stream_tws_distinct_minutes(spark, SF_DIR_001).collect()
        # the protobuf ImportError detail lives in the JVM cause chain;
        # the surfaced streaming error names the crashed TWS driver worker
        msg = str(ei.value)
        assert ("TransformWithStateInPySpark" in msg
                or "STREAM_FAILED" in msg), msg
