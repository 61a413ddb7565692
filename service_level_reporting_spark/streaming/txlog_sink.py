"""T10 — exactly-once streaming ingestion into a TxLog table.

The missing piece between the streaming surface (§2.9) and the lakehouse
format (S12): Structured Streaming's file/Kafka sources give at-least-once
delivery into `foreachBatch` — after a failure between the sink write and
the checkpoint advance, the engine RE-RUNS the last batch. Exactly-once
requires the sink to be idempotent per (writer, batch_id), which is what
`TxLogTable.txn_append` provides: the batch's data files and its
transactional marker become visible in ONE atomic commit, and a replayed
batch id is skipped before any data lands. This is the standard
Delta-style `txn` protocol expressed over the TxLog format.

The leg replays the events parquet as micro-batches (chunked staging +
maxFilesPerTrigger=1), ingests each batch via txn_append, then DELIBERATELY
re-applies the final batch (simulating the post-crash retry) and proves it
lands zero rows. Verification frame: per-type counts from the TABLE (must
equal the source exactly — no loss, no duplication) plus a '_txn' row
carrying the replayed-batch delta (must be 0) and the marker count.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark.scratch import app_scratch_dir
from service_level_reporting_spark.streaming.minute_rollup import (
    NORMALIZED_EVENTS_SCHEMA, _staged_chunks_dir)

TXN_WRITER = "slr_event_ingest"


def ingest_events_txlog(spark: SparkSession, sf_dir: str):
    """Run the chunked replay into a fresh TxLog table; returns
    (table, n_batches, replay_applied) where replay_applied is the result
    of re-applying the final batch (must be False = skipped)."""
    from service_level_reporting_spark.sources.txlog import TxLogTable

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    root = app_scratch_dir(spark, f"slr_txlog_ingest_{tag}")
    shutil.rmtree(root, ignore_errors=True)    # fresh table per invocation
    ckpt = app_scratch_dir(spark, f"slr_txlog_ingest_ckpt_{tag}")
    shutil.rmtree(ckpt, ignore_errors=True)
    table = TxLogTable(root, key_cols=["event_id"], stats_col="ts")

    last: list = [None, None, 0]      # [batch_id, pinned_df, n_batches]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # localCheckpoint: txn_append triggers its own write job; pin the
        # batch contents first so the file-source batch isn't recomputed.
        # Only the LAST batch is retained (the replay probe needs it) —
        # earlier pins are released so a long replay's checkpoint blocks
        # don't accumulate in storage memory.
        pinned = batch_df.localCheckpoint(eager=True)
        if last[1] is not None:
            try:
                last[1].unpersist()
            except Exception:
                pass
        last[0], last[1] = batch_id, pinned
        last[2] += 1
        table.txn_append(pinned, TXN_WRITER, batch_id)

    s = (spark.readStream.schema(NORMALIZED_EVENTS_SCHEMA)
         .option("maxFilesPerTrigger", 1)
         .parquet(_staged_chunks_dir(spark, sf_dir)))
    q = (s.writeStream.foreachBatch(handle)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # the post-crash retry: re-apply the final batch verbatim
    replay_applied = table.txn_append(last[1], TXN_WRITER, last[0])
    return table, last[2], replay_applied


def stream_txlog_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_level_reporting_spark.tables import load_tables

    table, n_batches, replay_applied = ingest_events_txlog(spark, sf_dir)
    got = table.read(spark)
    per_type = (got.groupBy(F.col("event_type").alias("key"))
                .agg(F.count(F.lit(1)).alias("n")))
    src_total = load_tables(spark, sf_dir, ("events",))["events"].count()
    table_total = got.count()
    meta_df = spark.createDataFrame(
        [("_txn",
          # 0 iff the table holds the source exactly once AND the replayed
          # batch landed nothing
          (table_total - src_total) + (1 if replay_applied else 0),
          n_batches)],
        "key string, n long, n2 long")
    return (per_type.withColumn("n2", F.lit(None).cast("long"))
            .unionByName(meta_df).orderBy("key"))
