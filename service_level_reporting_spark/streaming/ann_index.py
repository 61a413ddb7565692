"""T9 — incremental ANN-index maintenance as a stream.

At 100 TB the LSH index is not rebuilt, it is MAINTAINED: new embeddings
arrive continuously, each batch computes their multi-table hyperplane
signatures (the same seeded planes the batch index uses — a stateless,
Arrow-vectorized stage) and a stateful streaming aggregate keeps the
per-(table, bucket) populations current. Bucket populations are exactly
the statistic the query side needs (they size sub-tiling and flag hot
buckets for re-hashing), and they are an algebraic count — partial
aggregation + state merge, the cheapest possible streaming state.

Replay harness: embeddings parquet staged as N chunk files, consumed with
maxFilesPerTrigger=1 so the state genuinely accumulates across micro-
batches (a single batch would never exercise the merge). Batch
equivalence — streamed bucket populations == one-shot `lsh_blocks`-style
signature bucketing — is pytest-pinned.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _staged_emb_chunks(spark: SparkSession, sf_dir: str,
                       n_chunks: int = 4) -> str:
    """Stage embeddings as n_chunks parquet files (idempotent per app+sf,
    mtime-checked; appId salt avoids cross-process races)."""
    from service_level_reporting_spark.scratch import app_scratch_dir

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    dst_dir = app_scratch_dir(spark, f"slr_emb_chunks_{tag}")
    marker = os.path.join(dst_dir, "_STAGED")
    src = f"{sf_dir}/embeddings.parquet"
    if not (os.path.exists(marker)
            and os.path.getmtime(marker) >= os.path.getmtime(src)):
        shutil.rmtree(dst_dir, ignore_errors=True)
        (spark.read.parquet(src).repartition(n_chunks)
         .write.mode("overwrite").parquet(dst_dir))
        with open(marker, "w") as fh:
            fh.write("ok")
    return dst_dir


def streamed_bucket_populations(spark: SparkSession, sf_dir: str,
                                n_tables: int | None = None) -> DataFrame:
    """(table_idx, sig, n_vectors) maintained by a streaming aggregate over
    the chunked embeddings replay — the incremental form of the batch
    index's bucket statistics."""
    from service_level_reporting_spark.operators.similarity import (
        ANN_TOPK_TABLES, _planes_per_table, with_table_sigs)
    from service_level_reporting_spark.streaming.minute_rollup import (
        _run_to_table)
    from service_level_reporting_spark.tables import table_row_count

    g = _planes_per_table(table_row_count(sf_dir, "embeddings") or 2)
    s = (spark.readStream.schema(EMB_SCHEMA)
         .option("maxFilesPerTrigger", 1)          # one chunk per batch
         .parquet(_staged_emb_chunks(spark, sf_dir)))
    sigs = with_table_sigs(s, n_tables or ANN_TOPK_TABLES, g)
    buckets = (
        sigs.select(F.posexplode("sigs").alias("table_idx", "sig"))
        .groupBy("table_idx", "sig")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    return _run_to_table(buckets, "complete", "t9_lsh_index")


def batch_bucket_populations(spark: SparkSession, sf_dir: str,
                             n_tables: int | None = None) -> DataFrame:
    """One-shot twin of streamed_bucket_populations (same planes, same
    bucketing) for the equivalence check."""
    from service_level_reporting_spark.operators.similarity import (
        ANN_TOPK_TABLES, _planes_per_table, with_table_sigs)
    from service_level_reporting_spark.tables import load_tables, table_row_count

    g = _planes_per_table(table_row_count(sf_dir, "embeddings") or 2)
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return (
        with_table_sigs(e, n_tables or ANN_TOPK_TABLES, g)
        .select(F.posexplode("sigs").alias("table_idx", "sig"))
        .groupBy("table_idx", "sig")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def stream_lsh_index_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table index health after the replay: bucket count, vectors
    routed, and the largest bucket (the sub-tiling / hot-bucket signal)."""
    return (
        streamed_bucket_populations(spark, sf_dir)
        .groupBy("table_idx")
        .agg(F.count(F.lit(1)).alias("n_buckets"),
             F.sum("n_vectors").alias("n_vectors"),
             F.max("n_vectors").alias("max_bucket"))
        .orderBy("table_idx")
    )
