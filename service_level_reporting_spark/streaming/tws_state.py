"""T11 — the Spark 4 arbitrary-state streaming API (`transformWithState
InPandas`, SPARK-49564 family): typed state handles (ValueState here; List/
MapState and timers in the same API) behind a `StatefulProcessor` class,
running on the RocksDB state store. This is the successor surface to T6's
`applyInPandasWithState` — state schemas are declared per handle, TTL is
first-class, and the store is the disk-backed one a 100 TB deployment runs.

Operator: per-series DISTINCT ACTIVE MINUTES maintained as HLL register
state (operators/sketches.py design, p=12). The register array is the
textbook fit for streaming state: order-independent (elementwise max), so
the result is micro-batch-slicing-invariant — the batch-equivalence test
pins the streamed registers BIT-EXACT against a batch twin over the same
rows, not just approximately.

Hashing must be engine-independent here (no JVM xxhash64 inside the Python
processor), so minute buckets hash via splitmix64 (Vigna's public finalizer
— full 64-bit avalanche, vectorizes in numpy uint64).

ENVIRONMENTAL BOUNDARY (same honesty contract as the Kafka branch): the
transformWithState PYTHON RUNTIME requires the `google.protobuf` package
(its driver worker speaks protobuf to the JVM state server —
`pyspark/sql/streaming/proto/StateMessage_pb2.py`), which this container
does not ship and the environment forbids installing. The operator code
here is complete and real: the processor's state fold is unit-tested
bit-exact against the batch twin via a fake handle, `batch_distinct
_minutes` runs the SAME register code end-to-end in Spark, and
`stream_tws_distinct_minutes` constructs the genuine streaming query —
in-container it fails with the documented protobuf ImportError
(pytest-pinned), on a cluster with protobuf it runs as written."""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle)

HLL_P = 12
_BITS = 64 - HLL_P          # 52: rho fits float64's exact-integer range

_ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")


def splitmix64(x):
    """Vectorized splitmix64 finalizer over uint64 (public constants)."""
    import numpy as np

    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def update_minute_registers(regs, minutes):
    """Fold minute buckets into HLL registers in place (numpy scatter-max);
    shared verbatim by the streaming processor and the batch twin so
    bit-exact equivalence is a property of the INPUT SET alone."""
    import numpy as np

    h = splitmix64(np.asarray(minutes, dtype=np.int64).astype(np.uint64))
    idx = (h >> np.uint64(_BITS)).astype(np.int64)
    v = (h & np.uint64((1 << _BITS) - 1)).astype(np.float64)
    _m, e = np.frexp(v)
    rho = np.where(v > 0, _BITS - (e - 1), _BITS + 1).astype(np.int64)
    np.maximum.at(regs, idx, rho)
    return regs


def registers_summary(regs) -> tuple:
    """(approx_distinct, crc32 checksum) — what the operator emits and what
    the batch twin must reproduce exactly."""
    import numpy as np

    from service_level_reporting_spark.operators.sketches import (
        hll_estimate_np)

    regs = np.asarray(regs, dtype=np.int64)
    est = int(round(hll_estimate_np(regs)))
    crc = zlib.crc32(regs.astype("<i4").tobytes()) & 0xFFFFFFFF
    return est, crc


class DistinctMinuteProcessor(StatefulProcessor):
    """ValueState('registers array<int>') per event_type; each batch folds
    its minute buckets in and emits the post-batch estimate + register
    checksum (monotone: registers only grow)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("hll_regs",
                                           "registers array<int>")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        if self._state.exists():
            regs = np.asarray(self._state.get()[0], dtype=np.int64)
        else:
            regs = np.zeros(1 << HLL_P, dtype=np.int64)
        for pdf in rows:
            if len(pdf):
                update_minute_registers(regs, pdf["minute"].to_numpy())
        self._state.update(([int(r) for r in regs],))
        est, crc = registers_summary(regs)
        yield pd.DataFrame({
            "event_type": [key[0]],
            "approx_minutes": [est],
            "reg_checksum": [crc],
        })

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """True when the transformWithState Python runtime's protobuf
    dependency is importable (absent in this container)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def batch_distinct_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin, runnable in-container: same minute projection, same
    register fold (update_minute_registers, shared verbatim), same
    (estimate, checksum) summary — what the streamed final state must
    equal bit-for-bit wherever the runtime exists."""
    import numpy as np

    from service_level_reporting_spark.tables import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 60).cast("long").alias("minute"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << HLL_P, dtype=np.int64)
        update_minute_registers(regs, pdf["minute"].to_numpy())
        est, crc = registers_summary(regs)
        return pd.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                             "approx_minutes": [est],
                             "reg_checksum": [crc]})

    return (ev.groupBy("event_type")
            .applyInPandas(fold, schema=("event_type string, "
                                         "approx_minutes long, "
                                         "reg_checksum long"))
            .orderBy("event_type"))


def stream_tws_distinct_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the T11 operator over the chunked replay (one micro-batch per
    file, so state genuinely carries across batches) and return the final
    per-series row. transformWithState requires the RocksDB provider — set
    for the query, restored after (a deployment sets it once; it freezes
    into the checkpoint)."""
    import uuid

    from service_level_reporting_spark.streaming.minute_rollup import (
        NORMALIZED_EVENTS_SCHEMA, _staged_chunks_dir)

    chunks = _staged_chunks_dir(spark, sf_dir)
    s = (
        spark.readStream.schema(NORMALIZED_EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(chunks)
        .select("event_type",
                F.floor(F.unix_timestamp("ts") / 60).cast("long")
                .alias("minute"))
    )
    updated = s.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=DistinctMinuteProcessor(),
        outputStructType=("event_type string, approx_minutes long, "
                          "reg_checksum long"),
        outputMode="Update",
        timeMode="None",
    )
    name = f"t11_tws_{uuid.uuid4().hex[:8]}"
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       _ROCKSDB)
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(min(int(prev_parts), 32)))
        q = (updated.writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev_provider)
    out = spark.table(name)
    # one row per (series, batch); registers only grow, so the final state
    # is the row with the max estimate (ties broken by checksum are fine —
    # equal estimates from equal registers share a checksum)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("approx_minutes"), F.desc("reg_checksum"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("event_type", "approx_minutes", "reg_checksum")
        .orderBy("event_type")
    )
