"""End-to-end incremental curation pipeline (r10, VERDICT #4) — the
capstone composition over the engine's own lakehouse pieces:

    txlog CDC  →  quality gate (algebraic state, O(delta) folds)
               →  dedup state (sha2 + MinHash/LSH, O(delta) folds)
               →  curation verdicts (keep / duplicate / too_short)
               →  packed training sequences

Each stateful stage owns an idempotence watermark, so the pipeline is
EXACTLY-ONCE across a crash anywhere between stages: a re-run skips the
stages whose watermark already covers the corpus head and folds only
the ones the crash interrupted — nothing double-folds, nothing is lost
(pinned by a forced mid-pipeline restart test).

- The QUALITY stage persists its one-row algebraic state (rows, nulls,
  sum, sumsq, violations over per-doc token counts) in a txlog table
  stamped with ``__applied_ver``; a fold reads the corpus change feed
  with signed weights (quality.quality_apply_changes) and overwrites
  state+stamp atomically. A replayed fold sees ``maxv <= applied`` and
  skips — the same exactly-once shape as the streaming matview.
- The DEDUP stage is dedup_state.dedup_state_sync (VERDICT #3): its
  own `_sync.json` watermark; the state MERGE is idempotent (re-upsert
  of identical signatures, re-delete of absent keys), so a crash
  between merge and watermark replays safely.
- VERDICTS and PACKED SEQUENCES are deterministic VIEWS of the folded
  states — no third state to keep consistent. A doc is kept iff it is
  its duplicate-cluster's canonical representative (min doc_id label
  from the dedup state) AND long enough; kept docs pack greedily into
  PACK_BUDGET-token sequences in doc_id order (per-shard at scale —
  the cumulative sum partitions by stratum, never global).

fold-over-N-increments == batch-recompute-over-final-snapshot for every
output (quality report, verdicts, packed sequences) because states fold
exactly (algebraic / signature-deterministic) and outputs are pure
functions of state — the invariant the `curation_pipeline_incremental`
aux driver leg re-checks on every run (divergence rows must be 0).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from service_level_reporting_spark.operators import dedup_state as DS
from service_level_reporting_spark.operators.quality import (
    quality_apply_changes, quality_partials, quality_report_from_state)
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.sources.txlog import TxLogTable

MIN_TOKENS = 3          # verdict: shorter docs are dropped as too_short
PACK_BUDGET = 64        # tokens per packed training sequence

_QCOLS = ("rows", "null_value", "sum_value", "sumsq_value", "neg_value")


def _tokens(col="text"):
    return F.size(F.filter(F.split(col, " "), lambda t: t != F.lit("")))


def _q_frame(docs: DataFrame) -> DataFrame:
    """The rollup-shaped frame the quality gate profiles: one row per
    doc, value = token count (double)."""
    return docs.select(_tokens().cast("double").alias("value"))


def _q_state_table(work: str) -> TxLogTable:
    return TxLogTable(os.path.join(work, "quality_state"),
                      key_cols=["rows"], stats_col="rows")


def quality_sync(spark: SparkSession, corpus_path: str, work: str) -> dict:
    """Fold the corpus change feed into the persisted quality state —
    O(delta), exactly-once via the state row's __applied_ver stamp."""
    t = TxLogTable.open(corpus_path)
    cur = t.latest_version()
    st = _q_state_table(work)
    if st.latest_version() >= 0:
        row = st.read(spark).first()
        applied = int(row["__applied_ver"])
        if cur <= applied:
            return {"mode": "noop", "version": applied}
        state = st.read(spark).select(*_QCOLS)
        cdf = (t.changes(spark, applied, cur, net=True)
               .select(_tokens().cast("double").alias("value"),
                       "_change_type"))
        new = quality_apply_changes(state, cdf)
        mode = "fold"
    else:
        new = quality_partials(_q_frame(t.read(spark)))
        mode = "init"
    stamped = new.withColumn("__applied_ver", F.lit(cur).cast("long"))
    if st.latest_version() >= 0:
        st.overwrite(stamped.localCheckpoint(eager=True))
    else:
        st.append(stamped.coalesce(1))
    return {"mode": mode, "version": cur}


def pipeline_sync(spark: SparkSession, corpus_path: str,
                  work: str) -> dict:
    """One maintenance pass: fold quality, then dedup. Each stage's own
    watermark makes the whole pass idempotent and restartable at any
    point between (or inside) stages."""
    q = quality_sync(spark, corpus_path, work)
    dstate = os.path.join(work, "dedup_state")
    if os.path.exists(DS._sync_path(dstate)):
        d = DS.dedup_state_sync(spark, corpus_path, dstate)
    else:
        d = DS.build_dedup_state(spark, corpus_path, dstate)
    return {"quality": q, "dedup": d}


def quality_report(spark: SparkSession, work: str) -> DataFrame:
    st = _q_state_table(work)
    return quality_report_from_state(st.read(spark).select(*_QCOLS))


def verdicts(spark: SparkSession, corpus_path: str,
             work: str) -> DataFrame:
    """(doc_id, verdict) — 'keep' | 'duplicate' | 'too_short'. A doc is
    a duplicate iff the dedup state's cluster label names another doc
    as canonical; short docs drop regardless (too_short wins ties so
    the verdict is a total function of (label, n_tok))."""
    labels = DS.dedup_labels_from_state(
        spark, os.path.join(work, "dedup_state"))
    docs = TxLogTable.open(corpus_path).read(spark) \
        .select("doc_id", _tokens().alias("n_tok"))
    return (docs.join(labels, "doc_id")
            .select("doc_id", F.when(F.col("n_tok") < MIN_TOKENS,
                                     "too_short")
                    .when(F.col("label") != F.col("doc_id"), "duplicate")
                    .otherwise("keep").alias("verdict")))


def packed_sequences(spark: SparkSession, corpus_path: str,
                     work: str, n_strata: int | None = None) -> DataFrame:
    """(stratum, seq_id, n_docs, seq_tokens) — kept docs packed
    greedily into PACK_BUDGET-token sequences in doc_id order within
    each stratum. Deterministic function of the kept set.

    ``n_strata`` (r12) is the scale knob the docstring used to only
    promise: with it set, docs hash into ``pmod(doc_id, n_strata)``
    strata and the running sum partitions BY STRATUM — N independent
    window partitions instead of one global single-partition sort (the
    WindowExec all-to-one-partition trap). Sequences are identified by
    (stratum, seq_id); training consumers shuffle sequences anyway, so
    per-stratum packing order is semantically equivalent. Default None
    = one stratum (small corpora; keeps the exact r10 numbering)."""
    keep = (verdicts(spark, corpus_path, work)
            .where(F.col("verdict") == "keep").select("doc_id"))
    docs = (TxLogTable.open(corpus_path).read(spark)
            .join(keep, "doc_id")
            .select("doc_id", _tokens().alias("n_tok")))
    stratum = (F.pmod(F.col("doc_id"), F.lit(int(n_strata)))
               if n_strata else F.lit(0)).cast("long")
    docs = docs.withColumn("stratum", stratum)
    w = (Window.partitionBy("stratum").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs.withColumn("cum", F.sum("n_tok").over(w))
            .withColumn("seq_id", F.floor(
                (F.col("cum") - F.col("n_tok")) / float(PACK_BUDGET)))
            .groupBy("stratum", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("seq_tokens")))


def batch_recompute(spark: SparkSession, corpus_path: str,
                    work_fresh: str) -> dict:
    """The from-scratch twin over the FINAL snapshot: fresh dedup state,
    fresh quality partials — the reference every incremental output
    must equal."""
    t = TxLogTable.open(corpus_path)
    DS.build_dedup_state(spark, corpus_path,
                         os.path.join(work_fresh, "dedup_state"))
    st = _q_state_table(work_fresh)
    stamped = quality_partials(_q_frame(t.read(spark))).withColumn(
        "__applied_ver", F.lit(t.latest_version()).cast("long"))
    if st.latest_version() >= 0:
        st.overwrite(stamped.localCheckpoint(eager=True))
    else:
        st.append(stamped.coalesce(1))
    return {"version": t.latest_version()}


@register("curation_pipeline_incremental", aux=True)  # rows-only:
# stateful multi-stage pipeline; the invariant IS the output
def curation_pipeline_incremental(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Driver leg: stage a documents corpus as a txlog table, run the
    pipeline over THREE increments (append / delete / update) with a
    REPLAYED pass in the middle (the restart case — must fold nothing),
    then batch-recompute over the final snapshot. One row per compared
    output: n = incremental rows, n2 = batch rows, v = divergence row
    count (must be 0); plus a '_replay' accounting row (folds on the
    replayed pass — must be 0, encoded via v)."""
    import shutil
    import tempfile
    import uuid

    from service_level_reporting_spark.tables import load_tables

    base = os.path.join(tempfile.gettempdir(),
                        f"slr_curpipe_{uuid.uuid4().hex[:8]}")
    try:
        docs = (load_tables(spark, sf_dir)["documents"]
                .select("doc_id", "text").where(F.col("doc_id") < 150))
        corpus = os.path.join(base, "corpus")
        work = os.path.join(base, "work")
        fresh = os.path.join(base, "fresh")
        t = TxLogTable(corpus, key_cols=["doc_id"], stats_col="text")
        t.append(docs.where(F.col("doc_id") % 3 != 0).coalesce(2))
        pipeline_sync(spark, corpus, work)
        t.append(docs.where(F.col("doc_id") % 3 == 0).coalesce(2))
        pipeline_sync(spark, corpus, work)
        # replay: nothing may fold twice
        rep = pipeline_sync(spark, corpus, work)
        replay_folds = (0 if rep["quality"]["mode"] == "noop" else 1) \
            + (0 if rep["dedup"]["mode"] == "noop" else 1)
        t.delete(F.col("doc_id") % 10 == 1)
        pipeline_sync(spark, corpus, work)

        batch_recompute(spark, corpus, fresh)

        def div(a: DataFrame, b: DataFrame) -> int:
            return a.exceptAll(b).unionAll(b.exceptAll(a)).count()

        rows = []
        qi = quality_report(spark, work)
        qb = quality_report(spark, fresh)
        rows.append(("quality", qi.count(), qb.count(),
                     float(div(qi, qb))))
        vi = verdicts(spark, corpus, work)
        vb = verdicts(spark, corpus, fresh)
        rows.append(("verdicts", vi.count(), vb.count(),
                     float(div(vi, vb))))
        pi = packed_sequences(spark, corpus, work)
        pb = packed_sequences(spark, corpus, fresh)
        rows.append(("packed", pi.count(), pb.count(),
                     float(div(pi, pb))))
        rows.append(("_replay", replay_folds, 0, float(replay_folds)))
        return spark.createDataFrame(
            rows, "part string, n long, n2 long, v double")
    finally:
        shutil.rmtree(base, ignore_errors=True)
