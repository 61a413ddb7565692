"""Data-quality validation + distribution drift — the gate a training-data
pipeline runs BEFORE dedup/curation ever see a snapshot (Deequ/
Great-Expectations territory, re-expressed as plain Spark aggregates with a
DuckDB oracle twin).

Upstream parity note: the reference service (zalando-zmon/
service-level-reporting, reconstructed per SURVEY.md's provenance note)
validates SLI ingest payloads imperatively at its API boundary; this module
is that concern at corpus scale, plus the drift check a 100 TB pipeline
needs between snapshot versions.

Parts (one labeled union, SQL-oracled end to end):
  'null_rate'      — per audited column: null count / total / rate. The
                     completeness check every Deequ suite starts with.
  'profile_avg' /
  'profile_stddev' — per event_type: row count, distinct users, and the
                     value mean / sample stddev (the metric-store numbers a
                     monitoring pipeline alarms on when they jump).
  'constraint'     — Deequ-style declarative checks, one row per check
                     (violations / total / rate): value >= 0, ts inside a
                     sane epoch window, user_id present, doc_id unique,
                     n_chars consistent with the text payload.
  'psi' + 'psi_total' — Population Stability Index of the events value
                     distribution, first half-month vs the rest, over 10
                     fixed-width buckets spanning the observed range: the
                     standard train-vs-serve / snapshot-vs-snapshot drift
                     score (psi < 0.1 stable, > 0.25 action). Bucket edges
                     are plain floor arithmetic (identical IEEE doubles in
                     both engines), counts Laplace-smoothed so empty
                     buckets contribute finite mass.
  'psi_by_type'    — r7: the same PSI per event_type segment (global
                     bucket edges, per-type totals) — a real gate alarms
                     on the segment whose distribution shifted even when
                     the blended global score stays quiet.

100 TB posture: every part is a single-scan groupBy/agg (wordcount shape,
map-side partial); the PSI bounds ride a broadcast 1-row frame (no driver
collect); no UDF anywhere. The whole suite is one job per part over
columnar scans with only the audited columns read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

PSI_SPLIT = "2024-01-15"        # snapshot boundary: first half-month vs rest
PSI_BUCKETS = 10
PSI_EPS_N = 1e-4                # Laplace smoothing, numerator
PSI_EPS_T = 1e-3                # Laplace smoothing, denominator

@register(
    "data_quality_suite",
    aux=True,   # full SQL oracle, checked by the pytest differential
    oracle=f"""
    -- Deequ-style validation + PSI drift, mirrored per part.
    WITH null_audit AS (
        SELECT 'null_rate' AS part, 'events.value' AS key,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n,
               count(*) AS n2 FROM events
        UNION ALL SELECT 'null_rate', 'events.props',
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
        FROM events
        UNION ALL SELECT 'null_rate', 'events.user_id',
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(*)
        FROM events
        UNION ALL SELECT 'null_rate', 'documents.text',
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
        FROM documents
        UNION ALL SELECT 'null_rate', 'documents.lang',
               CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
        FROM documents
    ),
    profile AS (
        SELECT event_type, count(*) AS n,
               count(DISTINCT user_id) AS n2,
               round(avg(value), 6) AS avg_v,
               round(stddev(value), 6) AS sd_v
        FROM events GROUP BY event_type
    ),
    constraints AS (
        SELECT 'constraint' AS part, 'value_non_negative' AS key,
               CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
               count(*) AS n2 FROM events
        UNION ALL SELECT 'constraint', 'ts_in_epoch_window',
               CAST(sum(CASE WHEN ts < TIMESTAMP '2023-01-01'
                        OR ts >= TIMESTAMP '2026-01-01'
                        THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM events
        UNION ALL SELECT 'constraint', 'user_id_present',
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(*)
        FROM events
        UNION ALL SELECT 'constraint', 'doc_id_unique',
               count(*) - count(DISTINCT doc_id), count(*) FROM documents
        UNION ALL SELECT 'constraint', 'n_chars_matches_text',
               CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
                    AS BIGINT),
               count(*) FROM documents
    ),
    b AS (
        SELECT min(value) AS lo, max(value) AS hi,
               CAST(sum(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS t1,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS t2
        FROM events
    ),
    bucketed AS (
        SELECT CAST(least({PSI_BUCKETS - 1}, greatest(0,
                   floor((value - b.lo)
                         / (CASE WHEN b.hi > b.lo THEN b.hi - b.lo
                                 ELSE 1 END) * {PSI_BUCKETS})))
                   AS BIGINT) AS bucket,
               CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END AS w1
        FROM events, b
    ),
    g AS (
        SELECT bucket, CAST(sum(w1) AS BIGINT) AS n1,
               CAST(sum(1 - w1) AS BIGINT) AS nx
        FROM bucketed GROUP BY bucket
    ),
    psi AS (
        SELECT bucket, n1, nx,
               ((n1 + {PSI_EPS_N}) / (t1 + {PSI_EPS_T})
                - (nx + {PSI_EPS_N}) / (t2 + {PSI_EPS_T}))
               * ln(((n1 + {PSI_EPS_N}) / (t1 + {PSI_EPS_T}))
                    / ((nx + {PSI_EPS_N}) / (t2 + {PSI_EPS_T}))) AS c
        FROM g, b
    ),
    bucketed_t AS (
        SELECT event_type,
               CAST(least({PSI_BUCKETS - 1}, greatest(0,
                   floor((value - b.lo)
                         / (CASE WHEN b.hi > b.lo THEN b.hi - b.lo
                                 ELSE 1 END) * {PSI_BUCKETS})))
                   AS BIGINT) AS bucket,
               CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END AS w1
        FROM events, b
    ),
    gt AS (
        SELECT event_type, bucket, CAST(sum(w1) AS BIGINT) AS n1,
               CAST(sum(1 - w1) AS BIGINT) AS nx
        FROM bucketed_t GROUP BY event_type, bucket
    ),
    tt AS (
        SELECT event_type, CAST(sum(n1) AS BIGINT) AS t1,
               CAST(sum(nx) AS BIGINT) AS t2
        FROM gt GROUP BY event_type
    ),
    psi_t AS (
        SELECT gt.event_type, tt.t1, tt.t2,
               sum(((n1 + {PSI_EPS_N}) / (tt.t1 + {PSI_EPS_T})
                    - (nx + {PSI_EPS_N}) / (tt.t2 + {PSI_EPS_T}))
                   * ln(((n1 + {PSI_EPS_N}) / (tt.t1 + {PSI_EPS_T}))
                        / ((nx + {PSI_EPS_N}) / (tt.t2 + {PSI_EPS_T})))) AS c
        FROM gt JOIN tt USING (event_type)
        GROUP BY gt.event_type, tt.t1, tt.t2
    )
    SELECT part, key, n, n2,
           round(CAST(n AS DOUBLE) / n2, 6) AS v FROM null_audit
    UNION ALL
    SELECT 'profile_avg', event_type, n, n2, avg_v FROM profile
    UNION ALL
    SELECT 'profile_stddev', event_type, n, n2, sd_v FROM profile
    UNION ALL
    SELECT part, key, n, n2,
           round(CAST(n AS DOUBLE) / n2, 6) AS v FROM constraints
    UNION ALL
    SELECT 'psi', CAST(bucket AS VARCHAR), n1, nx, round(c, 6) FROM psi
    UNION ALL
    SELECT 'psi_by_type', event_type, t1, t2, round(c, 6) FROM psi_t
    UNION ALL
    SELECT 'psi_total', 'total', t1, t2,
           round((SELECT sum(c) FROM psi), 6) FROM b
    ORDER BY part, key
    """,
)
def data_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir, ("events", "documents"))
    ev, docs = t["events"], t["documents"]
    ts = F.col("ts").cast("timestamp")

    # r13 (guide §2.3/§2.4): the r7..r12 spelling built each labeled row
    # from its own 1-row aggregate — and since Catalyst does not share
    # subtrees across a Union, every null_rate/constraint row re-SCANNED
    # its table (plans/r13/data_quality_suite_before.txt: 20 scans). All
    # of those rows are conditional sums over the same scan, so each
    # table now pays ONE aggregate and stack() unpivots the labeled rows;
    # v = round(n / n2, 6) holds for every one of them. Values identical.

    # --- events: null_rate x3 + constraint x3 from ONE scan --------------
    ev_checks = [
        ("null_rate", "events.value", F.col("value").isNull()),
        ("null_rate", "events.props", F.col("props").isNull()),
        ("null_rate", "events.user_id", F.col("user_id").isNull()),
        ("constraint", "value_non_negative", F.col("value") < 0),
        ("constraint", "ts_in_epoch_window",
         (ts < F.lit("2023-01-01").cast("timestamp"))
         | (ts >= F.lit("2026-01-01").cast("timestamp"))),
        ("constraint", "user_id_present", F.col("user_id").isNull()),
    ]
    ev_agg = ev.agg(
        F.count(F.lit(1)).alias("_total"),
        *[F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_c{i}")
          for i, (_, _, cond) in enumerate(ev_checks)])
    ev_stack = ", ".join(f"'{part}', '{key}', _c{i}"
                         for i, (part, key, _) in enumerate(ev_checks))
    ev_rows = (ev_agg.selectExpr(
        f"stack({len(ev_checks)}, {ev_stack}) AS (part, key, n)", "_total")
        .select("part", "key", "n", F.col("_total").alias("n2"),
                SF.r6(F.col("n") / F.col("_total")).alias("v")))

    # --- documents: null_rate x2 + constraint x2 from ONE scan -----------
    docs_agg = docs.agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long").alias("_nt"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("long").alias("_nl"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id"))
        .cast("long").alias("_du"),
        F.sum(F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0))
        .cast("long").alias("_cm"))
    docs_rows = (docs_agg.selectExpr(
        "stack(4, 'null_rate', 'documents.text', _nt, "
        "'null_rate', 'documents.lang', _nl, "
        "'constraint', 'doc_id_unique', _du, "
        "'constraint', 'n_chars_matches_text', _cm) AS (part, key, n)",
        "_total")
        .select("part", "key", "n", F.col("_total").alias("n2"),
                SF.r6(F.col("n") / F.col("_total")).alias("v")))

    nulls_cons = ev_rows.unionByName(docs_rows)

    # --- profile: per-type count / distinct users / mean / stddev --------
    # one scan; stack() reshapes the avg/stddev columns into the two
    # labeled rows (the former two selects re-ran the countDistinct agg)
    prof = (ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n2"),
        SF.r6(F.avg("value")).alias("avg_v"),
        SF.r6(F.stddev("value")).alias("sd_v"))
        .selectExpr("event_type AS key", "n", "n2",
                    "stack(2, 'profile_avg', avg_v, "
                    "'profile_stddev', sd_v) AS (part, v)")
        .select("part", "key", "n", "n2", "v"))

    # --- PSI drift: fixed-width buckets over the observed value range ----
    # bounds + per-side totals ride ONE broadcast 1-row frame — the CMS
    # lesson (r5): no driver collect in the operator body
    split = F.lit(PSI_SPLIT).cast("timestamp")
    # bounds feeds the bucketing pass AND the psi_total row — persisted
    # (1 row) so it costs one scan, not two
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.sum(F.when(ts < split, 1).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.when(ts >= split, 1).otherwise(0)).cast("long").alias("t2")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    span = F.when(F.col("hi") > F.col("lo"),
                  F.col("hi") - F.col("lo")).otherwise(F.lit(1.0))
    bucket = F.least(
        F.lit(PSI_BUCKETS - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col("value") - F.col("lo")) / span * PSI_BUCKETS))
    ).cast("long")

    # --- psi_by_type (r7, VERDICT item 5): the same bucketed drift score
    # PER SEGMENT — a single event_type's distribution shift must alarm
    # even when the blended global distribution stays quiet. Bucket edges
    # stay GLOBAL (comparable across segments); the before/after totals
    # are per-type. Buckets empty for a type are skipped identically in
    # both engines (their smoothed contribution is ~eps-sized).
    # r13: the per-type bucket counts are computed FIRST (one bucketing
    # pass over events) and persisted; the GLOBAL bucket counts are their
    # per-bucket sums — exact integer addition, value-identical to the
    # former second bucketing pass over raw events, for one scan less.
    gt = (ev.crossJoin(F.broadcast(bounds))
          .select("event_type", bucket.alias("bucket"),
                  F.when(ts < split, 1).otherwise(0).alias("w1"))
          .groupBy("event_type", "bucket")
          .agg(F.sum("w1").cast("long").alias("n1"),
               F.sum(1 - F.col("w1")).cast("long").alias("nx"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    g = (gt.groupBy("bucket")
         .agg(F.sum("n1").cast("long").alias("n1"),
              F.sum("nx").cast("long").alias("nx"))
         .crossJoin(F.broadcast(bounds.select("t1", "t2"))))
    p = (F.col("n1") + PSI_EPS_N) / (F.col("t1") + PSI_EPS_T)
    q = (F.col("nx") + PSI_EPS_N) / (F.col("t2") + PSI_EPS_T)
    contrib = (p - q) * F.log(p / q)
    psi = g.select("bucket", "n1", "nx", "t1", "t2",
                   contrib.alias("c"))
    psi_rows = psi.select(
        F.lit("psi").alias("part"),
        F.col("bucket").cast("string").alias("key"),
        F.col("n1").alias("n"), F.col("nx").alias("n2"),
        SF.r6(F.col("c")).alias("v"))
    psi_total = psi.groupBy("t1", "t2").agg(
        SF.r6(F.sum("c")).alias("v")).select(
        F.lit("psi_total").alias("part"), F.lit("total").alias("key"),
        F.col("t1").alias("n"), F.col("t2").alias("n2"), "v")

    tt = gt.groupBy("event_type").agg(
        F.sum("n1").cast("long").alias("t1"),
        F.sum("nx").cast("long").alias("t2"))
    jt = gt.join(F.broadcast(tt), "event_type")
    pt = (F.col("n1") + PSI_EPS_N) / (F.col("t1") + PSI_EPS_T)
    qt = (F.col("nx") + PSI_EPS_N) / (F.col("t2") + PSI_EPS_T)
    psi_by_type = (jt.select("event_type", "t1", "t2",
                             ((pt - qt) * F.log(pt / qt)).alias("c"))
                   .groupBy("event_type", "t1", "t2")
                   .agg(SF.r6(F.sum("c")).alias("v"))
                   .select(F.lit("psi_by_type").alias("part"),
                           F.col("event_type").alias("key"),
                           F.col("t1").alias("n"),
                           F.col("t2").alias("n2"), "v"))

    return (nulls_cons.unionByName(prof).unionByName(psi_rows)
            .unionByName(psi_by_type)
            .unionByName(psi_total).orderBy("part", "key"))


# ---- incremental quality over lakehouse deltas (r7, VERDICT item 8) -----
#
# The r6 families composed: the txlog change data feed supplies row-level
# deltas, and the quality gate's LINEAR metrics (counts, sums, sums of
# squares, violation counts) form a mergeable algebraic state — so a
# 100 TB pipeline validates each snapshot by updating the previous
# snapshot's state with ONE pass over the increment instead of rescanning
# the table. Rewrite-carried rows (a merge re-emitting untouched rows as
# delete+insert pairs) cancel exactly because every metric is a signed
# sum. Distinct-style checks (doc_id_unique) are NOT linear and stay with
# the full-snapshot suite — the mergeable-sketch path (operators/
# sketches.py HLL) is their scale story.


def quality_partials(df: DataFrame, weight=None) -> DataFrame:
    """One-row algebraic quality state over a rollup-shaped frame
    (``value`` double): row count, null count, sum, sum of squares, and
    negative-value violations — each a plain (optionally ``weight``-ed)
    sum, so states merge by column-wise addition and a CDF increment
    applies with weight +1/-1. Single scan, map-side partials, no UDF."""
    w = (F.lit(1) if weight is None else weight).cast("long")
    val = F.col("value")
    v0 = F.coalesce(val, F.lit(0.0))
    return df.agg(
        F.coalesce(F.sum(w), F.lit(0)).cast("long").alias("rows"),
        F.coalesce(F.sum(F.when(val.isNull(), w).otherwise(0)),
                   F.lit(0)).cast("long").alias("null_value"),
        F.coalesce(F.sum(w * v0), F.lit(0.0)).alias("sum_value"),
        F.coalesce(F.sum(w * v0 * v0), F.lit(0.0)).alias("sumsq_value"),
        F.coalesce(F.sum(F.when(val < 0, w).otherwise(0)),
                   F.lit(0)).cast("long").alias("neg_value"))


def quality_apply_changes(state: DataFrame, cdf: DataFrame) -> DataFrame:
    """state' = state + partials(inserts) - partials(deletes): ONE
    partials pass over the change feed with signed weights, merged with
    the stored state by a 2-row column-wise sum — the increment is the
    only data scanned."""
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(-1)
    delta = quality_partials(cdf, weight=w)
    return state.unionByName(delta).agg(
        *[F.sum(c).alias(c) for c in state.columns])


def quality_report_from_state(state: DataFrame) -> DataFrame:
    """Derive the gate's human metrics (null rate, mean, sample stddev,
    violation rate) from the algebraic state in-frame — the same numbers
    a full-snapshot profile computes, without touching the table."""
    n = F.col("rows")
    nn = (n - F.col("null_value")).cast("double")
    s, ss = F.col("sum_value"), F.col("sumsq_value")
    var = (ss - s * s / nn) / (nn - F.lit(1.0))
    return state.select(
        "rows", "null_value",
        SF.r6(F.col("null_value") / n).alias("null_rate"),
        SF.r6(s / nn).alias("mean_value"),
        SF.r6(F.sqrt(F.greatest(var, F.lit(0.0)))).alias("stddev_value"),
        "neg_value", SF.r6(F.col("neg_value") / n).alias("neg_rate"))
