"""Window-function operators over SLI series.

Reference: "current value" of an indicator is the newest row per indicator
(`ORDER BY timestamp DESC LIMIT 1`, upstream:app/resources/sli.py#values
[H]); the rest (moving average, rank,
delta, cumulative error budget) are natural report extensions marked origin-N
in SURVEY.md §2.5.

Scale notes: every window here partitions by a series key (event_type /
user_id) — Spark shuffles once on that key and sorts within partitions; no
global sort. `moving_average` uses a ROWS frame over the already-aggregated
daily series (30 rows per series), so the window input is tiny even at 100 TB
raw — aggregate first, window second is the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

from service_level_reporting_spark.operators.sli import TARGET_LO, TARGET_HI


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(F.avg("value").alias("v"),
             F.count(F.when(SF.is_breach(F.col("value"), TARGET_LO, TARGET_HI),
                            F.lit(1))).alias("breaches"))
    )


_DAILY_SQL = f"""
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, avg(value) AS v,
               count(CASE WHEN value < {TARGET_LO} OR value > {TARGET_HI}
                          THEN 1 END) AS breaches
        FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


# W1 — newest row per series key ("current SLI value" [H])
@register(
    "latest_value_per_key",
    oracle="""
    SELECT user_id, event_type, ts, value
    FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_value_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


# W2+W3+W4+W5 — the daily window-function suite (round-2 consolidation:
# all four windows partition by the series key over the SAME tiny daily
# aggregate, so one query computes them side by side — aggregate first,
# window second; Spark pays ONE shuffle on event_type and sorts per frame):
#   ma7          — trailing 7-day moving average (ROWS frame)
#   breach_rank  — rank days by breach count within each series [L]
#   delta        — day-over-day delta (lag)
#   cum_breaches — cumulative error-budget burn (running breach total)
@register(
    "window_suite_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, day, round(v, 6) AS avg_value, breaches,
           round(avg(v) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS ma7,
           rank() OVER (PARTITION BY event_type
                        ORDER BY breaches DESC, day) AS breach_rank,
           round(v - lag(v) OVER (PARTITION BY event_type ORDER BY day), 6)
               AS delta,
           CAST(sum(breaches) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_breaches
    FROM daily
    """,
)
def window_suite_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_day = Window.partitionBy("event_type").orderBy("day")
    return _daily(spark, sf_dir).select(
        "event_type", "day",
        SF.r6(F.col("v")).alias("avg_value"),
        "breaches",
        SF.r6(F.avg("v").over(by_day.rowsBetween(-6, 0))).alias("ma7"),
        F.rank().over(Window.partitionBy("event_type")
                      .orderBy(F.desc("breaches"), F.asc("day")))
        .alias("breach_rank"),
        SF.r6(F.col("v") - F.lag("v").over(by_day)).alias("delta"),
        F.sum("breaches").over(by_day.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_breaches"),
    )


# ---------------------------------------------------------------------------
# Multi-window SLO burn rate (Google-SRE alerting pattern; natural extension
# of the reference's breach/compliance math). Burn rate = error-rate /
# error-budget; an alert needs BOTH a short and a long trailing window hot,
# which suppresses blips while catching sustained burn. Hot path: one hourly
# aggregation, then two tiny window frames over ~720 rows/month per series.
# ---------------------------------------------------------------------------

SLO_TARGET = 0.95
BURN_WINDOW_H = 6


@register(
    "slo_burn_rate_multiwindow",
    # r12 (VERDICT #7) rotation: W2-W5 window coverage in the driver
    # window is carried by window_suite_daily; this second W-row moved
    # to aux (still SQL-oracled in the pytest differential) to make
    # room for anomaly_seasonal_baseline (W7) in the 50-row window.
    aux=True,
    oracle=f"""
    WITH hourly AS (
        SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
               count(CASE WHEN event_type = 'error' THEN 1 END)
                 * 1.0 / count(*) AS err_rate
        FROM events GROUP BY 1
    )
    SELECT hour,
           round(err_rate / (1 - {SLO_TARGET}), 6) AS burn_1h,
           round(avg(err_rate) OVER (ORDER BY hour
                     ROWS BETWEEN {BURN_WINDOW_H - 1} PRECEDING AND CURRENT ROW)
                 / (1 - {SLO_TARGET}), 6) AS burn_6h,
           (err_rate / (1 - {SLO_TARGET}) > 1.0
            AND avg(err_rate) OVER (ORDER BY hour
                     ROWS BETWEEN {BURN_WINDOW_H - 1} PRECEDING AND CURRENT ROW)
                / (1 - {SLO_TARGET}) > 1.0) AS alert
    FROM hourly
    """,
)
def slo_burn_rate_multiwindow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    budget = 1.0 - SLO_TARGET
    hourly = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
        .agg((F.count(F.when(F.col("event_type") == "error", 1))
              / F.count(F.lit(1))).alias("err_rate"))
    )
    w = (Window.orderBy("hour")
         .rowsBetween(-(BURN_WINDOW_H - 1), Window.currentRow))
    burn_1h = F.col("err_rate") / F.lit(budget)
    burn_6h = F.avg("err_rate").over(w) / F.lit(budget)
    return hourly.select(
        "hour",
        SF.r6(burn_1h).alias("burn_1h"),
        SF.r6(burn_6h).alias("burn_6h"),
        ((burn_1h > 1.0) & (burn_6h > 1.0)).alias("alert"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization: gap > 30 min starts a new session per user (batch
# twin of the streaming session_window T3). lag + cumulative-sum-of-starts
# is the classic one-shuffle formulation: partition by user, sort by ts.
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


@register(
    "sessionize_events",
    oracle=f"""
    -- deterministic tie-break on event_id: duplicate timestamps would make
    -- the two window passes order-ambiguous otherwise
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         <= INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS is_start
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           max(cnt) AS longest_session_events
    FROM (SELECT user_id, session_id, count(*) AS cnt
          FROM sessions GROUP BY user_id, session_id)
    GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # tie-break on event_id: with duplicate (user, ts) rows the is_start
    # pass and the cumulative-sum pass must see the SAME total order, or
    # tied rows can migrate across a session boundary between passes
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MIN * 60
    # cast-to-double = fractional epoch seconds; unix_timestamp would
    # truncate to whole seconds and disagree with the oracle's exact
    # INTERVAL comparison on sub-second gap boundaries. The intermediate
    # cast("timestamp") makes this work for TIMESTAMP_NTZ sources too
    # (ntz→double is not a valid cast; ntz→timestamp resolves in the UTC
    # session zone, a no-op for already-tz'd columns).
    ts_s = F.col("ts").cast("timestamp").cast("double")
    prev_s = F.lag(ts_s).over(w_user)
    marked = ev.select(
        "user_id", "ts", "event_id",
        F.when((ts_s - prev_s) <= gap_s, F.lit(0))
        .otherwise(F.lit(1)).alias("is_start"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("is_start").over(w_user.rowsBetween(Window.unboundedPreceding, 0)))
    per_session = (sessions.groupBy("user_id", "session_id")
                   .agg(F.count(F.lit(1)).alias("cnt")))
    return per_session.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.sum("cnt").alias("n_events"),
        F.max("cnt").alias("longest_session_events"),
    )


# ---------------------------------------------------------------------------
# r4 session 2 (aux, rows-only) — LTTB downsampling (Steinarsson 2013,
# "Largest-Triangle-Three-Buckets"): the standard reduction a dashboard
# applies before rendering a series — keep first/last, bucket the rest,
# and per bucket keep the point forming the largest triangle with the
# previously KEPT point and the next bucket's centroid, preserving visual
# extremes that plain minute-averaging flattens.
#
# Sequentially dependent per series (each pick depends on the previous) =>
# not SQL-expressible; rows-only with invariants + a hand-computed fixture
# in pytest. Spark shape: per-series applyInPandas (one series' points fit
# one task by construction — a dashboard never renders more than it can
# sort), output is n_out rows per series.
# ---------------------------------------------------------------------------

def lttb_indices(xs, ys, n_out: int):
    """Pure-numpy LTTB: returns the kept indices (sorted). Deterministic
    (first-max tie-break)."""
    import numpy as np

    n = len(xs)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"LTTB: n_out must be >= 3, got {n_out}")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    every = (n - 2) / (n_out - 2)
    kept = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = min(int(np.floor((i + 1) * every)) + 1, n - 1)
        nlo = hi
        nhi = min(int(np.floor((i + 2) * every)) + 1, n)
        if nlo < nhi:                       # next bucket centroid
            ax_, ay_ = xs[nlo:nhi].mean(), ys[nlo:nhi].mean()
        else:                               # last bucket: use final point
            ax_, ay_ = xs[-1], ys[-1]
        bx, by = xs[lo:hi], ys[lo:hi]
        area = np.abs((xs[a] - ax_) * (by - ys[a])
                      - (xs[a] - bx) * (ay_ - ys[a]))
        a = lo + int(area.argmax())
        kept.append(a)
    kept.append(n - 1)
    return kept


@register("downsample_lttb", aux=True)  # rows-only: sequential per-series
def downsample_lttb(spark: SparkSession, sf_dir: str,
                    n_out: int = 100) -> DataFrame:
    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        xs = pdf["ts"].astype("int64").to_numpy()
        idx = lttb_indices(xs, pdf["value"].to_numpy(), n_out)
        out = pdf.iloc[idx][["event_type", "ts", "event_id", "value"]].copy()
        out["pick_rank"] = range(len(idx))
        return out

    return (ev.select("event_type", "ts", "event_id", "value")
            .groupBy("event_type")
            .applyInPandas(pick, schema=("event_type string, ts timestamp, "
                                         "event_id long, value double, "
                                         "pick_rank long"))
            .orderBy("event_type", "pick_rank"))


# ---------------------------------------------------------------------------
# r4 session 2 (aux, SQL-oracled) — seasonal-baseline anomaly detection:
# the standard SRE "is this hour weird?" check. Baseline = per (series,
# hour-of-day) mean/stddev over the TRAINING weeks (time-split, not
# random); the scoring week's hourly aggregates get a z-score against
# their hour-of-day twin, so daily seasonality doesn't read as anomaly.
# 100 TB: two hash aggs (hourly rollup; per-(series,hod) moments) + one
# broadcast join of the 5x24-row baseline — no window over raw events.
# ---------------------------------------------------------------------------

ANOMALY_SPLIT = "2024-01-22"   # train: weeks 1-3; score: final week
ANOMALY_Z = 3.0


@register(
    "anomaly_seasonal_baseline",
    # r12 (VERDICT #7): rotated INTO the 50-row driver window (was aux
    # since r6) so W7's hash check rides CORRECTNESS_r12+.
    oracle=f"""
    -- Cross-engine determinism: hourly means quantize to exact integer
    -- MILLI-units (v3 < 2^53), baseline moments are exact integer sums,
    -- and every double formula below runs on identical exact operands in
    -- both engines (IEEE division/sqrt are correctly rounded), so even
    -- round()-boundary ties agree.
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hr,
               hour(ts)               AS hod,
               CAST(round(avg(value) * 1000, 0) AS BIGINT) AS v3
        FROM events GROUP BY 1, 2, 3
    ), baseline AS (
        SELECT event_type, hod,
               count(*)                    AS n,
               CAST(sum(v3) AS DOUBLE)     AS s1,
               CAST(sum(v3 * v3) AS DOUBLE) AS s2
        FROM hourly WHERE hr < TIMESTAMP '{ANOMALY_SPLIT}'
        GROUP BY 1, 2
    )
    -- base_avg: explicit half-up on exact integers (engine round() tie
    -- policies differ): floor((20*s1 + n) / (2*n)) / 1e4
    SELECT h.event_type,
           h.hr,
           round(h.v3 / 1000.0, 4)   AS hourly_avg,
           floor((20 * b.s1 + b.n) / (2 * b.n)) / 10000.0 AS base_avg,
           round((h.v3 - b.s1 / b.n)
                 / nullif(sqrt((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1)), 0),
                 4) AS z,
           CASE WHEN abs((h.v3 - b.s1 / b.n)
                 / nullif(sqrt((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1)), 0))
                     > {ANOMALY_Z} THEN 1 ELSE 0 END AS is_anomaly
    FROM hourly h JOIN baseline b USING (event_type, hod)
    WHERE h.hr >= TIMESTAMP '{ANOMALY_SPLIT}'
    """,
)
def anomaly_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # r13 (guide §2.3): `hourly` feeds the baseline build AND the scoring
    # probe; unpersisted, each branch re-scanned events and re-ran the
    # hourly aggregate (plans/r13/anomaly_seasonal_baseline_before.txt:
    # 2 scans + 2 hash-agg exchanges). The persisted frame is tiny
    # (n_series x hours), so one scan/agg serves both branches.
    hourly = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", "ts").alias("hr"),
                   F.hour("ts").alias("hod"))
        .agg(F.round(F.avg("value") * 1000, 0).cast("long").alias("v3"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    split = F.lit(ANOMALY_SPLIT).cast("timestamp")
    baseline = (
        hourly.where(F.col("hr") < split)
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("v3").cast("double").alias("s1"),
             F.sum(F.col("v3") * F.col("v3")).cast("double").alias("s2"))
    )
    mean_m = F.col("s1") / F.col("n")
    std_m = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                   / (F.col("n") - 1))
    z = (F.col("v3") - mean_m) / F.nullif(std_m, F.lit(0.0))
    return (
        hourly.where(F.col("hr") >= split)
        .join(F.broadcast(baseline), ["event_type", "hod"])
        .select("event_type", "hr",
                F.round(F.col("v3") / 1000.0, 4).alias("hourly_avg"),
                (F.floor((20 * F.col("s1") + F.col("n"))
                         / (2 * F.col("n"))) / 10000.0).alias("base_avg"),
                F.round(z, 4).alias("z"),
                F.when(F.abs(z) > ANOMALY_Z, 1).otherwise(0)
                .cast("int").alias("is_anomaly"))
    )
