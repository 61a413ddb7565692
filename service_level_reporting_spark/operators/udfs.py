"""UDF escape hatches (SURVEY.md §2.10) — the ONLY sanctioned Python paths.

Policy: native-first. Every reference-origin operator in this engine is pure
Spark SQL; these are the three idioms for when that genuinely runs out, each
demonstrated on a real SLI task:

* grouped `applyInPandas` (UDAF-style): per-series minute gap-fill with
  linear interpolation — needs ordered neighbor state, which SQL window
  functions can't express cleanly (PySpark has no Python `Aggregator`;
  applyInPandas IS the UDAF idiom).
* scalar `pandas_udf` (Arrow-vectorized): z-score anomaly flag per batch.
* `mapInPandas` (UDTF-style): see similarity.py (GEMM tiles) and
  multimodal.py (feature extraction).

Scale notes: applyInPandas shuffles once on the series key — same shuffle an
SQL groupBy would need; each group is one series' window (minutes/day ≤ 1440
rows), so group memory is bounded regardless of total data size. Arrow moves
columns, not rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


# ---------------------------------------------------------------------------
# Gap-fill: resample each series to the full 1-minute grid and linearly
# interpolate missing minutes (the reference stores only observed minutes and
# tolerates gaps [H]; downstream burn-rate math wants a dense grid).
# ---------------------------------------------------------------------------

GAPFILL_SCHEMA = ("event_type string, minute timestamp, value double, "
                  "is_interpolated boolean")


def _gap_fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("minute").set_index("minute")
    full = pdf.resample("1min").mean(numeric_only=True)
    out = pd.DataFrame({
        "event_type": pdf["event_type"].iloc[0],
        "minute": full.index,
        "value": full["value"].interpolate(method="linear").round(6),
        "is_interpolated": full["value"].isna(),
    })
    return out.reset_index(drop=True)


def gap_fill_minutes(ev: DataFrame) -> DataFrame:
    per_minute = (
        ev.groupBy("event_type", SF.minute("ts").alias("minute"))
        .agg(F.avg("value").alias("value"))
    )
    return per_minute.groupBy("event_type").applyInPandas(
        _gap_fill_group, schema=GAPFILL_SCHEMA)


def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_level_reporting_spark.tables import events_between

    ev = events_between(spark, sf_dir, "2024-01-01", "2024-01-02")
    filled = gap_fill_minutes(ev)
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_minutes"),
            F.count(F.when(F.col("is_interpolated"), 1)).alias("n_interpolated"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Scalar pandas_udf: per-batch vectorized z-score (numpy under Arrow).
# The BATCH mean/std here are illustrative of the vectorized-scalar idiom;
# the checked query computes true per-day z-scores natively and uses the UDF
# only for the final standardization arithmetic.
# ---------------------------------------------------------------------------

def _standardize_fn(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    return ((v - mean) / std.replace(0.0, float("nan"))).round(6)


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDF built at call time: a module-level @pandas_udf would re-execute on
    # executor-side module import, where no SparkContext exists to parse the
    # return-type DDL.
    _standardize = pandas_udf(_standardize_fn, "double")
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stats = (
        ev.groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(F.avg("value").alias("day_mean"), F.stddev_samp("value").alias("day_std"))
    )
    z = (
        ev.select("event_id", "event_type", SF.day_str("ts").alias("day"), "value")
        .join(F.broadcast(stats), ["event_type", "day"])
        .withColumn("z", _standardize("value", "day_mean", "day_std"))
    )
    return (
        z.where(F.abs(F.col("z")) > 3.0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalies"),
             F.round(F.max(F.abs("z")), 6).alias("max_abs_z"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# U4 — native Python UDTF (Spark 4 `@udtf`): the REAL user-defined table
# function, not the mapInPandas idiom. One input row → N output rows via
# arbitrary Python, consumed with a SQL LATERAL join. The demo splits each
# document into sentences with token counts — a 1→N expansion whose split
# logic (regex + filtering) lives in Python; `explode(split())` could
# approximate it, which is exactly why the suite also keeps the native
# paths — this part exists to cover the UDTF API surface. Arrow-optimized
# (useArrow) so rows batch across the boundary.
# ---------------------------------------------------------------------------

def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_tokens int", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            import re

            for i, sent in enumerate(re.split(r"[.!?]+", text or "")):
                n = len([t for t in sent.split() if t])
                if n:
                    yield i, n

    spark.udtf.register("split_sentences", SplitSentences)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs.createOrReplaceTempView("udtf_docs_v")
    sent = spark.sql(
        "SELECT d.lang, s.sent_idx, s.n_tokens "
        "FROM udtf_docs_v AS d, LATERAL split_sentences(d.text) AS s")
    return (
        sent.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sentences"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("n_tokens"), 6).alias("avg_sentence_tokens"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# U1 + U2 + U4 as one labeled suite (round-2 consolidation; rows-only —
# pandas interpolation/sketchy float paths are engine-specific):
#   'gap_fill' — grouped applyInPandas per-series minute gap-fill with
#     linear interpolation (n = dense minutes, aux = interpolated count).
#   'zscore'   — scalar pandas_udf standardization, per-day z-score anomaly
#     counts (n = anomalies, aux = NULL, metric = max |z|).
#   'udtf'     — native Python UDTF sentence split via LATERAL (key column
#     carries lang; n = sentences, aux = total tokens, metric = avg
#     sentence length).
# ---------------------------------------------------------------------------

@register("udf_gap_fill_zscore")  # rows-only: exercises the Python UDF idioms
def udf_gap_fill_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = gap_fill_interpolate(spark, sf_dir).select(
        F.lit("gap_fill").alias("part"), "event_type",
        F.col("n_minutes").alias("n"),
        F.col("n_interpolated").alias("aux"),
        F.col("avg_value").alias("metric"))
    z = zscore_anomalies(spark, sf_dir).select(
        F.lit("zscore").alias("part"), "event_type",
        F.col("n_anomalies").alias("n"),
        F.lit(None).cast("long").alias("aux"),
        F.col("max_abs_z").alias("metric"))
    u = udtf_sentence_stats(spark, sf_dir).select(
        F.lit("udtf").alias("part"), F.col("lang").alias("event_type"),
        F.col("n_sentences").alias("n"),
        F.col("total_tokens").alias("aux"),
        F.col("avg_sentence_tokens").alias("metric"))
    return gap.unionByName(z).unionByName(u).orderBy("part", "event_type")
