"""Gap-fill semantics + salted-aggregation correctness (FIXTURES.md §B 4/7)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.operators.udfs import gap_fill_minutes


def _ts(minute: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, sec)


def test_gap_fill_linear_interpolation(spark):
    """Series with minutes 0,1,4: minutes 2,3 must be linearly interpolated,
    flagged, and observed minutes kept exact."""
    rows = [("e", _ts(0, 10), 10.0), ("e", _ts(1, 20), 20.0), ("e", _ts(4, 5), 50.0)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["minute"].minute: (r["value"], r["is_interpolated"])
           for r in gap_fill_minutes(ev).collect()}
    assert got[0] == (10.0, False)
    assert got[1] == (20.0, False)
    assert got[2] == (30.0, True)   # 20 + (50-20)/3
    assert got[3] == (40.0, True)
    assert got[4] == (50.0, False)
    assert len(got) == 5            # grid exactly min..max, nothing invented


def test_salted_agg_matches_direct_on_skewed_key(spark):
    """Salted two-phase aggregation must equal the direct groupBy on a
    skewed-key fixture (90% of rows on one hot key — FIXTURES.md §B.7).
    salted_agg aggregates columns by their OUTPUT names, so inputs are
    pre-projected under those names."""
    rows = [(("hot" if i % 10 else f"cold{i}"), float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    pre = df.select("k", F.col("v").alias("s"), F.col("v").alias("mn"),
                    F.col("v").alias("mx"))
    got = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
           for r in SF.salted_agg(
               pre, ["k"], {"n": "count", "s": "sum", "mn": "min", "mx": "max"}
           ).collect()}
    want = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    assert got == want


def test_zscore_flags_only_true_outliers(spark, monkeypatch):
    """pandas_udf standardization: a planted 5-sigma point is flagged, the
    rest of a tight cluster is not, and z matches the manual formula."""
    from service_level_reporting_spark.operators import udfs as U
    from service_level_reporting_spark.operators.udfs import zscore_anomalies

    rows = [(i, "e", dt.datetime(2024, 1, 1, 0, i % 60), 10.0 + (i % 5) * 0.1)
            for i in range(100)]
    rows.append((100, "e", dt.datetime(2024, 1, 1, 1, 0), 1000.0))  # outlier
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    monkeypatch.setattr(U, "load_tables", lambda s, d, names=None: {"events": ev})
    out = {r["event_type"]: r for r in zscore_anomalies(spark, "x").collect()}
    assert list(out) == ["e"]
    assert out["e"]["n_anomalies"] == 1
    import statistics
    vals = [r[3] for r in rows]
    want_z = (1000.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert abs(out["e"]["max_abs_z"] - round(abs(want_z), 6)) < 1e-6


def test_udtf_sentence_split_semantics(spark, monkeypatch):
    """Native Python UDTF via LATERAL: 1→N expansion with exact per-sentence
    token counts; empty sentences (doubled punctuation, trailing) drop."""
    from service_level_reporting_spark.operators import udfs as U
    docs = spark.createDataFrame(
        [(1, "one two. three four five! six", "en"),
         (2, "solo", "de"),
         (3, "double.. end.", "de")],
        "doc_id long, text string, lang string")
    monkeypatch.setattr(
        U, "load_tables", lambda s, d, names: {"documents": docs})
    rows = {r["lang"]: r for r in U.udtf_sentence_stats(spark, "x").collect()}
    assert rows["en"]["n_sentences"] == 3
    assert rows["en"]["total_tokens"] == 6
    assert rows["en"]["avg_sentence_tokens"] == 2.0
    assert rows["de"]["n_sentences"] == 3      # solo + double + end
    assert rows["de"]["total_tokens"] == 3
