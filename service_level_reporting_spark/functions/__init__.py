"""Column-expression helpers (no UDFs — everything stays in Catalyst codegen).

These are plain functions returning ``Column``; they are expression sugar,
not optimizer rules (SURVEY.md §4: no custom Catalyst work needed).

Vector math over ``array<float>`` uses higher-order functions
(``zip_with``/``aggregate``) so the 64-d embedding ops run JVM-side —
no Python/Arrow transfer in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# time helpers (reference: per-minute SLI grain, per-day report grain;
# upstream:app/resources/sli.py + report.py [H])
# ---------------------------------------------------------------------------

def minute(ts: Column | str) -> Column:
    return F.date_trunc("minute", ts)


def hour(ts: Column | str) -> Column:
    return F.date_trunc("hour", ts)


def day(ts: Column | str) -> Column:
    """DateType day bucket (matches DuckDB ``CAST(ts AS DATE)``)."""
    return F.to_date(ts)


def day_str(ts: Column | str) -> Column:
    """Day bucket as 'YYYY-MM-DD' string — used for any column that reaches
    the driver's value-hash: DATE round-trips through pandas differently in
    Spark (datetime.date) vs DuckDB (datetime64), strings are unambiguous.
    Oracle twin: ``strftime(ts, '%Y-%m-%d')``."""
    return F.date_format(ts, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# SLO helpers (reference: target bands `(target_from, target_to)`;
# upstream:app/resources/target.py [H]; bound inclusivity is OUR contract:
# a value exactly at the bound is WITHIN target — breach is strict <lo / >hi)
# ---------------------------------------------------------------------------

def is_breach(value: Column, lo: float | Column, hi: float | Column) -> Column:
    lo = F.lit(lo) if isinstance(lo, (int, float)) else lo
    hi = F.lit(hi) if isinstance(hi, (int, float)) else hi
    return (value < lo) | (value > hi)


def breach_count(value: Column, lo, hi) -> Column:
    """Aggregate: number of breaching rows (NULL values are not breaches)."""
    return F.count(F.when(is_breach(value, lo, hi), F.lit(1)))


def compliance(breaches: Column, total: Column) -> Column:
    """1 - breaches/total; NULL when total == 0 (empty window, SURVEY A6)."""
    return F.lit(1.0) - F.try_divide(breaches.cast("double"), total.cast("double"))


def safe_ratio(num: Column, den: Column) -> Column:
    return F.try_divide(num.cast("double"), den.cast("double"))


# ---------------------------------------------------------------------------
# vector math over array<float|double> — pure Spark SQL, codegen-friendly
# ---------------------------------------------------------------------------

def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product for a KNOWN vector width, expanded to a flat sum of
    ``dim`` products. Unlike the `aggregate` HOF (interpreted per element,
    ~100x slower in a pair join), this lands in whole-stage codegen — the hot
    path for brute-force similarity. Inputs must already be array<double>.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    terms = [a.getItem(i) * b.getItem(i) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def normalize(a: Column | str) -> Column:
    """Unit-normalize an array<float|double> (NULL-safe via try_divide);
    do this ONCE per side before a pair join so each pair costs one dot."""
    a = F.col(a) if isinstance(a, str) else a
    ad = a.cast("array<double>")
    n = l2_norm(ad)
    return F.transform(ad, lambda x: F.try_divide(x, n))


# ---------------------------------------------------------------------------
# float hash-parity policy (SURVEY §5.2): every float aggregate that reaches
# the driver's value-hash is rounded; ROUND_AVG for ~O(100) magnitudes,
# ROUND_SUM for large monetary sums where accumulated FP drift is bigger.
# Mirror EXACTLY in oracle SQL (DuckDB round() is also half-away-from-zero).
# ---------------------------------------------------------------------------

ROUND_AVG = 6
ROUND_SUM = 2


# ---------------------------------------------------------------------------
# Skew handling: salted two-phase aggregation. AQE's skew-join split covers
# joins; for a groupBy on a pathologically hot key (one entity owning most of
# a 100 TB stream), salt the key into N subkeys, aggregate partially per
# (key, salt), then merge per key. Only algebraic aggregates compose this
# way — helpers below cover the count/sum/min/max family the SLI specs use.
# ---------------------------------------------------------------------------

SALT_COL = "__salt"


def with_salt(df, n_salts: int = 16):
    """Deterministic salt derived from a uniformly-distributed source column
    is preferable, but a random salt is fine for aggregation (any row may
    land in any subgroup)."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(df, key_cols: list[str], aggs: dict[str, str], n_salts: int = 16):
    """Two-phase salted aggregation for algebraic functions.

    aggs: {column: one of 'sum'|'count'|'min'|'max'}. Returns one row per
    key with the same column names as a direct groupBy().agg() would.
    """
    phase1_exprs, phase2_exprs = [], []
    for col, how in aggs.items():
        if how == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(col))
            phase2_exprs.append(F.sum(col).alias(col))
        elif how == "sum":
            phase1_exprs.append(F.sum(col).alias(col))
            phase2_exprs.append(F.sum(col).alias(col))
        elif how == "min":
            phase1_exprs.append(F.min(col).alias(col))
            phase2_exprs.append(F.min(col).alias(col))
        elif how == "max":
            phase1_exprs.append(F.max(col).alias(col))
            phase2_exprs.append(F.max(col).alias(col))
        else:
            raise ValueError(f"non-algebraic aggregate: {how}")
    partial = (with_salt(df, n_salts)
               .groupBy(*key_cols, SALT_COL).agg(*phase1_exprs))
    return partial.groupBy(*key_cols).agg(*phase2_exprs)


def r6(c: Column) -> Column:
    return F.round(c, ROUND_AVG)


def r2(c: Column) -> Column:
    return F.round(c, ROUND_SUM)
