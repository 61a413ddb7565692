"""Local emulation of the driver's t2 differential check.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, column-name-sorted — the driver hashes after sorting
columns by name, so this is a strict superset of its check when we compare
values exactly).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from service_level_reporting_spark import registry
from service_level_reporting_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float repr — queries are responsible for rounding policy
        return repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare_query(spark, sf_dir: str, name: str) -> dict:
    """Run one query both ways; return a result dict (ok, detail).
    aux-registered queries (outside the driver window) are checked too —
    their oracles stay live in pytest even though the driver skips them."""
    qfn = registry.aux_queries()[name]
    oracle = registry.aux_oracles().get(name)
    sdf = qfn(spark, sf_dir).toPandas()
    out = {"name": name, "spark_rows": len(sdf), "ok": True, "detail": ""}
    if oracle is None:
        out["mode"] = "rows-only"
        return out
    out["mode"] = "sql"
    con = duck_connection(sf_dir)
    try:
        ddf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    out["duck_rows"] = len(ddf)
    if sorted(sdf.columns) != sorted(ddf.columns):
        out["ok"] = False
        out["detail"] = f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
        return out
    if len(sdf) != len(ddf):
        out["ok"] = False
        out["detail"] = f"row count differs: spark={len(sdf)} duck={len(ddf)}"
        return out
    a, b = _canon(sdf), _canon(ddf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        out["ok"] = False
        out["detail"] = f"values differ; first diffs: {diffs}"
    return out


def run_all(spark, sf_dir: str, names=None) -> list[dict]:
    qs = registry.aux_queries()
    names = names or sorted(qs)
    return [compare_query(spark, sf_dir, n) for n in names]
