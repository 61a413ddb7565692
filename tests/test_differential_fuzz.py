"""Property-based differential fuzzing: hypothesis generates small random
`events` tables, each written as a testdata-shaped parquet dir, and a set of
SQL-oracled queries runs Spark-vs-DuckDB on them — the same value-level
comparison as tests/differential.py, but over corpora the fixed SFs never
produce (empty tables, single rows, one giant duplicate-timestamp burst,
extreme values, a single day, boundary-of-day timestamps).

Deadline disabled (Spark jobs), small example budget — this is a depth
check, not a soak; the fixed-SF differential remains the breadth gate."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from service_level_reporting_spark import registry

# Queries whose semantics are pure functions of `events` and whose oracles
# are deterministic under duplicate keys (no ORDER-BY-LIMIT ties).
FUZZ_QUERIES = ("slo_daily_health", "resample_minute_avg",
                "agg_cross_group", "agg_time_weighted")

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# timestamps inside the testdata window, microsecond grain, including
# exact-midnight boundaries and duplicate instants
_TS = st.integers(min_value=1704067200_000_000,           # 2024-01-01
                  max_value=1706659199_999_999)           # 2024-01-30 ~end
_ROW = st.tuples(
    _TS,
    st.sampled_from(EVENT_TYPES),
    st.one_of(st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False,
                        width=32),
              st.sampled_from([0.0, -0.0, 1e-9, 123456.789])),
    st.integers(min_value=1, max_value=5),                # user_id
)


def _write_events(rows) -> str:
    d = tempfile.mkdtemp(prefix="slr_fuzz_")
    ts = pa.array([r[0] for r in rows], pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": ts,
        "user_id": pa.array([r[3] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def _canon(df) -> list:
    """Rows sorted by a 3-dp key; floats kept numeric for tolerance
    compare (cross-engine summation order shifts the last ulps, which at a
    rounding boundary can flip the final printed digit — exact-string
    equality would flake where the values are genuinely equal)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon = []
        for v in row:
            if isinstance(v, float):
                canon.append(v + 0.0)            # normalize -0.0
            else:
                canon.append(str(v))
        out.append(tuple(canon))

    def key(row):
        return tuple(f"{v:.3f}" if isinstance(v, float) else v for v in row)

    return sorted(out, key=key)


def _rows_close(a: list, b: list) -> bool:
    import math

    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if not math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-5):
                    return False
            elif va != vb:
                return False
    return True


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_ROW, min_size=0, max_size=60))
def test_random_event_tables_match_duckdb(spark, rows):
    sf_dir = _write_events(rows)
    try:
        qs = registry.aux_queries()
        oracles = registry.aux_oracles()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
        for name in FUZZ_QUERIES:
            sdf = qs[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).fetchdf()
            assert sorted(sdf.columns) == sorted(ddf.columns), name
            assert len(sdf) == len(ddf), \
                f"{name}: rows {len(sdf)} vs {len(ddf)} on {len(rows)} events"
            assert _rows_close(_canon(sdf), _canon(ddf)), \
                f"{name}: values differ on a {len(rows)}-event corpus"
        con.close()
    finally:
        import shutil

        shutil.rmtree(sf_dir, ignore_errors=True)
