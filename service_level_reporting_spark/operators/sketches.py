"""Mergeable HyperLogLog sketch state — distinct counts as ALGEBRAIC
incremental-rollup state (SURVEY.md §2.4 A8 scale variant; sinks S8).

`approx_count_distinct` answers the one-shot query, but its sketch lives
and dies inside a single aggregation — a 100 TB incremental rollup needs
the sketch ITSELF as a stored, mergeable column: registers written with
day N's partials, merged with day N+1's delta by elementwise max, estimate
derived at read time. That is what makes distinct counting incremental —
`sum/count/min/max` merge algebraically (sinks.py `incremental`), and with
register state so does distinct.

Design (classic HLL, Flajolet et al. 2007):
* hashing is JVM-side (`xxhash64` — inside codegen, 64-bit avalanche);
  Python only sees the hashed column, Arrow-batched.
* partial: one register array per key per Arrow batch (mapInPandas,
  numpy `maximum.at` scatter — no per-row Python). p=12 → 4096 one-byte
  registers (σ ≈ 1.04/√m ≈ 1.6%).
* merge: elementwise max per key (applyInPandas; per-key input rows =
  number of batches, bounded and tiny next to the data).
* THE load-bearing property, pytest-pinned exactly:
      merge(partial(A), partial(B)) == partial(A ∪ B)
  bit-for-bit on registers — so delta-merged state equals the one-shot
  recompute no matter how ingestion was sliced, and re-merging the same
  delta is idempotent (max is). Estimate uses the standard alpha_m bias
  constant + small-range linear counting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StructField, StructType)

HLL_P = 12                      # 4096 registers; relative error ~1.6%


def _register_schema(keys: list, df: DataFrame) -> StructType:
    fields = [df.schema[k] for k in keys]
    return StructType(list(fields)
                      + [StructField("registers", ArrayType(IntegerType()),
                                     False)])


def hll_partial(df: DataFrame, keys: list, col: str,
                p: int = HLL_P) -> DataFrame:
    """(keys..., registers): one HLL register array per key per Arrow
    batch. Hash runs JVM-side; the Python stage is a numpy scatter-max."""
    import numpy as np

    m = 1 << p
    bits = 64 - p
    mask = np.uint64((1 << bits) - 1)
    hashed = df.select(*keys, F.xxhash64(F.col(col)).alias("_h"))
    out_schema = _register_schema(keys, df)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            h = pdf["_h"].to_numpy(dtype=np.int64).astype(np.uint64)
            idx = (h >> np.uint64(bits)).astype(np.int64)
            v = (h & mask).astype(np.float64)      # exact: v < 2^52 <= 2^53
            _mant, expo = np.frexp(v)
            flog = expo - 1                        # floor(log2 v), v>0
            rho = np.where(v > 0, bits - flog, bits + 1).astype(np.int64)
            rows = {k: [] for k in keys}
            regs_out = []
            for kv, g in pdf.assign(_idx=idx, _rho=rho).groupby(
                    list(keys), sort=False, dropna=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                regs = np.zeros(m, dtype=np.int64)
                np.maximum.at(regs, g["_idx"].to_numpy(),
                              g["_rho"].to_numpy())
                for k, val in zip(keys, kv):
                    rows[k].append(val)
                regs_out.append(regs.astype("int32"))
            rows["registers"] = regs_out
            yield pd.DataFrame(rows)

    return hashed.mapInPandas(run, schema=out_schema)


def hll_estimate_np(regs) -> float:
    """Standard HLL estimator over one register array (numpy)."""
    import numpy as np

    regs = np.asarray(regs, dtype=np.float64)
    m = regs.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs))
    if e <= 2.5 * m:
        zeros = float(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return float(e)


def hll_merge(partials: DataFrame, keys: list) -> DataFrame:
    """Merge register rows per key (elementwise max) and attach the
    estimate. Input: output of hll_partial (or previously stored state
    unioned with fresh partials — same thing, that's the point)."""
    import numpy as np

    fields = [partials.schema[k] for k in keys]
    schema = StructType(list(fields) + [
        StructField("registers", ArrayType(IntegerType()), False),
        StructField("approx_distinct", LongType(), False),
        StructField("estimate", DoubleType(), False),
    ])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.asarray(r, dtype=np.int64)
                         for r in pdf["registers"]]).max(axis=0)
        est = hll_estimate_np(regs)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["registers"] = [regs.astype("int32")]
        out["approx_distinct"] = [int(round(est))]
        out["estimate"] = [est]
        return pd.DataFrame(out)

    return partials.groupBy(*keys).applyInPandas(merge, schema=schema)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY twin of
# the HLL state above: where HLL registers merge by max to count distinct,
# CMS count matrices merge by ADDITION to answer "how often" — heavy
# hitters, frequency caps, vocabulary-drift tracking as stored per-period
# state over a 100 TB stream, without keeping per-item counters.
# One-sided error: estimates never undercount; overcount <= eps*N with
# probability 1-delta (w = e/eps columns, d = ln(1/delta) rows).
# Same execution shape as HLL: JVM xxhash64 once, numpy scatter-ADD per
# Arrow batch, applyInPandas merge; merge(partial(A), partial(B)) ==
# partial(A ∪ B) COUNT-FOR-COUNT (sums are exact integers).
# ---------------------------------------------------------------------------

CMS_D = 4          # hash rows
CMS_W = 1024       # counters per row (eps ~ e/w ~ 0.27%)


def _cms_row_hashes(h, d: int = CMS_D, w: int = CMS_W):
    """(n,) uint64 base hashes -> (d, n) int64 column indices via
    splitmix64-style remixing with per-row odd constants (public
    finalizer; full avalanche per row)."""
    import numpy as np

    h = np.asarray(h, dtype=np.uint64)
    idx = np.empty((d, h.shape[0]), dtype=np.int64)
    for r in range(d):
        z = h ^ np.uint64((r * 2 + 1) * 0x9E3779B97F4A7C15 % (1 << 64))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        idx[r] = (z % np.uint64(w)).astype(np.int64)
    return idx


def cms_partial(df: DataFrame, keys: list, col: str) -> DataFrame:
    """(keys..., counts): one flattened (CMS_D x CMS_W) count matrix per
    key per Arrow batch (numpy scatter-add over JVM-hashed values)."""
    import numpy as np

    hashed = df.select(*keys, F.xxhash64(F.col(col)).alias("_h"))
    fields = [df.schema[k] for k in keys]
    schema = StructType(list(fields) + [
        StructField("counts", ArrayType(LongType()), False)])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            rows = {k: [] for k in keys}
            counts_out = []
            for kv, g in pdf.groupby(list(keys), sort=False, dropna=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                h = g["_h"].to_numpy(dtype=np.int64).astype(np.uint64)
                idx = _cms_row_hashes(h)
                m = np.zeros((CMS_D, CMS_W), dtype=np.int64)
                for r in range(CMS_D):
                    np.add.at(m[r], idx[r], 1)
                for k, val in zip(keys, kv):
                    rows[k].append(val)
                counts_out.append(m.reshape(-1))
            rows["counts"] = counts_out
            yield pd.DataFrame(rows)

    return hashed.mapInPandas(run, schema=schema)


def cms_merge(partials: DataFrame, keys: list) -> DataFrame:
    """Merge count matrices per key by elementwise ADDITION (exact integer
    sums — slicing-invariant and associative by construction)."""
    import numpy as np

    fields = [partials.schema[k] for k in keys]
    schema = StructType(list(fields) + [
        StructField("counts", ArrayType(LongType()), False),
        StructField("n_total", LongType(), False),
    ])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(c, dtype=np.int64)
                      for c in pdf["counts"]]).sum(axis=0)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["counts"] = [m]
        # every row of the matrix sums to the stream length
        out["n_total"] = [int(m.reshape(CMS_D, CMS_W)[0].sum())]
        return pd.DataFrame(out)

    return partials.groupBy(*keys).applyInPandas(merge, schema=schema)


def cms_estimate_col(counts_col, hash_col):
    """IN-FRAME CMS point query (r5, VERDICT item 6): estimate = min over
    rows of the merged count matrix at the remixed column indices — the
    same read as `cms_query`, evaluated as an Arrow-batched pandas_udf so
    the probe scales to a high-cardinality group key (join the merged
    sketch row to the probe items; nothing is collected to the driver).
    `hash_col` must carry Spark's `xxhash64` of the probed item, exactly
    like `cms_query`'s pre-hashed contract."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def probe(counts: pd.Series, h: pd.Series) -> pd.Series:
        import numpy as np

        n = len(h)
        out = np.empty(n, dtype=np.int64)
        if n == 0:
            return pd.Series(out)
        hs = h.to_numpy(dtype=np.int64).astype(np.uint64)
        idx = _cms_row_hashes(hs)                        # (CMS_D, n)
        for i in range(n):
            m = np.asarray(counts.iloc[i],
                           dtype=np.int64).reshape(CMS_D, CMS_W)
            out[i] = min(int(m[r, idx[r, i]]) for r in range(CMS_D))
        return pd.Series(out)

    return probe(counts_col, hash_col)


def cms_query(counts, items) -> dict:
    """Point-query the merged sketch for concrete item values: estimate =
    min over rows (the classic CMS read). Items hash with Spark's
    xxhash64 semantics via a throwaway local computation — callers pass
    the PRE-HASHED int64s (e.g. collected from F.xxhash64 on the items
    frame) to keep engine-hash parity."""
    import numpy as np

    m = np.asarray(counts, dtype=np.int64).reshape(CMS_D, CMS_W)
    out = {}
    for name, h in items.items():
        idx = _cms_row_hashes(np.array([np.uint64(np.int64(h))]))
        out[name] = int(min(m[r, idx[r, 0]] for r in range(CMS_D)))
    return out
