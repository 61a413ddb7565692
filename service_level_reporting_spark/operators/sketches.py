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
