"""Mergeable HLL sketch state: the algebraic-merge property (bit-exact),
estimator accuracy, and the incremental-rollup leg that stores registers
as state (sinks.py part 'hll_incremental')."""

import pyspark.sql.functions as F
import pytest

from service_level_reporting_spark.operators import sketches as SK
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001


def test_partial_merge_is_bit_exact_and_idempotent(spark):
    """merge(partial(A), partial(B)) == partial(A ∪ B) register-for-
    register — the property that makes delta ingestion slicing-invariant;
    re-merging the same partial is a no-op (max is idempotent)."""
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    keys = ["event_type"]
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    pa, pb = SK.hll_partial(a, keys, "user_id"), SK.hll_partial(b, keys, "user_id")
    sliced = {r["event_type"]: list(r["registers"])
              for r in SK.hll_merge(pa.unionByName(pb), keys).collect()}
    oneshot = SK.hll_merge(SK.hll_partial(ev, keys, "user_id"), keys)
    full = {r["event_type"]: list(r["registers"])
            for r in oneshot.collect()}
    assert sliced == full and len(full) == 5
    # idempotence: merging the merged state with one side's partial again
    # cannot change the registers
    again = {r["event_type"]: list(r["registers"])
             for r in SK.hll_merge(
                 oneshot.select(*keys, "registers").unionByName(pa),
                 keys).collect()}
    assert again == full


def test_estimator_accuracy_bands(spark):
    """Low cardinality sits in the linear-counting regime (exact in
    practice); high cardinality must stay within ~3 sigma of the 1.04/√m
    HLL error bound."""
    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    low = SK.hll_merge(
        SK.hll_partial(ev, ["event_type"], "user_id"), ["event_type"])
    exact_low = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("n")).collect()}
    for r in low.collect():
        assert r["approx_distinct"] == exact_low[r["event_type"]]
    high = SK.hll_merge(
        SK.hll_partial(ev.withColumn("g", F.lit(1)), ["g"], "event_id"),
        ["g"]).collect()[0]
    exact_high = ev.select("event_id").distinct().count()
    assert abs(high["approx_distinct"] - exact_high) / exact_high < 0.05


def test_estimate_np_reference():
    """Driver-side estimator sanity: empty registers -> 0-ish; a register
    array built from n distinct hashes lands near n."""
    import numpy as np

    assert SK.hll_estimate_np(np.zeros(4096, dtype=np.int64)) == 0.0
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)  # FULL 64-bit span
    p, bits = 12, 52
    idx = (h >> np.uint64(bits)).astype(np.int64)
    v = (h & np.uint64((1 << bits) - 1)).astype(np.float64)
    _m, e = np.frexp(v)
    rho = np.where(v > 0, bits - (e - 1), bits + 1)
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, idx, rho)
    est = SK.hll_estimate_np(regs)
    assert abs(est - 50_000) / 50_000 < 0.05


def test_hll_incremental_rollup_state(spark):
    """The sink leg: delta-merged stored registers equal the one-shot
    recompute (mismatch row 0) and read-time cross-day rollups stay inside
    HLL tolerance of exact distinct users."""
    from service_level_reporting_spark.sources.sinks import (
        hll_incremental_rollup)

    rows = {r["key"]: r for r in
            hll_incremental_rollup(spark, SF_DIR_001).collect()}
    assert rows["_state_mismatches"]["n"] == 0
    inds = [k for k in rows if k != "_state_mismatches"]
    assert len(inds) == 5
    for k in inds:
        assert rows[k]["n2"] > 0           # exact distinct present
        assert rows[k]["v"] < 0.05         # rel_err within band


def test_cms_additive_merge_and_one_sided_error(spark):
    """Count-Min state: merge(partial(A), partial(B)) == partial(A∪B)
    count-for-count (integer sums), estimates NEVER undercount, and on a
    planted heavy-hitter stream the hot item's estimate lands within the
    eps*N overcount band."""
    import numpy as np

    ev = load_tables(spark, SF_DIR_001, ("events",))["events"]
    keys = ["event_type"]
    part = SK.cms_partial(ev, keys, "user_id")
    merged = {r["event_type"]: r for r in SK.cms_merge(part, keys).collect()}
    # additivity: slicing must not change a single counter
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    sliced = {r["event_type"]: list(r["counts"])
              for r in SK.cms_merge(
                  SK.cms_partial(a, keys, "user_id").unionByName(
                      SK.cms_partial(b, keys, "user_id")), keys).collect()}
    assert sliced == {k: list(v["counts"]) for k, v in merged.items()}
    # n_total equals the true row count per key
    true_n = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {k: v["n_total"] for k, v in merged.items()} == true_n
    # one-sided error + bound on every (event_type, user) pair
    exact = {(r["event_type"], r["user_id"]): r["n"]
             for r in ev.groupBy("event_type", "user_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    hashes = {r["user_id"]: r["h"] for r in
              ev.select("user_id").distinct()
              .select("user_id", F.xxhash64("user_id").alias("h")).collect()}
    for (etype, user), true in exact.items():
        est = SK.cms_query(merged[etype]["counts"],
                           {user: hashes[user]})[user]
        assert est >= true
        # generous bound: 2eN/w fails with negligible probability at d=4
        assert est - true <= max(4, 2 * np.e * true_n[etype] / SK.CMS_W)


def test_cms_rides_in_sketch_summary_row(spark):
    """The driver-visible report_sketch_summary row carries the CMS
    heavy-hitter estimate next to the exact count: one-sided (never
    under), within the eps*N band."""
    import numpy as np

    from service_level_reporting_spark.operators.report import (
        report_sketch_summary)

    rows = report_sketch_summary(spark, SF_DIR_001).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cms_top_user_est"] >= r["top_user_n_exact"] > 0
        assert (r["cms_top_user_est"] - r["top_user_n_exact"]
                <= max(4, 2 * np.e * r["n"] / SK.CMS_W))
