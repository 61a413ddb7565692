"""Property-based tests (hypothesis) — semantic invariants the example-based
suites can't sweep: random value/weight distributions for the weighted-avg
fallback, random skew for salted aggregation, random gap patterns for
sessionization, random vectors for the fixed-width dot product.

Spark round-trips are expensive, so examples are capped and each example
uses a tiny createDataFrame — the point is adversarial VALUE coverage, not
volume.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
weights = st.one_of(st.none(), st.floats(min_value=0.0, max_value=1e3,
                                         allow_nan=False, allow_infinity=False))


@settings(**_SETTINGS)
@given(st.lists(st.tuples(finite, weights), min_size=1, max_size=12))
def test_weighted_average_fallback_property(spark, pairs):
    """coalesce(Σvw/nullif(Σw,0), avg(v)) — for ANY mix of null/zero/positive
    weights the result equals the python reference: weighted mean when
    Σw > 0, plain mean otherwise (the A3 fallback contract)."""
    df = spark.createDataFrame([(v, w) for v, w in pairs], "v double, w double")
    got = df.agg(
        F.coalesce(
            F.sum(F.col("v") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0)),
            F.avg("v"),
        ).alias("x")
    ).collect()[0]["x"]
    sw = sum(w for _, w in pairs if w is not None)
    svw = sum(v * w for v, w in pairs if w is not None)
    want = svw / sw if sw > 0 else sum(v for v, _ in pairs) / len(pairs)
    assert got is not None
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9), (got, want)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3), finite),
                min_size=1, max_size=40),
       st.integers(min_value=2, max_value=8))
def test_salted_agg_equals_direct_property(spark, rows, n_salts):
    """Salted two-phase aggregation ≡ direct groupBy for any distribution
    and any salt fan-out."""
    df = spark.createDataFrame([(f"k{k}", v) for k, v in rows],
                               "k string, v double")
    pre = df.select("k", F.col("v").alias("s"))
    got = {r["k"]: (r["n"], r["s"])
           for r in SF.salted_agg(
               pre.withColumn("n", F.lit(1)), ["k"],
               {"n": "count", "s": "sum"}, n_salts=n_salts).collect()}
    want = {r["k"]: (r["n"], r["s"])
            for r in df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        # abs_tol too: float addition is non-associative, and the two-phase
        # salted sum legitimately reorders it — a direct sum landing on a
        # subnormal vs the salted sum landing on exact 0.0 can never satisfy
        # a pure relative tolerance (hypothesis-found edge).
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-9,
                            abs_tol=1e-12), (k, got[k], want[k])


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=7200), min_size=1,
                max_size=30).map(sorted))
def test_sessionize_gap_property(spark, offsets):
    """For one user: n_sessions == 1 + (# gaps > threshold) and event count
    is conserved — for ANY ordered gap pattern (30 s threshold here; the
    operator's logic is threshold-independent)."""
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(seconds=s)) for s in offsets]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    gap_s = 30
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id").orderBy("ts")
    ts_s = F.col("ts").cast("double")
    marked = df.select(
        "user_id", "ts",
        F.when((ts_s - F.lag(ts_s).over(w_user)) <= gap_s, F.lit(0))
        .otherwise(F.lit(1)).alias("is_start"))
    sessions = marked.withColumn(
        "session_id",
        F.sum("is_start").over(w_user.rowsBetween(Window.unboundedPreceding, 0)))
    agg = sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events")).collect()[0]
    uniq = sorted(set(offsets))
    # duplicates share a timestamp -> gap 0 -> never a new session
    n_gaps = sum(1 for a, b in zip(uniq, uniq[1:]) if b - a > gap_s)
    # sessions are counted over distinct start positions in the full list;
    # expected = 1 + gaps-over-threshold between CONSECUTIVE events
    full = sorted(offsets)
    n_gaps_full = sum(1 for a, b in zip(full, full[1:]) if b - a > gap_s)
    assert n_gaps_full == n_gaps  # duplicates can't open a session
    assert agg["n_sessions"] == 1 + n_gaps
    assert agg["n_events"] == len(offsets)


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                          allow_infinity=False, width=32),
                min_size=4, max_size=4),
       st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                          allow_infinity=False, width=32),
                min_size=4, max_size=4))
def test_dot_fixed_matches_numpy(spark, a, b):
    """The codegen-friendly unrolled dot product equals numpy for any
    finite vectors (dim pinned to 4 for test speed; unrolling is uniform)."""
    import numpy as np

    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(SF.dot_fixed("a", "b", 4).alias("d")).collect()[0]["d"]
    want = float(np.dot(np.array(a, dtype=np.float32).astype(np.float64),
                        np.array(b, dtype=np.float32).astype(np.float64)))
    assert math.isclose(got, want, rel_tol=1e-6, abs_tol=1e-6), (got, want)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                max_size=25),
       st.integers(min_value=5, max_value=50))
def test_sequence_packing_invariants_property(spark, monkeypatch, n_toks,
                                              budget):
    """For ANY token distribution and budget: every doc lands in exactly
    one sequence (doc count conserved), and the sequence count / fill
    stats equal a plain-python reference packer. NB occupied sequence ids
    need NOT be contiguous: a doc bigger than the budget overflows past
    whole bins, and empty bins don't exist in the grouped output
    (hypothesis found this with n_toks=[10, 1], budget=5)."""
    from service_level_reporting_spark.operators import curation as C

    docs = spark.createDataFrame(
        [(i, " ".join("t" for _ in range(n)), "en", "s", 1)
         for i, n in enumerate(n_toks)],
        "doc_id long, text string, lang string, source string, n_chars long")
    monkeypatch.setattr(C, "_docs", lambda s, d: docs)
    monkeypatch.setattr(C, "PACK_BUDGET", budget)
    pack = {r["key"]: r for r in C.corpus_curation_suite(spark, "x").collect()
            if r["part"] == "pack"}["en"]
    # reference packing in plain python (dict: only occupied bins exist)
    seqs: dict[int, int] = {}
    cum = 0
    for n in n_toks:
        seq_id = cum // budget
        seqs[seq_id] = seqs.get(seq_id, 0) + n
        cum += n
    assert pack["n"] == len(seqs)
    assert pack["n2"] == len(n_toks)
    # Spark's round() is HALF_UP over BigDecimal.valueOf(double) (shortest
    # decimal repr), while Python's round() is banker's — at an exact tie
    # (Hypothesis found fill = 3.03125/4 = 0.7578125) they differ by 1e-6.
    # Recompute with the exact Spark semantics: Decimal(repr(x)) HALF_UP.
    import decimal
    fill = sum(s / budget for s in seqs.values()) / len(seqs)
    want_v = float(decimal.Decimal(repr(fill)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))
    assert pack["v"] == want_v, (pack["v"], want_v, fill)


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_bmp_codec_roundtrips_any_dims(w, h, seed):
    """Property: encode->decode is the identity for ANY dims (row padding
    included — widths not divisible by 4 are the tricky case), and resize
    to any target yields exactly the target dims."""
    import numpy as np

    from service_level_reporting_spark.operators import multimodal as MM

    rng = np.random.RandomState(seed % (2**31 - 1))
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = MM.encode_bmp(px)
    w2, h2, back = MM.decode_bmp(payload)
    assert (w2, h2) == (w, h)
    assert (back == px).all()
    tw, th = 1 + seed % 17, 1 + (seed // 17) % 17
    rw, rh, rpx = MM.decode_bmp(MM.resize_image(payload, tw, th))
    assert (rw, rh) == (tw, th)
    # nearest-neighbor: every output pixel exists in the source
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    assert (rpx == px[yi][:, xi]).all()


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=80, deadline=None)
def test_bmp_decode_never_fabricates(data):
    """Property: arbitrary bytes either decode as a genuinely valid BMP or
    raise ValueError — never a silent wrong answer, never a crash type
    other than the codec's contract."""
    import pytest as _pytest

    from service_level_reporting_spark.operators import multimodal as MM

    if data[:2] == b"BM":
        try:
            w, h, px = MM.decode_bmp(data)
            assert px.shape == (h, w, 3)
        except ValueError:
            pass
    else:
        with _pytest.raises(ValueError):
            MM.decode_bmp(data)


@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_avi_container_roundtrips_any_shape(w, h, n_frames, seed):
    """Property: the RIFF/AVI writer and parser are exact inverses for any
    dims/frame count — frame pixels, order, and count all survive."""
    import struct

    import numpy as np

    from service_level_reporting_spark.operators import multimodal as MM

    rng = np.random.RandomState(seed % (2**31 - 1))
    frames = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(n_frames)]

    def chunk(cid, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(four, data):
        return chunk(b"LIST", four + data)

    frame_size = len(MM._dib_rows(frames[0]))
    avih = struct.pack("<14I", 100_000, 0, 0, 0, n_frames, 0, 1,
                       frame_size, w, h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi = lst(b"movi", b"".join(
        chunk(b"00db", MM._dib_rows(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    w2, h2, back = MM.decode_avi(payload)
    assert (w2, h2) == (w, h) and len(back) == n_frames
    for src, got in zip(frames, back):
        assert (got == src).all()


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 4),
       st.integers(0, 2**31 - 2))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, filter_type, seed):
    """PNG codec property: ANY uint8 RGB array round-trips bit-exact
    through encode(filter f)/decode for every scanline filter type, and
    truncating the payload anywhere inside the chunk stream raises."""
    import numpy as np

    from service_level_reporting_spark.operators import multimodal as MM

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = MM.encode_png(px, filter_type=filter_type)
    w2, h2, back = MM.decode_png(payload)
    assert (w2, h2) == (w, h) and (back == px).all()
    cut = 8 + (seed % max(1, len(payload) - 20))
    try:
        MM.decode_png(payload[:cut])
    except ValueError:
        pass
    else:
        raise AssertionError(f"truncated payload (cut={cut}) decoded")
