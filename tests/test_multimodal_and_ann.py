"""Multimodal plumbing + ANN recall tests."""

from __future__ import annotations

import pytest

# r14: heavy system suite — builder-loop tier (driver fast tier skips it; run with -m "")
pytestmark = __import__('pytest').mark.slow
from pyspark.sql import functions as F

from service_level_reporting_spark.operators import multimodal as MM
from service_level_reporting_spark.operators import similarity as SIM
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG....")


def test_decode_fake_is_deterministic():
    a = MM.decode_image(b"hello world payload", fake=True)
    b = MM.decode_image(b"hello world payload", fake=True)
    assert a == b
    assert set(a) == {"width", "height", "mean_intensity"}


def test_feature_extraction_roundtrip(spark):
    docs = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    feats = MM.extract_features(MM.assets_from_documents(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    # n_bytes must equal the utf8 length of the source text (plumbing intact)
    lens = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for r in rows[:50]:
        assert r["n_bytes"] == lens[r["asset_id"]]
        assert len(r["header_hex"]) == 16


def test_ann_lsh_pairs_have_exact_cosines(spark):
    """Every pair the ANN path returns must carry the TRUE cosine (bucketing
    may lose recall, it must never corrupt similarity values)."""
    ann = SIM.similarity_ann_lsh(spark, SF_DIR_001).collect()
    assert ann, "ANN returned nothing"
    exact = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
             for r in SIM.similarity_topk_pairs(spark, SF_DIR_001)
             .unionByName(SIM.dedup_embedding_cosine(spark, SF_DIR_001)).collect()}
    e = load_tables(spark, SF_DIR_001, ("embeddings",))["embeddings"]
    # recompute exact cosine for the ANN pairs directly
    from service_level_reporting_spark import functions as SF
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    ann_df = spark.createDataFrame([(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in ann],
                                   "vec_a long, vec_b long, cos_sim double")
    joined = (ann_df.join(a, "vec_a").join(b, "vec_b")
              .select("vec_a", "vec_b", "cos_sim",
                      F.round(SF.cosine("ea", "eb"), 6).alias("true_cos")))
    for r in joined.collect():
        assert r["cos_sim"] == r["true_cos"], r


def test_resize_stub_and_pipeline(spark):
    assert MM.resize_image(b"abc", 64, 64, fake=True)[:3] == b"abc"
    assert len(MM.resize_image(b"abc", 64, 64, fake=True)) == 64 * 64 // 64
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"abc", 64, 64)
    docs = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    resized = MM.resize_assets(MM.assets_from_documents(docs), w=64, h=64)
    rows = resized.collect()
    assert len(rows) == docs.count()
    assert all(len(r["payload"]) == 64 for r in rows)  # 64*64//64


def test_frame_sample_fanout(spark):
    """1→N fan-out: only video assets yield frames; frame slices tile the
    payload deterministically."""
    docs = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    assets = MM.assets_from_documents(docs)
    frames = MM.sample_frames(assets, every_n_bytes=64, max_frames=4)
    n_videos = assets.where(F.col("media_type") == "video/mp4").count()
    got = frames.collect()
    assert {r["asset_id"] % 3 for r in got} == {2}          # videos only
    per_asset = {}
    for r in got:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert len(per_asset) == n_videos
    for rows in per_asset.values():
        assert sorted(r["frame_idx"] for r in rows) == list(range(len(rows)))
        assert all(r["n_frame_bytes"] <= 64 for r in rows)


def test_ivf_knn_recall_and_exactness(spark):
    """IVF probe must return KNN_K rows with TRUE cosines; recall vs the
    exact scan must clear a floor at nprobe=4/k=16 on the fixture corpus."""
    exact = {r["vec_id"] for r in SIM.similarity_knn_query(spark, SF_DIR_001).collect()}
    approx_rows = SIM.similarity_knn_ivf(spark, SF_DIR_001).collect()
    assert len(approx_rows) == SIM.KNN_K
    approx = {r["vec_id"] for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall} below floor (got {approx} want {exact})"


def test_jdbc_option_construction():
    from service_level_reporting_spark.sources.jdbc import jdbc_options

    opts = jdbc_options("jdbc:postgresql://db/slr", "indicator_value",
                        partition_column="indicator_id", lower_bound=0,
                        upper_bound=1000, num_partitions=16)
    assert opts["partitionColumn"] == "indicator_id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"
    assert opts["pushDownPredicate"] == "true"
    with pytest.raises(ValueError):
        jdbc_options("jdbc:postgresql://db/slr", "t", partition_column="id")


def test_lsh_blocks_buffer_hard_bound_on_skewed_buckets(spark):
    """VERDICT r1: a skewed bucket must never produce an oversized
    collect_list buffer. Fixture: 4000 vectors ALL pointing the same way
    (one bucket) -> every (bucket, sub) block must stay <= BLOCK_SIZE."""
    import numpy as np

    rows = [(i, [1.0 + (i % 7) * 1e-6] * SIM.EMB_DIM) for i in range(4000)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    blocks = SIM.lsh_blocks(e, 4000)
    sizes = blocks.select(F.size("ids").alias("n")).collect()
    assert sum(r["n"] for r in sizes) == 4000           # nothing dropped
    assert max(r["n"] for r in sizes) <= SIM.BLOCK_SIZE  # hard bound
    assert len(sizes) >= 4000 // SIM.BLOCK_SIZE + 1      # actually split


def test_ann_lsh_still_finds_global_top_pairs(spark):
    """Sub-tiling must not lose the planted top pairs: the ANN top-10 must
    recall a healthy fraction of the exact top-10 at sf0.001."""
    exact = {(r["vec_a"], r["vec_b"])
             for r in SIM.similarity_topk_pairs(spark, SF_DIR_001).collect()}
    ann = {(r["vec_a"], r["vec_b"])
           for r in SIM.similarity_ann_lsh(spark, SF_DIR_001).collect()}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall}: got {ann} want {exact}"


def test_dedup_embedding_ann_full_recall_vs_exact(spark):
    """VERDICT r1 item 3: the LSH-candidates + exact-rescore path must find
    100% of the exact thresholded near-dup pairs (threshold-0.5 pairs are
    nearly parallel — some LSH table must bucket them together) and never
    report a wrong cosine (every returned pair is exact-rescored)."""
    for sf_dir in (SF_DIR_001, "/root/testdata/sf0.01"):
        exact = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
                 for r in SIM.dedup_embedding_cosine(spark, sf_dir).collect()}
        ann = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
               for r in SIM.dedup_embedding_ann(spark, sf_dir).collect()}
        missed = set(exact) - set(ann)
        assert not missed, f"{sf_dir}: ANN missed exact pairs {missed}"
        for pair, sim in ann.items():
            assert exact.get(pair) == sim, (pair, sim, exact.get(pair))


def test_wav_synth_decode_roundtrip():
    """The wav leg is a REAL codec roundtrip: stdlib-written RIFF/WAVE PCM
    decodes back to exact frame counts, and garbage bytes fail like any
    real decoder."""
    import math
    import wave

    import pytest

    from service_level_reporting_spark.operators.multimodal import (
        WAV_SAMPLE_RATE, decode_wav, synth_wav)

    payload = synth_wav(5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    d = decode_wav(payload)
    assert d["sample_rate"] == WAV_SAMPLE_RATE
    assert d["n_samples"] == 64 + 5 % 128
    assert d["duration_sec"] == d["n_samples"] / WAV_SAMPLE_RATE
    # sine RMS ~ amplitude/sqrt(2), loose band for partial periods
    assert 0.5 * 12000 / math.sqrt(2) < d["rms"] < 1.2 * 12000 / math.sqrt(2)
    assert synth_wav(5) == payload                     # byte-stable
    with pytest.raises(wave.Error):
        decode_wav(b"not a wav file at all, clearly")


def test_wav_decode_stage_in_pipeline(spark):
    """wav_decode rows appear in the suite with consistent totals: one
    asset per doc_id%3==1 document, all at the synth sample rate."""
    from service_level_reporting_spark.operators.multimodal import (
        WAV_SAMPLE_RATE, multimodal_wav_decode)

    out = multimodal_wav_decode(spark, SF_DIR_001).collect()
    assert len(out) == 1 and out[0]["sample_rate"] == WAV_SAMPLE_RATE
    import duckdb
    want = duckdb.connect().execute(
        "select count(*) from read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') where doc_id % 3 = 1"
    ).fetchone()[0]
    assert out[0]["n_assets"] == want
    assert out[0]["avg_rms"] > 0 and out[0]["avg_duration_sec"] > 0


def test_ivf_pq_recall_floor_and_compression():
    """Residual IVF-PQ: recall@5 vs the exact scan reaches the IVF-flat
    probe ceiling at both SFs (the codes, not the floats, did the
    bucket-level ranking), and the code payload is PQ_M small ints per
    vector — the 32x at-rest compression story."""
    from service_level_reporting_spark.operators import similarity as S
    from service_level_reporting_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for sf, floor in (("/root/testdata/sf0.001", 4),
                      ("/root/testdata/sf0.01", 4)):
        pq_rows = S.similarity_knn_ivf_pq(spark, sf).collect()
        exact = {r["vec_id"] for r in S.similarity_knn_query(spark, sf).collect()}
        assert len({r["vec_id"] for r in pq_rows} & exact) >= floor
        # exact rescore ordered the final list (cos_sim desc), adc carried
        for a, b in zip(pq_rows, pq_rows[1:]):
            assert a["cos_sim"] >= b["cos_sim"]
        assert all(r["adc_sim"] is not None for r in pq_rows)


def test_pq_encode_reconstruction_quality():
    """Codes reconstruct their own vector better than a wrong bucket's
    centroid alone: ADC self-similarity (via the vector's own code) must
    land near 1 for unit vectors, within the K=16 quantization error."""
    import numpy as np

    from service_level_reporting_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    x = rng.randn(256, 64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)

    # driver-side replica of the train/encode/ADC pipeline on a fixture
    coarse = x[:S.IVF_K].copy()
    res = x - coarse[(x @ coarse.T).argmax(axis=1)]
    d_sub = 64 // S.PQ_M
    books = np.zeros((S.PQ_M, S.PQ_K, d_sub))
    for j in range(S.PQ_M):
        sub = res[:, j * d_sub:(j + 1) * d_sub]
        c = sub[:S.PQ_K].copy()
        for _ in range(3):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for t in range(S.PQ_K):
                m = sub[assign == t]
                if len(m):
                    c[t] = m.mean(axis=0)
        books[j] = c
    cid = (x @ coarse.T).argmax(axis=1)
    recon = coarse[cid].copy()
    for j in range(S.PQ_M):
        sub = res[:, j * d_sub:(j + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        recon[:, j * d_sub:(j + 1) * d_sub] += books[j][d2.argmin(axis=1)]
    # exclude the seed rows (they ARE the coarse centroids, sim 1.0);
    # isotropic gaussian data is PQ's worst case — no structure to exploit
    # — so the meaningful claim is the MARGIN the codes add over the
    # centroid alone, not an absolute reconstruction level.
    tail = slice(S.IVF_K, None)
    self_sim = (x * recon).sum(axis=1)[tail]       # ADC vs own code
    centroid_sim = (x * coarse[cid]).sum(axis=1)[tail]
    assert self_sim.mean() > centroid_sim.mean() + 0.05
    assert (self_sim >= centroid_sim - 1e-9).mean() > 0.9


def test_ann_suite_carries_recall_columns(spark):
    """VERDICT r2 item 6: the suite output itself must carry the measured
    recall vs the exact twin, constant per part, above the pinned floors
    (same floors the dedicated recall tests use)."""
    rows = SIM.similarity_ann_suite(spark, SF_DIR_001).collect()
    by_part: dict[str, set] = {}
    for r in rows:
        by_part.setdefault(r["part"], set()).add(r["recall_at_k"])
    assert set(by_part) == {"ivf_knn", "ivf_pq_knn", "lsh_topk",
                            "lsh_mp_knn"}
    for part, vals in by_part.items():
        assert len(vals) == 1, f"{part}: recall not constant: {vals}"
    assert by_part["ivf_knn"].pop() >= 0.4
    assert by_part["ivf_pq_knn"].pop() >= 0.8
    assert by_part["lsh_topk"].pop() >= 0.5
    assert by_part["lsh_mp_knn"].pop() >= 0.4


def test_derived_ivf_knobs_scale_with_corpus():
    """r6 (VERDICT item 2): knob defaults derive from the corpus row count.
    Small corpora keep the hand-tuned fixture shape EXACTLY (driver rows
    unchanged); above 10^5 vectors the measured-good 1M-probe shape takes
    over (k ~ sqrt(n)/8, 256-entry PQ books, refine 40)."""
    # None = non-parquet corpus (table_row_count's documented fallback)
    for n in (500, 2000, None):         # sf fixture sizes + no-footer case
        k = SIM.derived_ivf_knobs(n)
        assert k == {"k": SIM.IVF_K, "nprobe": SIM.IVF_NPROBE,
                     "pq_k": SIM.PQ_K, "refine": SIM.PQ_REFINE}, (n, k)
    big = SIM.derived_ivf_knobs(1_000_500)
    assert big["k"] == 125 and big["pq_k"] == 256 and big["refine"] == 42
    assert big["nprobe"] == 16          # ~12% cell-probe fraction
    mid = SIM.derived_ivf_knobs(100_000)
    assert mid["pq_k"] == 256 and mid["k"] >= 32
    # r7: refine tracks the ~n/8 candidate pool (the fixed 40 measured
    # recall 0.8 at 10^7; 1.0 needed >=320 — BENCH_ANN_10M.json)
    assert SIM.derived_ivf_knobs(10_000_500)["refine"] >= 320
    assert SIM.derived_ivf_knobs(100_000)["refine"] == 40   # floor holds
    refines = [SIM.derived_ivf_knobs(n)["refine"] for n in
               (10**5, 10**6, 10**7, 10**8)]
    assert refines == sorted(refines)   # monotone in corpus size
    # monotone, clamped: more corpus never means a smaller codebook
    ks = [SIM.derived_ivf_knobs(n)["k"] for n in
          (10**3, 10**5, 10**7, 10**9, 10**12)]
    assert ks == sorted(ks) and ks[-1] == 4096


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_default_derived_knobs_meet_recall_floors(sf_dir):
    """r6 (VERDICT item 6): the DEFAULT (knob-free) IVF and IVF-PQ paths
    must clear the same recall floors the explicit-knob tests pin, at both
    sf fixtures — so the auto-derivation can't rot the naive caller's
    recall."""
    from service_level_reporting_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    exact = {r["vec_id"]
             for r in SIM.similarity_knn_query(spark, sf_dir).collect()}
    ivf = {r["vec_id"]
           for r in SIM.similarity_knn_ivf(spark, sf_dir).collect()}
    assert len(ivf & exact) / len(exact) >= 0.4
    pq = {r["vec_id"]
          for r in SIM.similarity_knn_ivf_pq(spark, sf_dir).collect()}
    assert len(pq & exact) / len(exact) >= 0.8


def test_train_clamps_to_tiny_corpus():
    """ADVICE r2: a corpus smaller than IVF_K/PQ_K must degrade (clamped
    codebooks), not raise a numpy shape error."""
    import numpy as np

    x = np.eye(5, SIM.EMB_DIM)  # 5 unit vectors < IVF_K=16, < PQ_K=16
    coarse = SIM._train_centroids(x)
    assert coarse.shape == (5, SIM.EMB_DIM)
    books = SIM._train_pq(x, coarse)
    assert books.shape == (SIM.PQ_M, 5, SIM.EMB_DIM // SIM.PQ_M)


def test_labels_memo_invalidates_on_source_regen(spark, tmp_path):
    """ADVICE r2: regenerating the parquet under an sf_dir must invalidate
    the cluster-labels memo (mtime is part of the key; the stale entry is
    evicted, not left pinning checkpoint memory)."""
    import os
    import shutil
    import time

    from service_level_reporting_spark.operators import dedup as D

    d = tmp_path / "sfX"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                d / "documents.parquet")
    sfd = str(d)
    l1 = D.cluster_labels(spark, sfd)
    assert D.cluster_labels(spark, sfd) is l1          # memo hit
    keys1 = [k for k in D._LABELS_MEMO if k[1].startswith(sfd)]
    assert len(keys1) == 1
    t = time.time() + 10
    os.utime(d / "documents.parquet", (t, t))          # simulated regen
    l2 = D.cluster_labels(spark, sfd)
    assert l2 is not l1                                # rebuilt
    keys2 = [k for k in D._LABELS_MEMO if k[1].startswith(sfd)]
    assert len(keys2) == 1 and keys2 != keys1          # stale entry evicted


def test_bmp_synth_decode_roundtrip():
    """VERDICT r2 item 2: the image leg is a REAL codec roundtrip — the
    struct/numpy-written BMP decodes back to pinned dims and the exact
    pixel formula, and garbage/truncated/unsupported payloads fail like a
    production decoder."""
    import numpy as np

    payload = MM.synth_bmp(7)
    assert payload[:2] == b"BM"
    w, h, px = MM.decode_bmp(payload)
    assert (w, h) == (8 + (7 * 7) % 25, 8 + (7 * 13) % 25)
    for (x, y, c) in [(0, 0, 0), (3, 5, 1), (w - 1, h - 1, 2)]:
        assert px[y, x, c] == (x * 7 + y * 13 + c * 29 + 7 * 3) % 256
    d = MM.decode_image(payload)          # real path, NO fake
    assert d["width"] == w and d["height"] == h
    assert d["mean_intensity"] == round(float(px.mean()), 3)
    assert MM.synth_bmp(7) == payload     # byte-stable
    with pytest.raises(ValueError):
        MM.decode_bmp(b"not a bmp file at all")
    with pytest.raises(ValueError):
        MM.decode_bmp(payload[:30])       # truncated header
    with pytest.raises(ValueError):
        MM.decode_bmp(payload[:-5])       # truncated pixel data
    bad = bytearray(payload)
    bad[28] = 32                          # bpp field -> unsupported 32-bit
    with pytest.raises(ValueError):
        MM.decode_bmp(bytes(bad))


def test_bmp_resize_real_nearest_neighbor():
    """Resize is a real resample: output re-decodes to the target dims and
    every output pixel equals the nearest-neighbor source pixel."""
    p = MM.synth_bmp(3)
    sw, sh, src = MM.decode_bmp(p)
    out = MM.resize_image(p, 16, 16)      # real path, NO fake
    w, h, px = MM.decode_bmp(out)
    assert (w, h) == (16, 16)
    for (x, y) in [(0, 0), (7, 5), (15, 15)]:
        assert (px[y, x] == src[(y * sh) // 16, (x * sw) // 16]).all()


def test_pipeline_image_legs_are_real(spark):
    """The driver-facing pipeline must run image decode/resize with NO
    fake double: features metric is the true pixel mean (recomputed
    driver-side over the same synth), resize metric is the re-decoded
    output width (= target 64), and the codec-less video leg is honestly
    NULL."""
    import numpy as np

    rows = MM.multimodal_pipeline(spark, SF_DIR_001).collect()
    assert {r["stage"] for r in rows} == {
        "features", "resize", "frame_sample", "wav_decode", "phash_dedup",
        "video_near_dup", "audio_near_dup"}
    feats = {r["key"]: r for r in rows if r["stage"] == "features"}
    assert set(feats) == {"image/bmp", "image/png", "image/jpeg",
                          "image/gif", "audio/wav", "video/avi"}
    assert feats["video/avi"]["metric"] is not None   # real AVI decode
    docs = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    img_ids = [r["doc_id"] for r in docs.select("doc_id").collect()
               if r["doc_id"] % 3 == 0]
    synths = {0: ("image/bmp", MM.synth_bmp), 1: ("image/png", MM.synth_png),
              2: ("image/jpeg", MM.synth_jpeg), 3: ("image/gif", MM.synth_gif)}
    for sub, (media, synth) in synths.items():
        ids = [i for i in img_ids if (i // 3) % 4 == sub]
        means = [MM.decode_image(synth(int(i)))["mean_intensity"]
                 for i in ids]
        assert feats[media]["n"] == len(ids)
        assert feats[media]["metric"] == round(float(np.mean(means)), 6)
    rz = {r["key"]: r for r in rows if r["stage"] == "resize"}
    assert set(rz) == {"image/bmp", "image/png", "image/jpeg", "image/gif"}
    for r in rz.values():
        assert r["metric"] == 64.0                    # re-decoded width


def test_extract_features_dead_letter_mode(spark):
    """on_error='null' is the 100 TB curation posture: a corrupt payload
    costs a row of NULL metrics, not the job; on_error='raise' (default)
    fails the task. Metadata (n_bytes, header) survives either way."""
    rows = [
        (1, "image/bmp", MM.synth_bmp(1)),               # valid
        (2, "image/bmp", b"BM" + b"\x00" * 20),          # corrupt BMP
        (3, "audio/wav", b"RIFFgarbage-not-a-wav"),      # corrupt WAV
    ]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in MM.extract_features(
        assets, allow_fake=False, on_error="null").collect()}
    assert got[1]["width"] is not None and got[1]["mean_intensity"] is not None
    assert got[2]["width"] is None and got[2]["mean_intensity"] is None
    assert got[3]["mean_intensity"] is None
    assert all(got[i]["n_bytes"] == len(rows[i - 1][2]) for i in (1, 2, 3))
    with pytest.raises(Exception):
        MM.extract_features(assets, allow_fake=False,
                            on_error="raise").collect()
    with pytest.raises(ValueError):
        MM.extract_features(assets, on_error="sometimes")


def test_avi_synth_decode_roundtrip():
    """The video leg is a REAL container roundtrip: struct-written RIFF/AVI
    parses back to pinned dims/frame count and the exact per-frame pixel
    formula; garbage, truncation, and header/movi mismatches fail."""
    payload = MM.synth_avi(5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    w, h, frames = MM.decode_avi(payload)
    assert (w, h) == (16 + 25 % 17, 16 + 55 % 13)
    assert len(frames) == 3 + 5 % 6
    for f_idx in (0, len(frames) - 1):
        px = frames[f_idx]
        assert px.shape == (h, w, 3)
        for (x, y, c) in [(0, 0, 0), (3, 2, 1), (w - 1, h - 1, 2)]:
            assert px[y, x, c] == (x * 7 + y * 13 + c * 29 + 5 * 3
                                   + f_idx * 17) % 256
    assert MM.synth_avi(5) == payload                   # byte-stable
    with pytest.raises(ValueError):
        MM.decode_avi(b"RIFFxxxxWAVE")                  # wrong fourcc
    with pytest.raises(ValueError):
        MM.decode_avi(payload[:40])                     # truncated header
    with pytest.raises(ValueError):
        MM.decode_avi(payload[:-10])                    # truncated movi/idx
    bad = bytearray(payload)
    # corrupt avih frame count -> header/movi mismatch must be caught
    avih_off = payload.index(b"avih") + 8
    bad[avih_off + 16:avih_off + 20] = (99).to_bytes(4, "little")
    with pytest.raises(ValueError):
        MM.decode_avi(bytes(bad))


def test_avi_frame_sampling_is_real(spark):
    """sample_frames on AVI assets decodes the container: every emitted
    frame payload is itself a valid BMP with the video's dims, the stride
    sampling caps fan-out at max_frames, and frame pixels match the source
    formula (not byte slices)."""
    import numpy as np

    rows = [(2, "video/avi", MM.synth_avi(2)),
            (8, "video/avi", MM.synth_avi(8)),
            (1, "audio/wav", MM.synth_wav(1))]          # must not fan out
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = MM.sample_frames(assets, max_frames=2, media="video/avi").collect()
    by_asset = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {2, 8}
    for aid, frames in by_asset.items():
        assert len(frames) <= 2
        vw, vh, src_frames = MM.decode_avi(MM.synth_avi(aid))
        stride = max(1, -(-len(src_frames) // 2))
        for r in sorted(frames, key=lambda r: r["frame_idx"]):
            fw, fh, px = MM.decode_bmp(bytes(r["frame_payload"]))
            assert (fw, fh) == (vw, vh)
            assert (px == src_frames[r["frame_idx"] * stride]).all()


def test_multiprobe_lsh_knn_recall(spark):
    """Multi-probe must recover recall that home-bucket-only lookup loses:
    at the same tables/seed, the flip-probed candidate set is a superset
    of home-only, recall clears the IVF floor, and every returned cosine
    is exact (rescore, not an estimate)."""
    exact_rows = SIM.similarity_knn_query(spark, SF_DIR_001).collect()
    exact = {r["vec_id"] for r in exact_rows}
    exact_sims = {r["vec_id"]: r["cos_sim"] for r in exact_rows}

    mp_rows = SIM.similarity_knn_lsh_multiprobe(spark, SF_DIR_001).collect()
    assert len(mp_rows) == SIM.KNN_K
    mp = {r["vec_id"] for r in mp_rows}
    recall_mp = len(exact & mp) / len(exact)
    home_rows = SIM.similarity_knn_lsh_multiprobe(
        spark, SF_DIR_001, n_flips=0).collect()
    recall_home = len(exact & {r["vec_id"] for r in home_rows}) / len(exact)
    assert recall_mp >= recall_home          # probing never hurts
    assert recall_mp >= 0.4
    for r in mp_rows:                        # exact rescore carried through
        if r["vec_id"] in exact_sims:
            assert r["cos_sim"] == exact_sims[r["vec_id"]]


def test_ann_suite_has_multiprobe_part(spark):
    rows = SIM.similarity_ann_suite(spark, SF_DIR_001).collect()
    parts = {r["part"] for r in rows}
    assert "lsh_mp_knn" in parts
    mp = [r for r in rows if r["part"] == "lsh_mp_knn"]
    assert len(mp) == SIM.KNN_K
    assert len({r["recall_at_k"] for r in mp}) == 1


def test_png_synth_decode_roundtrip():
    """PNG is a REAL stdlib-zlib codec (r4): encode with every scanline
    filter type decodes back bit-exact; decoded pixel stats match the synth
    gradient formula; garbage, truncation, CRC corruption, and corrupt
    deflate streams all fail like a production codec."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (19, 14, 3), dtype=np.uint8)
    for ft in range(5):
        w, h, out = MM.decode_png(MM.encode_png(px, filter_type=ft))
        assert (w, h) == (14, 19) and (out == px).all(), ft

    seed = 5
    payload = MM.synth_png(seed)
    assert payload == MM.synth_png(seed)             # byte-stable
    w, h, out = MM.decode_png(payload)
    assert (w, h) == (8 + (seed * 11) % 23, 8 + (seed * 3) % 27)
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    expect = ((xs * 5 + ys * 17 + cs * 23 + seed * 7) % 256).astype(np.uint8)
    assert (out == expect).all()                     # pinned pixel values
    d = MM.decode_image(payload)
    assert d["mean_intensity"] == round(float(expect.mean()), 3)

    with pytest.raises(ValueError):
        MM.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        MM.decode_png(payload[:40])                  # truncated chunk
    bad = bytearray(payload)
    bad[50] ^= 0xFF                                  # flip a byte: CRC catches
    with pytest.raises(ValueError):
        MM.decode_png(bytes(bad))
    # corrupt the deflate stream but FIX the CRC: zlib must catch it
    off = 8
    while True:
        (ln,) = struct.unpack_from(">I", payload, off)
        if payload[off + 4:off + 8] == b"IDAT":
            break
        off += 12 + ln
    data = bytearray(payload[off + 8:off + 8 + ln])
    data[5] ^= 0xFF
    crc = struct.pack(">I", zlib.crc32(b"IDAT" + bytes(data)) & 0xFFFFFFFF)
    forged = payload[:off + 8] + bytes(data) + crc + payload[off + 12 + ln:]
    with pytest.raises(ValueError):
        MM.decode_png(forged)


def test_png_resize_real_nearest_neighbor():
    """resize keeps the PNG format: decode -> NN resample -> re-encode,
    verified pixel-exact against index mapping of the source."""
    p = MM.synth_png(9)
    sw, sh, src = MM.decode_png(p)
    out = MM.resize_image(p, 16, 16)                 # real path, NO fake
    w, h, px = MM.decode_png(out)
    assert (w, h) == (16, 16)
    for y, x in ((0, 0), (7, 3), (15, 15)):
        assert (px[y, x] == src[(y * sh) // 16, (x * sw) // 16]).all()


def test_jpeg_synth_decode_roundtrip():
    """Baseline JPEG is a REAL stdlib+numpy codec (r4 session 2): Annex K
    tables, canonical Huffman, 8x8 DCT. The codec is LOSSY, so the
    roundtrip contract is exact dims + bounded reconstruction error that
    shrinks as quality rises; garbage, truncation, and mid-stream markers
    fail like a production decoder; progressive (SOF2) is an honest
    unsupported error."""
    import numpy as np

    seed = 4
    payload = MM.synth_jpeg(seed)
    assert payload == MM.synth_jpeg(seed)            # byte-stable
    assert payload[:2] == b"\xFF\xD8" and payload[-2:] == b"\xFF\xD9"
    w, h, out = MM.decode_jpeg(payload)
    assert (w, h) == (8 + (seed * 13) % 21, 8 + (seed * 5) % 29)
    d = MM.decode_image(payload)                     # real path, NO fake
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_intensity"] == round(float(out.mean()), 3)

    # lossy-error monotonicity on a fixed gradient source
    xs = np.arange(24, dtype=np.int64)[None, :, None]
    ys = np.arange(16, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    src = ((xs * 3 + ys * 11 + cs * 31) % 256).astype(np.uint8)
    errs = []
    for q in (50, 75, 95):
        _, _, dec = MM.decode_jpeg(MM.encode_jpeg(src, quality=q))
        errs.append(float(np.abs(dec.astype(int) - src.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2]               # quality helps
    assert errs[2] < 2.0                             # q95 is near-faithful
    # a smooth ramp survives q95 almost exactly (DCT basis fits it)
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None],
                     (32, 1, 3))
    _, _, dec = MM.decode_jpeg(MM.encode_jpeg(smooth, quality=95))
    assert np.abs(dec.astype(int) - smooth.astype(int)).mean() < 0.5

    # 4:2:0 MCU interleave + chroma upsample path, odd dims included
    for wd, ht in ((9, 9), (17, 31), (33, 15)):
        s2 = ((np.arange(wd)[None, :, None] * 7
               + np.arange(ht)[:, None, None] * 13
               + np.arange(3)[None, None, :] * 29) % 256).astype(np.uint8)
        w2, h2, dec2 = MM.decode_jpeg(
            MM.encode_jpeg(s2, quality=90, sampling="420"))
        assert (w2, h2) == (wd, ht)
        assert np.abs(dec2.astype(int) - s2.astype(int)).mean() < 40.0

    with pytest.raises(ValueError):
        MM.decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        MM.decode_jpeg(b"\xFF\xD8garbage after a real SOI marker")
    with pytest.raises(ValueError):
        MM.decode_jpeg(payload[:40])                 # truncated segment walk
    with pytest.raises(ValueError):
        MM.decode_jpeg(payload[:-20])                # truncated entropy data
    bad = bytearray(payload)
    sof = bytes(payload).index(b"\xFF\xC0")
    bad[sof + 1] = 0xC3                              # lossless: unsupported
    with pytest.raises(ValueError, match="SOF marker"):
        MM.decode_jpeg(bytes(bad))
    bad[sof + 1] = 0xC2              # r5: SOF2 accepted, but a baseline
    with pytest.raises(ValueError):  # scan layout is not a valid DC scan
        MM.decode_jpeg(bytes(bad))


def test_jpeg_progressive_roundtrip_matches_baseline():
    """r5: progressive (SOF2) encode/decode — spectral selection +
    successive approximation with per-scan K.2-optimized tables. The
    oracle is exact: progressive reorders the SAME quantized
    coefficients, so decode must be BIT-IDENTICAL to the baseline
    pipeline on every config; any coefficient-corrupting bug in either
    direction (EOBRUN, refine correction bits, point transforms) breaks
    the equality."""
    import numpy as np

    cases = [
        (MM.synth_natural_image(3, 40, 36), 90, "444"),
        (MM.synth_natural_image(7, 33, 29), 75, "420"),   # odd dims + MCU pad
        (np.full((48, 56, 3), 130, np.uint8), 90, "444"),  # flat: long EOBruns
        (np.random.default_rng(9).integers(0, 256, (41, 37, 3))
         .astype(np.uint8), 95, "420"),                    # dense: ZRL/refine
    ]
    for px, q, samp in cases:
        base = MM.decode_jpeg(MM.encode_jpeg(px, quality=q, sampling=samp))
        prog_bytes = MM.encode_jpeg_progressive(px, quality=q, sampling=samp)
        prog = MM.decode_jpeg(prog_bytes)
        assert prog[:2] == base[:2]
        assert (prog[2] == base[2]).all(), (q, samp)
        # byte-stable and genuinely SOF2
        assert prog_bytes == MM.encode_jpeg_progressive(
            px, quality=q, sampling=samp)
        assert b"\xFF\xC2" in prog_bytes and b"\xFF\xC0" not in prog_bytes

    # truncation anywhere raises ValueError (production-decoder behavior)
    p = MM.encode_jpeg_progressive(MM.synth_natural_image(3, 40, 36))
    for cut in list(range(4, len(p) - 1, 41)):
        with pytest.raises(ValueError):
            MM.decode_jpeg(p[:cut])

    # the perceptual hash sees through the progressive re-encode too
    px = MM.synth_natural_image(3, 40, 36)
    h0 = MM.phash64(MM.decode_jpeg(MM.encode_jpeg(px, quality=90))[2])
    hp = MM.phash64(MM.decode_jpeg(
        MM.encode_jpeg_progressive(px, quality=90))[2])
    assert bin(h0 ^ hp).count("1") <= 3


def test_vp8l_per_pixel_alpha_wire_path():
    """r6 (self-review): the entropy-image writer accepts a per-pixel
    alpha column (the palette sub-image's delta-coded alpha). The alpha
    code becomes multi-symbol (emitted per literal, read back
    symmetrically), LZ77 matches additionally require alpha equality so
    a back-reference cannot smear the wrong alpha across RGB-identical
    runs, and the RGB payload roundtrips exactly."""
    import numpy as np

    # all pixels share RGB -> pure-run territory for the matcher; alpha
    # breaks at both ends, so matches must respect the alpha boundaries
    flat = np.tile(np.array([[7, 77, 177]], dtype=np.uint8), (64, 1))
    alpha = np.zeros(64, dtype=np.uint8)
    alpha[0] = 255
    alpha[-1] = 255
    bw = MM._Vp8lBitWriter()
    MM._vp8l_write_entropy_image(bw, flat, 8, 0, top_level=False,
                                 alpha_value=alpha)
    br = MM._Vp8lBitReader(bw.flush(), 0)
    out = MM._vp8l_decode_entropy_image(br, 8, 8, top_level=False)
    assert (out == flat).all()
    # palette files (which ride this path with the [255, 0, ...] alpha
    # column) still roundtrip end to end, with and without a color cache
    rng = np.random.default_rng(11)
    px = rng.integers(0, 5, (20, 24, 3)).astype(np.uint8) * 40
    assert len(np.unique(px.reshape(-1, 3), axis=0)) >= 17
    for cache_bits in (0, 4):
        wb = MM.encode_webp(px, color_indexing=True, cache_bits=cache_bits)
        _, _, out2 = MM.decode_webp(wb)
        assert (out2 == px).all()


def test_webp_lossless_roundtrip():
    """r5: WebP lossless (VP8L) codec — RIFF container, LSB-first
    bitstream, simple + code-length-coded prefix codes, literals + LZ77
    backward refs. The format is LOSSLESS, so the oracle is bit-exact
    RGBA equality; flat/row-copy images must actually compress via the
    backward-reference path (size assertions), and truncation raises."""
    import numpy as np

    cases = [
        MM.synth_natural_image(3, 40, 36),
        np.full((32, 48, 3), 77, np.uint8),                # runs (dist 1)
        np.tile(np.random.default_rng(7).integers(0, 256, (1, 50, 3))
                .astype(np.uint8), (30, 1, 1)),            # row copies
        np.random.default_rng(5).integers(0, 256, (25, 31, 3))
        .astype(np.uint8),                                 # dense literals
        np.array([[[1, 2, 3]]], dtype=np.uint8),           # 1x1
    ]
    for px in cases:
        wb = MM.encode_webp(px)
        assert wb[:4] == b"RIFF" and wb[8:16] == b"WEBPVP8L"
        w, h, out = MM.decode_webp(wb)
        assert (w, h) == (px.shape[1], px.shape[0])
        assert (out == px).all()
        assert wb == MM.encode_webp(px)                    # byte-stable
    # LZ77 is real: a flat image must land far below 3 bytes/pixel
    flat = MM.encode_webp(np.full((64, 64, 3), 9, np.uint8))
    assert len(flat) < 200
    # truncation raises, never fabricates
    wb = MM.encode_webp(cases[0])
    for cut in range(12, len(wb) - 1, 37):
        with pytest.raises((ValueError, NotImplementedError)):
            MM.decode_webp(wb[:cut])
    # cross-format near-dup: a WEBP re-encode of BMP pixels is
    # byte-disjoint but pHash-IDENTICAL (lossless pixels)
    px = MM.synth_natural_image(5, 40, 36)
    assert MM.phash64(MM.decode_webp(MM.encode_webp(px))[2]) \
        == MM.phash64(px)
    # decode_image dispatch routes RIFF/WEBP
    meta = MM.decode_image(MM.encode_webp(px))
    assert (meta["width"], meta["height"]) == (40, 36)

    # COLOR CACHE: scattered palette colors (no spatial runs) must both
    # roundtrip exactly and compress — cache hits replace three literal
    # codes with one green symbol, and the encoder's cache state must
    # track the decoder's exactly (ref-copied pixels insert too)
    rng = np.random.default_rng(11)
    palette = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    pal_img = palette[rng.integers(0, 8, (40, 50))]
    plain = MM.encode_webp(pal_img)
    cached = MM.encode_webp(pal_img, cache_bits=6)
    assert (MM.decode_webp(cached)[2] == pal_img).all()
    # the r5 general LZ77 matcher already shrinks the plain encoding on
    # repeated palette colors; the cache must still beat it outright
    assert len(cached) < len(plain)
    for cb in (4, 8):
        assert (MM.decode_webp(MM.encode_webp(
            MM.synth_natural_image(3, 40, 36), cache_bits=cb))[2]
            == MM.synth_natural_image(3, 40, 36)).all()

    # SUBTRACT-GREEN transform (r5): exact roundtrip, and on channel-
    # correlated content (r ~ g ~ b + noise) the residuals concentrate
    # near zero and the file shrinks
    base = rng.integers(0, 250, (40, 50)).astype(np.int16)
    corr = np.stack([base + rng.integers(0, 6, (40, 50)),
                     base,
                     base + rng.integers(0, 6, (40, 50))],
                    axis=-1).clip(0, 255).astype(np.uint8)
    plain = MM.encode_webp(corr)
    sg = MM.encode_webp(corr, subtract_green=True)
    assert (MM.decode_webp(sg)[2] == corr).all()
    assert len(sg) < len(plain) * 0.8
    # transform composes with the color cache
    assert (MM.decode_webp(MM.encode_webp(
        corr, cache_bits=6, subtract_green=True))[2] == corr).all()

    # COLOR-INDEXING transform (r5): a 17..256-color image rides as
    # green-channel indices + a delta-coded nested palette image —
    # exact roundtrip, real compression, and the <=16-color
    # pixel-bundling variant is refused, not guessed
    pal = rng.integers(0, 256, (40, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 40, (50, 60))]
    plain2 = MM.encode_webp(img)
    idxed = MM.encode_webp(img, color_indexing=True)
    assert (MM.decode_webp(idxed)[2] == img).all()
    assert len(idxed) < len(plain2) * 0.6
    assert (MM.decode_webp(MM.encode_webp(
        img, color_indexing=True, cache_bits=6))[2] == img).all()
    with pytest.raises(ValueError, match="17..256"):
        MM.encode_webp(np.zeros((4, 4, 3), np.uint8), color_indexing=True)

    # PREDICTOR transform (r5): spatial prediction residuals — the
    # natural/gradient win — emitted with the TR-independent modes only
    # (L / T / avg, chosen by measuring all three); exact roundtrip
    # alone and with the cache, and real compression on smooth content
    nat = MM.synth_natural_image(3, 40, 36)
    grad2 = np.tile(np.arange(64, dtype=np.uint8)[None, :, None],
                    (20, 1, 3))
    for img in (nat, grad2):
        pw = MM.encode_webp(img, predictor=True)
        assert (MM.decode_webp(pw)[2] == img).all()
        assert len(pw) < len(MM.encode_webp(img))
    assert (MM.decode_webp(MM.encode_webp(
        nat, predictor=True, cache_bits=6))[2] == nat).all()
    with pytest.raises(ValueError, match="pick one"):
        MM.encode_webp(nat, predictor=True, subtract_green=True)


def test_webp_property_random_roundtrip():
    """Hypothesis-style sweep without the library overhead: seeded random
    shapes/content classes through the full VP8L entropy layer — any
    prefix-code, RLE, LZ77, or cache bug breaks exact equality."""
    import numpy as np

    rng = np.random.default_rng(424242)
    for trial in range(25):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        kind = trial % 5
        if kind == 0:
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            pal = rng.integers(0, 256, (int(rng.integers(2, 9)), 3))
            px = pal[rng.integers(0, pal.shape[0], (h, w))].astype(np.uint8)
        elif kind == 2:
            px = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        elif kind == 3:
            row = rng.integers(0, 256, (1, w, 3)).astype(np.uint8)
            px = np.tile(row, (h, 1, 1))
        else:
            px = np.minimum(np.arange(h)[:, None, None]
                            + np.arange(w)[None, :, None]
                            + np.arange(3)[None, None, :], 255
                            ).astype(np.uint8)
        cb = int(rng.choice([0, 0, 3, 6, 10]))
        kw = {}
        if trial % 3 == 0:
            kw["predictor"] = True
        elif trial % 3 == 1:
            kw["subtract_green"] = True
        wb = MM.encode_webp(px, cache_bits=cb, **kw)
        gw, gh, out = MM.decode_webp(wb)
        assert (gw, gh) == (w, h), (trial, kind, cb)
        assert (out == px).all(), (trial, kind, cb)


def test_jpeg_resize_real_resample():
    """resize keeps the JPEG format: decode -> NN resample -> re-encode;
    the output re-decodes to the target dims and (being lossy) stays close
    to the index-mapped source pixels."""
    import numpy as np

    p = MM.synth_jpeg(9)
    sw, sh, src = MM.decode_jpeg(p)
    out = MM.resize_image(p, 16, 16)                 # real path, NO fake
    assert out[:2] == b"\xFF\xD8"
    w, h, px = MM.decode_jpeg(out)
    assert (w, h) == (16, 16)
    yi = (np.arange(16) * sh) // 16
    xi = (np.arange(16) * sw) // 16
    expect = src[yi][:, xi].astype(int)
    assert np.abs(px.astype(int) - expect).mean() < 16.0


def test_mjpeg_avi_roundtrip_and_guards():
    """MJPEG AVI (r4 session 2): '00dc' frame chunks each hold a standalone
    baseline-JPEG stream, declared via strf biCompression 'MJPG'. Decode is
    real (per-frame DCT decode, dims checked against avih); a non-MJPG
    compression fourcc with compressed chunks fails honestly, as does a
    corrupt frame; frame sampling re-encodes decoded MJPEG frames as BMP."""
    import struct

    import numpy as np

    seed = 5
    p = MM.synth_avi(seed, codec="mjpeg")
    assert p == MM.synth_avi(seed, codec="mjpeg")    # byte-stable
    w, h, frames = MM.decode_avi(p)
    assert (w, h) == (16 + (seed * 5) % 17, 16 + (seed * 11) % 13)
    assert len(frames) == 3 + seed % 6
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    for f, fr in enumerate(frames):                  # lossy per-frame bound
        src = ((xs * 7 + ys * 13 + cs * 29 + seed * 3 + f * 17) % 256
               ).astype(np.uint8)
        assert np.abs(fr.astype(int) - src.astype(int)).mean() < 20.0

    # strf declares a codec we don't have -> honest failure, no fabrication
    bad = bytearray(p)
    i1 = bytes(bad).index(b"MJPG")                   # strh fccHandler
    i2 = bytes(bad).index(b"MJPG", i1 + 4)           # strf biCompression
    bad[i2:i2 + 4] = b"H264"
    with pytest.raises(ValueError, match="not MJPG"):
        MM.decode_avi(bytes(bad))
    # corrupt frame bytes -> the JPEG layer catches it
    bad = bytearray(p)
    i = bytes(bad).index(b"00dc")
    bad[i + 12] ^= 0xFF
    with pytest.raises(ValueError):
        MM.decode_avi(bytes(bad))
    # a '00dc' frame lying about its dims fails the avih cross-check
    other = MM.synth_jpeg(2)                         # different dims
    fake = bytearray(p)
    (s2,) = struct.unpack_from("<I", fake, i + 4)
    with pytest.raises(ValueError):
        MM.decode_avi(bytes(fake[:i + 8]) + other
                      + bytes(fake[i + 8 + s2:]))


def test_avi_short_frame_chunk_fails():
    """ADVICE r3: a '00db' chunk whose declared size is smaller than a full
    frame must raise, not silently read bytes from the following chunk."""
    import struct

    payload = bytearray(MM.synth_avi(5))
    # find the first '00db' chunk and shrink its declared size
    idx = bytes(payload).index(b"00db")
    (size,) = struct.unpack_from("<I", payload, idx + 4)
    struct.pack_into("<I", payload, idx + 4, size - 8)
    with pytest.raises(ValueError, match="frame chunk"):
        MM.decode_avi(bytes(payload))


def test_decode_image_fake_falls_back_on_pseudo_bmp():
    """ADVICE r3: a legacy text payload that happens to start with 'BM'
    must hit the fake double under fake=True, not a data-dependent
    ValueError; without fake the strict parse still raises."""
    pseudo = b"BMost of this text is not a bitmap at all" * 3
    d = MM.decode_image(pseudo, fake=True)
    assert d["width"] > 0 and d["mean_intensity"] >= 0
    with pytest.raises(ValueError):
        MM.decode_image(pseudo)


def test_persisted_ivf_index_roundtrip(spark, tmp_path):
    """Index-as-table (r4 session 2): save_ivf_index persists centroids,
    PQ codebooks, and the coded corpus partitioned by centroid_id;
    load_ivf_index reloads WITHOUT retraining or re-assigning, the IVF and
    IVF-PQ queries return IDENTICAL rows to the freshly-built index, and
    the probe plans as storage-level partition pruning."""
    from service_level_reporting_spark.operators import similarity as SIM
    from service_level_reporting_spark.plans import formatted_plan

    sf = SF_DIR_001
    fresh_ivf = [tuple(r) for r in SIM.similarity_knn_ivf(spark, sf).collect()]
    fresh_pq = [tuple(r) for r in
                SIM.similarity_knn_ivf_pq(spark, sf).collect()]
    path = str(tmp_path / "ivf_index")
    SIM.save_ivf_index(spark, sf, path)
    idx = SIM.load_ivf_index(spark, path)
    assert idx["books"] is not None and "code" in idx["indexed"].columns
    got_ivf = [tuple(r) for r in
               SIM.similarity_knn_ivf(spark, sf, index=idx).collect()]
    got_pq = [tuple(r) for r in
              SIM.similarity_knn_ivf_pq(spark, sf, index=idx).collect()]
    assert got_ivf == fresh_ivf and got_pq == fresh_pq
    plan = formatted_plan(SIM.similarity_knn_ivf(spark, sf, index=idx))
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "centroid_id" in ln]
    assert pruned, "IVF probe must prune centroid partitions at storage"


def test_gif_synth_decode_roundtrip():
    """GIF87a is a REAL stdlib LZW codec (r4 session 2): palette images
    roundtrip LOSSLESSLY (web-safe-quantized synth), the variable-width
    LZW survives width growth and the 4096-entry table reset, and garbage,
    truncation, palette overflow, and unsupported variants fail like a
    production decoder."""
    import numpy as np

    seed = 6
    payload = MM.synth_gif(seed)
    assert payload == MM.synth_gif(seed)             # byte-stable
    assert payload[:6] == b"GIF87a" and payload[-1:] == b"\x3B"
    w, h, px = MM.decode_gif(payload)
    assert (w, h) == (8 + (seed * 17) % 19, 8 + (seed * 7) % 23)
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    expect = (((xs * 2 + ys * 3 + cs * 5 + seed) % 6) * 51).astype(np.uint8)
    assert (px == expect).all()                      # LOSSLESS
    d = MM.decode_image(payload)                     # real path, NO fake
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_intensity"] == round(float(expect.mean()), 3)

    # LZW stress straight through the codec: width growth + 4096 reset
    rng = np.random.default_rng(11)
    for mcs, n in ((2, 400), (8, 60_000)):
        idx = rng.integers(0, 1 << mcs, n).tolist()
        assert MM._gif_lzw_decode(MM._gif_lzw_encode(idx, mcs),
                                  mcs, n) == idx

    # resize keeps the format and a legal (subset) palette
    out = MM.resize_image(payload, 16, 16)
    assert out[:6] == b"GIF87a"
    w2, h2, px2 = MM.decode_gif(out)
    assert (w2, h2) == (16, 16)
    yi = (np.arange(16) * h) // 16
    xi = (np.arange(16) * w) // 16
    assert (px2 == expect[yi][:, xi]).all()          # NN-exact (lossless)

    with pytest.raises(ValueError):
        MM.decode_gif(b"not a gif at all")
    with pytest.raises(ValueError):
        MM.decode_gif(payload[:10])                  # truncated descriptor
    with pytest.raises(ValueError):
        MM.decode_gif(payload[:-6])                  # truncated sub-blocks
    with pytest.raises(ValueError, match="256"):
        MM.encode_gif(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
    bad = bytearray(payload)
    bad[10] |= 0x40                                  # pretend interlaced
    # (bit 0x40 of the SCREEN descriptor is the sort flag — flip the
    # IMAGE descriptor's interlace bit instead: find 0x2C block)
    i = bytes(payload).index(b"\x2C")
    bad = bytearray(payload)
    bad[i + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        MM.decode_gif(bytes(bad))


def test_phash_cross_format_near_dup(spark):
    """pHash (r4 session 2): the perceptual hash is stable across
    containers (PNG of the same pixels: Hamming 0) and across lossy
    re-encoding (JPEG q90 of natural-like content: Hamming <= 3), while
    different images sit far apart; the banded pair join recovers EVERY
    planted BMP<->JPEG duplicate with zero false pairs on the fixture;
    the driver-facing pipeline row carries the recall claim."""
    import numpy as np

    def ham(a, b):
        return bin(a ^ b).count("1")

    px = MM.synth_natural_image(3, 40, 36)
    h0 = MM.phash64(px)
    _, _, png_px = MM.decode_png(MM.encode_png(px))
    assert ham(h0, MM.phash64(png_px)) == 0          # lossless container
    _, _, jpg_px = MM.decode_jpeg(MM.encode_jpeg(px, quality=90))
    assert ham(h0, MM.phash64(jpg_px)) <= 3          # lossy re-encode
    other = MM.synth_natural_image(4, 40, 36)
    assert ham(h0, MM.phash64(other)) > 8            # different image

    rows = {r["key"]: r for r in
            MM.multimodal_phash_dedup(spark, SF_DIR_001).collect()}
    assert rows["planted_found"]["n"] == rows["planted_found"]["n2"]  # 100%
    assert rows["total_pairs"]["n"] == rows["planted_found"]["n"]    # no FPs
    assert rows["total_pairs"]["v"] <= MM.PHASH_MAX_HAMMING
    # r6 (VERDICT item 7): per-codec-pair rows — every rotated re-encode
    # format recovers ALL of its planted pairs, so one codec regressing
    # shows as a changed driver row, not a diluted aggregate
    per_pair = {k: r for k, r in rows.items()
                if k.startswith("planted_pair_")}
    assert set(per_pair) == {"planted_pair_bmp_jpeg",
                             "planted_pair_bmp_jpeg_prog",
                             "planted_pair_bmp_webp"}
    for k, r in per_pair.items():
        assert r["n"] == r["n2"] > 0, f"{k}: {r['n']}/{r['n2']} recovered"
    assert sum(r["n2"] for r in per_pair.values()) \
        == rows["planted_found"]["n2"]

    # pipeline stage present
    stages = {r["stage"] for r in
              MM.multimodal_pipeline(spark, SF_DIR_001).collect()}
    assert "phash_dedup" in stages


def test_video_audio_near_dup_driver_stages(spark):
    """r5 (VERDICT item 7): the video and audio near-dup legs are scored
    in the driver artifact, not just API pytest — each plants re-encoded
    clones from sf docs and must recover ALL of them (planted_found ==
    n_planted in n2) with zero false pairs and high match_frac."""
    vrows = {r["key"]: r for r in
             MM.multimodal_video_near_dup(spark, SF_DIR_001).collect()}
    assert vrows["planted_found"]["n"] == vrows["planted_found"]["n2"] > 0
    assert vrows["total_pairs"]["n"] == vrows["planted_found"]["n"]  # no FPs
    assert vrows["planted_found"]["v"] == 1.0      # every frame matched

    arows = {r["key"]: r for r in
             MM.multimodal_audio_near_dup(spark, SF_DIR_001).collect()}
    assert arows["planted_found"]["n"] == arows["planted_found"]["n2"] > 0
    assert arows["total_pairs"]["n"] == arows["planted_found"]["n"]  # no FPs
    assert arows["total_pairs"]["v"] >= 0.8        # weakest planted pair

    stages = {r["stage"] for r in
              MM.multimodal_pipeline(spark, SF_DIR_001).collect()}
    assert {"video_near_dup", "audio_near_dup"} <= stages


def test_video_phash_cross_codec_near_dup(spark):
    """Video near-dup across CODECS (r4 session 2): the same natural-like
    frames encoded raw-DIB and MJPEG are byte-disjoint files, but their
    per-frame perceptual hashes align — the banded frame-hash join must
    recover every planted pair at match_frac 1.0 with zero false pairs."""
    rows = []
    for s in range(4):
        frames = [MM.synth_natural_image(s * 10 + f, 32, 28)
                  for f in range(4)]
        rows.append((s * 2, "video/avi", MM.encode_avi(frames, "dib")))
        rows.append((s * 2 + 1, "video/avi",
                     MM.encode_avi(frames, "mjpeg", jpeg_quality=92)))
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {(r["asset_a"], r["asset_b"]): r for r in
           MM.video_near_dup_pairs(
               MM.video_phash_frames(assets)).collect()}
    assert set(got) == {(0, 1), (2, 3), (4, 5), (6, 7)}
    for r in got.values():
        assert r["n_matched"] == 4 and r["match_frac"] == 1.0
    # byte-level disjointness of the planted twins (the point of the test)
    for s in range(4):
        assert rows[s * 2][2] != rows[s * 2 + 1][2]


def test_audio_fingerprint_near_dup(spark):
    """Audio near-dup (r4 session 2, completes the image/video/audio dedup
    triplet): Haitsma-Kalker band-energy-derivative fingerprints are
    EXACTLY invariant to volume change (scaling cancels in log-energy
    differences), robust to dither, and discriminative across different
    content; the windowed pair join recovers every planted volume/dither
    twin and nothing else."""
    import io
    import wave

    import numpy as np

    def words_of(payload):
        with wave.open(io.BytesIO(payload), "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return MM.audio_fingerprint_words(pcm, MM.WAV_SAMPLE_RATE)

    loud = words_of(MM.synth_wav_melody(1, amplitude=0.9))
    quiet = words_of(MM.synth_wav_melody(1, amplitude=0.25))
    hams = [bin(a[1] ^ b[1]).count("1") for a, b in zip(loud, quiet)]
    assert sum(1 for h in hams if h <= 2) / len(hams) >= 0.95  # volume-proof
    other = words_of(MM.synth_wav_melody(9, amplitude=0.9))
    hams2 = [bin(a[1] ^ b[1]).count("1") for a, b in zip(loud, other)]
    assert sum(1 for h in hams2 if h <= 2) / len(hams2) <= 0.2  # distinct

    rows = []
    for s in range(4):
        rows.append((s * 2, "audio/wav",
                     MM.synth_wav_melody(s, amplitude=0.9)))
        rows.append((s * 2 + 1, "audio/wav",
                     MM.synth_wav_melody(s, amplitude=0.25, dither=0.004)))
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {(r["asset_a"], r["asset_b"]): r["match_frac"] for r in
           MM.audio_near_dup_pairs(
               MM.audio_phash_windows(assets)).collect()}
    assert set(got) == {(0, 1), (2, 3), (4, 5), (6, 7)}
    assert all(v >= 0.8 for v in got.values())
    # planted twins are byte-disjoint (volume re-render, not a copy)
    for s in range(4):
        assert rows[s * 2][2] != rows[s * 2 + 1][2]


def test_semdedup_subset_and_measured_recall(spark):
    """SemDeDup (r7 s2, dedup_semantic_pairs): cluster-local pairwise with
    soft top-2 assignment. Two pinned properties:
      * SUBSET-ness / zero false positives — every emitted pair is
        exact-rescored inside the tile, so it must appear in the exact
        thresholded pair set with the identical cosine;
      * measured recall — full at sf0.001/sf0.01; at sf0.1 the fixture's
        threshold-0.5 pairs (~60 deg apart, far below SemDeDup's
        high-similarity design point) straddle clusters and the measured
        recall is 9/14 (hard argmax read 5/14 — the top-2 lift is itself
        pinned by this floor). LSH (dedup_embedding_ann) remains the
        loose-threshold recall engine; SemDeDup is the cheap
        tight-threshold mechanism. Deterministic trainer/assigner ->
        stable numbers."""
    import service_level_reporting_spark.operators.similarity as SIM

    for sf_dir, floor in ((SF_DIR_001, 1.0),
                          ("/root/testdata/sf0.01", 1.0),
                          ("/root/testdata/sf0.1", 0.6)):
        exact = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
                 for r in SIM.dedup_embedding_cosine(spark, sf_dir).collect()}
        sem = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
               for r in SIM.dedup_semantic_pairs(spark, sf_dir).collect()}
        wrong = {p for p, c in sem.items() if exact.get(p) != c}
        assert not wrong, f"{sf_dir}: false/mis-scored pairs {wrong}"
        recall = len(set(sem) & set(exact)) / len(exact) if exact else 1.0
        assert recall >= floor, (sf_dir, recall)
    # the driver row carries the accounting sentinel
    rows = SIM.dedup_semantic(spark, SF_DIR_001).collect()
    sent = [r for r in rows if r["vec_a"] == -1]
    assert len(sent) == 1 and sent[0]["vec_b"] == len(rows) - 1


def _planted_cluster_frame(spark, n_clusters=8, per_cluster=50, seed=7,
                           id_base=0, flip=False):
    """Well-separated unit clusters: each vector = its cluster's
    one-hot-ish direction + small deterministic noise, so every true
    top-k neighbor is in-cluster and an IVF probe that reaches the
    cluster's cells answers EXACTLY."""
    import numpy as np

    rng = np.random.RandomState(seed)
    dim = SIM.EMB_DIM
    dirs = np.zeros((n_clusters, dim))
    for c in range(n_clusters):
        dirs[c, (c * 7) % dim] = -1.0 if flip else 1.0
        dirs[c, (c * 7 + 3) % dim] = 0.5
    rows = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            v = dirs[c] + 0.05 * rng.randn(dim)
            rows.append((id_base + c * per_cluster + i, f"c{c}",
                         [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>")


def test_ivf_index_cdf_fold_equals_rebuild(spark, tmp_path):
    """r8 (VERDICT item 3): after append + MoR-delete commits, the FOLDED
    index answers probe queries with the same top-k as a fresh rebuild
    (planted separable fixture), the watermark makes a second sync a
    no-op, and the fold never rewrites untouched centroid partitions."""
    from service_level_reporting_spark.sources.txlog import TxLogTable

    base = str(tmp_path)
    t = TxLogTable(base + "/t", key_cols=["vec_id"], stats_col="label")
    full = _planted_cluster_frame(spark).localCheckpoint(eager=True)
    t.append(full.where(F.col("vec_id") % 4 != 0))
    SIM.build_ivf_index(spark, t.read(spark), base + "/idx",
                        version=t.latest_version())
    t.append(full.where(F.col("vec_id") % 4 == 0))
    t.delete("vec_id % 10 = 3", mode="mor")

    sync = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync["mode"] == "fold" and sync["psi"] <= 0.25
    assert sync["inserted"] > 0 and sync["deleted"] > 0
    # idempotence: same version -> noop
    assert SIM.ivf_index_sync(spark, base + "/t",
                              base + "/idx")["mode"] == "noop"

    SIM.build_ivf_index(spark, t.read(spark), base + "/fresh",
                        version=t.latest_version())
    folded = SIM.load_ivf_index(spark, base + "/idx")
    fresh = SIM.load_ivf_index(spark, base + "/fresh")
    snap = {r["vec_id"]: r["embedding"]
            for r in t.read(spark).collect()}
    probes = sorted(snap)[::40][:8]
    for pv in probes:
        top_f = [v for v, _ in SIM.ivf_query_topk(
            spark, folded, snap[pv], exclude_vec_id=pv)]
        top_r = [v for v, _ in SIM.ivf_query_topk(
            spark, fresh, snap[pv], exclude_vec_id=pv)]
        assert top_f == top_r, (pv, top_f, top_r)
        # no deleted vector may surface through the folded index
        assert all(v % 10 != 3 for v in top_f)

    # the folded index state contains EXACTLY the live snapshot
    got = sorted(r["vec_id"] for r in folded["indexed"]
                 .select("vec_id").collect())
    assert got == sorted(snap)


def test_ivf_index_psi_gate_triggers_retrain(spark, tmp_path):
    """The PSI drift gate: a fold that lands a distribution-shifting blob
    (a new far cluster set, 3x the indexed corpus) crosses the threshold
    and the sync RE-TRAINS from the current snapshot; afterwards the gate
    is quiet again and queries in the new region answer exactly."""
    from service_level_reporting_spark.sources.txlog import TxLogTable

    base = str(tmp_path)
    t = TxLogTable(base + "/t", key_cols=["vec_id"], stats_col="label")
    a = _planted_cluster_frame(spark, per_cluster=25).localCheckpoint(
        eager=True)
    t.append(a)
    SIM.build_ivf_index(spark, t.read(spark), base + "/idx",
                        version=t.latest_version())
    # drift: a flipped-direction corpus 3x the indexed one
    b = _planted_cluster_frame(spark, per_cluster=75, seed=11,
                               id_base=10_000, flip=True
                               ).localCheckpoint(eager=True)
    t.append(b)
    sync = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync["mode"] == "rebuild", sync
    assert sync["psi"] > 0.25
    # post-rebuild: gate quiet, new-region probes answer exactly
    assert SIM.ivf_index_sync(spark, base + "/t",
                              base + "/idx")["mode"] == "noop"
    idx = SIM.load_ivf_index(spark, base + "/idx")
    snap = {r["vec_id"]: r["embedding"] for r in b.collect()}
    pv = 10_000
    top = [v for v, _ in SIM.ivf_query_topk(
        spark, idx, snap[pv], exclude_vec_id=pv)]
    assert len(top) == 5 and all(v >= 10_000 for v in top)


def test_ivf_tombstone_mask_reinsert_and_compaction(spark, tmp_path):
    """r8: index deletes fold as TOMBSTONES (the index's own
    merge-on-read) — O(increment) per fold, queries mask the pending
    set; a re-inserted vec_id cancels its tombstone in the same fold;
    and a mask crossing the compact fraction rewrites ONLY the
    tombstoned cells and clears the pending set."""
    import os

    from service_level_reporting_spark.sources.txlog import TxLogTable

    base = str(tmp_path)
    t = TxLogTable(base + "/t", key_cols=["vec_id"], stats_col="label")
    full = _planted_cluster_frame(spark).localCheckpoint(eager=True)
    t.append(full)
    SIM.build_ivf_index(spark, t.read(spark), base + "/idx",
                        version=t.latest_version())

    # a small scattered delete: tombstoned, nothing rewritten
    t.delete("vec_id % 100 = 7", mode="mor")      # 4 of 400 rows (1%)
    sync = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync["mode"] == "fold"
    assert sync["tombstones"] == 4 and sync["compacted_partitions"] == 0
    idx = SIM.load_ivf_index(spark, base + "/idx")
    got = {r["vec_id"] for r in idx["indexed"].select("vec_id").collect()}
    assert got == {r["vec_id"] for r in t.read(spark).collect()}
    snap = {r["vec_id"]: r["embedding"] for r in full.collect()}
    # a deleted vector's near-clone query must not return it
    top = [v for v, _ in SIM.ivf_query_topk(spark, idx, snap[7],
                                            exclude_vec_id=7)]
    assert 7 not in top and 107 not in top and 207 not in top \
        and 307 not in top

    # re-insert one deleted vec_id: the fold cancels its tombstone
    t.append(spark.createDataFrame(
        [(7, "c0", snap[7])], "vec_id long, label string, "
                              "embedding array<double>").coalesce(1))
    sync2 = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync2["mode"] == "fold" and sync2["tombstones"] == 3
    idx2 = SIM.load_ivf_index(spark, base + "/idx")
    assert 7 in {r["vec_id"]
                 for r in idx2["indexed"].select("vec_id").collect()}

    # a mass delete crosses the compact fraction: the mask folds into
    # exactly the tombstoned cells and the pending set clears
    t.delete("vec_id % 5 = 2", mode="mor")        # 20% of the corpus
    sync3 = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync3["mode"] == "fold"
    assert sync3["compacted_partitions"] > 0 and sync3["tombstones"] == 0
    assert not os.path.isdir(base + "/idx/tombstones")
    idx3 = SIM.load_ivf_index(spark, base + "/idx")
    assert {r["vec_id"] for r in idx3["indexed"].select("vec_id")
            .collect()} == {r["vec_id"] for r in t.read(spark).collect()}


def test_ivf_whole_cell_delete_does_not_resurrect(spark, tmp_path):
    """r10 (ADVICE high): compaction rewrites cells with dynamic
    partitionOverwriteMode, which only replaces partitions PRESENT in
    the written frame — when EVERY row of a cell is masked out (a whole
    cluster deleted), the survivors frame has no rows for that
    centroid, the stale partition used to survive untouched, and the
    post-compaction tombstone drop resurrected the deleted rows. The
    fold must delete zero-survivor cell partitions explicitly."""
    from service_level_reporting_spark.sources.txlog import TxLogTable

    base = str(tmp_path)
    t = TxLogTable(base + "/t", key_cols=["vec_id"], stats_col="label")
    full = _planted_cluster_frame(spark).localCheckpoint(eager=True)
    t.append(full)
    SIM.build_ivf_index(spark, t.read(spark), base + "/idx",
                        version=t.latest_version())
    # delete cluster c2 ENTIRELY: 50/400 = 12.5% crosses the 10%
    # compact fraction, so the fold rewrites the tombstoned cells and
    # clears the pending mask — the exact resurrection window
    t.delete("label = 'c2'", mode="mor")
    sync = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync["mode"] == "fold"
    assert sync["compacted_partitions"] > 0 and sync["tombstones"] == 0
    idx = SIM.load_ivf_index(spark, base + "/idx")
    got = {r["vec_id"] for r in idx["indexed"].select("vec_id").collect()}
    live = {r["vec_id"] for r in t.read(spark).collect()}
    assert got == live                  # nothing resurrected
    assert not any(100 <= v < 150 for v in got)   # c2 ids are 100..149
    # a probe straight at c2's direction returns only LIVE vectors
    snap = {r["vec_id"]: r["embedding"] for r in full.collect()}
    top = [v for v, _ in SIM.ivf_query_topk(spark, idx, snap[110],
                                            exclude_vec_id=110)]
    assert all(not (100 <= v < 150) for v in top), top


def test_ivf_update_does_not_resurrect_stale_row(spark, tmp_path):
    """r9 (ADVICE high): an UPDATE reaches the fold via changes(net=True)
    as delete+insert of the same vec_id. Cancelling the tombstone by key
    alone would resurrect the OLD physical row (two live rows per
    vec_id, the stale embedding queryable); the fold must force-compact
    the cancelled tombstone's exact cell before appending the new row.
    Pins: exactly one row per vec_id, the live embedding is the NEW one,
    and fold == rebuild on probe queries after the update."""
    import os

    from service_level_reporting_spark.sources.txlog import TxLogTable

    base = str(tmp_path)
    t = TxLogTable(base + "/t", key_cols=["vec_id"], stats_col="label")
    full = _planted_cluster_frame(spark).localCheckpoint(eager=True)
    t.append(full)
    SIM.build_ivf_index(spark, t.read(spark), base + "/idx",
                        version=t.latest_version())
    snap = {r["vec_id"]: r["embedding"] for r in full.collect()}
    # move vec 7 to cluster 3's region: delete + re-insert with a NEW
    # embedding (exactly what MERGE/UPDATE emits through the net feed)
    new_emb = snap[3 * 50 + 1]          # a c3 vector's embedding
    t.delete("vec_id = 7", mode="mor")
    t.append(spark.createDataFrame(
        [(7, "c3", new_emb)], "vec_id long, label string, "
                              "embedding array<double>").coalesce(1))
    sync = SIM.ivf_index_sync(spark, base + "/t", base + "/idx")
    assert sync["mode"] == "fold"
    folded = SIM.load_ivf_index(spark, base + "/idx")
    # exactly one physical row per vec_id — the stale row is GONE
    dup = (folded["indexed"].groupBy("vec_id")
           .agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") > 1).count())
    assert dup == 0
    assert folded["indexed"].count() == t.read(spark).count()
    live = folded["indexed"].where(F.col("vec_id") == 7).collect()
    assert len(live) == 1
    # the live embedding is the NEW one (norm against new_emb ~ exact)
    import numpy as np

    got = np.asarray(live[0]["emb"] if "emb" in folded["indexed"].columns
                     else live[0]["embedding"])
    want = np.asarray(new_emb) / (np.linalg.norm(new_emb) or 1.0)
    assert np.allclose(got / (np.linalg.norm(got) or 1.0), want,
                       atol=1e-9)
    # a query at the OLD location must not return vec 7; one at the NEW
    # location must — and fold == rebuild on both probes
    SIM.build_ivf_index(spark, t.read(spark), base + "/fresh",
                        version=t.latest_version())
    fresh = SIM.load_ivf_index(spark, base + "/fresh")
    for qv in (snap[7], new_emb):
        top_f = [v for v, _ in SIM.ivf_query_topk(spark, folded, qv,
                                                  exclude_vec_id=7)]
        top_r = [v for v, _ in SIM.ivf_query_topk(spark, fresh, qv,
                                                  exclude_vec_id=7)]
        assert top_f == top_r, (top_f, top_r)
    near_new = [v for v, _ in SIM.ivf_query_topk(spark, folded, new_emb)]
    assert 7 in near_new
    # the pending mask (if any) publishes through the ATOMIC pointer,
    # partitioned by centroid_id — never the legacy two-rename dir
    assert not os.path.isdir(base + "/idx/tombstones")
    d = SIM._tomb_current_dir(base + "/idx")
    if d is not None:
        assert any(n.startswith("centroid_id=")
                   for n in os.listdir(os.path.join(base, "idx", d)))


def test_train_sample_survives_id_structured_corpus(spark):
    """r8 (caught by the 10x sweep): the trainer's raw-id stride sample
    can land on an EMPTY residue class when the corpus ids are
    structured (all odd here, stride even -> id % stride == 0 never
    holds); the hash-stride fallback must produce a healthy sample and
    the build must succeed end to end."""
    import numpy as np

    rows = [(2 * i + 1, "a",
             [float((i + j) % 7 - 3) for j in range(SIM.EMB_DIM)])
            for i in range(200)]
    e = SIM._with_norm(spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"))
    # n=200, cap=50 -> stride 4; no odd id is ever % 4 == 0
    x = SIM._train_sample(e, n_rows=200, cap=50)
    assert len(x) >= 12                      # healthy fallback sample
    assert np.allclose(np.linalg.norm(x, axis=1), 1.0)
    c = SIM._train_centroids(x, k=4)
    assert c.shape == (4, SIM.EMB_DIM)


def test_jpeg_vectorized_entropy_scan_bit_exact():
    """r14: encode_jpeg's entropy-coded segment moved from the per-MCU
    Python loop (_jpeg_encode_block + _JpegBitWriter) to a vectorized
    numpy scan (_jpeg_entropy_scan). The retained reference loop pins the
    new path BYTE-identical across sizes, qualities and both sampling
    modes — any drift in Huffman items, DC prediction order, ZRL/EOB
    emission, spec padding, or 0xFF00 stuffing fails here."""
    for seed in range(12):
        w = 17 + (seed * 7) % 40
        h = 9 + (seed * 13) % 40
        px = MM.synth_natural_image(seed, w, h)
        for q, samp in ((90, "444"), (75, "420"), (10, "444"),
                        (100, "420")):
            planes, factors, qt, hh, ww, mcux, mcuy = \
                MM._jpeg_quantized_planes(px, q, samp)
            dc_tabs = (MM._jpeg_canonical_codes(*MM._JPEG_HUFF_DC_LUM),
                       MM._jpeg_canonical_codes(*MM._JPEG_HUFF_DC_CHR))
            ac_tabs = (MM._jpeg_canonical_codes(*MM._JPEG_HUFF_AC_LUM),
                       MM._jpeg_canonical_codes(*MM._JPEG_HUFF_AC_CHR))
            bw = MM._JpegBitWriter()
            preds = [0, 0, 0]
            for m in range(mcuy * mcux):
                my, mx = divmod(m, mcux)
                for ci in range(3):
                    hs, vs = factors[ci]
                    t = min(ci, 1)
                    for byi in range(vs):
                        for bxi in range(hs):
                            preds[ci] = MM._jpeg_encode_block(
                                planes[ci][my * vs + byi, mx * hs + bxi],
                                preds[ci], dc_tabs[t], ac_tabs[t], bw)
            assert MM._jpeg_entropy_scan(planes, factors) == bw.flush(), \
                (seed, q, samp)
