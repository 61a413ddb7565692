"""Pure-Python profile of the multimodal codec paths (no Spark): where do
multimodal_pipeline's seconds go per codec and per direction (synth/encode
vs decode)?  Replicates exactly the per-doc work the legs do at a given SF
doc count, single-threaded, so per-codec shares are comparable.

Usage: python tools/mm_profile.py [n_docs] [out.json]
"""

from __future__ import annotations

import cProfile
import io
import json
import pstats
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from service_level_reporting_spark.operators import multimodal as M  # noqa: E402


def timed(fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    return time.perf_counter() - t0, out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mm_profile.json"
    ids = list(range(n_docs))
    buckets: dict[str, float] = {}

    def add(k, dt):
        buckets[k] = buckets.get(k, 0.0) + dt

    # --- media_assets synthesis mix (doc_id % 3 rotation) -----------------
    payloads = {}
    for aid in ids:
        if aid % 3 == 0:
            sub = (aid // 3) % 4
            fn = (M.synth_bmp, M.synth_png, M.synth_jpeg, M.synth_gif)[sub]
            key = ("synth_bmp", "synth_png", "synth_jpeg", "synth_gif")[sub]
            dt, p = timed(fn, aid)
        elif aid % 3 == 1:
            key = "synth_wav"
            dt, p = timed(M.synth_wav, aid)
        else:
            key = "synth_avi_mjpeg" if (aid // 3) % 2 else "synth_avi_dib"
            dt, p = timed(M.synth_avi, aid,
                          "mjpeg" if (aid // 3) % 2 else "dib")
        add(key, dt)
        payloads[aid] = p

    # --- features-leg decode of those payloads ----------------------------
    for aid, p in payloads.items():
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            key = "decode_avi_mjpeg" if (aid // 3) % 2 else "decode_avi_dib"
            dt, _ = timed(M.decode_avi, p)
        elif p[:4] == b"RIFF":
            key = "decode_wav"
            dt, _ = timed(M.decode_wav, p)
        else:
            key = "decode_image_" + {0: "bmp", 1: "png", 2: "jpeg",
                                     3: "gif"}[(aid // 3) % 4]
            dt, _ = timed(M.decode_image, p)
        add(key, dt)

    # --- planted near-dup legs (phash/video/audio) ------------------------
    # phash leg: n_planted=50 image docs -> BMP + one of jpeg/prog/webp
    t0 = time.perf_counter()
    img_ids = [i for i in ids if i % 3 == 0][:50]
    for aid in img_ids:
        w = 24 + (aid * 7) % 25
        h = 24 + (aid * 13) % 25
        px = M.synth_natural_image(aid, w, h)
        sub = (aid // 3) % 3
        M.encode_bmp(px)
        if sub == 0:
            M.encode_jpeg(px, quality=90)
        elif sub == 1:
            M.encode_jpeg_progressive(px, quality=90)
        else:
            M.encode_webp(px)
    add("phash_leg_synth", time.perf_counter() - t0)
    # video leg: 10 docs x 4 frames, dib + mjpeg(92)
    t0 = time.perf_counter()
    vid_ids = [i for i in ids if i % 3 == 2][:10]
    for aid in vid_ids:
        w = 28 + (aid * 5) % 9
        h = 24 + (aid * 11) % 9
        frames = [M.synth_natural_image(aid * 10 + f, w, h) for f in range(4)]
        M.encode_avi(frames, "dib")
        M.encode_avi(frames, "mjpeg", jpeg_quality=92)
    add("video_leg_synth", time.perf_counter() - t0)
    t0 = time.perf_counter()
    aud_ids = [i for i in ids if i % 3 == 1][:10]
    for aid in aud_ids:
        M.synth_wav_melody(aid, amplitude=0.9)
        M.synth_wav_melody(aid, amplitude=0.25, dither=0.004)
    add("audio_leg_synth", time.perf_counter() - t0)

    total = sum(buckets.values())
    report = {"n_docs": n_docs, "total_sec": round(total, 3),
              "buckets": {k: round(v, 3) for k, v in
                          sorted(buckets.items(), key=lambda kv: -kv[1])}}
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)

    # --- cProfile of the top bucket path for hotspot functions ------------
    pr = cProfile.Profile()
    pr.enable()
    for aid in ids[:120]:
        if aid % 3 == 0 and (aid // 3) % 4 == 2:
            M.synth_jpeg(aid)
        elif aid % 3 == 2 and (aid // 3) % 2:
            M.synth_avi(aid, "mjpeg")
    for aid, p in list(payloads.items())[:120]:
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            M.decode_avi(p)
        elif p[:2] == b"\xff\xd8":
            M.decode_jpeg(p)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
