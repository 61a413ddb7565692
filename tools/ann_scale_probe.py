"""ANN at its design scale (r5, VERDICT item 4): the 100 TB ANN claim so
far rested on sf0.01 recall pytest + sf1 wall-time. This probe stages a
synthetic 10^6 x 64-d corpus and measures the REAL operators:

* `dedup_embedding_ann` (8-table LSH, corpus-scaled planes, bounded
  sub-tiles) vs the exact blocked-GEMM `dedup_embedding_cosine` — wall
  time AND recall against 500 PLANTED near-dup pairs (the only tractable
  ground truth at 10^6: the exact thresholded pair set is known by
  construction; both run at threshold 0.9 — at 10^6 isotropic vectors the
  expected count of RANDOM pairs over 0.9 is ~0, so planted == truth,
  which the exact run verifies).
* `similarity_knn_query` (exact full-corpus scan) vs `similarity_knn_ivf`
  and `similarity_knn_ivf_pq` through the PERSISTED index path
  (save_ivf_index -> load_ivf_index -> probe): index build+write time,
  reload time, per-query latency, recall@k vs the exact top-k.

Corpus: iid standard normal, unit-normalized (isotropic — the honest hard
case for threshold recall; cosine concentration at d=64 puts random pairs
~N(0, 1/8), so 0.9 is ~7 sigma and the planted pairs at ~0.995 are the
entire truth set). 500 planted clones: base vector + 0.03-sigma noise,
re-normalized (cos ~0.97 — strong near-dups, comfortably inside the 0.9
threshold; 0.05-sigma put the planted cosines ON the threshold and
measured the threshold boundary, not recall), ids offset by CLONE_OFF.

Index knobs (r6, VERDICT item 2): the probe passes NO explicit knobs —
every entry point scale-derives its defaults from the corpus row count
(similarity.derived_ivf_knobs: k ~ sqrt(n)/8, nprobe k/8, pq_k 256 above
10^5 vectors, refine 40 with 256-entry books), so this run certifies the
configuration a naive caller gets. The old fixture constants (k=16,
nprobe=4, pq_k=16, refine=12) measured recall 0.2-0.8 at 10^5+ and
survive only as small-corpus floors.

r7 (VERDICT item 6) — one more decade: at n_base > EXACT_GEMM_MAX the
exact all-pairs GEMM leg is SKIPPED (it is O(n^2): the measured ~700 s at
10^6 extrapolates to ~19 h at 10^7 on this box — which is itself the
crossover evidence) and ground truth comes from the construction instead:
the planted clones at cos~0.97 are known exactly, and the kNN oracle is
the exact linear scan (O(n) per query — the 'sampled query set' form of
exactness that stays tractable at any n). One honesty note at 10^7:
isotropic random pairs above 0.9 are ~7.2 sigma, expected count ~= C(n,2)
* 3e-13 ~= 15 at n=10^7 (vs 0.15 at 10^6), so a few non-planted returned
pairs are genuine over-threshold neighbors, NOT false positives — every
returned pair's cosine is verified exactly inside the candidate stage.

Usage: python tools/ann_scale_probe.py [n_base]   (default 1_000_000)
Output: one JSON line; recorded in SCALE.md §ANN and BENCH notes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

DIR = "/tmp/slr_ann1m"
MARKER = os.path.join(DIR, "_SLR_BUILD_OK")
INDEX_DIR = "/tmp/slr_ann1m_index"
DIM = 64
N_PLANTED = 500
CLONE_OFF = 1_500_000
PROBE_THRESHOLD = 0.9
# past this corpus size the O(n^2) exact dedup leg is skipped (19 h at
# 10^7 by quadratic extrapolation of the measured 1M run) and planted
# pairs serve as ground truth; the kNN oracle stays exact (linear scan)
EXACT_GEMM_MAX = 2_000_000


def _stage_for(n_base: int) -> None:
    """Keep the 1M artifact's staging paths stable; larger corpora get
    their own staging dir AND a clone-id offset past the base range."""
    global DIR, MARKER, INDEX_DIR, CLONE_OFF
    if n_base > 1_000_000:
        DIR = f"/tmp/slr_ann{n_base // 1_000_000}m"
        MARKER = os.path.join(DIR, "_SLR_BUILD_OK")
        INDEX_DIR = DIR + "_index"
        CLONE_OFF = max(CLONE_OFF, n_base)


def build(spark, n_base: int) -> None:
    if os.path.exists(MARKER):
        return
    import numpy as np
    import pandas as pd

    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR, exist_ok=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            # seed per contiguous chunk so generation is deterministic
            # regardless of partitioning
            rng = np.random.default_rng(int(ids[0]) + 977)
            m = rng.standard_normal((len(ids), DIM))
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [r.astype(np.float32) for r in m],
                "label": (ids % 10).astype("int32"),
            })

    # r7: stage the base corpus to parquet BEFORE deriving clones. The
    # previous form (gen-mapInPandas -> filter -> clone-mapInPandas fused
    # into ONE task) chains two Python runners through the JVM; at 10^7
    # rows the chained runner deadlocked (task thread in
    # writeAdditionalInputToPythonWorker's selector, both Python workers
    # blocked on read — reproduced, jstack'd, and killed after 7 idle
    # minutes). A parquet barrier keeps every task to a single Python
    # stage, which is also the honest 100 TB shape (generate once, derive
    # from storage).
    base_tmp = os.path.join(DIR, "_base_stage")
    (spark.range(0, n_base, numPartitions=32)
     .mapInPandas(gen, schema="vec_id long, "
                              "embedding array<float>, label int")
     .write.mode("overwrite").parquet(base_tmp))
    base = spark.read.parquet(base_tmp)

    def clone(batches):
        for pdf in batches:
            rows = {"vec_id": [], "embedding": [], "label": []}
            for vid, emb, lab in zip(pdf["vec_id"], pdf["embedding"],
                                     pdf["label"]):
                rng = np.random.default_rng(int(vid) + 31337)
                v = np.asarray(emb, dtype=np.float64)
                v = v + 0.03 * rng.standard_normal(DIM)
                v /= np.linalg.norm(v)
                rows["vec_id"].append(int(vid) + CLONE_OFF)
                rows["embedding"].append(v.astype(np.float32))
                rows["label"].append(int(lab))
            yield pd.DataFrame(rows)

    clones = (base.where(F.col("vec_id") < N_PLANTED)
              .mapInPandas(clone, schema="vec_id long, "
                                         "embedding array<float>, label int"))
    (base.unionByName(clones).repartition(32)
     .write.mode("overwrite").parquet(os.path.join(DIR, "embeddings.parquet")))
    shutil.rmtree(base_tmp, ignore_errors=True)
    with open(MARKER, "w") as fh:
        fh.write("ok")
    print(f"staged {n_base} embeddings", file=sys.stderr)


def timed(fn, n: int = 1):
    best, out = None, None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3), out


def main() -> None:
    from service_level_reporting_spark.operators import similarity as SIM

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    _stage_for(n_base)
    spark = get_spark(app_name="slr-ann-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, n_base)
    out = {"metric": "ann_scale_probe", "n_vectors": n_base + N_PLANTED,
           "dim": DIM, "threshold": PROBE_THRESHOLD}

    planted = {(i, i + CLONE_OFF) for i in range(N_PLANTED)}

    # --- near-dup pair search: ANN (bucketed) vs exact (blocked GEMM) ----
    ann_sec, ann_rows = timed(lambda: SIM.dedup_embedding_ann(
        spark, DIR, threshold=PROBE_THRESHOLD).collect())
    ann_pairs = {(r["vec_a"], r["vec_b"]) for r in ann_rows}
    out["dedup_ann"] = {
        "sec": ann_sec, "pairs": len(ann_pairs),
        "planted_recall": round(
            len(ann_pairs & planted) / len(planted), 4),
        "non_planted_pairs": len(ann_pairs - planted),
    }
    print(f"ann dedup: {out['dedup_ann']}", file=sys.stderr)

    # --- SemDeDup (r7 s2): cluster-local pairwise at its DESIGN point ----
    # (planted clones at cos~0.97 against threshold 0.9 — the paper's
    # high-similarity regime, unlike the fixture's 0.5-threshold pairs)
    sem_sec, sem_rows = timed(lambda: SIM.dedup_semantic_pairs(
        spark, DIR, threshold=PROBE_THRESHOLD).collect())
    sem_pairs = {(r["vec_a"], r["vec_b"]) for r in sem_rows}
    out["dedup_semantic"] = {
        "sec": sem_sec, "pairs": len(sem_pairs),
        "planted_recall": round(
            len(sem_pairs & planted) / len(planted), 4),
        "non_planted_pairs": len(sem_pairs - planted),
    }
    print(f"semdedup: {out['dedup_semantic']}", file=sys.stderr)

    if n_base <= EXACT_GEMM_MAX:
        exact_sec, exact_rows = timed(lambda: SIM.dedup_embedding_cosine(
            spark, DIR, threshold=PROBE_THRESHOLD).collect())
        exact_pairs = {(r["vec_a"], r["vec_b"]) for r in exact_rows}
        out["dedup_exact_gemm"] = {
            "sec": exact_sec, "pairs": len(exact_pairs),
            "planted_recall": round(
                len(exact_pairs & planted) / len(planted), 4),
            "ann_recall_vs_exact": round(
                len(ann_pairs & exact_pairs) / max(1, len(exact_pairs)), 4),
            "speedup_ann": round(exact_sec / ann_sec, 2) if ann_sec else None,
        }
        print(f"exact dedup: {out['dedup_exact_gemm']}", file=sys.stderr)
    else:
        # O(n^2) leg skipped by design; the quadratic extrapolation of the
        # measured 1M run IS the crossover claim at this decade
        out["dedup_exact_gemm"] = {
            "skipped": f"n_base {n_base} > {EXACT_GEMM_MAX}: exact "
                       "all-pairs GEMM is O(n^2) (~19 h extrapolated at "
                       "10^7 from the measured ~700 s at 10^6); planted "
                       "clones are the ground truth at this scale"}

    # --- KNN: exact scan vs persisted-index IVF / IVF-PQ -----------------
    ex_sec, ex_rows = timed(
        lambda: SIM.similarity_knn_query(spark, DIR).collect(), n=3)
    exact_ids = [r["vec_id"] for r in ex_rows]
    out["knn_exact"] = {"sec": ex_sec, "top": exact_ids}

    # r6 (VERDICT item 2): the probe now runs the DEFAULT path end to end
    # — no explicit knobs anywhere; save/load/query all derive from the
    # corpus row count via SIM.derived_ivf_knobs. The derived values are
    # recorded so the artifact shows what the defaults resolved to.
    n_tot = n_base + N_PLANTED
    out["index_knobs"] = dict(SIM.derived_ivf_knobs(n_tot),
                              derived="default_path")
    build_sec, _ = timed(
        lambda: SIM.save_ivf_index(spark, DIR, INDEX_DIR))
    load_sec, idx = timed(lambda: SIM.load_ivf_index(spark, INDEX_DIR))
    ivf_sec, ivf_rows = timed(
        lambda: SIM.similarity_knn_ivf(spark, DIR, index=idx).collect(),
        n=3)
    pq_sec, pq_rows = timed(
        lambda: SIM.similarity_knn_ivf_pq(spark, DIR, index=idx).collect(),
        n=3)
    k = len(exact_ids)
    out["knn_ivf"] = {
        "index_build_write_sec": build_sec, "index_load_sec": load_sec,
        "sec": ivf_sec,
        "recall_at_k": round(len(set(exact_ids)
                                 & {r["vec_id"] for r in ivf_rows}) / k, 4)}
    out["knn_ivf_pq"] = {
        "sec": pq_sec,
        "recall_at_k": round(len(set(exact_ids)
                                 & {r["vec_id"] for r in pq_rows}) / k, 4)}
    print(f"knn: exact {ex_sec}s ivf {ivf_sec}s pq {pq_sec}s",
          file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
