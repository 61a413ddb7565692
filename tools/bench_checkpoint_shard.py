"""Measure the r10 sharded checkpoint against the r9 single-JSON form on
a synthetic 100k-add commit log (VERDICT #2's done-criterion).

Fabricates a txlog table whose commits carry realistic add-actions
(typed multi-column stats like real writes record) through the PUBLIC
commit() API — pure Python, no Spark needed — then times, cold-handle:

  - metadata walk (_txn_map + constraints): the per-table-open cost every
    reader pays. Sharded checkpoints read the small meta JSON only; the
    legacy form JSON-parsed the full add-list payload first.
  - snapshot resolution (_resolve): cold (parts parsed) and warm (the
    per-version cache).
  - checkpoint write.

Usage: python tools/bench_checkpoint_shard.py [n_files] — writes
numbers to stdout; SCALE.md records the 100k run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_level_reporting_spark.sources.txlog import TxLogTable


def fabricate(path: str, n_files: int, adds_per_commit: int = 10_000):
    t = TxLogTable(path, key_cols=["k"], stats_col="k")
    stats = {f"c{i}": {"min": "a" * 8, "max": "z" * 8} for i in range(8)}
    v = 0
    written = 0
    while written < n_files:
        batch = min(adds_per_commit, n_files - written)
        actions = [{"add": {
            "path": f"data/{uuid.uuid4().hex}/part-{written + i:08d}.parquet",
            "rows": 50_000, "min": "a" * 8, "max": "z" * 8,
            "stats": stats}} for i in range(batch)]
        t.commit(actions, v, op="append",
                 txn={"writer": f"w{v % 7}", "batch": v})
        written += batch
        v += 1
    # force a checkpoint at the head so resolution seeds from it
    tw0 = time.perf_counter()
    t._write_checkpoint(v - 1)
    ckpt_write = time.perf_counter() - tw0
    return t, v - 1, ckpt_write


def timeit(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def to_legacy_inline(t: TxLogTable, v: int) -> None:
    """Rewrite the sharded checkpoint at v into the r9 single-JSON form."""
    ck = os.path.join(t.log_dir, f"{v:020d}.checkpoint.json")
    with open(ck) as fh:
        meta = json.load(fh)
    files = t._ckpt_files(meta)
    meta.pop("files_parts", None)
    meta.pop("n_files", None)
    meta["files"] = files
    with open(ck, "w") as fh:
        json.dump(meta, fh)
    for f in list(os.listdir(t.log_dir)):
        if f.endswith(".checkpoint.part"):
            os.remove(os.path.join(t.log_dir, f))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    base = os.path.join(tempfile.gettempdir(),
                        f"slr_ckpt_bench_{uuid.uuid4().hex[:8]}")
    try:
        t, v, ckpt_write = fabricate(base, n)
        meta_path = os.path.join(t.log_dir, f"{v:020d}.checkpoint.json")
        parts = [f for f in os.listdir(t.log_dir)
                 if f.endswith(".checkpoint.part")]
        out = {"n_files": n, "head_version": v,
               "sharded_meta_bytes": os.path.getsize(meta_path),
               "sharded_parts": len(parts),
               "sharded_payload_bytes": sum(
                   os.path.getsize(os.path.join(t.log_dir, f))
                   for f in parts),
               "sharded_ckpt_write_sec": round(ckpt_write, 4)}

        def fresh():
            return TxLogTable.open(base)

        out["sharded_meta_walk_sec"] = round(timeit(
            lambda: (fresh()._txn_map(), )), 4)
        out["sharded_resolve_cold_sec"] = round(timeit(
            lambda: fresh()._resolve()), 4)
        h = fresh()
        h._resolve()
        out["sharded_resolve_warm_sec"] = round(timeit(
            lambda: h._resolve(), 5), 6)

        to_legacy_inline(t, v)
        out["legacy_meta_bytes"] = os.path.getsize(meta_path)
        out["legacy_meta_walk_sec"] = round(timeit(
            lambda: (fresh()._txn_map(), )), 4)
        out["legacy_resolve_cold_sec"] = round(timeit(
            lambda: fresh()._resolve()), 4)
        out["meta_walk_speedup"] = round(
            out["legacy_meta_walk_sec"]
            / max(out["sharded_meta_walk_sec"], 1e-9), 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
