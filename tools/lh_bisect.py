"""r12 lakehouse-regression bisect (VERDICT r11 #1): BENCH_r11's
lakehouse medians read ~2x BENCH_r10's (append 0.78->1.66, MERGE
3.49->6.11, MoR delete 0.54->1.44, CDF fold 2.19->6.93 at 2M rows) —
but the two numbers come from DIFFERENT measurement windows on a
shared box whose weather swings DuckDB's own medians 7.7x between
windows (BENCH_SF10.json). This tool answers "code or weather" the
only way that works here: run r10 code and r11 code INTERLEAVED in
one window, one subprocess per repetition (fresh JVM each — exactly
the bench's fresh-table-per-rep discipline), alternating
r10/r11/r10/r11 so both see identical conditions.

Structural prior it also verifies: a bench rep commits versions 0..2
on a fresh table with CHECKPOINT_EVERY=10, so NO checkpoint is ever
written — the r11 parquet-checkpoint full-parse suspect cannot touch
these numbers (each rep reports its table's checkpoint-part count;
expect 0). The per-commit fingerprint reads (constraints/
generated_columns at the pinned base) are O(3-commit log) driver
JSON reads — the A/B decides whether they (or anything else in the
r11 diff) cost wall time.

Usage: python tools/lh_bisect.py [pairs]   (default 7)
Writes BENCH_LH_BISECT.json at the repo root.
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10_SHA = "4b56ed2"          # round-10 final state (verdict commit)
R10_WT = os.path.join(REPO, ".r10_worktree")
OPS = ("append", "merge_into", "delete_mor", "changes_fold")


def ensure_worktree() -> None:
    if os.path.isdir(os.path.join(R10_WT, "service_level_reporting_spark")):
        return
    subprocess.run(["git", "worktree", "add", "--detach", R10_WT, R10_SHA],
                   cwd=REPO, check=True)


def one_rep(root: str) -> dict:
    env = dict(os.environ, PYTHONPATH=root)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lh_one_rep.py")],
        env=env, capture_output=True, text=True, timeout=900)
    for line in p.stdout.splitlines():
        if line.startswith("LHREP "):
            return json.loads(line[6:])
    raise RuntimeError(f"no LHREP line from {root}:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    ensure_worktree()
    runs = {"r10": {op: [] for op in OPS}, "r11": {op: [] for op in OPS}}
    ckpt_parts = set()
    for i in range(pairs):
        for tag, root in (("r10", R10_WT), ("r11", REPO)):
            rep = one_rep(root)
            assert root in rep["root"], (tag, rep["root"])
            ckpt_parts.add(rep.get("ckpt_parts", -1))
            for op in OPS:
                runs[tag][op].append(round(rep[op], 4))
            print(f"pair {i} {tag}: " +
                  " ".join(f"{op}={rep[op]:.2f}" for op in OPS),
                  flush=True)
    med = {tag: {op: round(statistics.median(a), 4)
                 for op, a in per.items()} for tag, per in runs.items()}
    out = {
        "pairs": pairs,
        "rows": int(os.environ.get("SPARK_GRAFT_LH_ROWS", "2000000")),
        "checkpoint_parts_seen": sorted(ckpt_parts),
        "runs": runs,
        "medians": med,
        "ratio_r11_over_r10": {
            op: round(med["r11"][op] / med["r10"][op], 3) for op in OPS},
        "mins_ratio": {
            op: round(min(runs["r11"][op]) / min(runs["r10"][op]), 3)
            for op in OPS},
    }
    with open(os.path.join(REPO, "BENCH_LH_BISECT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"medians": med,
                      "ratio_r11_over_r10": out["ratio_r11_over_r10"],
                      "checkpoint_parts_seen": out["checkpoint_parts_seen"]}))


if __name__ == "__main__":
    main()
