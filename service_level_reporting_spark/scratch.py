"""Per-application /tmp scratch paths with stale-sibling pruning.

ADVICE r3: salting every scratch path with applicationId (the r2 fix for
concurrent-process races) made each pytest/sweep/bench PROCESS leave behind
its own full staged copy of events/embeddings chunks, sink outputs, and sf1
stage — unbounded /tmp growth, where the earlier unsalted scheme reused one
dir. This module centralizes the path construction and, on each new scratch
allocation, prunes sibling dirs with the same stem that belong to a
DIFFERENT application AND have gone untouched for STALE_AGE_SEC — old
enough that any process that created them is gone (the test/bench processes
these dirs serve run minutes, not hours). A pruned live dir would only cost
that app a re-stage (every staging site is mtime-marker idempotent), never
a wrong result; the age gate makes even that unlikely.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

STALE_AGE_SEC = 2 * 3600


def prune_stale_siblings(stem: str, keep: str) -> None:
    """Remove {tmp}/{stem}_* dirs other than ``keep`` older than the age
    gate. Best-effort: a dir vanishing mid-walk is fine."""
    root = tempfile.gettempdir()
    try:
        names = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith(stem + "_") or name == os.path.basename(keep):
            continue
        path = os.path.join(root, name)
        try:
            if os.path.isdir(path) and now - os.path.getmtime(path) > STALE_AGE_SEC:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass


def app_scratch_dir(spark: SparkSession, stem: str) -> str:
    """{tmp}/{stem}_{applicationId} — stable within one app (legs that
    reuse state across calls still find it), unique across concurrent
    processes, and self-cleaning: allocation prunes stale same-stem dirs
    left by finished apps."""
    app = spark.sparkContext.applicationId
    target = os.path.join(tempfile.gettempdir(), f"{stem}_{app}")
    prune_stale_siblings(stem, keep=target)
    return target
