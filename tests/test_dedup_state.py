"""Incremental TEXT-dedup state (r10, VERDICT #3): fold == rebuild on
planted append / delete / update increments — state rows, dedup PAIRS,
and cluster LABELS all identical between the CDF-folded state and a
from-scratch rebuild over the final snapshot; folding is O(delta)
(signatures computed only for changed docs); sync is idempotent."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections import Counter

import pytest
from pyspark.sql import functions as F

from service_level_reporting_spark.operators import dedup_state as DS
from service_level_reporting_spark.sources.txlog import TxLogTable


@pytest.fixture()
def base_path():
    p = os.path.join(tempfile.gettempdir(),
                     f"slr_dstate_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _corpus_rows(start, n, stem="the quick brown fox jumps over"):
    """Docs with controlled overlap: ids in one clone family share the
    exact text; 'near' ids share a long stem with one word swapped
    (high shingle overlap); the rest are distinct."""
    rows = []
    for i in range(start, start + n):
        if i % 7 == 0:
            text = f"{stem} the lazy dog again and again and again"
        elif i % 7 == 1:
            text = (f"{stem} the lazy dog again and again and again "
                    f"variant")
        elif i % 7 == 2:
            text = "tiny"                       # <3 tokens: exact-only
        else:
            text = f"{stem} unique tail {i} with words {i * 3} {i * 7}"
        rows.append((i, text))
    return rows


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1)


def _ms_pairs(df):
    return Counter((r["method"], r["doc_a"], r["doc_b"], r["score"])
                   for r in df.collect())


def _ms_labels(df):
    return {(r["doc_id"], r["label"]) for r in df.collect()}


def _ms_state(spark, path):
    s = TxLogTable.open(path).read(spark)
    return Counter(
        (r["doc_id"], r["h"],
         tuple(r["mh"]) if r["mh"] is not None else None,
         tuple(r["bands"]) if r["bands"] is not None else None)
        for r in s.collect())


def test_fold_equals_rebuild_over_increments(spark, base_path):
    corpus = os.path.join(base_path, "corpus")
    folded = os.path.join(base_path, "folded")
    fresh = os.path.join(base_path, "fresh")

    t = TxLogTable(corpus, key_cols=["doc_id"], stats_col="text")
    t.append(_frame(spark, _corpus_rows(0, 20)))
    res0 = DS.build_dedup_state(spark, corpus, folded)
    assert res0["mode"] == "rebuild" and res0["signed"] == 20

    # increment 1: append (includes a new clone of an existing family)
    t.append(_frame(spark, _corpus_rows(20, 8)))
    r1 = DS.dedup_state_sync(spark, corpus, folded)
    assert r1["mode"] == "fold"
    assert r1["signed"] == 8 and r1["deleted"] == 0   # O(delta), proven
    # increment 2: delete a clone member + a unique doc
    t.delete(F.col("doc_id").isin([7, 5]))
    r2 = DS.dedup_state_sync(spark, corpus, folded)
    assert r2["mode"] == "fold"
    assert r2["signed"] == 0 and r2["deleted"] == 2
    # increment 3: UPDATE (delete+insert via the net feed): doc 10 gets
    # a clone family's text — it must JOIN that family's cluster
    t.merge(_frame(spark, [(10, _corpus_rows(0, 1)[0][1])]))
    r3 = DS.dedup_state_sync(spark, corpus, folded)
    assert r3["mode"] == "fold"
    assert r3["signed"] == 1 and r3["deleted"] == 0   # upsert, not del

    # idempotent: same corpus version -> noop
    assert DS.dedup_state_sync(spark, corpus, folded)["mode"] == "noop"

    # rebuild from the FINAL snapshot: state / pairs / labels identical
    DS.build_dedup_state(spark, corpus, fresh)
    assert _ms_state(spark, folded) == _ms_state(spark, fresh)
    pf = _ms_pairs(DS.dedup_pairs_from_state(spark, folded))
    pr = _ms_pairs(DS.dedup_pairs_from_state(spark, fresh))
    assert pf == pr and len(pf) > 0
    lf = _ms_labels(DS.dedup_labels_from_state(spark, folded))
    lr = _ms_labels(DS.dedup_labels_from_state(spark, fresh))
    assert lf == lr

    # semantic spot checks: deleted docs carry no state and no pairs
    ids_in_state = {d for d, *_ in _ms_state(spark, folded)}
    assert 7 not in ids_in_state and 5 not in ids_in_state
    assert not any(7 in (a, b) or 5 in (a, b)
                   for _, a, b, _s in pf)
    # doc 10 joined the clone family of doc 0 (same text after update)
    lab = dict(lf)
    assert lab[10] == lab[0]
    # the <3-token docs participate: exact pairs among identical 'tiny'
    tiny_ids = sorted(d for d, t_ in _corpus_rows(0, 20) + _corpus_rows(
        20, 8) if t_ == "tiny" and d not in (5, 7))
    if len(tiny_ids) >= 2:
        assert ("exact", tiny_ids[0], tiny_ids[1], 1.0) in pf


def test_near_dup_detected_through_banding(spark, base_path):
    """The stem-sharing variant pair (one word appended on a long common
    stem) must surface as a minhash pair through the band buckets with
    an estimated score >= threshold — and NOT via exact hashes."""
    corpus = os.path.join(base_path, "corpus")
    state = os.path.join(base_path, "state")
    t = TxLogTable(corpus, key_cols=["doc_id"], stats_col="text")
    stem = " ".join(f"w{i}" for i in range(40))
    t.append(_frame(spark, [(1, stem), (2, stem + " extra")]))
    DS.build_dedup_state(spark, corpus, state)
    pairs = _ms_pairs(DS.dedup_pairs_from_state(spark, state))
    near = [(m, a, b, s) for (m, a, b, s) in pairs
            if m == "minhash" and (a, b) == (1, 2)]
    assert near and near[0][3] >= 0.8
    assert not any(m == "exact" for (m, a, b, s) in pairs)
    labels = dict(_ms_labels(DS.dedup_labels_from_state(spark, state)))
    assert labels[1] == labels[2]
