"""Distributed BPE trainer/encoder semantics (rows-only registry row —
the pure-Python textbook reference is the oracle, per the driver's design
for non-SQL-expressible iterative ops)."""

import pytest

from service_level_reporting_spark.operators import bpe

from .conftest import SF_DIR_001

CORPUS = [
    "the cat sat on the mat",
    "the hat of the cat",
    "that cat, that hat!",
    "mats and hats and cats",
    "lower lowest newer newest wider widest",
] * 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_k1_matches_textbook_reference(spark, docs):
    """batch_k=1 must reproduce the sequential Sennrich merge sequence
    EXACTLY — same pairs, same order, same frequencies."""
    ref = bpe.bpe_reference_train(CORPUS, 15)
    got = bpe.bpe_train(spark, docs, n_merges=15, batch_k=1)
    assert got == ref
    assert len(got) == 15


def test_batched_merges_are_compatible_and_deterministic(spark, docs):
    """batch_k>1 (the scale mode) may reorder merges but every batch must
    be symbol-disjoint (application order independence) and the result
    reproducible run-to-run."""
    got = bpe.bpe_train(spark, docs, n_merges=16, batch_k=4)
    assert got == bpe.bpe_train(spark, docs, n_merges=16, batch_k=4)
    assert len(got) == 16
    ranks = [r for r, *_ in got]
    assert ranks == list(range(16))
    # every learned merge concatenates its own pair
    assert all(m == a + b for _, a, b, m, _f in got)


def test_compatible_top_k_filter():
    """('t','h') must block ('h','e') within one batch — they overlap in
    'the' so application order would change the result."""
    rows = [
        {"a": "t", "b": "h", "pair_freq": 10},
        {"a": "h", "b": "e", "pair_freq": 9},   # shares 'h' -> blocked
        {"a": "a", "b": "n", "pair_freq": 8},
        {"a": "t", "b": "h", "pair_freq": 8},   # duplicate symbols -> blocked
        {"a": "x", "b": "y", "pair_freq": 7},
    ]
    picked = bpe._compatible_top_k(rows, 3)
    assert picked == [("t", "h", 10), ("a", "n", 8), ("x", "y", 7)]


def test_encode_roundtrip_and_compression(spark, docs):
    """Greedy rank-order encoding must (a) losslessly reconstruct the
    pretoken stream (concatenating tokens and stripping EOW = the word)
    and (b) compress: more merges => fewer tokens, never below 1/word."""
    merges = bpe.bpe_train(spark, docs, n_merges=20, batch_k=4)
    ranks = {(a, b): r for r, a, b, _m, _f in merges}
    for word in ("the", "cat", "newest", "unseen", "zzz"):
        toks = bpe.bpe_encode_word(word, ranks)
        assert "".join(toks).replace(bpe.EOW, "") == word
        assert 1 <= len(toks) <= len(word) + 1
    enc = {r["doc_id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
    enc0 = {r["doc_id"]: r
            for r in bpe.bpe_encode(docs, []).collect()}   # no merges
    assert len(enc) == len(CORPUS)
    for i in enc:
        assert enc[i]["n_pretokens"] == enc0[i]["n_pretokens"]
        assert (enc[i]["n_pretokens"] <= enc[i]["n_bpe_tokens"]
                <= enc0[i]["n_bpe_tokens"])


def test_suite_shape(spark):
    """Registry row: 40 merge rows in rank order + 3 labeled corpus stats;
    stats must be arithmetically consistent."""
    rows = bpe.bpe_tokenizer_suite(spark, SF_DIR_001).collect()
    merges = [r for r in rows if r["part"] == "merge"]
    stats = {r["lhs"]: r["n"] for r in rows if r["part"] == "encode_stat"}
    assert len(merges) == 40
    assert [r["rank"] for r in merges] == list(range(40))
    assert set(stats) == {"total_bpe_tokens", "total_pretokens",
                          "bpe_per_pretoken_x1e6"}
    assert stats["total_bpe_tokens"] >= stats["total_pretokens"] > 0
    assert stats["bpe_per_pretoken_x1e6"] == round(
        stats["total_bpe_tokens"] / stats["total_pretokens"] * 1e6, 0)


def test_driver_path_matches_distributed_path(spark, docs):
    """r14: the small-vocab driver-side trainer must learn the IDENTICAL
    merge table as the distributed pass loop (same batched algorithm,
    same candidate window, same tie-breaks) — for the textbook batch_k=1
    and the scale batch_k=8 shapes."""
    for bk in (1, 8):
        via_driver = bpe.bpe_train(spark, docs, n_merges=16, batch_k=bk)
        via_spark = bpe.bpe_train(spark, docs, n_merges=16, batch_k=bk,
                                  driver_vocab_cap=0)  # force distributed
        assert via_driver == via_spark


def test_driver_path_on_real_corpus(spark):
    """Same equivalence over the sf0.001 documents table (exercises the
    regex pretokenizer + real punctuation through both paths)."""
    from service_level_reporting_spark.tables import load_tables

    d = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    assert (bpe.bpe_train(spark, d, n_merges=12, batch_k=4)
            == bpe.bpe_train(spark, d, n_merges=12, batch_k=4,
                             driver_vocab_cap=0))
