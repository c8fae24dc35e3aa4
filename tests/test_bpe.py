"""Byte-level BPE tokenizer (functions/bpe.py): exact round trips over
arbitrary UTF-8, deterministic training, merge-replay correctness,
compression on repetitive text, and the distributed encode path."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.functions.bpe import (
    bpe_decode,
    bpe_encode,
    tokenize_corpus,
    train_bpe,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the streaming stream streams the streamed streams",
    "sparks spark sparking sparked sparkly",
    "ünïcödé and emoji 🚀 survive byte-level tokenization ✓",
]


@pytest.fixture(scope="module")
def merges():
    return train_bpe(CORPUS, n_merges=100)


def test_training_is_deterministic(merges):
    assert train_bpe(CORPUS, n_merges=100) == merges
    assert train_bpe(list(reversed(CORPUS)), n_merges=100) == merges


def test_roundtrip_on_training_and_unseen_text(merges):
    for t in CORPUS + ["wholly unseen θ text", "", "  ", "a", "🚀🚀🚀"]:
        assert bpe_decode(bpe_encode(t, merges)) == t


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_is_exact_for_any_unicode(merges, s):
    """Byte-level alphabet => lossless on EVERY string, including
    surrogara-free astral chars, control bytes, mixed scripts."""
    assert bpe_decode(bpe_encode(s, merges)) == s


def test_merges_compress_repetitive_text(merges):
    t = "the stream the stream the stream the stream"
    toks = bpe_encode(t, merges)
    assert len(toks) < len(t.encode("utf-8")) * 0.6


def test_merges_never_lengthen(merges):
    for t in CORPUS + ["zzzz completely out of domain 12345"]:
        assert len(bpe_encode(t, merges)) <= len(t.encode("utf-8"))


def test_merge_ranks_apply_lowest_first():
    """Encoding must replay merges in RANK order, not left-to-right
    greedily: construct merges where order changes the outcome."""
    merges = [(b"b", b"c"), (b"a", b"b")]
    # rank 0 (b+c) must win inside "abc": a, bc — not ab, c
    assert bpe_encode("abc", merges) == [b"a", b"bc"]


def test_empty_training_corpus():
    assert train_bpe([], n_merges=10) == []
    assert bpe_encode("text", []) == [bytes([b]) for b in b"text"]


def test_tokenize_corpus_distributed(spark, merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)] + [(99, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tokenize_corpus(
            df, "text", merges,
            "doc_id long, n_tokens long, n_bytes long, roundtrip_ok boolean",
        ).collect()
    }
    assert all(r["roundtrip_ok"] for r in out.values())
    assert out[99]["n_tokens"] == 0  # null text treated as empty
    for i, t in enumerate(CORPUS):
        assert out[i]["n_bytes"] == len(t.encode("utf-8"))
        assert out[i]["n_tokens"] <= out[i]["n_bytes"]


# ------------------------------------------------- distributed training


def test_train_bpe_spark_identical_merge_list(spark, merges):
    """The distributed trainer (Spark pair-count aggregate + Catalyst
    fold merge application) must reproduce the driver trainer's merge
    list EXACTLY — same counts, same lowest-pair tie-break — on the
    same corpus.  40 merges keeps the per-round job count test-sized;
    the prefix property (merge k is independent of n_merges) makes the
    comparison against the driver's first 40 exact."""
    from starryskyqueryengine_spark.functions.bpe import train_bpe_spark

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe_spark(df, "text", n_merges=40)
    assert got == merges[:40]


def test_train_bpe_spark_overlapping_pair_fold(spark):
    """'aaaa' with merge (a,a): the fold must yield [aa, aa], never a
    greedy re-merge against the just-formed token — pins the
    accumulator-tail semantics of the Catalyst fold."""
    from starryskyqueryengine_spark.functions.bpe import train_bpe_spark

    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = train_bpe_spark(df, "text", n_merges=3)
    assert got == train_bpe(["aaaa aaaa aaaa"], n_merges=3)
    assert got[0] == (b"a", b"a")
