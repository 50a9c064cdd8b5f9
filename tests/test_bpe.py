"""Learned-BPE tokenizer: hand-computed known answers, determinism, and
Spark-UDF parity with the driver-side encoder."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigtrees_spark.functions.bpe import (
    END,
    encode_word,
    fit_bpe,
    make_bpe_count_udf,
    train_bpe,
    with_bpe_token_counts,
)

_MERGES = train_bpe(
    ["the cat sat on the mat " * 3, "that theme then there " * 2, "aa ab aba abab " * 4],
    n_merges=120,
)
_RANKS = {p: i for i, p in enumerate(_MERGES)}


@given(st.text(alphabet="abcdehmnst", min_size=0, max_size=16))
@settings(max_examples=200, deadline=None)
def test_encode_word_lossless_and_bounded(word):
    """BPE invariants for ANY word under ANY merge table: the pieces
    concatenate back to word+END (merges never drop or reorder bytes), and
    the piece count is within [1, len(word)+1]."""
    pieces = encode_word(word, _RANKS)
    assert "".join(pieces) == word + END
    assert 1 <= len(pieces) <= len(word) + 1


@given(st.lists(st.text(alphabet="abcdehmnst ", max_size=30), max_size=8))
@settings(max_examples=50, deadline=None)
def test_train_bpe_merges_are_valid(texts):
    """Training on arbitrary corpora yields well-formed merges: no pair
    merges across the end-of-word sentinel's right side, ranks unique."""
    merges = train_bpe(texts, n_merges=30)
    assert len(set(merges)) == len(merges)
    for a, b in merges:
        assert not a.endswith(END)  # END can only terminate the right side


def test_train_bpe_known_answer():
    # words: aa x3, ab x1.  Pair counts round 1: (a,a)=3, (a,</w>)=3,
    # (a,b)=1, (b,</w>)=1.  Tie (3,3) breaks to the lexicographically
    # smaller pair ("a","</w>") ('<' sorts before 'a'); round 2 merges
    # ("a","a</w>"); remaining pairs have count 1 < min_pair_count -> stop.
    merges = train_bpe(["aa aa aa ab"])
    assert merges == [("a", "</w>"), ("a", "a</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("aa", ranks) == ["aa</w>"]
    assert encode_word("ab", ranks) == ["a", "b", "</w>"]
    assert encode_word("aab", ranks) == ["a", "a", "b", "</w>"]


def test_train_bpe_deterministic_and_compresses():
    texts = [f"the quick brown fox jumps over the lazy dog {i}" for i in range(50)]
    m1 = train_bpe(texts, n_merges=100)
    m2 = train_bpe(list(texts), n_merges=100)
    assert m1 == m2 and len(m1) > 10
    ranks = {p: i for i, p in enumerate(m1)}
    # a frequent word compresses to one piece; an unseen word stays chars+1
    assert len(encode_word("the", ranks)) == 1
    assert len(encode_word("zzqx", ranks)) == len("zzqx") + 1


def test_spark_udf_matches_driver_encoder(spark):
    rows = [
        ("u1", "the cat and the hat"),
        ("u2", ""),
        ("u3", None),
        ("u4", "unseenwordzz 123 the"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    merges = fit_bpe(df, sample_size=10, n_merges=50)
    out = {r.url: r.n_tokens_bpe_learned for r in with_bpe_token_counts(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    from bigtrees_spark.functions.bpe import WORD_RE

    for url, text in rows:
        expect = sum(len(encode_word(w, ranks)) for w in WORD_RE.findall((text or "").lower()))
        assert out[url] == expect
    assert out["u2"] == 0 and out["u3"] == 0


def test_fit_bpe_sample_layout_invariant(spark):
    """fit_bpe's training sample is hash-ordered, so the learned merges must
    be identical across partition layouts AND runs — not just within one run
    (ADVICE r02: sample().limit() was layout-dependent).  sample_size < corpus
    makes the test sensitive to WHICH rows are picked."""
    df = spark.range(300).select(
        F.concat(F.lit("text body word variant "), F.col("id").cast("string")).alias("text")
    )
    m1 = fit_bpe(df, sample_size=50, n_merges=40)
    m2 = fit_bpe(df.repartition(11).sortWithinPartitions(F.desc("text")), sample_size=50, n_merges=40)
    assert m1 == m2 and len(m1) > 0


def test_udf_deterministic_across_partitioning(spark):
    df = spark.range(200).select(
        F.format_string("d%03d", "id").alias("url"),
        F.concat(F.lit("doc words repeat repeat number "), F.col("id").cast("string")).alias("text"),
    )
    merges = fit_bpe(df, n_merges=80)
    a = {r.url: r.n_tokens_bpe_learned for r in with_bpe_token_counts(df, merges).collect()}
    b = {
        r.url: r.n_tokens_bpe_learned
        for r in with_bpe_token_counts(df.repartition(7), merges).collect()
    }
    assert a == b
