"""Learned-BPE tokenizer: hand-computed known answers, determinism, and
Spark-UDF parity with the driver-side encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigtrees_spark.functions.bpe import (
    encode_word,
    fit_bpe,
    make_bpe_count_udf,
    train_bpe,
    with_bpe_token_counts,
)


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
