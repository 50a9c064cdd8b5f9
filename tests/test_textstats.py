"""Text-analysis operators: token counts, quality, language-ID."""

from __future__ import annotations

import pytest

from bigtrees_spark.operators.textstats import doc_profile, with_lang_id, with_quality, with_token_counts


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        ("u1", "The cat and the dog sat in the house for a while."),
        ("u2", "Der Hund und die Katze sind nicht mit der Maus auf dem Tisch."),
        ("u3", "El perro y la casa de que un gato por la ventana con pan."),
        ("u4", ""),
        ("u5", "   "),
        ("u6", "word"),
        ("u7", "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_token_counts(sample):
    got = {r.url: (r.n_words, r.n_tokens_bpe) for r in with_token_counts(sample).collect()}
    assert got["u1"][0] == 12
    assert got["u4"] == (0, 0)
    assert got["u5"] == (0, 0)
    assert got["u6"][0] == 1
    assert got["u6"][1] == 1  # 'word' -> one <=4-char piece
    assert got["u1"][1] >= got["u1"][0]  # BPE-ish >= word count


def test_quality(sample):
    got = {r.url: r for r in with_quality(sample).collect()}
    assert got["u1"].quality_ok
    assert not got["u4"].quality_ok          # too short
    assert not got["u7"].quality_ok          # all digits
    assert got["u1"].stopword_hits >= 4      # the/and/the/in/the/for/a
    assert 0.0 <= got["u1"].punct_ratio < 0.1


def test_lang_id(sample):
    got = {r.url: r.lang_guess for r in with_lang_id(sample).collect()}
    assert got["u1"] == "en"
    assert got["u2"] == "de"
    assert got["u3"] == "es"
    assert got["u4"] == "und"
    assert got["u6"] == "und"


def test_doc_profile_composes(sample):
    out = doc_profile(sample)
    cols = set(out.columns)
    assert {"n_words", "n_tokens_bpe", "n_chars", "quality_ok", "lang_guess"} <= cols
    assert out.count() == sample.count()


def test_repetition_signals(spark):
    from bigtrees_spark.operators.textstats import with_repetition

    rows = [
        (1, "unique one\nunique two\nunique one\nunique one"),  # 4 lines, 2 distinct
        (2, "spam spam spam spam"),                # words all dup; top bigram 3/3
        (3, "a b a b a"),                          # bigrams: ab ba ab ba -> top 2/4
        (4, "all words here differ totally"),      # no repetition
        (5, ""),                                   # empty -> all 0.0
        (6, "word"),                               # single word -> no bigrams
        (7, None),                                 # null text behaves as empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_repetition(df).collect()}
    assert got[1].dup_line_frac == pytest.approx(0.5)
    assert got[1].dup_word_frac == pytest.approx(5 / 8)  # 8 words, 3 distinct
    assert got[2].dup_word_frac == pytest.approx(0.75)
    assert got[2].top_bigram_frac == pytest.approx(1.0)
    assert got[3].dup_word_frac == pytest.approx(3 / 5)
    assert got[3].top_bigram_frac == pytest.approx(0.5)
    assert got[4].dup_word_frac == 0.0 and got[4].dup_line_frac == 0.0
    assert got[4].top_bigram_frac == pytest.approx(0.25)  # 4 bigrams all distinct
    for i in (5, 6, 7):
        assert got[i].dup_word_frac == 0.0
        assert got[i].top_bigram_frac == 0.0
    assert got[6].dup_line_frac == 0.0
    assert len(got) == 7  # left join keeps bigram-less docs


def test_whitespace_strip_semantics(spark):
    """Leading/trailing tabs and newlines must not create phantom empty-string
    words (ADVICE r04: F.trim strips ASCII spaces only).  n_words and
    dup_word_frac see the same word list the splitter intends."""
    from bigtrees_spark.operators.textstats import with_repetition

    rows = [
        (1, "\tfoo bar"),          # tab-led: 2 words, not 3
        (2, "foo bar\n"),          # newline-trailed: 2 words
        (3, " \t\n "),             # whitespace-only: 0 words
        (4, "\n\nfoo foo\t"),      # strip both ends: 2 words, dup frac 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tc = {r.doc_id: r.n_words for r in with_token_counts(df).collect()}
    assert tc == {1: 2, 2: 2, 3: 0, 4: 2}
    rep = {r.doc_id: r.dup_word_frac for r in with_repetition(df).collect()}
    assert rep[1] == 0.0
    assert rep[3] == 0.0
    assert rep[4] == pytest.approx(0.5)


def test_repetition_hashed_and_exact_bigram_modes_agree(spark):
    """The default xxhash64 bigram key (the 100 TB shuffle diet) must produce
    the same top_bigram_frac as the bit-exact string key on real text —
    collisions are the only possible divergence and must not occur here."""
    from bigtrees_spark.operators.textstats import with_repetition

    rows = [
        (1, "the cat sat on the mat the cat came back"),
        (2, "spam spam spam spam spam"),
        (3, "all of these words differ completely right here"),
        (4, ""),
        (5, "a b a b a b a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = {r.doc_id: r.top_bigram_frac for r in with_repetition(df).collect()}
    exact = {
        r.doc_id: r.top_bigram_frac
        for r in with_repetition(df, exact_bigrams=True).collect()
    }
    assert hashed == exact
