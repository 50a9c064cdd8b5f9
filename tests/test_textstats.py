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
