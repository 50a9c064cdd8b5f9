"""Corpus-wide repeated-line removal (operators/linededup.py)."""

from __future__ import annotations

from collections import Counter

import pytest

from bigtrees_spark.operators.linededup import remove_repeated_segments


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # boilerplate FOOTER / NAV lines shared across docs; unique bodies
        (1, "alpha body one\nNAV\nunique tail a\nFOOTER"),
        (2, "beta body two\nNAV\nFOOTER"),
        (3, "gamma body three\nFOOTER"),
        (4, "NAV\nFOOTER"),          # fully boilerplate -> clean_text ''
        (5, "solo document, no repeats at all"),
        (6, "alpha body one\nepsilon tail"),  # body line repeated w/ doc 1
        (7, ""),                      # empty doc: one empty segment
        (8, None),                    # null text behaves as empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(rows, sep="\n", min_repeats=2):
    segs = {i: ("" if t is None else t).split(sep) for i, t in rows}
    freq = Counter(s for v in segs.values() for s in v)
    out = {}
    for i, v in segs.items():
        kept = [s for s in v if freq[s] < min_repeats]
        out[i] = (sep.join(kept), len(kept), len(v) - len(kept))
    return out


def test_matches_brute_force(docs):
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_repeated_segments(docs).collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    assert got == _brute(rows)


def test_repeated_body_line_removed(docs):
    got = {r.doc_id: r for r in remove_repeated_segments(docs).collect()}
    assert len(got) == 8  # every input row survives, even fully-removed ones
    assert got[1].clean_text == "unique tail a"
    assert got[1].n_removed == 3  # alpha body one, NAV, FOOTER
    assert got[4].clean_text == "" and got[4].n_kept == 0
    assert got[5].n_removed == 0
    # docs 7 and 8 both reduce to one '' segment -> repeated -> removed
    assert got[7].clean_text == "" and got[7].n_removed == 1
    assert got[8].clean_text == "" and got[8].n_removed == 1


def test_min_repeats_threshold(docs):
    # FOOTER appears 4x, NAV 3x, 'alpha body one' 2x: at min_repeats=3 the
    # body pair survives
    got = {
        r.doc_id: r for r in remove_repeated_segments(docs, min_repeats=3).collect()
    }
    assert got[1].clean_text == "alpha body one\nunique tail a"
    assert got[6].clean_text == "alpha body one\nepsilon tail"
    assert got[4].clean_text == ""
    with pytest.raises(ValueError):
        remove_repeated_segments(docs, min_repeats=1)


def test_sep_is_literal_not_regex(spark):
    # '.' would split on EVERY char if sep were passed as a raw Java regex
    rows = [(1, "aaa.bbb.ccc"), (2, "ddd.bbb"), (3, "eee")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_repeated_segments(df, sep=".").collect()
    }
    assert got[1] == ("aaa.ccc", 2, 1)  # shared 'bbb' segment removed
    assert got[2] == ("ddd", 1, 1)
    assert got[3] == ("eee", 1, 0)


def test_normalized_keys_collapse_trivially_varying_boilerplate(spark):
    """normalize=True (CCNet dedup-key normalization): boilerplate that
    varies only by digits/punct/case/whitespace ('© 2024 Foo' vs '© 2025
    Foo!') must collapse to one frequency key and be removed everywhere,
    while the OUTPUT text keeps the original bytes of every kept segment.
    Verified against a brute-force normalizer."""
    import re as _re

    def norm(s):
        s = _re.sub(r"[0-9]", "", s.lower())
        # strip ASCII punctuation (Java \p{Punct}), collapse whitespace
        s = _re.sub(r"[!-/:-@\[-`{-~]", "", s)
        return _re.sub(r"\s+", " ", s).strip()

    rows = [
        (1, "Unique alpha body\nCopyright (c) 2024 ExampleCo.\ntail A"),
        (2, "Unique beta body\ncopyright c 2025  exampleco\ntail B"),
        (3, "Visitors today: 1024\nUnique gamma body"),
        (4, "visitors today 99\nUnique delta body"),
        (5, "Unique epsilon body only"),
    ]

    # brute force over normalized keys
    segs = {i: t.split("\n") for i, t in rows}
    from collections import Counter

    freq = Counter(norm(s) for v in segs.values() for s in v)
    want = {}
    for i, v in segs.items():
        kept = [s for s in v if freq[norm(s)] < 2]
        want[i] = ("\n".join(kept), len(kept), len(v) - len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_repeated_segments(df, normalize=True).collect()
    }
    assert got == want
    # the copyright/visitor lines really did collapse (sanity of the fixture)
    assert got[1][2] >= 1 and got[3][2] >= 1
    # raw semantics untouched: default mode removes none of these variants
    raw = {
        r.doc_id: r.n_removed
        for r in remove_repeated_segments(df).collect()
    }
    assert raw[1] == 0 and raw[3] == 0


def test_normalize_empty_key_falls_back_to_raw_bytes(spark):
    """Digit-only / punct-only / whitespace-only lines normalize to '' —
    pooling them under one corpus-wide key would delete unique data ('123'
    vs '456') as boilerplate.  They must key on their RAW bytes instead:
    distinct numeric lines survive, while a genuinely repeated numeric line
    is still removed."""
    rows = [
        (1, "Total:\n123"),
        (2, "Score:\n456"),      # 123 vs 456: distinct data, both must stay
        (3, "page marker\n---"),
        (4, "other marker\n---"),  # identical raw '---' repeats -> removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_repeated_segments(df, normalize=True).collect()
    }
    assert got[1] == ("Total:\n123", 0)
    assert got[2] == ("Score:\n456", 0)
    assert got[3] == ("page marker", 1)
    assert got[4] == ("other marker", 1)
