"""input_hint invariant: byte-identical extracted text per url, pipeline
(Spark pandas UDF) vs oracle (same pure function, single-node)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigtrees_spark.sources.extraction import extract_text, extract_text_udf


def test_extract_roundtrips_fixture_text(corpus):
    """The fixture embeds `text` in <main>; extraction must recover it
    byte-for-byte for EVERY url."""
    for r in corpus.pages.itertuples():
        assert extract_text(r.html) == r.text, r.url


def test_extract_udf_matches_oracle_per_url(spark, pages, corpus):
    got = {
        r["url"]: r["extracted"]
        for r in pages.select("url", extract_text_udf(F.col("html")).alias("extracted")).collect()
    }
    for r in corpus.pages.itertuples():
        assert got[r.url] == extract_text(r.html), r.url
        assert got[r.url] == r.text, r.url


def test_extract_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"no tags at all") == "no tags at all"
    assert extract_text(b"<body>a  b\n\nc</body>") == "a b c"
    assert extract_text(b"<body><script>var x=1;</script>hi</body>") == "hi"
    assert extract_text(b"<body><nav>menu</nav>content<footer>f</footer></body>") == "content"
    assert extract_text(b"<main>m</main><body>b</body>") == "m"
    assert extract_text(b"<body>a &amp; b</body>") == "a & b"
    # broken utf-8 is deterministic (errors=replace), never a crash
    assert isinstance(extract_text(b"<body>\xff\xfe broken</body>"), str)
    # broken tags: still deterministic
    assert extract_text(b"<body><p>unclosed") == "unclosed"
