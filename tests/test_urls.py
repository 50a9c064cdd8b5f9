"""URL canonicalization + scoping (pathIsInTree analog, Build.hs:128-140)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigtrees_spark.operators.urls import (
    canonical_url,
    canonicalize_urls,
    same_host,
    scope_filter,
    url_in_scope,
)


def _canon(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(canonical_url("url").alias("c"))
        .first()
        .c
    )


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # scheme/host case, www, default port, fragment
        ("HTTP://WWW.Site.COM:80/a/b#frag", "http://site.com/a/b"),
        ("https://site.com:443/a", "https://site.com/a"),
        ("https://site.com:8443/a", "https://site.com:8443/a"),
        # trailing slash (non-root) and empty path
        ("http://site.com/a/b/", "http://site.com/a/b"),
        ("http://site.com", "http://site.com/"),
        ("http://site.com/", "http://site.com/"),
        # query param order
        ("http://site.com/p?b=2&a=1", "http://site.com/p?a=1&b=2"),
        ("http://site.com/p?a=1&b=2", "http://site.com/p?a=1&b=2"),
        # already canonical
        ("https://site.com/x/y?k=v", "https://site.com/x/y?k=v"),
    ],
)
def test_canonical_url(spark, raw, want):
    assert _canon(spark, raw) == want


def test_equivalent_urls_collide_after_canonicalization(spark):
    df = spark.createDataFrame(
        [
            ("HTTP://WWW.Site.com:80/a/b/?b=2&a=1",),
            ("http://site.com/a/b?a=1&b=2",),
        ],
        "url string",
    )
    got = canonicalize_urls(df).select("url").distinct().collect()
    assert len(got) == 1


def test_non_absolute_urls_pass_through(spark):
    # synthetic corpora key rows by bare ids — canonicalization must not
    # null them out
    assert _canon(spark, "d00000042") == "d00000042"
    assert _canon(spark, "site/a3/00000007") == "site/a3/00000007"


def test_same_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.x.com/a", "http://x.com/b", True),
         ("https://x.com/a", "https://y.com/a", False)],
        "a string, b string, want boolean",
    )
    got = df.select((same_host("a", "b") == F.col("want")).alias("ok")).collect()
    assert all(r.ok for r in got)


@pytest.mark.parametrize(
    ("url", "scope", "want"),
    [
        ("https://x.com/docs/intro", "https://x.com/docs", True),
        ("https://x.com/docs", "https://x.com/docs", True),
        ("https://x.com/docs2/intro", "https://x.com/docs", False),  # segment-aligned
        ("https://y.com/docs/intro", "https://x.com/docs", False),   # other host
        ("https://www.x.com/docs/deep/page", "https://x.com/docs/", True),
        ("https://x.com/other", "https://x.com/", True),             # root scope
    ],
)
def test_url_in_scope(spark, url, scope, want):
    got = (
        spark.createDataFrame([(url,)], "url string")
        .select(url_in_scope("url", scope).alias("ok"))
        .first()
        .ok
    )
    assert got == want


def test_scope_filter_prunes(spark):
    df = spark.createDataFrame(
        [(f"https://x.com/docs/{i}",) for i in range(5)]
        + [(f"https://x.com/blog/{i}",) for i in range(3)],
        "url string",
    )
    assert scope_filter(df, "https://x.com/docs").count() == 5


@pytest.mark.parametrize(
    ("url", "want"),
    [
        ("https://x.com/a", True),
        ("doc-001_x.html", True),            # bare synthetic ids are names too
        ("", False),
        (".", False),
        ("..", False),
        ("https://x.com/a b", False),        # whitespace never survives a url
        ("https://x.com/a\tb", False),
        ("https://x.com/\x07bell", False),   # control bytes break row formats
        (None, False),
    ],
)
def test_valid_url(spark, url, want):
    from bigtrees_spark.operators.urls import valid_url

    got = (
        spark.createDataFrame([(url,)], "url string")
        .select(F.coalesce(valid_url("url"), F.lit(False)).alias("ok"))
        .first()
        .ok
    )
    assert got == want
