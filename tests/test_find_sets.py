"""The find query surface + hash-set algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigtrees_spark.operators import sets
from bigtrees_spark.operators.find import (
    SearchConfig,
    contains_hash,
    find,
    url_prefix_subtree,
)
from bigtrees_spark.operators.fingerprint import fingerprint_docs


@pytest.fixture(scope="module")
def fp(pages):
    return fingerprint_docs(pages).cache()


def test_bounds_filter(fp):
    cfg = SearchConfig(min_bytes=100, max_bytes=2000, out_cols=["url", "nbytes"])
    rows = find(fp, cfg).collect()
    assert rows
    assert all(100 <= r.nbytes <= 2000 for r in rows)


def test_lang_filter(fp):
    cfg = SearchConfig(langs=["de"], out_cols=["url", "lang"])
    rows = find(fp, cfg).collect()
    assert rows and all(r.lang == "de" for r in rows)


def test_exclude_regex(fp):
    cfg = SearchConfig(exclude_url_regexes=[r"site1\d\."], out_cols=["url"])
    rows = find(fp, cfg).collect()
    assert all("site10." not in r.url and "site19." not in r.url for r in rows)


def test_labeled_search_first_wins(fp):
    cfg = SearchConfig(
        labeled_searches=[("s0", [r"/s0/"]), ("site0", [r"SITE0\."])],  # case-insensitive
        out_cols=["url", "label"],
    )
    rows = find(fp, cfg).collect()
    assert rows
    for r in rows:
        if "/s0/" in r.url:
            assert r.label == "s0"  # first match wins even if site0 also matches
        else:
            assert r.label == "site0" and "site0." in r.url


def test_exclude_set_anti_join(fp):
    total = fp.count()
    excl = sets.hash_set_from_docs(fp.limit(40), note="x")
    cfg = SearchConfig(out_cols=["url", "sha256"])
    kept = find(fp, cfg, exclude_sets=[excl])
    assert kept.count() < total
    assert kept.join(excl.select("sha256"), "sha256", "left_semi").count() == 0


def test_set_add_last_note_wins(spark):
    s1 = spark.createDataFrame([("h1", 1, 10, "old"), ("h2", 2, 20, "old")],
                               "sha256 string, n_docs long, n_bytes long, note string")
    s2 = spark.createDataFrame([("h2", 2, 20, "new"), ("h3", 1, 5, "new")],
                               "sha256 string, n_docs long, n_bytes long, note string")
    out = {r.sha256: r.note for r in sets.set_add(s1, [s2]).collect()}
    assert out == {"h1": "old", "h2": "new", "h3": "new"}


def test_member_and_contains(fp):
    some = fp.limit(5)
    hs = sets.hash_set_from_docs(some)
    assert sets.member(fp, hs).count() >= 5
    a_digest = some.collect()[0].sha256
    assert sets.set_contains(hs, a_digest)
    assert contains_hash(fp, a_digest)
    assert not contains_hash(fp, "nope")


def test_exclude_then_member_disjoint(fp):
    hs = sets.hash_set_from_docs(fp.limit(10))
    excluded = sets.exclude(fp, hs)
    assert excluded.join(F.broadcast(hs.select("sha256")), "sha256", "left_semi").count() == 0
    assert excluded.count() + sets.member(fp, hs).count() == fp.count()


def test_url_prefix_subtree(fp):
    sub = url_prefix_subtree(fp, "https://site3.example/")
    assert sub.count() > 0
    assert all(r.url.startswith("https://site3.example/") for r in sub.select("url").collect())
