"""Err-node semantics: per-doc failures become error ROWS, never dead jobs.

Reference behavior under test: every per-node exception is wrapped into an
Err node and the scan continues (/root/reference/lib/System/Directory/
BigTrees/HashTree/Build.hs:109-118 mkErrTree/handleAny; round-trip test at
HashTree.hs:198-232 — a bad path yields an Err node, not an abort).
"""

from __future__ import annotations

import dataclasses
import datetime

import numpy as np
import pytest

from bigtrees_spark.config import DEFAULT_CONFIG
from bigtrees_spark.functions.spark_udfs import fingerprint_row
from bigtrees_spark.operators.fingerprint import fingerprint_docs
from bigtrees_spark.plans.pipeline import near_dedup_pipeline
from bigtrees_spark.sources.extraction import (
    extract_text,
    extract_text_checked,
    sanitize_err,
)

CFG_SMALL = dataclasses.replace(DEFAULT_CONFIG, max_html_bytes=100_000)


# ---------------------------------------------------------------------------
# pure-function layer
# ---------------------------------------------------------------------------


def test_extract_checked_ok_matches_unchecked():
    html = b"<html><body>hello <b>world</b></body></html>"
    text, err = extract_text_checked(html, 1 << 20)
    assert err is None
    assert text == extract_text(html)


def test_extract_checked_oversize_is_error_row():
    big = b"<body>" + b"x" * 200_000 + b"</body>"
    text, err = extract_text_checked(big, 100_000)
    assert text == ""
    assert err is not None and "HtmlTooLarge" in err


def test_extract_checked_catches_exceptions():
    # a str instead of bytes makes the byte-regex raise TypeError — any
    # unexpected per-row exception must become an error value, not a raise
    text, err = extract_text_checked("not-bytes", 1 << 20)  # type: ignore[arg-type]
    assert text == ""
    assert err is not None and "TypeError" in err


def test_sanitize_err_single_bounded_line():
    msg = sanitize_err(ValueError("a\nb\t" + "c" * 500))
    assert "\n" not in msg and "\t" not in msg
    assert len(msg) <= 200


class _Boom:
    """Text stand-in whose .lower() raises — drives the kernel except path."""

    def lower(self):
        raise RuntimeError("boom")

    def __bool__(self):
        return True


def test_fingerprint_row_kernel_failure_yields_sentinel():
    a, b = DEFAULT_CONFIG.minhash_coeffs()
    sig, sh, bands, nt, shingles, err = fingerprint_row(_Boom(), DEFAULT_CONFIG, True, a, b)
    assert err is not None and "RuntimeError: boom" in err
    assert nt == 0 and sh == 0 and shingles == []
    # sentinel == the empty-doc fingerprint (schema stays non-null)
    empty_sig, _, empty_bands, _, _, empty_err = fingerprint_row(
        "", DEFAULT_CONFIG, True, a, b
    )
    assert empty_err is None
    assert sig == empty_sig and bands == empty_bands


# ---------------------------------------------------------------------------
# Spark layer: poisoned corpus completes; clean clusters unchanged
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def poisoned_pages(spark, pages):
    ts = datetime.datetime(2025, 1, 1)
    poison = spark.createDataFrame(
        [("poison/huge", ts, b"<body>" + b"z" * 150_000 + b"</body>", None, "en")],
        schema=pages.schema,
    )
    return pages.unionByName(poison)


def test_poisoned_corpus_completes_with_one_error_row(spark, pages, poisoned_pages):
    res = near_dedup_pipeline(
        poisoned_pages, cfg=CFG_SMALL, extract_from_html=True, persist=False
    )
    errs = res.docs_fp.where("error IS NOT NULL").collect()
    assert len(errs) == 1
    assert errs[0].url == "poison/huge"
    assert "HtmlTooLarge" in errs[0].error
    # the error row surfaces as its own singleton cluster
    poison_cluster = {
        r.cluster_id for r in res.clusters.where("url = 'poison/huge'").collect()
    }
    assert poison_cluster == {"poison/huge"}


def test_clean_clusters_unchanged_by_poison_row(spark, pages, poisoned_pages):
    base = near_dedup_pipeline(
        pages, cfg=CFG_SMALL, extract_from_html=True, persist=False
    )
    pois = near_dedup_pipeline(
        poisoned_pages, cfg=CFG_SMALL, extract_from_html=True, persist=False
    )
    a = {(r.url, r.cluster_id) for r in base.clusters.collect()}
    b = {
        (r.url, r.cluster_id)
        for r in pois.clusters.collect()
        if r.url != "poison/huge"
    }
    assert a == b


def test_clean_rows_have_null_error(pages):
    fp = fingerprint_docs(pages, extract_from_html=True)
    assert fp.where("error IS NOT NULL").count() == 0


def test_fingerprint_row_numpy_import_safe():
    # the except path builds the sentinel via numpy — ensure it works with
    # an empty uint64 array exactly like the kernels' empty-text path
    a, b = DEFAULT_CONFIG.minhash_coeffs()
    from bigtrees_spark.functions import kernels

    sig = kernels.minhash_signature(np.empty(0, dtype=np.uint64), a, b)
    assert sig.shape == (DEFAULT_CONFIG.n_perms,)


# ---------------------------------------------------------------------------
# annex-style precomputed digest reuse (Hash.hs:152-166 / Build.hs:229-233)
# ---------------------------------------------------------------------------


def test_url_digest_hint_reuse(spark):
    from bigtrees_spark.operators.fingerprint import (
        ANNEX_DIGEST_PATTERN,
        fingerprint_docs,
    )

    hex64 = "ab" * 32
    rows = [
        (f"cas/SHA256E-s9--{hex64}.bin", "ignored payload text"),
        ("plain/doc1", "some document text"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    fp = {
        r.url: r.sha256
        for r in fingerprint_docs(
            pages, url_digest_pattern=ANNEX_DIGEST_PATTERN
        ).collect()
    }
    assert fp[f"cas/SHA256E-s9--{hex64}.bin"] == hex64  # parsed, not recomputed
    import hashlib

    assert fp["plain/doc1"] == hashlib.sha256(b"some document text").hexdigest()

    # without the pattern: everything recomputed (default unchanged)
    fp2 = {r.url: r.sha256 for r in fingerprint_docs(pages).collect()}
    assert fp2[f"cas/SHA256E-s9--{hex64}.bin"] != hex64

# ---------------------------------------------------------------------------
# sanitizeErrMsg / simplifyErrMsg column analogs (HashLine.hs:155-168)
# ---------------------------------------------------------------------------


def _one(spark, col):
    from pyspark.sql import functions as F

    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_sanitize_err_msg_whitelist(spark):
    from pyspark.sql import functions as F

    from bigtrees_spark.functions.errors import sanitize_err_msg

    raw = 'bad "quote" <tag> 100% én path/x.txt [3]: (ok)_-'
    got = _one(spark, sanitize_err_msg(F.lit(raw)))
    # reference keep-set: alnum (Unicode: é stays, isAlphaNum parity),
    # space, /:()[]._-  — quotes, <>, % dropped
    assert got == "bad quote tag 100 én path/x.txt [3]: (ok)_-"


def test_sanitize_err_msg_keeps_unicode_whitespace(spark):
    """isSpace parity (HashLine.hs:155-161): Haskell isSpace is Unicode-aware,
    so NBSP / ideographic space must SURVIVE sanitization — Java \\s is
    ASCII-only without the (?U) flag (ADVICE r02)."""
    from pyspark.sql import functions as F

    from bigtrees_spark.functions.errors import sanitize_err_msg

    raw = "a b　c\td"  # NBSP, ideographic space, tab — all isSpace
    assert _one(spark, sanitize_err_msg(F.lit(raw))) == raw


def test_simplify_err_msg_strips_first_path_segment(spark):
    from pyspark.sql import functions as F

    from bigtrees_spark.functions.errors import simplify_err_msg

    # Haskell: intercalate ": " . tail . splitOn ": " — only the FIRST
    # segment (the redundant filepath) goes; later separators survive
    raw = "/data/part-0001.warc: openFile: does not exist"
    assert _one(spark, simplify_err_msg(F.lit(raw))) == "openFile: does not exist"
    # no separator => sanitized string unchanged (length sSplit < 2 branch)
    assert _one(spark, simplify_err_msg(F.lit("plain message"))) == "plain message"
    # sanitize runs FIRST, exactly like simplifyErrMsg composes them
    assert _one(spark, simplify_err_msg(F.lit('"/p": <err>'))) == "err"


def test_pipeline_error_column_is_sanitized(spark, pages):
    import datetime

    poison = spark.createDataFrame(
        [("poison/huge", datetime.datetime(2025, 1, 1),
          b"<body>" + b"z" * 150_000 + b"</body>", None, "en")],
        schema=pages.schema,
    )
    fp = fingerprint_docs(poison, CFG_SMALL, extract_from_html=True)
    err = fp.where("error IS NOT NULL").collect()[0].error
    assert "HtmlTooLarge" in err
    # ">" is outside the reference's safe character set
    assert ">" not in err
