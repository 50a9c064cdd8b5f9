"""HTML -> text extraction: ONE pinned, deterministic pure function of the raw
bytes, used by both the Spark pipeline (via a pandas UDF) and the single-node
oracle — so the input_hint invariant "byte-identical extracted text per url"
holds by construction and is verified per-url in tests/test_extraction.py.

Rules (pinned; changing them invalidates committed goldens):
  1. decode UTF-8 with errors="replace" (no environment-dependent charset
     guessing — SURVEY.md §7 risk note),
  2. take the first <main> element's content if present, else <body>, else all,
  3. drop <script>/<style>/<nav>/<header>/<footer> subtrees,
  4. strip remaining tags, unescape HTML entities,
  5. collapse all whitespace runs to single spaces and trim.

Reference analog: the file-content hash is a pure function of bytes
(/root/reference/lib/System/Directory/BigTrees/Hash.hs:113-125); extraction is
our "content normalization before fingerprinting" equivalent.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_MAIN_RE = re.compile(rb"<main[^>]*>(.*?)</main>", re.S | re.I)
_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)
_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | None) -> str:
    """Deterministic text extraction from raw HTML bytes (rules above)."""
    if not html_bytes:
        return ""
    m = _MAIN_RE.search(html_bytes) or _BODY_RE.search(html_bytes)
    content = (m.group(1) if m else html_bytes).decode("utf-8", errors="replace")
    content = _DROP_RE.sub(" ", content)
    content = _TAG_RE.sub(" ", content)
    content = _html.unescape(content)
    return _WS_RE.sub(" ", content).strip()


@F.pandas_udf(StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    """Arrow-batched wrapper; one call per batch, same pure function."""
    return html_col.map(extract_text)


# ---------------------------------------------------------------------------
# Err-node semantics: per-row failures become error rows, never task failures.
# Reference: every per-node exception is wrapped into an Err node and the scan
# continues (/root/reference/lib/System/Directory/BigTrees/HashTree/Build.hs:
# 109-118 mkErrTree/handleAny; row form HashLine.hs:189-192).
# ---------------------------------------------------------------------------


def sanitize_err(exc: BaseException | str) -> str:
    """One-line, bounded error message (the reference flattens Err messages to
    a single sanitized line before writing them as rows, HashLine.hs:189-192)."""
    msg = exc if isinstance(exc, str) else f"{type(exc).__name__}: {exc}"
    return " ".join(msg.split())[:200]


def extract_text_checked(
    html_bytes: bytes | None, max_bytes: int
) -> tuple[str, str | None]:
    """(text, error): error is None on success; on oversized input or any
    extraction exception, text is '' and error carries the sanitized message."""
    try:
        if html_bytes is not None and len(html_bytes) > max_bytes:
            return "", sanitize_err(f"HtmlTooLarge: {len(html_bytes)} > {max_bytes} bytes")
        return extract_text(html_bytes), None
    except Exception as e:  # noqa: BLE001 — any per-row failure becomes a row
        return "", sanitize_err(e)


EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def make_extract_checked_udf(max_bytes: int):
    """Arrow-batched html -> struct<text, error>; never raises per row."""

    @F.pandas_udf(EXTRACT_SCHEMA)
    def extract_checked(html_col: pd.Series) -> pd.DataFrame:
        texts, errs = [], []
        for b in html_col:
            t, e = extract_text_checked(b, max_bytes)
            texts.append(t)
            errs.append(e)
        return pd.DataFrame({"text": texts, "error": errs})

    return extract_checked
