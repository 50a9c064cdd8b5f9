"""Error-message normalization (reference parity: HashLine.hs:155-168).

The reference stores per-node failures as Err rows and normalizes the
message text before serialization so error lines stay parseable and
goldens stay stable:

- ``sanitizeErrMsg`` (HashLine.hs:155-161) keeps only alphanumerics,
  whitespace, and the characters ``/:()[]._-`` — everything else is
  dropped.
- ``simplifyErrMsg`` (HashLine.hs:163-168) sanitizes, then cuts the
  (redundant) filepath prefix off IO-style messages: split on ``": "``
  and drop the first segment when there are at least two.

Both are pure string transforms, so here they are whole-stage-codegen
Catalyst expressions (``regexp_replace``) — no UDF, applied once when the
error column is produced, not per downstream read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Keep-list mirrors HashLine.hs:156-161: isAlphaNum/isSpace plus "/:()[]._-".
# Haskell's isAlphaNum/isSpace are Unicode-aware (Lu/Ll/../Nd categories;
# White_Space incl. NBSP), hence \p{L}\p{N} rather than ASCII ranges and the
# (?U) flag so Java's \s matches Unicode whitespace too (without it \s is
# ASCII-only and e.g. U+00A0 would be dropped where the reference keeps it).
# ']' and '-' escaped in the class.
_SANITIZE_DROP = r"(?U)[^\p{L}\p{N}\s/:()\[\]._\-]"

# Non-greedy through the FIRST ": " (DOTALL: sanitized text may keep
# newlines — Haskell's splitOn ignores line boundaries too).
_FIRST_SEGMENT = r"(?s)^.*?: "


def sanitize_err_msg(col: Column | str) -> Column:
    """Drop every character outside the reference's safe set."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _SANITIZE_DROP, "")


def simplify_err_msg(col: Column | str) -> Column:
    """Sanitize, then strip the leading ``<path>: `` segment if present.

    ``intercalate ": " (tail (splitOn ": " s))`` is exactly "everything
    after the first ``": "``"; when no separator exists the sanitized
    string is returned unchanged (``length sSplit < 2`` branch).
    """
    return F.regexp_replace(sanitize_err_msg(col), _FIRST_SEGMENT, "")
