"""URL canonicalization + scoping — the web analog of the reference's
path-scope check.

Reference: `pathIsInTree` prunes the scan to paths under the tree root
(/root/reference/lib/System/Directory/BigTrees/HashTree/Build.hs:128-140);
SURVEY §2.9 maps it to a same-host `parse_url` check.  Real web corpora need
canonicalization BEFORE any url-keyed stage (exact-dup collapse, diff, move
detection): `HTTP://WWW.Site.com:80/a/b/?b=2&a=1#frag` and
`http://site.com/a/b?a=1&b=2` are the same resource.

Everything here is pure Catalyst (try_parse_url / regexp / array_sort inside
whole-stage codegen) — no Python, fully pushdown-friendly.  try_parse_url,
not parse_url: under ANSI mode one malformed url in 10^12 rows would throw
mid-stage (Catalyst may evaluate projections before sibling filters), and a
malformed row must degrade (NULL -> pass-through / filtered), never kill the
job — the same Err-row philosophy as the fingerprint stage.

Pinned canonicalization rules (changing them re-keys every url-keyed table):
  1. scheme and host lowercased; leading `www.` stripped from the host
  2. default ports dropped (`:80` for http, `:443` for https)
  3. fragment dropped
  4. query parameters sorted bytewise (param order never distinguishes)
  5. trailing slash stripped from non-root paths; empty path -> `/`
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _host(url: Column) -> Column:
    h = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.regexp_replace(h, r"^www\.", "")


def _scheme(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))


def canonical_url(url) -> Column:
    """Canonical form of a url column (rules in the module docstring)."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = _scheme(url)
    host = _host(url)
    # drop default ports; keep non-default ones (parse_url HOST strips the
    # port, so recover it from the authority)
    raw_auth = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    port_str = F.regexp_extract(raw_auth, r":(\d+)$", 1)
    keep_port = (
        (port_str != "")
        & ~((scheme == "http") & (port_str == "80"))
        & ~((scheme == "https") & (port_str == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_q = F.concat_ws("&", F.array_sort(F.split(query, "&")))
    q_part = F.when(
        query.isNull() | (query == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), sorted_q))
    p_part = F.when(keep_port, F.concat(F.lit(":"), port_str)).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host, p_part, path, q_part)
    # non-absolute inputs (no scheme) pass through unchanged rather than
    # producing nulls — synthetic corpora use bare ids as urls
    return F.when(scheme.isNull() | host.isNull(), url).otherwise(out)


def same_host(a, b) -> Column:
    """True when two urls share a canonical host (www-stripped, lowercased)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _host(a) == _host(b)


def url_in_scope(url, scope: str) -> Column:
    """pathIsInTree analog (Build.hs:128-140): is `url` under the scope url's
    host + path prefix?  Segment-aligned: scope .../a does NOT match .../ab."""
    url = F.col(url) if isinstance(url, str) else url
    s = F.lit(scope)
    host_ok = _host(url) == _host(s)
    up = F.try_parse_url(url, F.lit("PATH"))
    up = F.when(up.isNull() | (up == ""), F.lit("/")).otherwise(up)
    sp = F.try_parse_url(s, F.lit("PATH"))
    sp = F.when(sp.isNull() | (sp == ""), F.lit("/")).otherwise(sp)
    sp = F.when(
        (F.length(sp) > 1) & sp.endswith("/"), F.substring(sp, 1, F.length(sp) - 1)
    ).otherwise(sp)
    path_ok = (
        (sp == "/")
        | (up == sp)
        | up.startswith(F.concat(sp, F.lit("/")))
    )
    return host_ok & path_ok


def valid_url(url) -> Column:
    """isValidName analog (reference Name.hs:149-153: a node name has no
    '/', is not '.' or '..', and survives OS encoding).  The URL-corpus
    restatement: non-null, non-empty, not a bare '.'/'..', and free of
    whitespace/control bytes (which survive in no valid URL and break the
    TAB/NUL-delimited row formats the reference serializes to).

    Pure codegen (rlike) — usable as a scan-time filter that pushes down.
    """
    url = F.col(url) if isinstance(url, str) else url
    return (
        url.isNotNull()
        & (url != "")
        & (url != ".")
        & (url != "..")
        & ~url.rlike(r"[\s\x00-\x1f\x7f]")
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Replace url_col with its canonical form (run BEFORE url-keyed stages)."""
    return df.withColumn(url_col, canonical_url(url_col))


def scope_filter(df: DataFrame, scope: str, url_col: str = "url") -> DataFrame:
    """Scan-pruning scope filter: keep only rows under the scope url."""
    return df.where(url_in_scope(url_col, scope))
