"""The `bigtrees find` query surface — filtered, labeled, projected listing.

Reference (/root/reference/lib/System/Directory/BigTrees/HashTree/{Find,Search}.hs):
  findKeepNode  (Find.hs:93-110)   min/max bounds on bytes/depth/nodes/modtime
                                   + tree-type membership + hash-set exclusion
  labeled regex (Find.hs:129-171)  per-row (label, [regex]) match, first wins,
                                   case-insensitive
  out-fmt       (Find.hs:177-216)  "thdmbfl" metadata projection/reorder
  exclude regex (Build.hs:70-78)   scan-time path exclusion

Spark-first: the whole surface is ONE Catalyst select/filter/when chain —
filters and the projection push down to the parquet scan (PushedFilters /
ReadSchema in .explain), the hash-set exclusion is a broadcast left anti-join.
No custom physical work at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class SearchConfig:
    """Mirror of the reference's SearchConfig record (Search.hs:27-41),
    retargeted to document columns."""

    min_bytes: int | None = None
    max_bytes: int | None = None
    min_tokens: int | None = None
    max_tokens: int | None = None
    min_ts: str | None = None           # ISO timestamp lower bound
    max_ts: str | None = None
    langs: list[str] | None = None      # tree-type filter analog
    scope_url: str | None = None        # pathIsInTree analog (Build.hs:128-140)
    exclude_url_regexes: list[str] = field(default_factory=list)
    labeled_searches: list[tuple[str, list[str]]] = field(default_factory=list)
    # out-fmt analog: ordered projection of metadata columns
    out_cols: list[str] = field(default_factory=lambda: ["url", "sha256", "nbytes", "lang"])


def _bounds_predicate(cfg: SearchConfig) -> Column:
    p = F.lit(True)
    if cfg.min_bytes is not None:
        p = p & (F.col("nbytes") >= cfg.min_bytes)
    if cfg.max_bytes is not None:
        p = p & (F.col("nbytes") <= cfg.max_bytes)
    if cfg.min_tokens is not None:
        p = p & (F.col("n_tokens") >= cfg.min_tokens)
    if cfg.max_tokens is not None:
        p = p & (F.col("n_tokens") <= cfg.max_tokens)
    if cfg.min_ts is not None:
        p = p & (F.col("warc_ts") >= F.lit(cfg.min_ts).cast("timestamp"))
    if cfg.max_ts is not None:
        p = p & (F.col("warc_ts") <= F.lit(cfg.max_ts).cast("timestamp"))
    if cfg.langs:
        p = p & F.col("lang").isin(cfg.langs)
    return p


def label_column(searches: list[tuple[str, list[str]]]) -> Column:
    """First-match-wins label cascade (Find.hs:160-171, case-insensitive).
    Regexes are combined per label with '|'; (?i) mirrors the reference's
    caseless compile (Find.hs:148-158)."""
    col = F.lit(None).cast("string")
    expr = None
    for label, regexes in searches:
        combined = "(?i)" + "|".join(f"(?:{r})" for r in regexes)
        cond = F.col("url").rlike(combined)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(col) if expr is not None else col


def find(
    docs_fp: DataFrame,
    cfg: SearchConfig,
    exclude_sets: list[DataFrame] | None = None,
) -> DataFrame:
    """Filtered/labeled/projected listing over the fingerprint table."""
    df = docs_fp.where(_bounds_predicate(cfg))
    if cfg.scope_url:
        from bigtrees_spark.operators.urls import url_in_scope

        df = df.where(url_in_scope("url", cfg.scope_url))
    for rex in cfg.exclude_url_regexes:
        df = df.where(~F.col("url").rlike(rex))
    if exclude_sets:
        # hash-set exclusion: left anti-join per set (Find.hs:43-48).  No
        # forced broadcast — a .bigset can hold a whole snapshot's digests,
        # so AQE picks the strategy (small sets still broadcast at runtime)
        for s in exclude_sets:
            df = df.join(s.select("sha256"), "sha256", "left_anti")
    if cfg.labeled_searches:
        # only labeled rows are listed (Find.hs:160-171: unmatched nodes are
        # skipped when searches are configured)
        df = df.withColumn("label", label_column(cfg.labeled_searches)).where(
            F.col("label").isNotNull()
        )
    cols = [c for c in cfg.out_cols if c in df.columns or c == "label"]
    return df.select(*cols)


def url_prefix_subtree(docs_fp: DataFrame, prefix: str) -> DataFrame:
    """dropTo / treeContainsPath analog (Search.hs:107-118): point/subtree
    lookup by url prefix — prunes to matching partitions at the scan."""
    return docs_fp.where(F.col("url").startswith(prefix))


def contains_hash(docs_fp: DataFrame, digest: str) -> bool:
    """treeContainsHash (Search.hs:120-126): any row with the given digest?"""
    return docs_fp.where(F.col("sha256") == digest).limit(1).count() > 0


def zero_mod_time(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """zeroModTime normalizer (HashTree/Base.hs:33-37): comparison-insensitive
    timestamp column, used when diffing snapshots whose scan times differ."""
    return df.withColumn(ts_col, F.lit("1970-01-01 00:00:00").cast("timestamp"))


def rename_root(df: DataFrame, old_prefix: str, new_prefix: str, url_col: str = "url") -> DataFrame:
    """renameRoot normalizer (HashTree/Base.hs:175-181): rewrite the url
    prefix so two snapshots rooted differently compare by relative path."""
    return df.withColumn(
        url_col,
        F.when(
            F.col(url_col).startswith(old_prefix),
            F.concat(F.lit(new_prefix), F.expr(f"substring({url_col}, {len(old_prefix) + 1})")),
        ).otherwise(F.col(url_col)),
    )
