"""Corpus-wide repeated-line removal (CCNet-style paragraph/line dedup).

Web-text curation's standard intra-corpus dedup stage below the document
level: split every document into segments (lines/paragraphs), count each
distinct segment's frequency across the WHOLE corpus, and drop every copy of
any segment that appears >= min_repeats times (boilerplate: navigation bars,
cookie banners, footers, licence blurbs).  This is the segment-granularity
sibling of the reference's whole-file dupe grouping (/root/reference/lib/
System/Directory/BigTrees/DupeMap.hs:64-119 groups by content hash; here the
"content" is a line, and the action is removal rather than reporting).

Scale shape (pure Catalyst, no Python):
  explode            — no shuffle, segments stay with their source partition
  freq agg           — groupBy sha2(segment) with map-side partial count;
                       the shuffle ships (32B hash, count) rows only
  seg >< freq join   — one shuffle of (doc_id, pos, segment, hash); the hot
                       keys a boilerplate-heavy corpus creates (the same
                       footer on 10^8 pages) are exactly the AQE skew-join
                       case (session.py enables skewJoin), and the freq side
                       of a hot key is a single row, so splitting the fat
                       side is always safe
  reassembly agg     — groupBy doc_id; the aggregation buffer holds one
                       document's OWN segments (bounded by document size,
                       never by corpus size)
Grouping/joining on sha2(segment, 256) instead of the raw string keeps the
frequency shuffle skinny; the same 256-bit-identity convention the exact
dedup stage uses (operators/dedup.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SEP = "\n"
DEFAULT_MIN_REPEATS = 2


def _normalize_key(seg: Column) -> Column:
    """CCNet's dedup-key normalization (Wenzek et al. 2020 §4.1, public
    work): lowercase, strip digits and punctuation, collapse whitespace —
    so trivially-varying boilerplate ('© 2024 …' vs '© 2025 …', hit
    counters, dates) still collapses to one frequency key.  Applied to the
    HASH KEY only; output text is always the original segment."""
    k = F.lower(seg)
    k = F.regexp_replace(k, r"[0-9]", "")
    k = F.regexp_replace(k, r"\p{Punct}", "")
    return F.trim(F.regexp_replace(k, r"\s+", " "))


def remove_repeated_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = DEFAULT_SEP,
    min_repeats: int = DEFAULT_MIN_REPEATS,
    normalize: bool = False,
) -> DataFrame:
    """-> (id_col, clean_text, n_kept, n_removed), one row per input row.

    clean_text is the sep-join of the document's segments whose corpus-wide
    frequency is < min_repeats, in original order; every copy of a repeated
    segment is dropped (CCNet semantics — the first occurrence is just as
    much boilerplate as the rest).  A fully-boilerplate document stays in
    the output with clean_text = '' so downstream length/quality filters
    see it (paralleling the pipeline's error-ROW convention).

    Precondition: `id_col` must be unique per row — reassembly groups by it,
    so duplicate ids would merge distinct documents' segments (ADVICE r04).

    normalize=True counts frequency over CCNet-normalized segment keys
    (lowercase, digits/punct stripped, whitespace collapsed — _normalize_key)
    so boilerplate that varies only by dates/counters still collapses; the
    OUTPUT text is unchanged either way.  Segments whose normalized key is
    EMPTY (digit-only, punct-only, whitespace-only lines) fall back to their
    raw bytes as the key: normalization exists to collapse trivially-varying
    boilerplate, and pooling every numeric line in the corpus under one ''
    key would delete unique data ('123' vs '456') as if it were repeated.
    The two key domains are hash-prefixed so a raw fallback can never
    collide with a normalized key.  Default False = raw-byte identity, the
    exact semantics the SQL oracle replicates.
    """
    if min_repeats < 2:
        raise ValueError(f"min_repeats must be >= 2, got {min_repeats}")
    raw_seg = F.col("seg")
    if normalize:
        norm = _normalize_key(raw_seg)
        key = F.when(norm == "", F.concat(F.lit("r:"), raw_seg)).otherwise(
            F.concat(F.lit("n:"), norm)
        )
    else:
        key = raw_seg
    seg = df.select(
        F.col(id_col),
        F.posexplode(
            # sep is a LITERAL separator (it is re-joined verbatim below);
            # F.split takes a Java regex, so escape metacharacters
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(re.escape(sep)),
                F.lit(-1),
            )
        ).alias("pos", "seg"),
    ).withColumn("h", F.sha2(key, 256))
    freq = seg.groupBy("h").agg(F.count("*").alias("seg_count"))
    marked = seg.join(freq, "h").withColumn(
        "dup", F.col("seg_count") >= F.lit(min_repeats)
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("dup"), 0).otherwise(1)).alias("n_kept"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("pos", "seg", "dup"))),
                        lambda s: ~s["dup"],
                    ),
                    lambda s: s["seg"],
                ),
                sep,
            ).alias("clean_text"),
        )
        .select(id_col, "clean_text", "n_kept", "n_removed")
    )
