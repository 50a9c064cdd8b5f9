"""Verbatim-substring duplicate pass (SURVEY.md G4).

The reference hashes whole files only; the north_rule adds detection of long
verbatim shared substrings (e.g. quoted excerpts) that sit BELOW the MinHash
Jaccard threshold.  SURVEY.md sketches a per-partition suffix array; we use
the equivalent-but-distributed winnowing scheme (Schleimer, Wilkerson, Aiken:
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):

  guarantee: any two docs sharing a verbatim substring of length >=
  cfg.substring_min_len share >= 1 selected fingerprint.

Pipeline shape (all equi-key, no n^2 anywhere):
  docs -> winnow UDF (Arrow) -> explode (url, fp, pos)
       -> groupBy(fp) buckets (capped like LSH) -> candidate pairs
       -> verify: seed-and-extend around the matching positions (Arrow UDF)
       -> edges(url_l, url_r, match_len)

Verification makes precision exact: a shared fingerprint is only a candidate;
the extend step confirms a true >= min_len common substring.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig
from bigtrees_spark.functions.spark_udfs import make_winnow_udf
from bigtrees_spark.operators import lsh

MAX_FP_BUCKET = 50  # fingerprint buckets above this are rank-chained like LSH


def winnow_table(docs: DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs(url, text) -> skinny (url, fp, pos) fingerprint rows."""
    w = make_winnow_udf(cfg)
    return (
        docs.select("url", w(F.col("text")).alias("fps"))
        .select("url", F.explode("fps").alias("f"))
        .select("url", F.col("f.fp").alias("fp"), F.col("f.pos").alias("pos"))
    )


def make_extend_udf(cfg: FingerprintConfig = DEFAULT_CONFIG):
    """pandas UDF: greedy extend around matched gram positions; returns the
    length of the confirmed common substring (0 if the gram match was a hash
    collision)."""

    @F.pandas_udf(IntegerType())
    def extend(text_l: pd.Series, text_r: pd.Series, pos_l: pd.Series, pos_r: pd.Series) -> pd.Series:
        w = cfg.winnow_gram
        out = []
        for tl, tr, pl, pr in zip(text_l, text_r, pos_l, pos_r):
            bl = (tl or "").encode("utf-8")
            br = (tr or "").encode("utf-8")
            pl, pr = int(pl), int(pr)
            if bl[pl : pl + w] != br[pr : pr + w]:
                out.append(0)  # hash collision
                continue
            lo = 0
            while pl - lo - 1 >= 0 and pr - lo - 1 >= 0 and bl[pl - lo - 1] == br[pr - lo - 1]:
                lo += 1
            hi = w
            while pl + hi < len(bl) and pr + hi < len(br) and bl[pl + hi] == br[pr + hi]:
                hi += 1
            out.append(lo + hi)
        return pd.Series(out, dtype="int32")

    return extend


def substring_edges(
    docs: DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG
) -> DataFrame:
    """docs(url, text) -> edges(url_l, url_r, match_len) for pairs sharing a
    verified verbatim substring >= cfg.substring_min_len bytes."""
    fps = winnow_table(docs, cfg)

    # shared skew-capped pairing core (lsh._skewcapped_pairs): item carries
    # the seed position, items sort by (url, pos), so l < r lexicographically
    # and same-doc combos are dropped by the url inequality below; over-cap
    # fingerprint buckets degrade to rank-chained pairs (no self-join on
    # either branch).  distinct=False: the seed groupBy below dedups anyway.
    items = fps.select("fp", F.struct("url", "pos").alias("item"))
    pairs = lsh._skewcapped_pairs(
        items, ["fp"], MAX_FP_BUCKET, skew_name="winnow_fps", distinct=False
    ).where(F.col("l.url") != F.col("r.url"))

    # up to 4 seed positions per pair: a lone seed can be a spurious short
    # match (same gram at unrelated positions); any seed inside the true
    # shared region extends to its full length, so max over a few suffices
    cands = (
        pairs.select(
            F.col("l.url").alias("url_l"),
            F.col("r.url").alias("url_r"),
            F.col("l.pos").alias("pos_l"),
            F.col("r.pos").alias("pos_r"),
        )
        .groupBy("url_l", "url_r")
        .agg(F.slice(F.collect_list(F.struct("pos_l", "pos_r")), 1, 4).alias("seeds"))
        .select("url_l", "url_r", F.explode("seeds").alias("s"))
        .select("url_l", "url_r", F.col("s.pos_l").alias("pos_l"), F.col("s.pos_r").alias("pos_r"))
    )

    texts = docs.select("url", "text")
    extend = make_extend_udf(cfg)
    return (
        cands.join(texts.withColumnsRenamed({"url": "url_l", "text": "text_l"}), "url_l")
        .join(texts.withColumnsRenamed({"url": "url_r", "text": "text_r"}), "url_r")
        .withColumn("match_len", extend("text_l", "text_r", "pos_l", "pos_r"))
        .groupBy("url_l", "url_r")
        .agg(F.max("match_len").alias("match_len"))
        .where(F.col("match_len") >= F.lit(cfg.substring_min_len))
        .select("url_l", "url_r", "match_len")
    )
