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
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig
from bigtrees_spark.functions.spark_udfs import make_winnow_udf

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

    w = Window.partitionBy("fp")
    # checkpoint: feeds both sides of both pair joins (see lsh.candidate_pairs)
    sized = (
        fps.withColumn("bsz", F.count("*").over(w))
        .withColumn("rnk", F.row_number().over(w.orderBy("url", "pos")))
        .localCheckpoint(eager=True)
    )
    small = sized.where(F.col("bsz") <= MAX_FP_BUCKET)
    big = sized.where(F.col("bsz") > MAX_FP_BUCKET)

    def pair(df: DataFrame, chained: bool) -> DataFrame:
        cond = F.col("l.url") < F.col("r.url")
        if chained:
            cond = (F.col("r.rnk") - F.col("l.rnk")).between(1, 3) & (
                F.col("l.url") != F.col("r.url")
            )
        return (
            df.alias("l")
            .join(df.alias("r"), "fp")
            .where(cond)
            .select(
                F.least(F.col("l.url"), F.col("r.url")).alias("url_l"),
                F.greatest(F.col("l.url"), F.col("r.url")).alias("url_r"),
                F.when(F.col("l.url") < F.col("r.url"), F.col("l.pos"))
                .otherwise(F.col("r.pos"))
                .alias("pos_l"),
                F.when(F.col("l.url") < F.col("r.url"), F.col("r.pos"))
                .otherwise(F.col("l.pos"))
                .alias("pos_r"),
            )
        )

    # up to 4 seed positions per pair: a lone seed can be a spurious short
    # match (same gram at unrelated positions); any seed inside the true
    # shared region extends to its full length, so max over a few suffices
    cands = (
        pair(small, False)
        .unionByName(pair(big, True))
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
