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
the extend step confirms a true >= min_len common substring.  The verify is
one byte-exact strategy routed PER DOCUMENT on each row's own length: a doc
that fits in one slice window ships verbatim (same bytes, statically
unsaturable); a longer doc ships the bounded substring(text, pos±W) slice so
full documents never ride the pair join, with a once-per-pair full-text
fallback only for window-saturated matches.  No corpus-level probe exists to
misroute: rare huge docs in a mostly-short corpus are sliced by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig
from bigtrees_spark.functions.spark_udfs import make_winnow_udf
from bigtrees_spark.operators import lsh

MAX_FP_BUCKET = 50  # fingerprint buckets above this are rank-chained like LSH

# seed-window half-width multiple: the sliced verify ships substring(text,
# pos±W) instead of full texts through the pair join (VERDICT r03 #1); W is
# EXTEND_WINDOW_MULT * substring_min_len bytes per side
EXTEND_WINDOW_MULT = 2



def winnow_table(docs: DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs(url, text) -> skinny (url, fp, pos) fingerprint rows."""
    w = make_winnow_udf(cfg)
    return (
        docs.select("url", w(F.col("text")).alias("fps"))
        .select("url", F.explode("fps").alias("f"))
        .select("url", F.col("f.fp").alias("fp"), F.col("f.pos").alias("pos"))
    )


def _extend_bytes(bl: bytes, br: bytes, pl: int, pr: int, w: int):
    """Greedy byte extend around matched gram positions.  Returns
    (match_len, l_exh_left, r_exh_left, l_exh_right, r_exh_right): the
    confirmed common-substring length (0 on hash collision) plus which
    input(s) the extension exhausted at each end — the caller decides
    whether an exhausted SLICE edge means the result is a lower bound."""
    if bl[pl : pl + w] != br[pr : pr + w]:
        return 0, False, False, False, False
    lo = 0
    while pl - lo - 1 >= 0 and pr - lo - 1 >= 0 and bl[pl - lo - 1] == br[pr - lo - 1]:
        lo += 1
    hi = w
    while pl + hi < len(bl) and pr + hi < len(br) and bl[pl + hi] == br[pr + hi]:
        hi += 1
    return (
        lo + hi,
        pl - lo == 0,           # l exhausted leftward
        pr - lo == 0,           # r exhausted leftward
        pl + hi == len(bl),     # l exhausted rightward
        pr + hi == len(br),     # r exhausted rightward
    )


_SLICED_EXTEND_SCHEMA = StructType(
    [StructField("mlen", IntegerType()), StructField("sat", BooleanType())]
)


# driver-side construction caches keyed by the frozen (hashable) config:
# UDF registration and the slice-column expression set are pure functions of
# cfg, and rebuilding them per call was pure py4j churn (OPTIMIZATION_r06.md)
_SLICED_UDFS: dict = {}
_FULL_UDFS: dict = {}
_SLICE_COLS: dict = {}


def make_sliced_extend_udf(cfg: FingerprintConfig = DEFAULT_CONFIG):
    """pandas UDF over byte SLICES: extend within substring(text, pos±W)
    windows; `sat` flags results truncated by a slice edge that is NOT a true
    text boundary (more_* args) — only those pairs re-extend on full texts."""
    cached = _SLICED_UDFS.get(cfg)
    if cached is not None:
        return cached

    @F.pandas_udf(_SLICED_EXTEND_SCHEMA)
    def extend_sliced(
        sl: pd.Series, sr: pd.Series,
        rel_l: pd.Series, rel_r: pd.Series,
        more_ll: pd.Series, more_rl: pd.Series,
        more_lr: pd.Series, more_rr: pd.Series,
    ) -> pd.DataFrame:
        w = cfg.winnow_gram
        mlens, sats = [], []
        for bl, br, pl, pr, mll, mrl, mlr, mrr in zip(
            sl, sr, rel_l, rel_r, more_ll, more_rl, more_lr, more_rr
        ):
            mlen, lel, rel_, ler, rer = _extend_bytes(
                bytes(bl or b""), bytes(br or b""), int(pl), int(pr), w
            )
            mlens.append(mlen)
            # inconclusive iff a slice edge stopped the scan where the real
            # text continues (on whichever side hit the edge)
            sats.append(
                bool(mlen)
                and ((lel and mll) or (rel_ and mrl) or (ler and mlr) or (rer and mrr))
            )
        return pd.DataFrame({"mlen": pd.Series(mlens, dtype="int32"), "sat": sats})

    _SLICED_UDFS[cfg] = extend_sliced
    return extend_sliced


def make_full_extend_udf(cfg: FingerprintConfig = DEFAULT_CONFIG):
    """pandas UDF: exact re-extend of window-saturated pairs on full byte
    texts, max over the pair's saturated seeds (<= 4)."""
    cached = _FULL_UDFS.get(cfg)
    if cached is not None:
        return cached

    @F.pandas_udf(IntegerType())
    def extend_full(tb_l: pd.Series, tb_r: pd.Series, seeds: pd.Series) -> pd.Series:
        w = cfg.winnow_gram
        out = []
        for bl, br, ss in zip(tb_l, tb_r, seeds):
            bl, br = bytes(bl or b""), bytes(br or b"")
            best = 0
            for s in ss:
                best = max(best, _extend_bytes(bl, br, int(s["pos_l"]), int(s["pos_r"]), w)[0])
            out.append(best)
        return pd.Series(out, dtype="int32")

    _FULL_UDFS[cfg] = extend_full
    return extend_full


def substring_edges(
    docs: DataFrame,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    persisted: list | None = None,
) -> DataFrame:
    """docs(url, text) -> edges(url_l, url_r, match_len) for pairs sharing a
    verified verbatim substring >= cfg.substring_min_len bytes.

    persisted (optional list): internal persist() handles (the skew-capped
    pairing cache and, on the sliced path, the per-pair extend cache) are
    appended so the caller can release them after the edges materialize.
    Without a list the handles stay cached for the session (they serve the
    returned lazy frame, so self-release here would force recomputation) —
    looping callers must pass `persisted` and unpersist after their last
    read, as bench.py's substring leg does (ADVICE r05)."""
    fps = winnow_table(docs, cfg)

    # shared skew-capped pairing core (lsh._skewcapped_pairs): item carries
    # the seed position, items sort by (url, pos), so l < r lexicographically
    # and same-doc combos are dropped by the url inequality below; over-cap
    # fingerprint buckets degrade to rank-chained pairs (no self-join on
    # either branch).  distinct=False: the seed groupBy below dedups anyway.
    items = fps.select("fp", F.struct("url", "pos").alias("item"))
    pairs = lsh._skewcapped_pairs(
        items, ["fp"], MAX_FP_BUCKET, skew_name="winnow_fps", distinct=False,
        persisted=persisted,
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

    # --- verify: ONE exact strategy, routed PER DOCUMENT (round-5 rework of
    # the r04 corpus-level sampled length probe, VERDICT r04 what's-wrong #3:
    # a sampled probe can misroute a mostly-short corpus with rare huge docs,
    # and the misclassification direction is the expensive one — full texts
    # on pair rows).  Routing on each row's own octet_length is deterministic
    # at any scale and needs no probe job:
    #
    #   * a doc that FITS IN ONE SLICE WINDOW (ln <= 2W+gram) ships verbatim
    #     as its own "slice" — the same bytes a window would carry, with the
    #     edge flags statically false, so it can never saturate;
    #   * a longer doc ships the bounded byte slice substring(tb, pos±W),
    #     projected IN THE SAME STAGE as the per-url text join, so the only
    #     shuffle that ships a full text is the per-url join input
    #     (unavoidable: texts must reach their pairs once) — everything
    #     downstream, including the second join's shuffle and the Arrow
    #     extend stage, carries <= 2W+gram bytes per row instead of two full
    #     documents.
    #
    # The extend is byte-exact within the window; results truncated by a
    # slice edge that is not a true text boundary are flagged `sat` and ONLY
    # those pairs re-extend against full texts (once per pair, not once per
    # seed) — exactness matches a full-text verify while collision and
    # short-match candidates never put a full text on a pair row.  On an
    # all-short corpus every row takes the verbatim branch, no pair ever
    # saturates, and the fallback stage is skipped after one count of the
    # cached skinny per-pair frame.
    W = EXTEND_WINDOW_MULT * cfg.substring_min_len
    slice_len = 2 * W + cfg.winnow_gram
    texts_b = docs.select(
        "url", F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("tb")
    ).withColumn("ln", F.octet_length("tb"))

    def _slice_cols(side: str) -> list:
        cached = _SLICE_COLS.get((cfg, side))
        if cached is not None:
            return cached
        pos = F.col(f"pos_{side}")
        whole = F.col("ln") <= F.lit(slice_len)
        start = F.when(whole, F.lit(0)).otherwise(F.greatest(pos - W, F.lit(0)))
        sl = F.when(whole, F.col("tb")).otherwise(
            F.substring("tb", start + 1, F.lit(slice_len))
        )
        cols = [
            sl.alias(f"sl_{side}"),
            (pos - start).alias(f"rel_{side}"),
            (~whole & (start > 0)).alias(f"more_{side}l"),
            (~whole & (start + F.octet_length(sl) < F.col("ln"))).alias(
                f"more_{side}r"
            ),
        ]
        _SLICE_COLS[(cfg, side)] = cols
        return cols

    extend_sliced = make_sliced_extend_udf(cfg)
    scored = (
        cands.join(texts_b.withColumnRenamed("url", "url_l"), "url_l")
        .select("url_l", "url_r", "pos_l", "pos_r", *_slice_cols("l"))
        .join(texts_b.withColumnRenamed("url", "url_r"), "url_r")
        .select(
            "url_l", "url_r", "pos_l", "pos_r",
            "sl_l", "rel_l", "more_ll", "more_lr", *_slice_cols("r"),
        )
        .withColumn(
            "e",
            extend_sliced(
                "sl_l", "sl_r", "rel_l", "rel_r",
                "more_ll", "more_rl", "more_lr", "more_rr",
            ),
        )
    )
    per_pair = scored.groupBy("url_l", "url_r").agg(
        F.max(F.when(~F.col("e.sat"), F.col("e.mlen"))).alias("m_ok"),
        F.slice(
            F.collect_list(F.when(F.col("e.sat"), F.struct("pos_l", "pos_r"))), 1, 4
        ).alias("sat_seeds"),
        # skinny (two urls + int + <=4 pos structs); consumed by both the
        # resolved and fallback branches — persist (NOT localCheckpoint: an
        # unreplicated checkpoint deletes lineage, so one lost executor after
        # it would fail the job unrecoverably at scale; a persisted frame
        # recomputes lost partitions from lineage) so the sliced-extend Arrow
        # stage runs ONCE, not once per branch
    ).persist()
    if persisted is not None:
        persisted.append(per_pair)
    resolved = per_pair.where(F.size("sat_seeds") == 0).select(
        "url_l", "url_r", F.col("m_ok").alias("match_len")
    )
    # the full (not limit-1) count materializes EVERY per_pair partition into
    # the cache, so both branches below read cached rows; docs shorter than
    # the slice window can never saturate, so the common short-doc corpus
    # skips the fallback branch (two joins + an Arrow stage) entirely
    if per_pair.where(F.size("sat_seeds") > 0).count() == 0:
        edges = resolved
    else:
        extend_full = make_full_extend_udf(cfg)
        texts_full = texts_b.select("url", "tb")
        fallback = (
            per_pair.where(F.size("sat_seeds") > 0)
            .join(texts_full.withColumnsRenamed({"url": "url_l", "tb": "tb_l"}), "url_l")
            .join(texts_full.withColumnsRenamed({"url": "url_r", "tb": "tb_r"}), "url_r")
            .withColumn("m_fb", extend_full("tb_l", "tb_r", "sat_seeds"))
            .select(
                "url_l",
                "url_r",
                F.greatest(F.coalesce("m_ok", F.lit(0)), "m_fb").alias("match_len"),
            )
        )
        edges = resolved.unionByName(fallback)
    return edges.where(F.col("match_len") >= F.lit(cfg.substring_min_len)).select(
        "url_l", "url_r", "match_len"
    )
