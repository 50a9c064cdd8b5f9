"""Round-6 per-stage profiler: attributes near_dedup_e2e / substring_pass
bench wall time to individual materializing jobs (guide §1: measure first).

Replicates bench.py's corpus derivation and query bodies, inserting timers at
every eager point (the operators' internal counts run inside the timed calls,
so call boundaries = job boundaries).  NOT a benchmark artifact — a
diagnostic; numbers are single-leg and window-dependent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _corpus, _sf_dir  # noqa: E402


def t(label, fn, out):
    t0 = time.time()
    r = fn()
    dt = round(time.time() - t0, 3)
    out[label] = dt
    print(f"  {label}: {dt}s", flush=True)
    return r


def profile_near_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigtrees_spark.config import DEFAULT_CONFIG as cfg
    from bigtrees_spark.operators import cc, lsh

    out: dict = {}
    print("near_dedup_e2e stages:", flush=True)
    corpus = _corpus(spark, sf_dir)

    from bigtrees_spark.operators.fingerprint import fingerprint_docs

    docs_fp = fingerprint_docs(
        corpus, cfg, ensure_parallelism=False, compute_simhash=False
    ).drop("text").persist()
    # materialize the fingerprint cache alone (bench folds this into the
    # first pairing job; here we split it out)
    t("fingerprint_persist(noop)", lambda: docs_fp.write.format("noop").mode("overwrite").save(), out)

    clean_fp = docs_fp.where(F.col("error").isNull())
    err_fp = docs_fp.where(F.col("error").isNotNull())
    winners = clean_fp.groupBy("sha256").agg(F.min("url").alias("url")).persist()
    t("winners_count", winners.count, out)
    rep_urls = winners.select("url")
    band_src = clean_fp.select("url", "bands").join(rep_urls, "url", "left_semi")

    handles: list = []
    pairs = t(
        "candidate_pairs(incl multi.count)",
        lambda: lsh.candidate_pairs(band_src, cfg, persisted=handles),
        out,
    )
    edges = t(
        "verify_pairs(incl pre.count)",
        lambda: lsh.verify_pairs(pairs, clean_fp, cfg, persisted=handles),
        out,
    )
    e = edges.select(
        F.col("url_l").alias("u"), F.col("url_r").alias("v")
    ).where(F.col("u") != F.col("v")).distinct().persist()
    n_edges = t("cc_entry_count", e.count, out)
    print(f"    (n_edges={n_edges})")
    pdf = t("cc_toPandas", e.toPandas, out)
    labels = t("cc_driver_solve+createDF", lambda: cc._driver_cc(e), out)
    rep_labels = winners.join(labels, "url", "left").select(
        "sha256", F.coalesce(F.col("cluster_id"), F.col("url")).alias("cluster_id")
    )
    clusters = clean_fp.select("url", "sha256").join(rep_labels, "sha256").select(
        "url", "cluster_id"
    ).unionByName(err_fp.select("url", F.col("url").alias("cluster_id")))
    t("clusters_count", clusters.count, out)
    for h in handles:
        h.unpersist()
    winners.unpersist()
    docs_fp.unpersist()
    e.unpersist()
    out["TOTAL"] = round(sum(v for k, v in out.items() if k != "TOTAL"), 3)
    print(f"  TOTAL: {out['TOTAL']}s", flush=True)
    return out


def profile_substring(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigtrees_spark.config import DEFAULT_CONFIG as cfg
    from bigtrees_spark.operators import lsh
    from bigtrees_spark.operators.substring import (
        EXTEND_WINDOW_MULT,
        MAX_FP_BUCKET,
        make_sliced_extend_udf,
        winnow_table,
    )

    out: dict = {}
    print("substring_pass stages:", flush=True)
    corpus = _corpus(spark, sf_dir).select("url", "text").persist()
    t("corpus_persist(noop)", lambda: corpus.write.format("noop").mode("overwrite").save(), out)

    fps = winnow_table(corpus, cfg)
    items = fps.select("fp", F.struct("url", "pos").alias("item"))
    handles: list = []
    pairs = t(
        "winnow+pairing(incl multi.count)",
        lambda: lsh._skewcapped_pairs(
            items, ["fp"], MAX_FP_BUCKET, skew_name="winnow_fps", distinct=False,
            persisted=handles,
        ).where(F.col("l.url") != F.col("r.url")),
        out,
    )
    cands = (
        pairs.select(
            F.col("l.url").alias("url_l"), F.col("r.url").alias("url_r"),
            F.col("l.pos").alias("pos_l"), F.col("r.pos").alias("pos_r"),
        )
        .groupBy("url_l", "url_r")
        .agg(F.slice(F.collect_list(F.struct("pos_l", "pos_r")), 1, 4).alias("seeds"))
        .select("url_l", "url_r", F.explode("seeds").alias("s"))
        .select("url_l", "url_r", F.col("s.pos_l").alias("pos_l"), F.col("s.pos_r").alias("pos_r"))
    )
    W = EXTEND_WINDOW_MULT * cfg.substring_min_len
    slice_len = 2 * W + cfg.winnow_gram
    texts_b = corpus.select(
        "url", F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("tb")
    ).withColumn("ln", F.octet_length("tb"))

    def _slice_cols(side):
        pos = F.col(f"pos_{side}")
        whole = F.col("ln") <= F.lit(slice_len)
        start = F.when(whole, F.lit(0)).otherwise(F.greatest(pos - W, F.lit(0)))
        sl = F.when(whole, F.col("tb")).otherwise(F.substring("tb", start + 1, F.lit(slice_len)))
        return [
            sl.alias(f"sl_{side}"),
            (pos - start).alias(f"rel_{side}"),
            (~whole & (start > 0)).alias(f"more_{side}l"),
            (~whole & (start + F.octet_length(sl) < F.col("ln"))).alias(f"more_{side}r"),
        ]

    extend_sliced = make_sliced_extend_udf(cfg)
    scored = (
        cands.join(texts_b.withColumnRenamed("url", "url_l"), "url_l")
        .select("url_l", "url_r", "pos_l", "pos_r", *_slice_cols("l"))
        .join(texts_b.withColumnRenamed("url", "url_r"), "url_r")
        .select(
            "url_l", "url_r", "pos_l", "pos_r",
            "sl_l", "rel_l", "more_ll", "more_lr", *_slice_cols("r"),
        )
        .withColumn("e", extend_sliced(
            "sl_l", "sl_r", "rel_l", "rel_r", "more_ll", "more_rl", "more_lr", "more_rr"))
    )
    per_pair = scored.groupBy("url_l", "url_r").agg(
        F.max(F.when(~F.col("e.sat"), F.col("e.mlen"))).alias("m_ok"),
        F.slice(
            F.collect_list(F.when(F.col("e.sat"), F.struct("pos_l", "pos_r"))), 1, 4
        ).alias("sat_seeds"),
    ).persist()
    n_sat = t("per_pair_count(sat probe)", lambda: per_pair.where(F.size("sat_seeds") > 0).count(), out)
    print(f"    (n_sat={n_sat})")
    resolved = per_pair.where(F.size("sat_seeds") == 0).select(
        "url_l", "url_r", F.col("m_ok").alias("match_len")
    )
    edges = resolved.where(F.col("match_len") >= F.lit(cfg.substring_min_len))
    t("edges_count", edges.count, out)
    per_pair.unpersist()
    for h in handles:
        h.unpersist()
    corpus.unpersist()
    out["TOTAL"] = round(sum(v for k, v in out.items() if k != "TOTAL"), 3)
    print(f"  TOTAL: {out['TOTAL']}s", flush=True)
    return out


def main():
    sf_dir = _sf_dir()
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    from bigtrees_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, app_name="profile_r06")
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench: sf0.001 pass of both profiled bodies
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    print("warming...", flush=True)
    profile_near_dedup(spark, warm_dir)
    profile_substring(spark, warm_dir)
    print("=== timed (sf under test) ===", flush=True)
    res = {}
    for leg in range(int(os.environ.get("PROFILE_LEGS", "2"))):
        res[f"near_dedup_leg{leg}"] = profile_near_dedup(spark, sf_dir)
        res[f"substring_leg{leg}"] = profile_substring(spark, sf_dir)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
