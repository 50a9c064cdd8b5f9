"""Micro-experiments inside verify_pairs and the substring per_pair job.

Decomposes the two expensive jobs into sub-steps and A/B's alternatives:
  verify: distinct cost, sig-join+est cost, exact cost, fused single-job cost,
          and the no-prefilter variant (edge-set equality checked).
  substring: per_pair job with the current join shape vs. explicit broadcast
             of the small pair side.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _corpus  # noqa: E402


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"  {label}: {round(time.time()-t0,3)}s -> {r}", flush=True)
    return r


def main():
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from bigtrees_spark.config import DEFAULT_CONFIG as cfg
    from bigtrees_spark.operators import lsh
    from bigtrees_spark.operators.fingerprint import fingerprint_docs
    from bigtrees_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")), app_name="exp_verify")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    corpus = _corpus(spark, sf_dir)
    docs_fp = fingerprint_docs(corpus, cfg, ensure_parallelism=False, compute_simhash=False).drop("text").persist()
    docs_fp.write.format("noop").mode("overwrite").save()
    clean_fp = docs_fp.where(F.col("error").isNull())
    winners = clean_fp.groupBy("sha256").agg(F.min("url").alias("url")).persist()
    winners.count()
    band_src = clean_fp.select("url", "bands").join(winners.select("url"), "url", "left_semi")
    handles: list = []
    pairs = lsh.candidate_pairs(band_src, cfg, persisted=handles)

    # warm: one full verify to stabilize codegen/broadcast paths
    h2: list = []
    lsh.verify_pairs(pairs, clean_fp, cfg, persisted=h2).count()
    for h in h2:
        h.unpersist()

    print("verify decomposition:", flush=True)
    t("pairs.count (from multi cache)", pairs.count)
    pd_ = pairs.persist()
    t("pairs.persist.count", pd_.count)

    sigs = clean_fp.select("url", "minhash")
    est = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")), F.lit(0), lambda acc, x: acc + x
    ) / F.greatest(F.size(a), F.lit(1))
    thr = cfg.jaccard_threshold
    margin = 4.5 * (thr * (1.0 - thr) / cfg.n_perms) ** 0.5
    pre_frame = (
        pd_.join(sigs.withColumnsRenamed({"url": "url_l", "minhash": "sig_l"}), "url_l")
        .join(sigs.withColumnsRenamed({"url": "url_r", "minhash": "sig_r"}), "url_r")
        .withColumn("est_j", est(F.col("sig_l"), F.col("sig_r")))
        .where(F.col("est_j") >= F.lit(max(0.0, thr - margin)))
        .select("url_l", "url_r")
    )
    t("sig-join+est+filter count (no persist)", pre_frame.count)
    t("sig-join+est again (warm)", pre_frame.count)

    sh = clean_fp.select("url", "shingles")
    inter = F.size(F.array_intersect(F.col("sh_l"), F.col("sh_r")))
    union = F.size(F.array_union(F.col("sh_l"), F.col("sh_r")))

    def exact_from(src):
        return (
            src.join(sh.withColumnsRenamed({"url": "url_l", "shingles": "sh_l"}), "url_l")
            .join(sh.withColumnsRenamed({"url": "url_r", "shingles": "sh_r"}), "url_r")
            .withColumn(
                "jaccard",
                F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union.cast("double")),
            )
            .where(F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
            .select("url_l", "url_r", "jaccard")
        )

    pre_p = pre_frame.persist()
    t("pre.persist.count", pre_p.count)
    t("exact from cached pre", exact_from(pre_p).count)
    t("FUSED: exact(pre_frame) single job (pre not persisted)", exact_from(pre_frame).count)
    t("NO-PREFILTER: exact(pairs) single job", exact_from(pd_).count)

    a = exact_from(pre_p).select("url_l", "url_r", "jaccard")
    b = exact_from(pd_).select("url_l", "url_r", "jaccard")
    diff = a.unionByName(b).groupBy("url_l", "url_r", "jaccard").count().where("count != 2").count()
    print(f"  edge-set diff (prefilter vs none): {diff} rows", flush=True)
    pre_p.unpersist()
    pd_.unpersist()
    for h in handles:
        h.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
