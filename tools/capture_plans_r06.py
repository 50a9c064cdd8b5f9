"""Capture .explain('formatted') for each bench query's result frame into
plans/r06/<query>_<tag>.txt (tag = before/after).  Driver-only: builds the
lazy frames without executing the eager pipeline internals where avoidable —
for near_dedup/substring the operators contain eager counts, so those run
(at sf0.001 by default) to let the final frame be constructed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _corpus  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def cap(name, df):
    os.makedirs(OUT, exist_ok=True)
    p = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(p, "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
    print(f"wrote {p}")


def main():
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    from pyspark.sql import functions as F

    from bigtrees_spark.session import get_spark

    spark = get_spark(cores=8, app_name=f"plans_r06_{TAG}")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = SF_DIR

    # near_dedup_e2e: final clusters frame
    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

    res = near_dedup_pipeline(_corpus(spark, sf_dir), persist=True, pre_partitioned=True)
    cap("near_dedup_clusters", res.clusters)
    res.unpersist()

    # exact_dupes_report
    from bigtrees_spark.operators.dedup import dupes_report

    c = _corpus(spark, sf_dir).select(
        "url", F.length("text").alias("nbytes"), F.sha2("text", 256).alias("sha256")
    )
    cap("exact_dupes_report", dupes_report(c, limit=100))

    # digest_tree
    from bigtrees_spark.operators.digest import partition_digests, rollup_digest_tree

    c2 = _corpus(spark, sf_dir).select(
        "url", F.length("text").alias("nbytes"), F.sha2("text", 256).alias("sha256")
    )
    cap("digest_tree", rollup_digest_tree(partition_digests(c2, n_buckets=128)))

    # substring_pass
    from bigtrees_spark.operators.substring import substring_edges

    corpus = _corpus(spark, sf_dir).select("url", "text").persist()
    handles: list = []
    cap("substring_edges", substring_edges(corpus, persisted=handles))
    for h in handles:
        h.unpersist()
    corpus.unpersist()

    # ann_topk
    from bigtrees_spark.operators.similarity import brute_force_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    cap("ann_topk", brute_force_topk(e.where(F.col("vec_id") < 100), e, k=10))

    # textstats_profile
    from bigtrees_spark.operators.textstats import doc_profile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    cap("textstats_profile", doc_profile(d).where("quality_ok"))

    spark.stop()


if __name__ == "__main__":
    main()
