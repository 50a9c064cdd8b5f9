"""Standalone N-vs-4N scaling evidence run (BASELINE.md methodology):
same job + same input at local[8] and local[32], sequential, exclusive.
Writes one JSON line to the path given as argv[1]."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling_result.json"
    n_variants = int(os.environ.get("SPARK_GRAFT_SCALE_VARIANTS", "64"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

    results = {}
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "32"))
    for cores in (lo, hi):
        spark = bench._bench_session(cores)
        try:
            near_dedup_pipeline(
                bench._corpus(spark, sf_dir).limit(400), persist=False
            ).clusters.count()
            corpus = bench._scaling_corpus(spark, sf_dir, n_variants)
            t0 = time.time()
            res = near_dedup_pipeline(corpus, persist=True)
            n = res.clusters.count()
            dt = time.time() - t0
            res.unpersist()
        finally:
            spark.stop()
        results[cores] = {"sec": round(dt, 1), "docs": n, "docs_per_sec": round(n / dt, 1)}

    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    out = {
        "sf_dir": sf_dir,
        "n_variants": n_variants,
        "docs": results[lo]["docs"],
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "cores_low": lo,
        "cores_high": hi,
        "scaling_efficiency": round(eff, 3),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
