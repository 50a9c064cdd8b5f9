"""Min-of-k scaling measurement for a noisy shared host: alternate the two
parallelism levels k times each, take the per-leg MINIMUM wall time (the
least-contended observation), report efficiency from the minima.

Methodology note (BASELINE.md): the sandbox host is multi-tenant with load
average 2-20 from other tenants; single measurements of the identical config
vary by up to 1.8x.  Min-of-k isolates the engine's scaling behavior from
neighbor noise without cherry-picking — both legs get the same k attempts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def one_run(cores: int, sf_dir: str, n_variants: int) -> tuple[float, int]:
    import bench
    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

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
        res.docs_fp.unpersist()
    finally:
        spark.stop()
    return dt, n


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling_minof.json"
    k = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "32"))
    n_variants = int(os.environ.get("SPARK_GRAFT_SCALE_VARIANTS", "64"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    times: dict[int, list[float]] = {lo: [], hi: []}
    docs = 0
    for rep in range(k):
        for cores in (lo, hi):  # alternate so noise hits both legs equally
            dt, docs = one_run(cores, sf_dir, n_variants)
            times[cores].append(round(dt, 1))
            # append progress after every leg so partial results survive kills
            with open(out_path + ".progress", "a") as f:
                f.write(json.dumps({"rep": rep, "cores": cores, "sec": round(dt, 1)}) + "\n")

    t_lo, t_hi = min(times[lo]), min(times[hi])
    eff = (docs / t_hi) / (docs / t_lo) / (hi / lo)
    out = {
        "sf_dir": sf_dir,
        "n_variants": n_variants,
        "docs": docs,
        "reps": k,
        "method": "min-of-k alternating (multi-tenant host)",
        "all_times": {str(c): ts for c, ts in times.items()},
        f"local{lo}": {"sec": t_lo, "docs_per_sec": round(docs / t_lo, 1)},
        f"local{hi}": {"sec": t_hi, "docs_per_sec": round(docs / t_hi, 1)},
        "cores_low": lo,
        "cores_high": hi,
        "scaling_efficiency": round(eff, 3),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
