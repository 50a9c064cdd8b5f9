"""A/B config experiments on the two hot bench legs (fresh session per
variant, bench-identical warmup, 2 timed legs each, min reported)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _sf_dir, run_ann, run_dedup, run_digest_tree, run_exact_dupes, run_substring, run_textstats  # noqa: E402

VARIANTS = {
    "base": {},
    "cachedAQE": {"spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true"},
    "cachedAQE+sp32": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        "spark.sql.shuffle.partitions": "32",
    },
}

QUERIES = {
    "near_dedup": run_dedup,
    "substring": run_substring,
    "exact": run_exact_dupes,
    "digest": run_digest_tree,
    "ann": run_ann,
    "textstats": run_textstats,
}


def run_variant(name, conf, sf_dir):
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    from bigtrees_spark.session import get_spark

    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        app_name=f"exp_conf_{name}",
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for fn in QUERIES.values():
        fn(spark, warm)
    out = {}
    for leg in range(2):
        for qn, fn in QUERIES.items():
            t0 = time.time()
            fn(spark, sf_dir)
            out.setdefault(qn, []).append(round(time.time() - t0, 3))
    spark.stop()
    return out


def main():
    sf_dir = _sf_dir()
    which = sys.argv[1:] or list(VARIANTS)
    res = {}
    for name in which:
        print(f"--- {name} ---", flush=True)
        legs = run_variant(name, VARIANTS[name], sf_dir)
        mins = {q: min(ts) for q, ts in legs.items()}
        mins["TOTAL"] = round(sum(mins.values()), 3)
        res[name] = {"legs": legs, "min": mins}
        print(json.dumps(res[name]), flush=True)
    print(json.dumps({k: v["min"] for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
