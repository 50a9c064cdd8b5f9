"""CC round-trimming experiment (VERDICT r02 #8): measure rounds + wall time
of the distributed large-star/small-star loop on the 1.28M-doc derived corpus,
current loop vs a min-label pre-contraction seed.

Pre-contraction: one pass computing m(u) = min(N(u) u {u}) and rewriting every
edge (u, v) -> (m(u), m(v)), dropping self-loops.  This collapses stars and
chains of length <= 2 before the first star round — on near-dup graphs (mostly
tiny components) it can remove whole rounds.  Cost: one agg + two joins (~3/4
of a star round).

Usage: python tools/cc_rounds_experiment.py [n_variants]
Writes one JSON line per variant leg to stdout; run under a quiet window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def star_loop(e, max_iter=25, pre_contract=False):
    """Replica of cc.connected_components' distributed loop with round
    instrumentation (and the optional pre-contraction seed under test).

    pre_contract composes labels back through the contraction map:
    label(u) = inner_label(m(u)), where m(u) = min(N(u) u {u}) is in u's
    component by construction and min(M) = min(C) because the component's
    global min maps to itself."""
    from bigtrees_spark.operators.cc import _checksum, _large_star, _small_star, _symmetric

    rounds = 0
    m = None
    if pre_contract:
        sym = _symmetric(e)
        m = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("u", "mv").alias("m")).localCheckpoint()
        e = (
            e.join(m.withColumnsRenamed({"u": "u0", "m": "mu"}), F.col("u") == F.col("u0"))
            .join(m.withColumnsRenamed({"u": "v0", "m": "mv2"}), F.col("v") == F.col("v0"))
            .select(F.col("mu").alias("u"), F.col("mv2").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
    prev = _checksum(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        rounds += 1
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    labels = e.select(F.col("u").alias("url"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("url")).distinct().withColumn(
        "cluster_id", F.col("url")
    )
    out = labels.unionByName(roots).groupBy("url").agg(
        F.min("cluster_id").alias("cluster_id")
    )
    if pre_contract:
        inner = out.withColumnsRenamed({"url": "m", "cluster_id": "cid"})
        out = m.join(inner, "m", "left").select(
            F.col("u").alias("url"),
            F.coalesce(F.col("cid"), F.col("m")).alias("cluster_id"),
        )
    return out, rounds


def main():
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    n_variants = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import bench
    from bigtrees_spark.operators import lsh
    from bigtrees_spark.operators.fingerprint import fingerprint_docs
    from bigtrees_spark.session import get_spark

    spark = get_spark(cores=8, app_name="cc_rounds")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = bench._scaling_corpus(spark, bench._sf_dir(), n_variants=n_variants)

    docs_fp = fingerprint_docs(corpus)
    clean = docs_fp.where(F.col("error").isNull())
    winners = clean.groupBy("sha256").agg(F.min("url").alias("url"))
    band_src = clean.select("url", "bands").join(winners.select("url"), "url", "left_semi")
    pairs = lsh.candidate_pairs(band_src)
    edges = lsh.verify_pairs(pairs, clean)
    e = (
        edges.select(F.col("url_l").alias("u"), F.col("url_r").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = e.count()
    print(json.dumps({"n_variants": n_variants, "n_edges": n_edges}), flush=True)

    results = {}
    # alternating legs, 2 reps each
    for rep in range(2):
        for name, pre in [("baseline", False), ("pre_contract", True)]:
            t0 = time.time()
            labels, rounds = star_loop(e, pre_contract=pre)
            n_labels = labels.count()
            chk = labels.agg(
                F.coalesce(F.bit_xor(F.xxhash64("url", "cluster_id")), F.lit(0))
            ).collect()[0][0]
            dt = round(time.time() - t0, 2)
            row = {"variant": name, "rep": rep, "rounds": rounds,
                   "sec": dt, "n_labels": n_labels, "labels_checksum": int(chk)}
            results.setdefault(name, []).append(row)
            print(json.dumps(row), flush=True)

    # labels must be identical across variants
    chks = {tuple(sorted({r["labels_checksum"] for r in v})) for v in results.values()}
    print(json.dumps({"checksums_agree": len(chks) == 1,
                      "checksums": sorted(str(c) for c in chks)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
