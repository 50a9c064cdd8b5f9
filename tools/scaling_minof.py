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


def _tree_cpu_seconds() -> float:
    """CPU seconds (utime+stime) consumed by this process and every live
    descendant (driver JVM, executor threads, Python workers) — read from
    /proc.  Deltas of this are STEAL-RESISTANT: neighbor tenants inflate
    wall time but not our processes' CPU time, so cpu_lo ~= cpu_hi across
    parallelism levels is direct evidence the engine does the same total
    work at N and 4N (no work inflation term), independent of tenancy."""
    import os

    me = os.getpid()
    ppid: dict[int, int] = {}
    ticks: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: fields resume after the last ')'
        rest = s[s.rindex(")") + 2 :].split()
        pid = int(d)
        ppid[pid] = int(rest[1])          # field 4
        ticks[pid] = int(rest[11]) + int(rest[12])  # utime+stime (14,15)
    total = 0
    for pid in ticks:
        p = pid
        for _ in range(64):  # walk ancestry
            if p == me:
                total += ticks[pid]
                break
            p = ppid.get(p, 0)
            if p <= 1:
                break
    return total / os.sysconf("SC_CLK_TCK")


def materialize(
    sf_dir: str, n_variants: int, path: str, cores: int = 16, spark=None
) -> None:
    """One-time, UNTIMED: write the derived scaling corpus to parquet.  Every
    leg then reads the identical bytes, and corpus synthesis (a sandbox-only
    step — a real 100 TB input arrives as a table) is excluded from the
    measured job, which becomes exactly the north-rule job: the dedup
    pipeline over a parquet/Iceberg-shaped table.  Legs before round-4e
    derived the corpus lazily inside the timed region instead; that work was
    embarrassingly parallel, so it inflated both legs' walls equally, but
    excluding it is the cleaner measurement."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    import bench

    own = spark is None
    if own:
        spark = bench._bench_session(cores)
    try:
        bench._scaling_corpus(spark, sf_dir, n_variants).write.mode(
            "overwrite"
        ).parquet(path)
    finally:
        if own:  # caller-provided sessions stay alive (shared local JVM)
            spark.stop()


def one_run(cores: int, corpus_path: str, sf_dir: str) -> tuple[float, int, float]:
    import bench
    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

    spark = bench._bench_session(cores)
    try:
        near_dedup_pipeline(
            bench._corpus(spark, sf_dir).limit(400), persist=False
        ).clusters.count()
        corpus = spark.read.parquet(corpus_path)
        cpu0 = _tree_cpu_seconds()
        t0 = time.time()
        res = near_dedup_pipeline(corpus, persist=True)
        n = res.clusters.count()
        dt = time.time() - t0
        cpu = _tree_cpu_seconds() - cpu0
        res.unpersist()
    finally:
        spark.stop()
    return dt, n, round(cpu, 1)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/results/scaling_minof.json"
    k = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "32"))
    n_variants = int(os.environ.get("SPARK_GRAFT_SCALE_VARIANTS", "64"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    tag = os.path.basename(sf_dir.rstrip("/"))
    # key the cache on the DERIVATION CODE too: the _SUCCESS short-circuit in
    # materialize() would otherwise keep serving a corpus derived by an older
    # bench._scaling_corpus after the derivation changes
    import hashlib
    import inspect

    import bench

    deriv = hashlib.sha256(
        inspect.getsource(bench._scaling_corpus).encode()
    ).hexdigest()[:8]
    corpus_path = os.environ.get(
        "SPARK_GRAFT_SCALE_CORPUS",
        f"/tmp/scaling_corpus_{tag}_v{n_variants}_{deriv}.parquet",
    )
    materialize(sf_dir, n_variants, corpus_path)

    def _jiffies() -> list[int]:
        with open("/proc/stat") as f:
            # user nice system idle iowait irq softirq steal
            return [int(x) for x in f.readline().split()[1:9]]

    times: dict[int, list[float]] = {lo: [], hi: []}
    cpus: dict[int, list[float]] = {lo: [], hi: []}
    steals: dict[int, list[float]] = {lo: [], hi: []}
    docs = 0
    for rep in range(k):
        for cores in (lo, hi):  # alternate so noise hits both legs equally
            load0 = open("/proc/loadavg").read().split()[0]
            j0 = _jiffies()
            dt, docs, cpu = one_run(cores, corpus_path, sf_dir)
            dj = [b - a for a, b in zip(j0, _jiffies())]
            # hypervisor steal during the leg, % of all cpu-time: neighbor
            # tenants of the VM HOST take real cycles without raising our
            # own loadavg — the contention term the load trace can't see
            steal = round(dj[7] / max(sum(dj), 1) * 100, 1)
            times[cores].append(round(dt, 1))
            cpus[cores].append(cpu)
            steals[cores].append(steal)
            # append progress after every leg so partial results survive kills
            with open(out_path + ".progress", "a") as f:
                f.write(json.dumps({
                    "rep": rep, "cores": cores, "sec": round(dt, 1),
                    "cpu_sec": cpu, "load_start": load0,
                    "load_end": open("/proc/loadavg").read().split()[0],
                    "steal_pct": steal,
                }) + "\n")

    t_lo, t_hi = min(times[lo]), min(times[hi])
    eff = (docs / t_hi) / (docs / t_lo) / (hi / lo)
    out = {
        "sf_dir": sf_dir,
        "n_variants": n_variants,
        "docs": docs,
        "reps": k,
        "method": "min-of-k alternating (multi-tenant host)",
        "input": f"pre-materialized parquet ({corpus_path})",
        "all_times": {str(c): ts for c, ts in times.items()},
        # process-tree CPU seconds per leg: steal-resistant work metric —
        # cpu_lo ~= cpu_hi means the engine does the same total work at both
        # parallelism levels (no work-inflation term), whatever the tenancy
        "cpu_seconds": {str(c): ts for c, ts in cpus.items()},
        # hypervisor steal %% per leg (tenancy invisible to our loadavg);
        # a leg with steal ~0 is a genuinely quiet observation
        "steal_pct": {str(c): ts for c, ts in steals.items()},
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
