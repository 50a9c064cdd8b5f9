"""bench.py artifact helpers (pure python — no SparkSession)."""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_best_recorded_scaling_pair_prefers_latest_round():
    """The embedded pair must come from the HIGHEST round present (current
    engine), not an older round with a better wall ratio — r2's 0.899 was
    measured on round-2 code and must not shadow round-4 artifacts."""
    bench = _load_bench()
    best = bench._best_recorded_scaling_pair()
    assert best is not None
    # repo root carries r2/r3/r4 artifacts; r4 is the newest round recorded
    assert "_r4" in best["source"]
    for key in (
        "docs",
        "cores_low",
        "cores_high",
        "sec_low",
        "sec_high",
        "docs_per_sec_low",
        "docs_per_sec_high",
        "wall_efficiency",
    ):
        assert key in best, key
    # round-4 artifacts carry CPU-seconds -> the steal-resistant decomposition
    # must surface in the summary
    assert "cpu_work_ratio_hi_over_lo" in best
    assert "cpu_derived_efficiency" in best


def test_best_recorded_pair_math_matches_artifact():
    """Cross-check the summary against the raw artifact it names."""
    bench = _load_bench()
    best = bench._best_recorded_scaling_pair()
    with open(os.path.join("/root/repo", best["source"])) as f:
        raw = json.load(f)
    lo, hi = raw["cores_low"], raw["cores_high"]
    assert best["sec_low"] == raw[f"local{lo}"]["sec"]
    assert best["sec_high"] == raw[f"local{hi}"]["sec"]
    assert best["wall_efficiency"] == raw["scaling_efficiency"]
    cpu_lo = min(raw["cpu_seconds"][str(lo)])
    cpu_hi = min(raw["cpu_seconds"][str(hi)])
    assert best["cpu_work_ratio_hi_over_lo"] == round(cpu_hi / cpu_lo, 3)
    assert best["cpu_derived_efficiency"] == round((cpu_lo / lo) / (cpu_hi / hi) / (hi / lo), 3)


def _load_scaling_tool():
    spec = importlib.util.spec_from_file_location(
        "scaling_minof_mod",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "scaling_minof.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_materialized_scaling_corpus_roundtrip(spark, tmp_path):
    """The pre-materialized scaling input must (a) equal the live-derived
    corpus byte-for-byte (count + order-independent content hash), so every
    leg measures the same job, and (b) be idempotent — a second materialize
    call must not rewrite (legs share one copy)."""
    from pyspark.sql import functions as F

    import bench

    tool = _load_scaling_tool()
    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "scaling_corpus.parquet")

    os.environ["SPARK_GRAFT_SCALE_VARIANTS"] = "4"
    try:
        live = bench._scaling_corpus(spark, sf, 4)
        tool.materialize(sf, 4, path, spark=spark)
        mtime0 = os.path.getmtime(os.path.join(path, "_SUCCESS"))
        tool.materialize(sf, 4, path, spark=spark)  # second call: no-op
        assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime0

        stored = spark.read.parquet(path)

        def sig(df):
            r = df.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("url", "text")).alias("x"),
            ).collect()[0]
            return r.n, r.x

        assert sig(stored) == sig(live)
    finally:
        os.environ.pop("SPARK_GRAFT_SCALE_VARIANTS", None)
