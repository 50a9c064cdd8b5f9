"""Checkpoint/resume: a killed job must not recompute completed partitions
(north_rule resumability; FIXTURES.md T4 test plan)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigtrees_spark.plans.runmeta import RunContext, resumable_fingerprint


@pytest.fixture()
def tmp_paths(tmp_path):
    return str(tmp_path / "metrics"), str(tmp_path / "docs_fp")


def _file_mtimes(path: str) -> dict[str, float]:
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_full_run_then_resume_is_noop(spark, pages, tmp_paths):
    metrics, out = tmp_paths
    ctx = RunContext.new(spark, metrics, "run1")
    fp1 = resumable_fingerprint(ctx, pages, out, n_buckets=8)
    n1 = fp1.count()
    assert n1 == pages.count()
    mt1 = _file_mtimes(out)

    # resume with everything done: no bucket recomputed, no file rewritten
    ctx2 = RunContext.new(spark, metrics, "run2")
    fp2 = resumable_fingerprint(ctx2, pages, out, n_buckets=8)
    assert fp2.count() == n1
    assert _file_mtimes(out) == mt1


def test_partial_failure_recomputes_only_missing(spark, pages, tmp_paths):
    metrics, out = tmp_paths
    ctx = RunContext.new(spark, metrics, "run1")

    # simulate a killed job: only buckets {0,1,2} completed
    from bigtrees_spark.operators.digest import bucket_of

    pages_b = pages.withColumn("bucket", bucket_of("url", 8))
    done = pages_b.where(F.col("bucket") < 3)
    from bigtrees_spark.operators.fingerprint import fingerprint_docs

    fingerprint_docs(done).withColumn("bucket", bucket_of("url", 8)).write.mode(
        "append"
    ).partitionBy("bucket").parquet(out)
    ctx.mark_done([0, 1, 2], "fingerprint")
    mt_before = _file_mtimes(out)

    # resume: must compute exactly buckets 3..7 and leave 0..2 untouched
    ctx2 = RunContext.new(spark, metrics, "run2")
    pending = ctx2.pending_buckets(pages_b.select("bucket").distinct(), "fingerprint")
    assert {r.bucket for r in pending.collect()} == {3, 4, 5, 6, 7}

    fp = resumable_fingerprint(ctx2, pages, out, n_buckets=8)
    assert fp.count() == pages.count()
    for p, m in mt_before.items():
        assert os.path.getmtime(p) == m, f"completed partition rewritten: {p}"

    # all buckets now done
    ctx3 = RunContext.new(spark, metrics, "run3")
    assert ctx3.pending_buckets(pages_b.select("bucket").distinct(), "fingerprint").count() == 0


def test_invalidate_reopens_buckets(spark, pages, tmp_paths):
    metrics, out = tmp_paths
    ctx = RunContext.new(spark, metrics, "run1")
    resumable_fingerprint(ctx, pages, out, n_buckets=8)
    ctx.invalidate([2, 5], "fingerprint", out_path=out)
    pending = ctx.pending_buckets(
        spark.range(8).select(F.col("id").alias("bucket")), "fingerprint"
    )
    assert {r.bucket for r in pending.collect()} == {2, 5}
    # the stale partitions are gone, so the rerun truly recomputes them
    assert not os.path.isdir(f"{out}/bucket=2")
    fp = resumable_fingerprint(RunContext.new(spark, metrics, "run2"), pages, out, n_buckets=8)
    assert fp.count() == pages.count()


def test_crash_between_publish_and_mark_done_no_duplicates(spark, pages, tmp_paths):
    """A committed-but-unmarked bucket (crash in the publish/mark window) is
    reconciled as done on resume — no duplicate rows appended."""
    metrics, out = tmp_paths
    ctx = RunContext.new(spark, metrics, "run1")
    fp1 = resumable_fingerprint(ctx, pages, out, n_buckets=8)
    n1 = fp1.count()

    # simulate the crash: all bucket dirs are published, but the metrics
    # table vanishes (equivalently: mark_done never ran)
    import shutil

    shutil.rmtree(metrics)
    ctx2 = RunContext.new(spark, metrics, "run2")
    mt_before = _file_mtimes(out)
    fp2 = resumable_fingerprint(ctx2, pages, out, n_buckets=8)
    assert fp2.count() == n1, "reconcile must not append duplicate rows"
    assert _file_mtimes(out) == mt_before, "reconcile must not rewrite data"
    # and the reconciled completions are recorded
    ctx3 = RunContext.new(spark, metrics, "run3")
    assert (
        ctx3.pending_buckets(
            spark.range(8).select(F.col("id").alias("bucket")), "fingerprint"
        ).count()
        == 0
    )


def test_config_hash_mismatch_forces_recompute(spark, pages, tmp_paths):
    """Provenance gate: completions under config A don't satisfy a resume
    under config B (HeadFoot.hs header-provenance analog)."""
    import dataclasses

    from bigtrees_spark.config import DEFAULT_CONFIG

    cfg_a = DEFAULT_CONFIG
    cfg_b = dataclasses.replace(DEFAULT_CONFIG, shingle_k=7)
    assert cfg_a.config_hash() != cfg_b.config_hash()

    metrics, out = tmp_paths
    ctx_a = RunContext.new(spark, metrics, "runA", config_hash=cfg_a.config_hash())
    resumable_fingerprint(ctx_a, pages, out, n_buckets=8, cfg=cfg_a)

    buckets = spark.range(8).select(F.col("id").alias("bucket"))
    # same config: nothing pending
    ctx_a2 = RunContext.new(spark, metrics, "runA2", config_hash=cfg_a.config_hash())
    assert ctx_a2.pending_buckets(buckets, "fingerprint").count() == 0
    # different config: EVERYTHING pending again
    ctx_b = RunContext.new(spark, metrics, "runB", config_hash=cfg_b.config_hash())
    assert ctx_b.pending_buckets(buckets, "fingerprint").count() == 8
    # and the rerun really recomputes: cfg_a's dirs are stale (marker
    # mismatch), so they're replaced, not reconciled as done
    fp_b = resumable_fingerprint(ctx_b, pages, out, n_buckets=8, cfg=cfg_b)
    assert fp_b.count() == pages.count()
    ctx_b2 = RunContext.new(spark, metrics, "runB2", config_hash=cfg_b.config_hash())
    assert ctx_b2.pending_buckets(buckets, "fingerprint").count() == 0


def test_header_json_round_trip(spark, tmp_path):
    """HeadFoot.hs:66-75 analog: provenance header JSON round-trips."""
    from bigtrees_spark import __version__
    from bigtrees_spark.plans.runmeta import parse_header

    ctx = RunContext.new(spark, str(tmp_path / "m"), "runh", config_hash="cafe")
    j = ctx.header_json()
    h = parse_header(spark, j).first()
    assert h.run_id == "runh"
    assert h.config_hash == "cafe"
    assert h.app_version == __version__
    assert h.scan_start > 1_700_000_000  # POSIX seconds, not ms/null
    assert h.system  # non-empty platform string
