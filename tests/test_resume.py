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
    ctx.invalidate([2, 5], "fingerprint")
    pending = ctx.pending_buckets(
        spark.range(8).select(F.col("id").alias("bucket")), "fingerprint"
    )
    assert {r.bucket for r in pending.collect()} == {2, 5}
