"""Skew handling is measured, not assumed (SURVEY §7; north_rule "skew
handled explicitly"): over-cap buckets degrade to rank-adjacent pairing —
never silent drops — and every capped stage records its bucket-size
distribution + cap-fire count into the skew-metrics table."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bigtrees_spark.config import DEFAULT_CONFIG
from bigtrees_spark.operators import lsh
from bigtrees_spark.operators.fingerprint import fingerprint_docs
from bigtrees_spark.plans.runmeta import RunContext


@pytest.fixture()
def hot_chunk_fp(spark):
    """40 near-identical docs: their simhashes agree on (at least) one 16-bit
    chunk, forming one hot chunk bucket we can push over a tiny cap."""
    ts = datetime.datetime(2025, 1, 1)
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the market report shows steady quarterly growth in every region "
    ) * 6
    rows = [
        (f"hot/{i:04d}", ts, None, base + f"suffix token {i % 3}", "en")
        for i in range(40)
    ]
    pages = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return fingerprint_docs(pages)


def test_simhash_hot_chunk_keeps_connectivity(spark, hot_chunk_fp):
    # cap of 5 forces EVERY chunk bucket of the 40-doc group over cap:
    # the old behavior dropped all pairs; rank-chaining must keep the
    # group connected (as one chain) instead
    edges = lsh.simhash_edges(hot_chunk_fp, DEFAULT_CONFIG, chunk_cap=5)
    got = [(r.url_l, r.url_r) for r in edges.collect()]
    assert len(got) > 0, "over-cap chunks must not lose all pairs"

    # connectivity: union-find over returned edges — docs with identical
    # simhash (Hamming 0) must end up connected despite the cap
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    sh = {r.url: r.simhash for r in hot_chunk_fp.select("url", "simhash").collect()}
    from collections import Counter

    groups = Counter(sh.values())
    dup_sh = [v for v, n in groups.items() if n > 1]
    assert dup_sh, "fixture must contain identical-simhash docs"
    for v in dup_sh:
        members = [u for u, s in sh.items() if s == v]
        roots = {find(u) for u in members}
        assert len(roots) == 1, f"identical-simhash docs split across {len(roots)} components"


def test_skew_metrics_recorded(spark, hot_chunk_fp, tmp_path):
    ctx = RunContext.new(spark, str(tmp_path / "metrics"))
    lsh.simhash_edges(hot_chunk_fp, DEFAULT_CONFIG, ctx=ctx, chunk_cap=5).count()
    lsh.candidate_pairs(hot_chunk_fp, DEFAULT_CONFIG, ctx=ctx).count()
    skew = {r.stage: r for r in ctx.read_skew().collect()}
    assert "simhash_chunks" in skew and "lsh_bands" in skew
    s = skew["simhash_chunks"]
    assert s.cap == 5
    assert s.n_overcap > 0, "the cap fired; metrics must say so"
    assert s.max_bucket >= 40
    assert skew["lsh_bands"].n_buckets > 0


def test_partition_balance_recorded(spark, hot_chunk_fp, tmp_path):
    """SURVEY §7: per-partition row balance (the task-time proxy) lands in
    the skew table, both directly and via the pipeline's ctx hook."""
    ctx = RunContext.new(spark, str(tmp_path / "metrics"))
    ctx.record_partition_balance("docs_fp", hot_chunk_fp.select("url"))
    skew = {r.stage: r for r in ctx.read_skew().collect()}
    s = skew["docs_fp:partitions"]
    assert s.n_buckets >= 1                      # partitions counted
    assert s.max_bucket >= 1
    assert s.p95_bucket <= s.max_bucket
    assert s.n_overcap >= 0 and s.cap >= 2       # 2x-median straggler bound

    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

    ts = datetime.datetime(2025, 1, 1)
    src = spark.createDataFrame(
        [(f"u/{i}", ts, None, f"body words number {i} repeated thing", "en") for i in range(30)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    ctx2 = RunContext.new(spark, str(tmp_path / "metrics2"))
    near_dedup_pipeline(src, ctx=ctx2).clusters.count()
    stages = {r.stage for r in ctx2.read_skew().collect()}
    assert "docs_fp:partitions" in stages


def test_small_buckets_unchanged_by_cap_path(spark, pages):
    """With a huge cap, the new union path must equal the pure all-pairs
    result (no behavior change for normal buckets)."""
    fp = fingerprint_docs(pages.limit(80))
    a = {
        (r.url_l, r.url_r)
        for r in lsh.simhash_edges(fp, DEFAULT_CONFIG, chunk_cap=10**6).collect()
    }
    b_small = fp.select("url", "simhash")
    exp = (
        b_small.alias("l")
        .join(b_small.alias("r"), F.col("l.url") < F.col("r.url"))
        .where(
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
            <= DEFAULT_CONFIG.simhash_hamming_max
        )
        .select(F.col("l.url").alias("url_l"), F.col("r.url").alias("url_r"))
    )
    assert a == {(r.url_l, r.url_r) for r in exp.collect()}


def test_simhash_rejects_radius_beyond_pigeonhole(spark):
    """The 4x16-bit chunk blocking only guarantees candidates for Hamming <= 3;
    a wider configured radius must be rejected, not silently under-recalled."""
    import dataclasses

    import pytest as _pytest

    from bigtrees_spark.config import DEFAULT_CONFIG
    from bigtrees_spark.operators.lsh import simhash_edges

    fp = spark.createDataFrame([("u:a", 5), ("u:b", 9)], "url string, simhash long")
    bad = dataclasses.replace(DEFAULT_CONFIG, simhash_hamming_max=4)
    with _pytest.raises(ValueError, match="simhash_hamming_max"):
        simhash_edges(fp, bad)
