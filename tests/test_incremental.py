"""Incremental fingerprint reuse, simplifyDupes containment pruning, skew-cap
recall, and streaming ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigtrees_spark.operators.dedup import (
    exact_dupe_groups,
    prefix_dupe_groups,
    simplify_dupes,
)
from bigtrees_spark.operators.fingerprint import fingerprint_docs, incremental_fingerprint
from bigtrees_spark.sources.fixtures import corpus_to_spark, derive_snapshot_v2


def test_incremental_fingerprint_reuses_unchanged(spark, pages, corpus):
    old_fp = fingerprint_docs(pages).cache()
    old_fp.count()
    pages_v2, deltas = derive_snapshot_v2(corpus, seed=43)
    new_pages = corpus_to_spark(spark, pages_v2)

    inc = incremental_fingerprint(new_pages, old_fp)
    full = fingerprint_docs(new_pages)

    a = {(r.url, r.sha256) for r in inc.select("url", "sha256").collect()}
    b = {(r.url, r.sha256) for r in full.select("url", "sha256").collect()}
    assert a == b  # identical result, cheaper plan

    # the fresh-path input is only the changed rows (Add + Mv targets;
    # Edits keep (url, warc_ts) identity here so they reuse old rows)
    keys = new_pages.join(old_fp.select("url", "warc_ts").distinct(), ["url", "warc_ts"], "left_anti")
    n_changed = keys.count()
    assert n_changed < new_pages.count() * 0.2


def test_incremental_fingerprint_no_prior(spark, pages):
    assert incremental_fingerprint(pages, None).count() == pages.count()


def test_prefix_groups_and_simplify(spark):
    """Two sections with identical content sets -> one prefix-level group;
    doc-level groups fully inside them are pruned (simplifyDupes semantics,
    DupeMap.hs:147-154); a doc group with a member elsewhere survives."""
    rows = []
    for sec in ("a", "b"):  # identical sections (prefix-level dupes)
        for i in range(4):
            rows.append((f"https://s.example/{sec}/doc{i}", f"content {i}", 100))
    # a doc-level dupe with one member OUTSIDE the covered prefixes
    rows.append(("https://s.example/c/doc0", "content 0", 100))
    df = spark.createDataFrame(rows, "url string, text string, n int").select(
        "url", F.length("text").alias("nbytes"), F.sha2("text", 256).alias("sha256")
    )
    pg = prefix_dupe_groups(df)
    got = pg.collect()
    assert len(got) == 1
    assert got[0].prefixes == ["https://s.example/a", "https://s.example/b"]
    assert got[0].n_prefixes == 2

    dg = exact_dupe_groups(df)
    assert dg.count() == 4  # content 0..3 each duplicated
    kept = simplify_dupes(dg, pg).collect()
    # only the group containing the /c/doc0 member survives
    assert len(kept) == 1
    assert any("https://s.example/c/doc0" in m for m in kept[0].members)


def test_skew_cap_preserves_planted_recall(spark, pages, corpus):
    """With an aggressively small bucket cap, chained pairing must keep the
    planted groups connected (skew-handling must not cost recall)."""
    from dataclasses import replace

    from bigtrees_spark.config import DEFAULT_CONFIG
    from bigtrees_spark.plans.pipeline import near_dedup_pipeline

    cfg = replace(DEFAULT_CONFIG, max_bucket_size=8)
    res = near_dedup_pipeline(pages, cfg=cfg)
    labels = {r.url: r.cluster_id for r in res.clusters.collect()}
    for gid, grp in corpus.groups.groupby("group_id"):
        if grp.kind.iloc[0] == "substring":
            continue
        cids = {labels[u] for u in grp.url}
        assert len(cids) == 1, f"group {gid} split under skew cap"


def test_streaming_ingest_dedups(spark, tmp_path):
    import pandas as pd

    from bigtrees_spark.sources.fixtures import generate_corpus
    from bigtrees_spark.streaming.ingest import stream_ingest

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    corpus = generate_corpus(120, seed=9)
    corpus_to_spark(spark, corpus.pages).write.parquet(src)

    q = stream_ingest(spark, src, sink, ckpt, watermark="10 minutes")
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    n_distinct_texts = corpus.pages.text.nunique()
    assert out.count() == n_distinct_texts  # exact dups dropped in-stream
    assert out.select("sha256").distinct().count() == n_distinct_texts


def test_incremental_run_digest_driven(spark, pages, corpus, tmp_path):
    """Merkle-digest-driven incremental: second run over a 7%-changed snapshot
    re-fingerprints only the changed buckets and matches a full recompute."""
    from bigtrees_spark.plans.incremental import incremental_run

    state = str(tmp_path / "state")

    r1 = incremental_run(spark, pages, state, n_buckets=16)
    assert r1.n_buckets_changed == r1.n_buckets_total  # first run: all fresh
    assert r1.docs_fp.count() == pages.count()

    pages_v2, _ = derive_snapshot_v2(corpus, seed=43)
    new_pages = corpus_to_spark(spark, pages_v2)
    r2 = incremental_run(spark, new_pages, state, n_buckets=16)
    assert 0 < r2.n_buckets_changed <= r2.n_buckets_total
    assert r2.docs_fp.count() == new_pages.count()

    full = fingerprint_docs(new_pages)
    a = {(r.url, r.sha256) for r in r2.docs_fp.select("url", "sha256").collect()}
    b = {(r.url, r.sha256) for r in full.select("url", "sha256").collect()}
    assert a == b

    # third run, nothing changed: zero buckets recomputed
    r3 = incremental_run(spark, new_pages, state, n_buckets=16)
    assert r3.n_buckets_changed == 0
    assert r3.docs_fp.count() == new_pages.count()
