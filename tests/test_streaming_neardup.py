"""Streaming near-dup detection (streaming/neardup.py): verified edges
across micro-batches and restarts from bounded per-bucket state."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from bigtrees_spark.config import DEFAULT_CONFIG


def _pages(spark, rows):
    ts = datetime.datetime(2025, 1, 1)
    data = [(u, ts, None, t, "en") for u, t in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _text(seed_words: list[str], n: int = 60) -> str:
    """n-token doc by cycling seed words with positional suffixes (same
    derivation spirit as the fixture corpus: unique docs, twin via
    truncation)."""
    return " ".join(f"{seed_words[i % len(seed_words)]}{i}" for i in range(n))


def _twin(text: str) -> str:
    """Drop the last 3 tokens — the standard near-dup twin (jaccard ~0.95
    at 60 tokens, above the default threshold)."""
    return " ".join(text.split()[:-3])


@pytest.mark.timeout(300)
def test_cross_batch_twin_detected_after_restart(spark, tmp_path):
    from bigtrees_spark.streaming.neardup import distinct_edges, start_neardup_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    a = _text(["alpha", "bravo", "car"])
    b = _text(["delta", "echo", "fox"])

    # batch 1: two unrelated docs -> no edges
    _pages(spark, [("u:a", a), ("u:b", b)]).write.mode("append").parquet(src)
    q = start_neardup_stream(spark, src, ckpt, sink)
    q.awaitTermination(120)

    # batch 2, RESTARTED query: a's twin arrives -> the edge must come from
    # resumed bucket state, not from any rescan of batch 1
    _pages(spark, [("u:a2", _twin(a)), ("u:c", _text(["golf", "hotel", "ink"]))]).write.mode(
        "append"
    ).parquet(src)
    q = start_neardup_stream(spark, src, ckpt, sink)
    q.awaitTermination(120)

    edges = {(r.url_l, r.url_r): r.jaccard for r in distinct_edges(spark, sink).collect()}
    assert ("u:a", "u:a2") in edges
    assert edges[("u:a", "u:a2")] >= DEFAULT_CONFIG.jaccard_threshold
    # unrelated docs never pair
    assert all({"u:b", "u:c"} - {l, r} for (l, r) in edges)

    # keep-first filter: the ARRIVAL (u:a2) drops, the original (u:a) and
    # the unrelated docs survive
    from bigtrees_spark.streaming.neardup import keep_first_pages

    all_pages = spark.read.parquet(src)
    kept = {r.url for r in keep_first_pages(all_pages, spark, sink).collect()}
    assert kept == {"u:a", "u:b", "u:c"}


@pytest.mark.timeout(300)
def test_within_batch_twins_and_replay_dedup(spark, tmp_path):
    from bigtrees_spark.streaming.neardup import distinct_edges, start_neardup_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    d = _text(["kilo", "lima", "mike"])
    _pages(spark, [("u:d", d), ("u:d2", _twin(d))]).write.mode("append").parquet(src)
    q = start_neardup_stream(spark, src, ckpt, sink)
    q.awaitTermination(120)

    got = distinct_edges(spark, sink).collect()
    assert {(r.url_l, r.url_r) for r in got} == {("u:d", "u:d2")}
    # the pair surfaces from MANY shared bands; the sink view must still
    # hold exactly one row for it (this is the multi-band dedup contract)
    assert len(got) == 1


@pytest.mark.timeout(300)
def test_capped_bucket_stays_connected(spark, tmp_path):
    """With cap=2, four byte-identical docs (one mega bucket per band)
    cannot pair all-ways — but every post-cap arrival must still edge to a
    RETAINED representative, so the component stays connected (the
    streaming analog of the batch rank-chain fallback)."""
    from bigtrees_spark.streaming.neardup import distinct_edges, start_neardup_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    t = _text(["nova", "oscar", "papa"])
    urls = [f"u:{i}" for i in range(4)]
    _pages(spark, [(u, t) for u in urls]).write.mode("append").parquet(src)
    q = start_neardup_stream(spark, src, ckpt, sink, cap=2)
    q.awaitTermination(120)

    edges = [(r.url_l, r.url_r) for r in distinct_edges(spark, sink).collect()]
    # union-find connectivity over the emitted edges
    parent = {u: u for u in urls}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for l, r in edges:
        parent[find(l)] = find(r)
    assert len({find(u) for u in urls}) == 1
    # retention is bounded: the two retained docs pair, later arrivals pair
    # only against the retained two -> strictly fewer than all 6 pairs
    assert len(edges) < 6


@pytest.mark.timeout(300)
def test_error_rows_never_pair(spark, tmp_path, monkeypatch):
    """Failed docs all share the sentinel (empty-shingle) fingerprint, so
    without the error filter every failed doc after the first would pair at
    'jaccard 1.0' and keep-first would drop unrelated pages — the batch
    pipeline's Err-node rule, enforced here for the stream.  Two forced-error
    docs must emit NO edge; a genuine twin pair in the same batch must still
    fire (the filter only removes error rows)."""
    from pyspark.sql import functions as F

    import bigtrees_spark.streaming.neardup as nd
    from bigtrees_spark.functions import spark_udfs

    @F.pandas_udf(spark_udfs.FINGERPRINT_SCHEMA)
    def fp_with_errors(texts: pd.Series) -> pd.DataFrame:
        cfg = DEFAULT_CONFIG
        a, b = cfg.minhash_coeffs()
        rows = []
        for t in texts:
            if "ERRDOC" in t:  # sentinel fingerprint + error, like a raise
                sig, s, bands, n, sh, _ = spark_udfs.fingerprint_row(
                    "", cfg, False, a, b
                )
                rows.append((sig, s, bands, n, sh, "boom"))
            else:
                rows.append(spark_udfs.fingerprint_row(t, cfg, False, a, b))
        return pd.DataFrame(
            rows, columns=["minhash", "simhash", "bands", "n_tokens", "shingles", "error"]
        )

    monkeypatch.setattr(
        nd, "make_fingerprint_udf", lambda cfg, compute_simhash=True: fp_with_errors
    )

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    a = _text(["alpha", "bravo", "car"])
    _pages(
        spark,
        [
            ("u:e1", "ERRDOC one"),
            ("u:e2", "ERRDOC two totally unrelated"),
            ("u:a", a),
            ("u:a2", _twin(a)),
        ],
    ).write.mode("append").parquet(src)
    q = nd.start_neardup_stream(spark, src, ckpt, sink)
    q.awaitTermination(120)

    edges = {(r.url_l, r.url_r) for r in nd.distinct_edges(spark, sink).collect()}
    assert edges == {("u:a", "u:a2")}


@pytest.mark.timeout(300)
def test_empty_sink_reads_as_no_edges(spark, tmp_path):
    """A stream that never fired a batch leaves no sink directory; the edge
    views must read that as 'no edges', not raise — keep_first_pages keeps
    everything."""
    from bigtrees_spark.streaming.neardup import distinct_edges, keep_first_pages

    sink = str(tmp_path / "never_written")
    assert distinct_edges(spark, sink).count() == 0
    pages = _pages(spark, [("u:a", _text(["alpha", "bravo", "car"]))])
    assert {r.url for r in keep_first_pages(pages, spark, sink).collect()} == {"u:a"}


@pytest.mark.timeout(300)
def test_rocksdb_state_store_cross_batch(spark, tmp_path):
    """The cross-batch restart contract under the RocksDB state store — the
    large-state knob for 10^12-doc streams, where retained bucket state
    outgrows executor heap (the default HDFS-backed provider keeps every
    loaded store version on-heap; RocksDB keeps it on local disk).  The
    operator itself is provider-agnostic; this pins that the state schema
    round-trips through RocksDB and resumes across a query restart."""
    from bigtrees_spark.streaming.neardup import distinct_edges, start_neardup_stream

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
        a = _text(["xray", "yankee", "zulu"])
        _pages(spark, [("u:a", a)]).write.mode("append").parquet(src)
        start_neardup_stream(spark, src, ckpt, sink).awaitTermination(120)
        _pages(spark, [("u:a2", _twin(a))]).write.mode("append").parquet(src)
        start_neardup_stream(spark, src, ckpt, sink).awaitTermination(120)
        edges = {(r.url_l, r.url_r) for r in distinct_edges(spark, sink).collect()}
        assert ("u:a", "u:a2") in edges
    finally:
        spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)


@pytest.mark.timeout(300)
def test_idle_timeout_expires_bucket_state(spark, tmp_path):
    """With a tiny idle timeout, a bucket that receives no arrivals for a
    trigger is expired — a twin arriving AFTER the expiry no longer pairs.
    (Expiry only fires for groups WITHOUT new data in a batch, so the
    middle batch touches unrelated buckets.)"""
    from bigtrees_spark.streaming.neardup import (
        STREAM_BUCKET_CAP,
        distinct_edges,
        neardup_edges_stream,
    )

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    a = _text(["romeo", "sierra", "tango"])

    def run_once():
        srcdf = spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(src)

        def write_batch(df, batch_id):
            df.write.mode("append").parquet(sink)

        q = (
            neardup_edges_stream(srcdf, cap=STREAM_BUCKET_CAP, idle_timeout_ms=1)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _pages(spark, [("u:a", a)]).write.mode("append").parquet(src)
    run_once()
    # idle trigger touching only unrelated buckets -> a's buckets time out
    _pages(spark, [("u:x", _text(["uni", "victor", "whisk"]))]).write.mode(
        "append"
    ).parquet(src)
    run_once()
    # a's twin arrives after expiry: state is gone, no edge may fire
    _pages(spark, [("u:a2", _twin(a))]).write.mode("append").parquet(src)
    run_once()

    import os

    edges = (
        [] if not os.path.isdir(sink) else distinct_edges(spark, sink).collect()
    )
    assert all({r.url_l, r.url_r} != {"u:a", "u:a2"} for r in edges)


@pytest.mark.timeout(300)
def test_shuffle_partitions_knob_sets_state_store_count(spark, tmp_path):
    """start_neardup_stream(shuffle_partitions=N) must pin the stateful
    operator to N state-store tasks (the per-trigger cost driver measured
    in tools/streaming_profile.py — each partition opens/commits one store
    every trigger, empty ones included)."""
    import json

    from bigtrees_spark.streaming.neardup import start_neardup_stream

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    a = _text(["kilo", "lima", "mike"])
    _pages(spark, [("u:a", a), ("u:a2", _twin(a))]).write.mode("append").parquet(src)
    try:
        q = start_neardup_stream(spark, src, ckpt, sink, shuffle_partitions=4)
        q.awaitTermination(120)
        progress = [json.loads(p.json) for p in q.recentProgress]
        state = [
            p["stateOperators"][0]
            for p in progress
            if p.get("numInputRows", 0) > 0 and p.get("stateOperators")
        ]
        assert state, "no stateful trigger progress recorded"
        assert state[-1]["numShufflePartitions"] == 4
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
