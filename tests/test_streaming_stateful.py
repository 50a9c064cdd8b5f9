"""Stateful streaming (applyInPandasWithState): per-host running totals
accumulate across micro-batches AND across restarts (state store resume)."""

from __future__ import annotations

import datetime

import pytest


def _pages(spark, rows):
    ts = datetime.datetime(2025, 1, 1)
    data = [(u, ts, None, t, "en") for u, t in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.mark.timeout(300)
def test_host_stats_accumulate_across_restarts(spark, tmp_path):
    from bigtrees_spark.streaming.stateful import latest_host_stats, start_host_stats

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    batch1 = [
        ("http://a.com/1", "xxxx"),       # a.com: 1 doc, 4 bytes
        ("http://a.com/2", "yy"),         # a.com: 2 docs, 6 bytes
        ("http://b.com/1", "zzz"),        # b.com: 1 doc, 3 bytes
    ]
    _pages(spark, batch1).write.mode("append").parquet(src)
    q = start_host_stats(spark, src, ckpt, sink)
    q.awaitTermination(120)
    got1 = {r.host: (r.n_docs, r.n_bytes) for r in latest_host_stats(spark, sink).collect()}
    assert got1["a.com"] == (2, 6)
    assert got1["b.com"] == (1, 3)

    # second batch lands later; a RESTARTED query (same checkpoint) must
    # resume the state store and keep counting from the running totals
    batch2 = [
        ("http://a.com/3", "w"),          # a.com total: 3 docs, 7 bytes
        ("http://c.com/1", "12345"),      # new host
    ]
    _pages(spark, batch2).write.mode("append").parquet(src)
    q = start_host_stats(spark, src, ckpt, sink)
    q.awaitTermination(120)
    got2 = {r.host: (r.n_docs, r.n_bytes) for r in latest_host_stats(spark, sink).collect()}
    assert got2["a.com"] == (3, 7)          # resumed, not recounted
    assert got2["c.com"] == (1, 5)
    assert got2["b.com"] == (1, 3)          # untouched host keeps its total


def test_latest_host_stats_dedupes_replayed_batches(spark, tmp_path):
    """foreachBatch is at-least-once: a retried batch re-appends identical
    (host, batch_id) rows; latest_host_stats must still return exactly one
    row per host (ADVICE r02)."""
    import pandas as pd

    from bigtrees_spark.streaming.stateful import latest_host_stats

    sink = str(tmp_path / "sink")
    rows = pd.DataFrame(
        {
            "host": ["a.com", "a.com", "a.com", "b.com"],
            "n_docs": [2, 3, 3, 1],
            "n_bytes": [6, 7, 7, 3],
            "batch_id": [0, 1, 1, 0],   # batch 1 replayed for a.com
        }
    )
    spark.createDataFrame(rows).write.mode("append").parquet(sink)
    got = latest_host_stats(spark, sink).collect()
    assert len(got) == 2
    by_host = {r.host: (r.n_docs, r.n_bytes) for r in got}
    assert by_host == {"a.com": (3, 7), "b.com": (1, 3)}
