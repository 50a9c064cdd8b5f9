"""Custom stateful streaming operator: per-host running corpus statistics via
applyInPandasWithState.

The reference accumulates a DupeMap in memory while scanning
(/root/reference/lib/System/Directory/BigTrees/DupeMap.hs:72-114); the
streaming analog is state that SURVIVES across micro-batches and restarts —
Spark's state store keyed by host, updated with Arrow-batched pandas.

Per-host cumulative (n_docs, n_bytes) is the canonical crawl-ops signal
(quota enforcement, politeness budgeting, hot-host detection).  State size is
O(#hosts) — bounded and tiny next to the data; the state store shards by the
groupBy key so a 1000-executor cluster partitions hosts, not documents.

Sinks: tests use the memory sink (update mode); production would writeStream
to Kafka/Iceberg-upsert.  The operator itself is sink-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigtrees_spark.streaming.ingest import WEB_PAGES_DDL

HOST_STATS_SCHEMA = "host string, n_docs bigint, n_bytes bigint"
_STATE_SCHEMA = "n_docs bigint, n_bytes bigint"


def _update_host_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_docs, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_docs += len(pdf)
        n_bytes += int(pdf["n_bytes"].sum())
    state.update((n_docs, n_bytes))
    yield pd.DataFrame({"host": [key[0]], "n_docs": [n_docs], "n_bytes": [n_bytes]})


def host_stats_stream(pages: DataFrame) -> DataFrame:
    """Streaming pages(url, text, ...) -> update-mode stream of cumulative
    per-host (n_docs, n_bytes).  parse_url stays JVM-side; only the skinny
    (host, n_bytes) projection crosses into the Arrow state function."""
    hosted = pages.select(
        F.coalesce(F.expr("parse_url(url, 'HOST')"), F.lit("")).alias("host"),
        F.octet_length(F.coalesce(F.col("text"), F.lit(""))).alias("n_bytes"),
    )
    return hosted.groupBy("host").applyInPandasWithState(
        _update_host_stats,
        HOST_STATS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def start_host_stats(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
):
    """Run-once (availableNow) host-stats pass; state in checkpoint_dir
    accumulates across invocations — a restart resumes the running totals
    rather than recounting history.

    Sink: foreachBatch appending (host, n_docs, n_bytes, batch_id) parquet —
    the checkpoint-recoverable stand-in for a production upsert sink (the
    memory sink cannot recover from a checkpoint); the latest row per host
    (max batch_id) is the current total, see latest_host_stats."""
    src = spark.readStream.schema(WEB_PAGES_DDL).parquet(source_dir)

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink_dir)

    return (
        host_stats_stream(src)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def latest_host_stats(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Current running totals: the max-batch_id row per host.

    foreachBatch is at-least-once: a retry after the sink append but before
    the checkpoint commit re-appends the same batch_id rows (with identical
    cumulative values — the state update re-runs from the uncommitted state).
    dropDuplicates on (host, batch_id) collapses those replays so the
    max-batch filter returns exactly one row per host."""
    snap = spark.read.parquet(sink_dir).dropDuplicates(["host", "batch_id"])
    w_latest = F.max("batch_id").over(Window.partitionBy("host"))
    return (
        snap.withColumn("_mx", w_latest)
        .where(F.col("batch_id") == F.col("_mx"))
        .select("host", "n_docs", "n_bytes")
    )
