"""Structured Streaming ingest with in-stream exact dedup.

The reference is batch-only; its "streaming" is constant-memory file iteration
(/root/reference/lib/System/Directory/BigTrees/HashLine.hs:515-627) and the
incremental-rescan plan is a todo (README.md:49).  SURVEY.md §2.10 marks
continuous ingest an optional extension; this module provides it Spark-first:

  readStream (parquet/file source of web_pages)
    -> sha2 content digest (JVM-side)
    -> withWatermark(warc_ts) + dropDuplicates([sha256]) within the watermark
    -> append sink partitioned by bucket

Near-dup clustering stays a periodic batch job over the deduped sink (the
right architecture at scale: LSH+CC is a global computation; running it
per-microbatch would re-shuffle the world every trigger).  The watermark
bounds the dedup state store exactly like the reference bounds memory via
streaming reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from bigtrees_spark.operators.digest import bucket_of

WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    n_buckets: int = 16,
    trigger_once: bool = True,
):
    """Start (or run-once) the streaming dedup ingest; returns the query."""
    src = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .parquet(source_dir)
        .withColumn("sha256", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["sha256"])
        .withColumn("bucket", bucket_of("url", n_buckets))
    )
    writer = (
        src.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
