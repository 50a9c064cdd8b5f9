"""Run metrics + per-partition checkpoint/resume.

Reference analog: .bigtree files carry a JSON Header (scan provenance) and
Footer (scanEnd) — /root/reference/lib/System/Directory/BigTrees/HeadFoot.hs:
66-75,115-119 — and the tail probe reads them for O(1) status
(HashTree/Read.hs:86-113).  The reference's planned "intelligent re-hashing of
only changed files" (README.md:49, todo) is realized here at partition
granularity:

  run_metrics(run_id, bucket, stage, started, finished, n_rows, status)

A stage over a bucket is 'done' only after its output parquet partition is
fully written; resume = anti-join the bucket list against completed rows, so
a killed job recomputes ONLY unfinished buckets (north_rule resumability).
Combined with digest trees (operators/digest.py): a bucket whose level-0
digest is unchanged between snapshots skips re-fingerprinting entirely.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUN_METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("stage", StringType(), False),
        StructField("started", TimestampType(), True),
        StructField("finished", TimestampType(), True),
        StructField("n_rows", LongType(), True),
        StructField("status", StringType(), False),
        # provenance (reference Header/Footer analog, HeadFoot.hs:66-75,
        # 115-119): which config + code produced this completion row.  A
        # completion only counts toward resume when its config_hash matches
        # the current run's — changing any fingerprint knob forces recompute.
        StructField("config_hash", StringType(), True),
        StructField("app_version", StringType(), True),
    ]
)

# Skew measured, not assumed (SURVEY §7; north_rule "skew handled
# explicitly"): every capped pairing stage records its bucket-size
# distribution and how often the cap fired, so the recall trade-off of
# rank-adjacent fallback pairing is visible per run instead of silent.
SKEW_METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("cap", LongType(), False),
        StructField("n_buckets", LongType(), True),
        StructField("n_overcap", LongType(), True),
        StructField("max_bucket", LongType(), True),
        StructField("p95_bucket", LongType(), True),
        StructField("finished", TimestampType(), True),
    ]
)


# HeadFoot.hs:66-75 analog: the JSON provenance header.  scan_start is POSIX
# seconds (`round . utcTimeToPOSIXSeconds`, HeadFoot.hs:51-52).
HEADER_SCHEMA = (
    "run_id string, config_hash string, app_version string, "
    "scan_start long, system string"
)


def parse_header(spark: SparkSession, header: str) -> DataFrame:
    """Round-trip a header_json() string back to columns (from_json,
    SURVEY §2.9 'JSON encode/decode of Header' row)."""
    return (
        spark.createDataFrame([(header,)], "j string")
        .select(F.from_json("j", HEADER_SCHEMA).alias("h"))
        .select("h.*")
    )


@dataclass
class RunContext:
    spark: SparkSession
    metrics_path: str
    run_id: str
    config_hash: str | None = None

    def header_json(self) -> str:
        """Scan-provenance header as one JSON string (to_json of a struct),
        the .bigtree JSON-header-comment analog: which program version and
        config produced this table, started when, on what system."""
        import platform

        from bigtrees_spark import __version__

        return (
            self.spark.range(1)
            .select(
                F.to_json(
                    F.struct(
                        F.lit(self.run_id).alias("run_id"),
                        F.lit(self.config_hash).alias("config_hash"),
                        F.lit(__version__).alias("app_version"),
                        F.unix_timestamp().alias("scan_start"),
                        F.lit(platform.platform()).alias("system"),
                    )
                ).alias("j")
            )
            .first()
            .j
        )

    @classmethod
    def new(
        cls,
        spark: SparkSession,
        metrics_path: str,
        run_id: str | None = None,
        config_hash: str | None = None,
    ) -> "RunContext":
        return cls(spark, metrics_path, run_id or uuid.uuid4().hex[:12], config_hash)

    def _read(self) -> DataFrame:
        if os.path.exists(self.metrics_path):
            df = self.spark.read.parquet(self.metrics_path)
            for f in RUN_METRICS_SCHEMA.fields:  # pre-provenance tables stay readable
                if f.name not in df.columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            return df
        return self.spark.createDataFrame([], RUN_METRICS_SCHEMA)

    def completed_buckets(self, stage: str) -> DataFrame:
        """Buckets already finished for this stage (any run — completion is a
        property of the output, not the run attempt).  When this context
        carries a config_hash, only completions under the SAME config count:
        a knob change invalidates prior work instead of silently reusing
        fingerprints computed under different semantics."""
        done = self._read().where(
            (F.col("stage") == stage) & (F.col("status") == "done")
        )
        if self.config_hash is not None:
            done = done.where(F.col("config_hash") == self.config_hash)
        return done.select("bucket").distinct()

    def pending_buckets(self, all_buckets: DataFrame, stage: str) -> DataFrame:
        """all_buckets(bucket) minus completed — the resume anti-join."""
        return all_buckets.join(self.completed_buckets(stage), "bucket", "left_anti")

    def mark_done(self, buckets: list[int], stage: str, n_rows: dict[int, int] | None = None) -> None:
        """Append completion rows (atomic per parquet-append semantics)."""
        from bigtrees_spark import __version__

        now = time.time()
        rows = [
            {
                "run_id": self.run_id,
                "bucket": int(b),
                "stage": stage,
                "started": None,
                "finished": None,
                "n_rows": int((n_rows or {}).get(b, 0)),
                "status": "done",
                "config_hash": self.config_hash,
                "app_version": __version__,
            }
            for b in buckets
        ]
        df = self.spark.createDataFrame(rows, RUN_METRICS_SCHEMA).withColumn(
            "finished", F.lit(now).cast("timestamp")
        )
        df.write.mode("append").parquet(self.metrics_path)

    @property
    def skew_path(self) -> str:
        return self.metrics_path + ".skew"

    def record_skew(self, stage: str, cap: int, stats: dict) -> None:
        """Append one bucket-skew row for a capped pairing stage."""
        row = {
            "run_id": self.run_id,
            "stage": stage,
            "cap": int(cap),
            "n_buckets": int(stats.get("n_buckets") or 0),
            "n_overcap": int(stats.get("n_overcap") or 0),
            "max_bucket": int(stats.get("max_bucket") or 0),
            "p95_bucket": int(stats.get("p95_bucket") or 0),
            "finished": None,
        }
        df = self.spark.createDataFrame([row], SKEW_METRICS_SCHEMA).withColumn(
            "finished", F.lit(time.time()).cast("timestamp")
        )
        df.write.mode("append").parquet(self.skew_path)

    def record_partition_balance(self, stage: str, df: DataFrame) -> None:
        """Per-partition row distribution for a stage input — SURVEY §7's
        'per-partition task times' in its measurable form on a UI-less local
        session: inside a whole-stage-codegen stage task time is proportional
        to rows, so rows-per-partition max/p95 vs median is the skew signal.
        Reuses the skew-metrics schema: stage='<name>:partitions',
        n_buckets=#partitions, max/p95_bucket=rows, n_overcap=#partitions
        holding more than 2x the median (the straggler count), cap=2x median.

        The per-partition count table is at most #partitions rows — tiny —
        so the stats fold happens driver-side in one cheap job."""
        pdf = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("n"))
            .toPandas()
        )
        if len(pdf) == 0:
            return
        med = float(pdf["n"].median())
        threshold = int(2 * max(med, 1.0))
        self.record_skew(
            f"{stage}:partitions",
            threshold,
            {
                "n_buckets": int(len(pdf)),
                "n_overcap": int((pdf["n"] > threshold).sum()),
                "max_bucket": int(pdf["n"].max()),
                "p95_bucket": int(pdf["n"].quantile(0.95)),
            },
        )

    def read_skew(self) -> DataFrame:
        if os.path.exists(self.skew_path):
            return self.spark.read.parquet(self.skew_path)
        return self.spark.createDataFrame([], SKEW_METRICS_SCHEMA)

    def invalidate(self, buckets: list[int], stage: str, out_path: str | None = None) -> None:
        """Drop completion rows for given buckets (e.g. digest changed between
        snapshots) by rewriting the metrics table without them.  Pass the
        stage's out_path to also remove the now-STALE bucket partitions —
        otherwise the resume reconciler would see complete-looking dirs and
        re-mark them done without recomputing."""
        if out_path is not None:
            import shutil

            for b in buckets:
                shutil.rmtree(f"{out_path}/bucket={int(b)}", ignore_errors=True)
        cur = self._read()
        keep = cur.where(
            ~((F.col("stage") == stage) & F.col("bucket").isin([int(b) for b in buckets]))
        )
        tmp = self.metrics_path + ".tmp"
        keep.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.metrics_path)


def resumable_fingerprint(
    ctx: RunContext,
    pages: DataFrame,
    out_path: str,
    n_buckets: int = 16,
    stage: str = "fingerprint",
    cfg=None,
) -> DataFrame:
    """Fingerprint only buckets not yet marked done; publish each bucket's
    output atomically; mark completions.  Returns the full docs_fp table
    (existing + newly computed).  Kill/rerun => completed buckets are never
    recomputed (tests/test_resume.py asserts via Spark accumulators).

    Crash-safety: the batch is written to a staging dir, then each bucket
    directory is RENAMED into place, then mark_done runs.  A crash between a
    rename and mark_done leaves complete bucket dirs unmarked — the resume
    reconciles those against the metrics table (marks them done) instead of
    recomputing and appending duplicate rows.
    """
    import shutil

    from bigtrees_spark.config import DEFAULT_CONFIG
    from bigtrees_spark.operators.digest import bucket_of
    from bigtrees_spark.operators.fingerprint import fingerprint_docs

    cfg = cfg or DEFAULT_CONFIG
    pages_b = pages.withColumn("bucket", bucket_of("url", n_buckets))
    all_buckets = pages_b.select("bucket").distinct()
    pending = ctx.pending_buckets(all_buckets, stage)
    pending_list = [r["bucket"] for r in pending.collect()]

    conf_marker = f"_conf-{ctx.config_hash or 'none'}"  # Spark ignores _-files

    # reconcile: a bucket dir carrying OUR config marker was fully published
    # (renames happen only after the staged write committed) by an attempt
    # that died before mark_done — count it done, don't recompute-and-
    # duplicate.  A dir with a DIFFERENT (or no) marker is stale output from
    # another config: delete it so the recompute can publish cleanly.
    published, stale = [], []
    for b in pending_list:
        d = f"{out_path}/bucket={int(b)}"
        if not os.path.isdir(d):
            continue
        (published if os.path.exists(f"{d}/{conf_marker}") else stale).append(b)
    for b in stale:
        shutil.rmtree(f"{out_path}/bucket={int(b)}", ignore_errors=True)
    if published:
        ctx.mark_done(published, stage)
        pending_list = [b for b in pending_list if b not in set(published)]

    if pending_list:
        staging = f"{out_path}.staging-{ctx.run_id}"
        shutil.rmtree(staging, ignore_errors=True)
        todo = pages_b.where(F.col("bucket").isin([int(b) for b in pending_list]))
        fp = fingerprint_docs(todo, cfg).withColumn(
            "bucket", bucket_of("url", n_buckets)
        )
        fp.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        os.makedirs(out_path, exist_ok=True)
        for b in pending_list:
            src = f"{staging}/bucket={int(b)}"
            if os.path.isdir(src):  # empty buckets produce no directory
                with open(f"{src}/{conf_marker}", "w"):  # provenance marker
                    pass
                os.rename(src, f"{out_path}/bucket={int(b)}")
        shutil.rmtree(staging, ignore_errors=True)
        ctx.mark_done(pending_list, stage)

    return ctx.spark.read.parquet(out_path)
