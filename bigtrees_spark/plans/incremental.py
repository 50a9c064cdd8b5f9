"""Digest-driven incremental runs: re-fingerprint ONLY buckets whose content
changed between snapshots.

This is the reference's Merkle speedup (equal dir hashes => skip the whole
subtree, /root/reference/lib/System/Directory/BigTrees/Delta.hs:74-76) turned
into the incremental-ingest loop its README plans ("intelligent re-hashing of
only the files whose mod times have changed", README.md:49):

  1. CHEAP pass over the new snapshot: JVM-side sha2 per row, one hash-agg
     per bucket over sorted (url, sha256) pairs — no Python, no wide columns.
  2. Compare with the stored bucket digests (broadcast join on ~n_buckets
     rows): unchanged buckets keep their stored docs_fp rows verbatim.
  3. The EXPENSIVE Arrow-UDF fingerprint stage runs only over changed
     buckets' rows.

At 100 TB with a daily 1% churn this turns the Python stage from
100 TB -> ~1 TB; step 1 is a single scan the columnar reader serves from
(url, text) only.  Note the state digest includes the url (unlike the
reference's name-free dir hash / digest.partition_digests): fingerprint
reuse is keyed on row identity, not just content multiset.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig
from bigtrees_spark.operators.digest import bucket_of
from bigtrees_spark.operators.fingerprint import fingerprint_docs
from bigtrees_spark.sinks import SnapshotSink


def bucket_state_digests(pages_b: DataFrame) -> DataFrame:
    """(bucket, state_digest): sha256 of the sorted url<US>sha256 pairs —
    changes iff any row's identity OR content changes."""
    return (
        pages_b.select(
            "bucket",
            F.concat_ws(
                "\x1f", F.col("url"), F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
            ).alias("row_key"),
        )
        .groupBy("bucket")
        .agg(
            F.sha2(F.concat_ws("\n", F.sort_array(F.collect_list("row_key"))), 256).alias(
                "state_digest"
            )
        )
    )


@dataclass
class IncrementalResult:
    docs_fp: DataFrame
    n_buckets_changed: int
    n_buckets_total: int


def incremental_run(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    n_buckets: int = 64,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    sink: SnapshotSink | None = None,
) -> IncrementalResult:
    """Fingerprint the new snapshot, reusing stored rows for every bucket
    whose state digest is unchanged.  Persists docs_fp + digests through the
    SnapshotSink (Iceberg snapshot commit when a catalog is configured,
    staged parquet swap otherwise) for the next run."""
    sink = sink or SnapshotSink(spark, state_dir)

    pages_b = pages.withColumn("bucket", bucket_of("url", n_buckets))
    new_digests = bucket_state_digests(pages_b).persist()
    n_total = new_digests.count()

    have_state = sink.exists("digests") and sink.exists("docs_fp")
    if have_state:
        old_digests = sink.read("digests")
        j = new_digests.alias("n").join(
            old_digests.alias("o"), "bucket", "left_outer"
        )
        changed = j.where(
            F.col("o.state_digest").isNull()
            | (F.col("n.state_digest") != F.col("o.state_digest"))
        ).select("bucket")
        # buckets REMOVED in the new snapshot simply don't appear in
        # new_digests; their old rows are dropped by the semi-join below
        changed = F.broadcast(changed)
        n_changed = changed.count()

        unchanged = new_digests.join(changed, "bucket", "left_anti").select("bucket")
        old_fp = sink.read("docs_fp")
        kept = old_fp.join(F.broadcast(unchanged), "bucket", "left_semi")
        fresh = fingerprint_docs(
            pages_b.join(changed, "bucket", "left_semi"), cfg
        ).withColumn("bucket", bucket_of("url", n_buckets))
        docs_fp = kept.select(*fresh.columns).unionByName(fresh)
    else:
        n_changed = n_total
        docs_fp = fingerprint_docs(pages_b, cfg).withColumn(
            "bucket", bucket_of("url", n_buckets)
        )

    # snapshot commit through the sink: kept rows are READ from the previous
    # snapshot, so the write must stage-then-publish (Iceberg does this via
    # its metadata pointer; the parquet fallback via directory rename)
    sink.commit_snapshot(docs_fp, "docs_fp", partition_by=["bucket"])
    sink.commit_snapshot(new_digests, "digests")
    out = sink.read("docs_fp")
    new_digests.unpersist()
    return IncrementalResult(out, int(n_changed), int(n_total))
