"""Per-trigger cost attribution for the streaming near-dup operator
(VERDICT r04 next #7): WHERE does a micro-batch's wall time go?

Reads the engine's own StreamingQueryProgress (durationMs: addBatch /
getBatch / queryPlanning / walCommit / commitOffsets / stateOperators
commit+removal times) instead of hand timing, and A/Bs the two knobs the
round-4 verdict asked about:

  * spark.sql.shuffle.partitions tuned to the observed band-group count
    per trigger vs the session default (32) — the state operator runs one
    task per shuffle partition, and each task opens/commits one state
    store; empty partitions still pay provider round-trips;
  * HDFSBackedStateStoreProvider (default) vs RocksDBStateStoreProvider.

Usage: python tools/streaming_profile.py [docs_per_batch] [n_batches]
Appends one JSON line per config to results/streaming_profile.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def make_source(spark, out_dir: str, docs_per_batch: int, n_batches: int) -> None:
    """n_batches parquet files of derived twin-bearing pages: file N holds
    docs, file N+1 holds their 3-token-truncated twins (cross-batch state
    hits), so the state op does real verify work every trigger."""
    import bench
    from pyspark.sql import functions as F

    d = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .limit(docs_per_batch)
        .select("doc_id", "text")
        .cache()
    )
    for b in range(n_batches):
        side = d.select(
            F.format_string(f"b{b:02d}d%08d", "doc_id").alias("url"),
            (F.col("text") if b % 2 == 0 else bench._drop3("text")).alias("text"),
        )
        page = side.select(
            "url",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        )
        # the file-stream source lists FILES directly under the input path
        # (it does not recurse into part-file directories), so stage the
        # Spark directory-write and move the single part file up as a flat
        # batchNN.parquet
        stage = f"{out_dir}/.stage{b:02d}"
        page.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(Path(stage).glob("part-*.parquet"))
        part.rename(Path(out_dir) / f"batch{b:02d}.parquet")
        shutil.rmtree(stage, ignore_errors=True)
    d.unpersist()


def run_config(
    name: str,
    docs_per_batch: int,
    n_batches: int,
    shuffle_parts: int | None,
    rocksdb: bool,
) -> dict:
    import bench
    from bigtrees_spark.streaming.neardup import start_neardup_stream

    spark = bench._bench_session(8)
    try:
        if shuffle_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        if rocksdb:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        work = tempfile.mkdtemp(prefix=f"stream_prof_{name}_")
        src, ckpt, sink = f"{work}/src", f"{work}/ckpt", f"{work}/sink"
        make_source(spark, src, docs_per_batch, n_batches)
        # availableNow over maxFilesPerTrigger=1 -> one trigger per batch file
        srcdf = (
            spark.readStream.schema(
                "url string, warc_ts timestamp, html binary, text string, lang string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from pyspark.sql import functions as F
        from bigtrees_spark.streaming.neardup import neardup_edges_stream

        def write_batch(df, batch_id):
            df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink)

        t0 = time.time()
        q = (
            neardup_edges_stream(srcdf)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(600)
        wall = time.time() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
        if not finished:
            q.stop()
            raise RuntimeError(f"{name}: stream did not finish within 600s")
        edges = spark.read.parquet(sink).count()
        shutil.rmtree(work, ignore_errors=True)
    finally:
        spark.stop()

    trig = [p for p in progress if p.get("numInputRows", 0) > 0]

    def avg(path):
        vals = []
        for p in trig:
            v = p
            for k in path:
                v = v.get(k, {}) if isinstance(v, dict) else {}
            if isinstance(v, (int, float)):
                vals.append(v)
        return round(sum(vals) / len(vals), 1) if vals else None

    state = [p["stateOperators"][0] for p in trig if p.get("stateOperators")]
    out = {
        "config": name,
        "docs_per_batch": docs_per_batch,
        "n_batches": n_batches,
        "triggers_with_input": len(trig),
        "wall_sec_total": round(wall, 1),
        "edges": edges,
        "avg_durationMs": {
            k: avg(["durationMs", k])
            for k in (
                "triggerExecution",
                "addBatch",
                "getBatch",
                "queryPlanning",
                "walCommit",
                "commitOffsets",
            )
        },
        "avg_state": {
            "commitTimeMs": round(
                sum(s.get("commitTimeMs", 0) for s in state) / max(len(state), 1), 1
            ),
            "numRowsTotal": state[-1].get("numRowsTotal") if state else None,
            "memoryUsedBytes": state[-1].get("memoryUsedBytes") if state else None,
            "numShufflePartitions": state[-1].get("numShufflePartitions")
            if state
            else None,
        },
    }
    return out


def main() -> None:
    docs_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    results = []
    for name, parts, rocks in (
        ("default_hdfs_sp32", None, False),
        ("tuned_sp8", 8, False),
        ("rocksdb_sp8", 8, True),
    ):
        r = run_config(name, docs_per_batch, n_batches, parts, rocks)
        print(json.dumps(r))
        results.append(r)
    out = Path("/root/repo/results/streaming_profile.json")
    with out.open("a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
