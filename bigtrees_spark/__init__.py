"""bigtrees_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine with the query semantics of jefdaj/bigtrees.

The reference (read-only at /root/reference) is a single-process Haskell hash-tree
dedup tool; this package re-expresses its semantics — content fingerprinting,
grouping-by-fingerprint into duplicate sets, savings scoring, containment pruning,
set algebra over fingerprints, snapshot diffing, Merkle-style rollup digests —
as Spark DataFrame pipelines over web-page / document tables, generalized from
exact hashing to MinHash/SimHash/LSH near-duplicate detection with connected
components, plus the training-data-pipeline operators (similarity search, text
quality analysis, multimodal column plumbing) such an engine needs at 100 TB.

Layout:
    config.py             shared fingerprint/LSH configuration (single source of
                          truth for pipeline AND oracle — recall gates depend on it)
    session.py            SparkSession factory (Arrow, AQE, shuffle tuning)
    functions/            pure numpy/pandas fingerprint kernels + Spark UDF wrappers
    sources/              synthetic web_pages fixture generator, readers/writers
    operators/            dedup, lsh, cc, diff, find, sets, digest, substring,
                          similarity, textstats, multimodal
    plans/                pipeline assembly (end-to-end dedup plan), run metrics,
                          resume logic
    streaming/            incremental / resumable semantics
    oracle.py             single-node brute-force oracle for recall tests
"""

__version__ = "0.1.0"


def _install_zipimport_invalidation_guard() -> None:
    """Backport CPython's mtime/size guard to zipimporter.invalidate_caches.

    Spark's Python worker calls importlib.invalidate_caches() during setup of
    EVERY task (pyspark/worker_util.py setup_spark_files), and on Python <=
    3.11 zipimporter.invalidate_caches() unconditionally re-reads the whole
    zip central directory from disk.  With Spark's pyspark.zip on the worker
    path, that is 140-280 ms of wall per task on this host's rootfs —
    measured as the dominant cost of every ArrowEvalPython/MapInPandas task
    (a trivial 64-task pandas-UDF stage: 0.62 s before, 0.24 s after).

    The guard skips the re-read while the archive's (mtime, size) is
    unchanged — the same freshness rule importlib's own FileFinder uses for
    directories, and the behavior CPython itself adopted upstream for
    zipimport (the directory cache is invalidated only when the file
    changes).  Re-zipped archives with a new mtime or size still invalidate
    exactly as before; our pipelines never rewrite path zips mid-session.

    Installed at package import, so any Spark worker that unpickles one of
    this package's UDFs (they all reference module-level functions, which
    imports the package in the worker) is patched from its first task on.
    Idempotent; a failure to patch degrades to stock behavior.
    """
    try:
        import os
        import zipimport

        zi = zipimport.zipimporter
        if getattr(zi, "_bigtrees_mtime_guard", False):
            return
        orig = zi.invalidate_caches

        def invalidate_caches(self):  # noqa: ANN001 — stdlib signature
            try:
                st = os.stat(self.archive)
                key = (st.st_mtime, st.st_size)
            except OSError:
                key = None
            cache = getattr(zi, "_bigtrees_mtime_cache", None)
            if cache is None:
                cache = {}
                zi._bigtrees_mtime_cache = cache
            if key is not None and cache.get(self.archive) == key:
                return
            orig(self)
            cache[self.archive] = key

        zi.invalidate_caches = invalidate_caches
        zi._bigtrees_mtime_guard = True
    except Exception:  # noqa: BLE001 — never let the guard break imports
        pass


_install_zipimport_invalidation_guard()
