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
