"""Vectorized fingerprint kernels and their Spark UDF wrappers."""

from bigtrees_spark.functions.kernels import (  # noqa: F401
    band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash64,
    token_hashes,
    tokenize,
    winnow_fingerprints,
)
