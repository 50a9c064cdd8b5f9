"""Shared fingerprint / LSH configuration.

One config object is shared by the Spark pipeline, the pure-Python oracle, and
the fixture generator, so that "dup-pair recall >= 0.99 at the same
shingle/signature config" (BASELINE.json north_rule) is a meaningful comparison:
both sides shingle, hash, and band identically.

Reference analog: the reference pins its digest algorithm in one module
(sha256 -> hex -> base64 -> 20 chars, /root/reference/lib/System/Directory/
BigTrees/Hash.hs:99-114) with committed unit vectors (Hash.hs:194-204).  We pin
our MinHash permutations the same way: seeded, serialized in this module, with
known-answer vectors in tests/test_fingerprints.py.

Banding math (Leskovec/Rajaraman/Ullman ch.3 S-curve): detection probability at
Jaccard s is 1-(1-s^r)^b.  With r=3, b=42 (126 of 128 perms used):
    s=0.5 -> 0.996     s=0.6 -> 0.99996     s=0.7 -> ~1-1e-7
so candidate recall at the default verify threshold (0.5) clears the 0.99 gate
with margin; final pairs are verified with EXACT shingle-set Jaccard, making
precision 1.0 relative to the oracle's definition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Modulus for the universal-hash MinHash permutations: Mersenne prime 2^31-1.
# Shingle hashes are 32-bit; (a * x + b) mod P with a,b < P fits in uint64
# with NO overflow (31 + 32 = 63 bits), so the arithmetic is exact — unlike the
# common uint64-wraparound shortcut.
MERSENNE_P = np.uint64((1 << 31) - 1)


@dataclass(frozen=True)
class FingerprintConfig:
    """All knobs for shingling, MinHash, SimHash, LSH banding, and the
    substring (winnowing) pass."""

    seed: int = 42

    # --- shingling ---
    shingle_k: int = 5          # tokens per shingle (w-shingling on words)

    # --- MinHash ---
    n_perms: int = 128

    # --- LSH banding ---
    bands: int = 42
    rows_per_band: int = 3      # bands * rows_per_band <= n_perms

    # --- verification ---
    jaccard_threshold: float = 0.5   # exact shingle-Jaccard for a true dup pair

    # --- SimHash ---
    simhash_bits: int = 64
    simhash_hamming_max: int = 3     # Hamming radius for SimHash near-dup edges

    # --- substring/winnowing pass (suffix-array-equivalent semantics) ---
    substring_min_len: int = 256     # guarantee: shared substrings >= this long
    winnow_gram: int = 64            # w-gram size for rolling hashes

    # --- LSH skew handling ---
    max_bucket_size: int = 200       # buckets above this are salted/capped

    # --- error-row guard (Err-node semantics) ---
    # html payloads above this are rejected as error rows instead of risking
    # an executor OOM inside the Arrow batch (real crawls contain GB pages).
    max_html_bytes: int = 8 << 20

    def __post_init__(self) -> None:
        assert self.bands * self.rows_per_band <= self.n_perms
        assert self.winnow_gram < self.substring_min_len

    @property
    def winnow_window(self) -> int:
        """Winnowing window size: guarantee detection of any shared substring of
        length >= substring_min_len (Schleimer et al., SIGMOD'03: t - w + 1)."""
        return self.substring_min_len - self.winnow_gram + 1

    # Permutation coefficients are derived lazily but deterministically from
    # the seed, so every executor / the oracle / the tests regenerate the
    # identical permutation set without shipping arrays around.
    def config_hash(self) -> str:
        """Stable 12-hex digest of every knob — scan provenance (the
        reference Header records its config the same way, HeadFoot.hs:66-75).
        Two runs reuse each other's completed work only when this matches."""
        import dataclasses
        import hashlib
        import json

        blob = json.dumps(dataclasses.asdict(self), sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:12]

    def minhash_coeffs(self) -> tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng(self.seed)
        p = int(MERSENNE_P)
        a = rng.integers(1, p, size=self.n_perms, dtype=np.uint64)
        b = rng.integers(0, p, size=self.n_perms, dtype=np.uint64)
        return a, b


DEFAULT_CONFIG = FingerprintConfig()
