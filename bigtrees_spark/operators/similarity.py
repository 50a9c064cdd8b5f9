"""Similarity search over an embedding column (array<float>).

Generalizes the reference's "same fingerprint => duplicate" to continuous
fingerprints: embedding-cosine near-dup pairs and top-k nearest neighbors.

Two paths (SURVEY.md / task brief):
  * brute-force cosine top-k — the exactness baseline. JVM-side math only:
    F.zip_with + F.aggregate for dot products inside whole-stage codegen
    (norms hoisted to one projection per side, not per pair); the top-k is a
    partition-local bounded reducer + a small final rank (_topk_per_query).
    Cost O(Q x N) — correct tool when Q is small (a query batch) even at huge N.
  * LSH-bucketed path — random-hyperplane signatures (SimHash for vectors,
    Charikar'02): b x r sign bits per vector; bucket-join on band keys, exact
    cosine re-rank inside buckets. Sub-linear candidate generation at
    10^12-vector scale, same skew controls as the text LSH.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig


def _dot(a, b):  # Column helper: dot product of two float arrays
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):  # Column helper: L2 norm of a float array
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(a, b):  # Column helper: cosine similarity of two float arrays
    return _dot(a, b) / (_norm(a) * _norm(b))


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """EXACT per-query top-k with bounded memory at every stage.

    One rank window with a row_number <= k filter.  Spark 3.5+ plans this as
    WindowGroupLimit(Partial) BEFORE the exchange — each map task keeps only
    its partition-local top-k per query — then WindowGroupLimit(Final) after
    it, so the post-shuffle task sees <= n_partitions * k rows per query and
    no task ever buffers a query's full candidate list.  That is exactly the
    bound the previous mapInPandas partial-top-k reducer enforced by hand
    (r03 shape), minus the JVM->Python->JVM crossing of every scored row:
    the round-6 plan is pure JVM (the BatchEvalPython/MapInPandas node is
    gone) and the pre-shuffle sort is codegen'd + spillable.  Exactness is
    unchanged: the global top-k by (cosine desc, neighbor_id asc) is a
    subset of the per-partition top-ks by the same order, and the final
    window re-ranks those survivors."""
    sc = scored.select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _static_dot(a, b, dim: int):
    """Dot product as a STATIC left-fold chain over `dim` array slots:
    ((0.0 + a[0]*b[0]) + a[1]*b[1]) + ... — the exact association (and
    therefore the exact IEEE-754 double result) of the F.aggregate/zip_with
    fold it replaces, but built from GetArrayItem/Multiply/Add, which
    whole-stage codegen compiles to straight-line JVM code.  The lambda
    fold is a CodegenFallback expression interpreted per element per pair —
    measured 1.37 s for the bench's 200k-pair x 64-dim cross join vs ~0.3 s
    for the compiled chain.  Rows whose arrays are shorter than `dim` yield
    null (GetArrayItem out of bounds), the same null the zip_with pad
    produces — callers guard with a size() check and fall back to the
    dynamic fold for nonconforming rows."""
    out = F.lit(0.0)
    for i in range(dim):
        out = out + a[i] * b[i]
    return out


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small -> broadcast; the cross join then streams
    the corpus once per partition with zero shuffle of the corpus side.  The
    per-query top-k goes through the partition-local bounded reducer
    (_topk_per_query) so a handful of queries against a 10^12-vector corpus
    never serializes each query's scores into one sort task or one
    aggregation buffer.  Self-matches (same id) are excluded.

    Norms are projected ONCE per side before the cross join (N + Q array
    aggregations) instead of inside the pair expression (2 x N x Q) — the
    same doubles in the same order, so cosine is bit-identical, at a third
    of the JVM array work per pair.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    # one-row probe of the (small, broadcast-bound) query side pins the
    # common embedding dimension so the per-pair dot product compiles to a
    # static codegen chain; rows of any other length take the dynamic
    # zip_with fold via the per-row guard, so ragged corpora stay correct
    # and bit-identical.  The probe is one driver job over one row.
    dim_row = queries.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row and dim_row["d"] is not None else None
    qv, cv = F.col("qv"), F.col("cv")
    dyn = _dot(qv, cv)
    if dim is not None and 0 < dim <= 512:
        dot = F.when(
            (F.size(qv) == dim) & (F.size(cv) == dim), _static_dot(qv, cv, dim)
        ).otherwise(dyn)
    else:
        dot = dyn
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot / (F.col("qn") * F.col("cn")))
    )
    return _topk_per_query(scored, k)


def make_hyperplane_udf(dim: int, n_bits: int = 128, seed: int = 42):
    """pandas UDF: embedding -> array of band keys from random-hyperplane sign
    bits (Charikar'02 random projection LSH).  Hyperplanes are regenerated
    deterministically from the seed on every executor — nothing to broadcast."""
    n_bands = n_bits // 16  # 16 sign bits per band key

    @F.pandas_udf(ArrayType(LongType()))
    def hyperplane_bands(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_bits, dim)).astype(np.float32)
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float32)
            bits = (planes @ x) > 0  # (n_bits,)
            keys = []
            for band in range(n_bands):
                chunk = bits[band * 16 : (band + 1) * 16]
                val = int(np.packbits(chunk).view(np.uint16)[0]) if len(chunk) == 16 else 0
                keys.append((band << 32) | val)
            out.append(keys)
        return pd.Series(out)

    return hyperplane_bands


def lsh_neardup_pairs(
    vectors: DataFrame,
    cosine_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 128,
    seed: int = 42,
    max_bucket: int = 500,
    ctx=None,
    persisted: list | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: hyperplane-LSH buckets -> within-bucket pairs
    -> exact cosine verify.  Returns (id_l, id_r, cosine >= threshold).

    persisted (optional list): the pairing core's internal persist() handle
    is appended so the caller can release it after the pairs materialize
    (same convention as lsh.candidate_pairs / substring_edges).

    Pairing goes through the SAME skew-capped core as the text LSH and SimHash
    paths (lsh._skewcapped_pairs): buckets <= max_bucket pair all-ways inside
    a JVM combination expression (no self-join); hot buckets — e.g. many
    near-zero or duplicated embeddings collapsing onto one hyperplane cell —
    degrade to rank-adjacent pairs instead of being dropped, so a monster
    bucket stays CONNECTED for any downstream clustering and the cap firing
    is recorded in the skew-metrics table (skew_name 'lsh_ann') when a
    runmeta.RunContext is passed as ctx.  The item is struct(id, v), so both
    vectors ride out of the pairing stage and the cosine verify needs no join
    back to the corpus.
    """
    from bigtrees_spark.operators import lsh

    bands_udf = make_hyperplane_udf(dim, n_bits, seed)
    # norm rides the item struct (computed once per vector, not per pair);
    # it sits AFTER id, so pair ordering — struct comparison, decided by the
    # distinct id in the first field — is unchanged.  Project-then-struct:
    # field names come from the projection (aliases on computed expressions
    # inside F.struct are not preserved as field names).
    items = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
        F.explode(bands_udf(F.col(vec_col))).alias("band_key"),
    ).select(F.struct("id", "v", "n").alias("item"), "band_key")
    pairs = lsh._skewcapped_pairs(
        items, ["band_key"], max_bucket, ctx=ctx, skew_name="lsh_ann",
        persisted=persisted,
    ).select(
        F.col("l.id").alias("id_l"),
        F.col("r.id").alias("id_r"),
        F.col("l.v").alias("v_l"),
        F.col("r.v").alias("v_r"),
        F.col("l.n").alias("n_l"),
        F.col("r.n").alias("n_r"),
    )
    return (
        pairs.withColumn(
            "cosine", _dot(F.col("v_l"), F.col("v_r")) / (F.col("n_l") * F.col("n_r"))
        )
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_l", "id_r", "cosine")
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 64,
    vec_col: str = "embedding",
    seed: int = 7,
    sample_size: int = 20_000,
    n_iter: int = 8,
) -> np.ndarray:
    """Spherical k-means on a driver-side sample: the standard IVF coarse
    quantizer training (Lloyd iterations, cosine assignment, re-normalized
    mean update; empty clusters re-seeded from the sample).

    A sample fit is the canonical IVF recipe (FAISS trains on a subset too):
    at 10^12 vectors the quantizer sees a few 10^4 rows once, then ships to
    executors inside the UDF closure (n_centroids x dim floats — KBs to MBs).

    Sampling is a seed-keyed hash-ordered top-N (TakeOrderedAndProject): ONE
    pass, no full-corpus count() job, and deterministic across runs and
    partition layouts — sample(frac).limit(n) was layout-dependent and needed
    a prior count() to size the fraction.
    """
    sample = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.lit(seed), vec_col))
        .limit(sample_size)
    ).toPandas()
    rng = np.random.default_rng(seed)
    if len(sample) == 0:
        C = rng.standard_normal((n_centroids, dim)).astype(np.float32)
        return C / np.linalg.norm(C, axis=1, keepdims=True)
    X = np.stack([np.asarray(v, dtype=np.float32) for v in sample[vec_col]])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms

    # k-means++ init (Arthur & Vassilvitskii '07), cosine distance = 1 - sim:
    # spread seeds proportionally to distance from the chosen set — materially
    # better coarse cells than uniform seeding at small n_centroids
    k_eff = min(n_centroids, len(X))
    first = int(rng.integers(len(X)))
    chosen = [first]
    d2 = np.maximum(1.0 - X @ X[first], 0.0) ** 2
    for _ in range(1, k_eff):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(X), 1.0 / len(X))
        nxt = int(rng.choice(len(X), p=probs))
        chosen.append(nxt)
        d2 = np.minimum(d2, np.maximum(1.0 - X @ X[nxt], 0.0) ** 2)
    C = X[chosen]
    if len(C) < n_centroids:  # tiny corpora: pad with random directions
        pad = rng.standard_normal((n_centroids - len(C), dim)).astype(np.float32)
        C = np.vstack([C, pad / np.linalg.norm(pad, axis=1, keepdims=True)])

    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)  # cosine: both sides unit-norm
        newC = np.zeros_like(C)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members) == 0:
                newC[j] = X[rng.integers(len(X))]  # re-seed empty cluster
            else:
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                newC[j] = m / nm if nm > 0 else C[j]
        if np.allclose(newC, C, atol=1e-6):
            C = newC
            break
        C = newC
    return C.astype(np.float32)


def make_centroid_udf(
    dim: int,
    n_centroids: int = 64,
    n_probe: int = 2,
    seed: int = 7,
    centroids: np.ndarray | None = None,
):
    """pandas UDF: embedding -> its n_probe nearest coarse-centroid ids.

    With `centroids` (from fit_ivf_centroids) the trained quantizer ships to
    executors in the UDF closure.  Without, DETERMINISTIC random centroids
    are regenerated from the seed on every executor — the untrained fallback
    partitions the space like a coarse LSH (lower recall, zero fit cost)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType

    trained = None if centroids is None else np.ascontiguousarray(centroids, dtype=np.float32)

    @F.pandas_udf(ArrayType(IntegerType()))
    def centroid_ids(vecs: pd.Series) -> pd.Series:
        if trained is not None:
            C = trained
        else:
            rng = np.random.default_rng(seed)
            C = rng.standard_normal((n_centroids, dim)).astype(np.float32)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ C.T                      # (batch, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :n_probe]    # n_probe nearest lists
        return pd.Series([row.astype("int32").tolist() for row in top])

    return centroid_ids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 64,
    n_probe: int = 2,
    seed: int = 7,
    train: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k: IVF bucket join + exact cosine re-rank.

    Scale path for 10^12 vectors: corpus vectors live in their single nearest
    list (inverted file); each query probes its n_probe nearest lists, so the
    join touches ~n_probe/n_centroids of the corpus instead of all of it.
    Exact re-rank inside the probed lists keeps ranking exact conditional on
    the probe — the standard IVF recall trade-off, tuned by n_probe.

    Centroids are k-means-trained on a corpus sample by default
    (fit_ivf_centroids); pass centroids= to reuse a fitted quantizer across
    runs, or train=False for the untrained random-projection fallback.
    """
    if centroids is None and train:
        centroids = fit_ivf_centroids(
            corpus, dim, n_centroids, vec_col=vec_col, seed=seed
        )
    assign = make_centroid_udf(dim, n_centroids, n_probe, seed, centroids=centroids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),  # corpus norms once, not per pair
    )
    c = c.withColumn("list_id", F.element_at(assign(F.col("cv")), 1))  # nearest only
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    q = q.withColumn("list_id", F.explode(assign(F.col("qv"))))        # probe lists

    scored = (
        q.join(c, "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    # a query appears once per probed list, so the same (query, neighbor)
    # cannot duplicate (corpus vectors live in exactly one list); the
    # bounded reducer caps the per-query ranking like the brute-force path
    return _topk_per_query(scored, k)
