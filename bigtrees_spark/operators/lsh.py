"""MinHash-LSH banding, skew-aware candidate-pair generation, and exact
verification — the generalization of the reference's `groupBy(hash)` dupe
grouping (/root/reference/lib/System/Directory/BigTrees/DupeMap.hs:72-114) to
near-duplicates (SURVEY.md G1/G2).

Scale design (north_rule: "partitioning / shuffle / skew handled explicitly"):
  * the band table is SKINNY — (url, band_idx, band_hash) only; signatures and
    texts are joined back AFTER candidate dedup, so the explode x42 never
    multiplies wide payloads through a shuffle;
  * hot buckets (boilerplate-heavy web text is Zipfian) are bounded: buckets
    above cfg.max_bucket_size switch from all-pairs to windowed neighbor
    pairing (rank-adjacent within the bucket), which preserves bucket
    connectivity for the CC stage while capping the pair join at O(m*K)
    instead of O(m^2);  exact-dup collapse BEFORE banding (dedup.canonical_docs)
    already removes the worst offenders;
  * AQE skew-join splitting stays on for the residual skew (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig

NEIGHBOR_K = 3  # windowed pairing width inside over-cap buckets

SIMHASH_CHUNK_CAP = 10_000  # chunk buckets above this switch to rank pairing


def _bucket_skew_stats(sized: DataFrame, cap: int) -> dict:
    """Bucket-size distribution of a (already checkpointed) sized/ranked
    bucket table: rnk==1 selects one row per bucket, so this is one cheap agg
    over the materialized table — 'skew: measured, not assumed' (SURVEY §7)."""
    row = (
        sized.where(F.col("rnk") == 1)
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("bsz") > cap).cast("long")).alias("n_overcap"),
            F.max("bsz").alias("max_bucket"),
            F.percentile_approx("bsz", 0.95).alias("p95_bucket"),
        )
        .first()
    )
    return row.asDict() if row else {}


def _skew_stats_from_sizes(sizes: DataFrame, cap: int) -> dict:
    """Same stats from a (bucket -> bsz) table (one row per bucket)."""
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("bsz") > cap).cast("long")).alias("n_overcap"),
        F.max("bsz").alias("max_bucket"),
        F.percentile_approx("bsz", 0.95).alias("p95_bucket"),
    ).first()
    return row.asDict() if row else {}


# all unordered (us[i], us[j]) i<j pairs from a sorted url array, JVM-side:
# per-bucket work is bounded by the size cap, so the arrays are small
_COMBOS = (
    "flatten(transform(us, (x, i) -> "
    "transform(slice(us, i + 2, size(us) - i - 1), "
    "y -> struct(x AS url_l, y AS url_r))))"
)


def band_table(docs_fp: DataFrame) -> DataFrame:
    """Explode signatures into skinny (url, band_idx, band_hash) rows."""
    return docs_fp.select(
        "url", F.posexplode("bands").alias("band_idx", "band_hash")
    )


def candidate_pairs(
    docs_fp: DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG, ctx=None
) -> DataFrame:
    """Distinct (url_l, url_r) candidate pairs (url_l < url_r) from LSH buckets.

    Buckets <= max_bucket_size: all within-bucket pairs (exact LSH semantics).
    Buckets  > max_bucket_size: rank-adjacent pairs (|rank diff| <= NEIGHBOR_K)
    — documented recall trade-off for pathological buckets, kept connected for
    the downstream connected-components stage.

    ctx (optional runmeta.RunContext): records the bucket-size distribution
    and cap-fire count into the skew-metrics table.

    Plan shape: ONE shuffle (the size/rank window over the skinny band
    table), singleton buckets dropped before materialization (on real web
    corpora most docs are not near-dups, so most band rows die here), then:
    small buckets pair inside a bounded collect_list array — a hash agg that
    reuses the window's partitioning (no shuffle, no self-join, no sort);
    only the rare over-cap buckets pay a rank-adjacent self-join.
    """
    keys = ["band_idx", "band_hash"]
    bands = band_table(docs_fp)
    w = Window.partitionBy(*keys)
    sized = bands.withColumn("bsz", F.count("*").over(w)).withColumn(
        "rnk", F.row_number().over(w.orderBy("url"))
    )
    # materialize once (feeds skew stats + both pairing paths), WITHOUT the
    # pair-less singleton buckets — the dominant rows at realistic dup rates
    multi = sized.where(F.col("bsz") > 1).localCheckpoint(eager=True)
    if ctx is not None:
        # n_buckets counts multi-occupancy buckets (the ones that can pair)
        ctx.record_skew(
            "lsh_bands", cfg.max_bucket_size, _bucket_skew_stats(multi, cfg.max_bucket_size)
        )

    small = (
        multi.where(F.col("bsz") <= cfg.max_bucket_size)
        .groupBy(*keys)  # partitioning preserved from the window: no shuffle
        .agg(F.sort_array(F.collect_list("url")).alias("us"))
        .select(F.explode(F.expr(_COMBOS)).alias("p"))
        .select("p.url_l", "p.url_r")
    )

    big = multi.where(F.col("bsz") > cfg.max_bucket_size)
    bp = (
        big.alias("l")
        .join(big.alias("r"), keys)
        .where(
            (F.col("r.rnk") > F.col("l.rnk"))
            & (F.col("r.rnk") - F.col("l.rnk") <= NEIGHBOR_K)
        )
        .select(F.col("l.url").alias("url_l"), F.col("r.url").alias("url_r"))
    )

    return small.unionByName(bp).distinct()


def verify_pairs(
    pairs: DataFrame,
    docs_fp: DataFrame,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    sig_prefilter_margin: float = 0.15,
) -> DataFrame:
    """Candidate pairs -> verified near-dup edges with EXACT shingle Jaccard.

    Two-stage: (1) cheap signature-estimate prefilter (join skinny sigs, drop
    pairs whose estimated Jaccard is hopeless), (2) exact shingle-set Jaccard
    via the precomputed sorted-distinct shingle arrays — pure Catalyst
    (array_intersect/array_union inside whole-stage codegen), so the verify
    stage ships fingerprint arrays instead of document TEXTS (5-20x less
    shuffle at web scale) and never re-tokenizes a doc once per pair.
    Final predicate == the oracle's definition, so pipeline precision is 1.0
    and recall is the LSH candidate recall (config.py S-curve: >=0.996 at
    threshold).

    Returns edges: url_l, url_r, jaccard (>= cfg.jaccard_threshold).
    """
    sigs = docs_fp.select("url", "minhash")
    # estimated Jaccard = fraction of agreeing MinHash slots — pure codegen
    # (zip_with + aggregate), no Python round-trip for the prefilter
    est = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.greatest(F.size(a), F.lit(1))
    pre = (
        pairs.join(sigs.withColumnsRenamed({"url": "url_l", "minhash": "sig_l"}), "url_l")
        .join(sigs.withColumnsRenamed({"url": "url_r", "minhash": "sig_r"}), "url_r")
        .withColumn("est_j", est(F.col("sig_l"), F.col("sig_r")))
        .where(F.col("est_j") >= F.lit(max(0.0, cfg.jaccard_threshold - sig_prefilter_margin)))
        .select("url_l", "url_r")
        # materialize the surviving (skinny) pair set: the prefilter joins
        # otherwise re-plan/re-execute under AQE when fused with the exact
        # stage (observed 18s vs 1s at sf0.1); the checkpoint also truncates
        # lineage before the shingle join
        .localCheckpoint(eager=True)
    )

    sh = docs_fp.select("url", "shingles")
    inter = F.size(F.array_intersect(F.col("sh_l"), F.col("sh_r")))
    union = F.size(F.array_union(F.col("sh_l"), F.col("sh_r")))
    return (
        pre.join(sh.withColumnsRenamed({"url": "url_l", "shingles": "sh_l"}), "url_l")
        .join(sh.withColumnsRenamed({"url": "url_r", "shingles": "sh_r"}), "url_r")
        .withColumn(
            "jaccard",
            # two empty shingle sets are identical docs (jaccard 1.0), same
            # convention as the Arrow kernel and the brute-force oracle
            F.when(union == 0, F.lit(1.0)).otherwise(
                inter.cast("double") / union.cast("double")
            ),
        )
        .where(F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
        .select("url_l", "url_r", "jaccard")
    )


def simhash_edges(
    docs_fp: DataFrame,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    ctx=None,
    chunk_cap: int = SIMHASH_CHUNK_CAP,
) -> DataFrame:
    """Second edge source: SimHash pairs within Hamming radius.

    Block on 4 x 16-bit chunks of the 64-bit fingerprint (pigeonhole: any pair
    with Hamming distance <= 3 agrees exactly on at least one chunk), groupBy
    chunk value, pair within buckets, verify Hamming via vectorized popcount.

    Hot chunk values (e.g. near-zero simhashes from many short docs) are NOT
    dropped: buckets above chunk_cap switch to rank-adjacent pairing, the same
    connectivity-preserving fallback candidate_pairs uses — so a hot chunk
    degrades to a chain of verified edges instead of silently losing every
    pair.  ctx (runmeta.RunContext) records how often the cap fired.
    """
    chunks = docs_fp.select(
        "url",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("url", "simhash", "c.chunk_idx", "c.chunk_val")

    w = Window.partitionBy("chunk_idx", "chunk_val")
    sized = (
        chunks.withColumn("bsz", F.count("*").over(w))
        .withColumn("rnk", F.row_number().over(w.orderBy("url")))
        .localCheckpoint(eager=True)  # feeds both sides of both self-joins
    )
    if ctx is not None:
        ctx.record_skew("simhash_chunks", chunk_cap, _bucket_skew_stats(sized, chunk_cap))

    small = sized.where(F.col("bsz") <= chunk_cap)
    sp = (
        small.alias("l")
        .join(small.alias("r"), ["chunk_idx", "chunk_val"])
        .where(F.col("l.url") < F.col("r.url"))
        .select(
            F.col("l.url").alias("url_l"),
            F.col("r.url").alias("url_r"),
            F.col("l.simhash").alias("sh_l"),
            F.col("r.simhash").alias("sh_r"),
        )
    )
    big = sized.where(F.col("bsz") > chunk_cap)
    bp = (
        big.alias("l")
        .join(big.alias("r"), ["chunk_idx", "chunk_val"])
        .where(
            (F.col("r.rnk") > F.col("l.rnk"))
            & (F.col("r.rnk") - F.col("l.rnk") <= NEIGHBOR_K)
        )
        .select(
            F.col("l.url").alias("url_l"),
            F.col("r.url").alias("url_r"),
            F.col("l.simhash").alias("sh_l"),
            F.col("r.simhash").alias("sh_r"),
        )
    )
    pairs = sp.unionByName(bp).distinct()
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r"))),  # JVM popcount
        )
        .where(F.col("hamming") <= F.lit(cfg.simhash_hamming_max))
        .select("url_l", "url_r", "hamming")
    )
