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
  * AQE skew-join splitting stays on for the residual skew (session.py);
  * partitioning choice: the pairing window hash-partitions on the band keys
    (band_hash is uniform by construction — a minhash of minhashes — so hash
    partitioning is already balanced; repartitionByRange would add a sampling
    pass to learn a distribution that is uniform by design).  Over-cap
    buckets are additionally SALTED: their rows re-hash on (keys, item) so
    the fallback pair generation spreads across tasks instead of running
    where the window sort left the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig

NEIGHBOR_K = 3  # windowed pairing width inside over-cap buckets

SIMHASH_CHUNK_CAP = 10_000  # chunk buckets above this switch to rank pairing


def _skew_stats_from_sizes(sizes: DataFrame, cap: int) -> dict:
    """Skew stats from a (bucket -> bsz) table (one row per bucket) —
    'skew: measured, not assumed' (SURVEY §7)."""
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("bsz") > cap).cast("long")).alias("n_overcap"),
        F.max("bsz").alias("max_bucket"),
        F.percentile_approx("bsz", 0.95).alias("p95_bucket"),
    ).first()
    return row.asDict() if row else {}


# all unordered (us[i], us[j]) i<j pairs from a sorted item array, JVM-side:
# per-bucket work is bounded by the size cap, so the arrays are small
_COMBOS = (
    "flatten(transform(us, (x, i) -> "
    "transform(slice(us, i + 2, size(us) - i - 1), "
    "y -> struct(x AS l, y AS r))))"
)


def _skewcapped_pairs(
    items: DataFrame,
    keys: list,
    cap: int,
    ctx=None,
    skew_name: str = "buckets",
    distinct: bool = True,
    persisted: list | None = None,
) -> DataFrame:
    """Distinct (l, r) pairs (l < r) per bucket, skew-capped — the shared
    pairing core of candidate_pairs and simhash_edges.

    `items` has the bucket-key columns plus one `item` column (a string or a
    struct whose first field orders the pair, e.g. struct(url, simhash)).

    Buckets <= cap: ALL within-bucket pairs.  Buckets > cap: rank-adjacent
    pairs only (each item paired with its NEIGHBOR_K successors in item
    order) — a documented recall trade-off for pathological buckets that
    keeps every bucket CONNECTED for the downstream CC stage.

    Plan shape (one window stage + one small re-shuffle, no self-join):
      * ONE ordered window computes bucket size AND, for over-cap rows only,
        the array of NEIGHBOR_K successor items (F.lead) — so the fallback
        pairs are a pure projection, not a join;
      * singleton buckets (the dominant case at realistic dup rates) are
        dropped BEFORE the materialization point caches anything;
      * the multi-occupancy rows are persist()ed, NOT localCheckpoint()ed:
        this is a corpus-scale frame, and an unreplicated checkpoint deletes
        lineage — one lost executor between here and the last consumer
        would fail the job unrecoverably at cluster scale, while a persisted
        frame recomputes lost partitions from lineage.  persist also keeps
        the window's hash partitioning on the bucket keys (a checkpoint's
        LogicalRDD reports UnknownPartitioning under AQE), so the small-
        bucket groupBy below reuses it instead of re-shuffling;
      * small buckets pair inside a bounded collect_list array + a JVM
        combination expression.
    """
    wo = Window.partitionBy(*keys).orderBy("item")
    # bucket size over the ORDERED spec with an explicit whole-partition
    # frame: same value as count().over(partitionBy-only), but sharing the
    # ordered spec lets Catalyst compute size, the lead()s, and row_number
    # in ONE Window operator (one pass over the sorted partition) instead
    # of two chained Window operators (round 6).
    whole = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nbrs = F.array(*[F.lead("item", k).over(wo) for k in range(1, NEIGHBOR_K + 1)])
    sized = items.withColumn("bsz", F.count("*").over(whole)).withColumn(
        # prune in the same stage: the K-wide successor arrays exist only on
        # over-cap rows, so they never ride the cache for normal buckets
        "nbrs",
        F.when(F.col("bsz") > cap, F.filter(nbrs, lambda x: x.isNotNull())),
    ).withColumn(
        # SIZE-2 FAST PATH (round 6): a two-occupancy bucket's single pair is
        # already computed by the ordered window — first row's successor —
        # so it needs no collect_list aggregation and no interpreted combo
        # expression (the nested transform/slice lambdas in _COMBOS are
        # CodegenFallback, evaluated per element in interpreted mode; at
        # realistic dup rates size-2 buckets dominate, and this was ~1.2s of
        # the 5953-pair bench run).  Gated to the first row (rn == 1) via the
        # same window sort the lead() already pays for.
        "pair2",
        F.when(
            (F.col("bsz") == 2) & (F.row_number().over(wo) == 1),
            F.struct(
                F.col("item").alias("l"), F.lead("item", 1).over(wo).alias("r")
            ),
        ),
    )
    multi = sized.where(F.col("bsz") > 1).persist()
    # one deterministic materializing job (the window stage runs ONCE and
    # caches) before the skew probe / small / big consumers fan out
    multi.count()
    if persisted is not None:
        # hand the cache handle to the caller: the output pair frame reads
        # `multi` lazily, so release belongs to whoever materializes it last
        # (pipeline threads this into DedupResult.persisted).  Without a
        # list the handle is deliberately NOT self-released (unlike
        # connected_components' pre-contraction map, whose hot consumers
        # run before it returns): every consumer of this cache is in the
        # RETURNED lazy frame, so an early release would recompute the
        # window once per branch — direct callers that loop must pass
        # `persisted` and release after materializing (ADVICE r05).
        persisted.append(multi)
    if ctx is not None:
        # n_buckets counts multi-occupancy buckets (the ones that can pair)
        sizes = multi.groupBy(*keys).agg(F.max("bsz").alias("bsz"))
        ctx.record_skew(skew_name, cap, _skew_stats_from_sizes(sizes, cap))

    # size-2 buckets: pure projection of the precomputed window pair —
    # identical (l, r) to the sorted-array combo (window order == sort_array
    # order, first row's successor == (us[0], us[1]))
    two = multi.where(F.col("pair2").isNotNull()).select("pair2.l", "pair2.r")
    small = (
        multi.where((F.col("bsz") > 2) & (F.col("bsz") <= cap))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("item")).alias("us"))
        .select(F.explode(F.expr(_COMBOS)).alias("p"))
        .select("p.l", "p.r")
    ).unionByName(two)
    # SALT the hot buckets (north_star: "salting hot LSH buckets"): after the
    # window, a whole over-cap bucket sits in ONE task; its m*K pair explode
    # would be a single-task straggler at monster-bucket scale.  Re-hashing
    # on (keys, item) spreads the bucket's rows — each already carries its
    # successor array, so the explode needs no bucket locality.  Only the
    # rare over-cap rows pay this extra (skinny) shuffle.
    big = (
        multi.where(F.col("bsz") > cap)
        .repartition(*keys, "item")
        .select(F.col("item").alias("l"), F.explode("nbrs").alias("r"))
    )
    out = small.unionByName(big)
    # callers whose next step is already a groupBy over the pair key can skip
    # the dedup shuffle (duplicates across bands are merged there anyway)
    return out.distinct() if distinct else out


def band_table(docs_fp: DataFrame) -> DataFrame:
    """Explode signatures into skinny (url, band_idx, band_hash) rows."""
    return docs_fp.select(
        "url", F.posexplode("bands").alias("band_idx", "band_hash")
    )


def candidate_pairs(
    docs_fp: DataFrame,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    ctx=None,
    persisted: list | None = None,
) -> DataFrame:
    """Distinct (url_l, url_r) candidate pairs (url_l < url_r) from LSH buckets.

    Buckets <= max_bucket_size: all within-bucket pairs (exact LSH semantics).
    Buckets  > max_bucket_size: rank-adjacent pairs (|rank diff| <= NEIGHBOR_K)
    — documented recall trade-off for pathological buckets, kept connected for
    the downstream connected-components stage.

    ctx (optional runmeta.RunContext): records the bucket-size distribution
    and cap-fire count into the skew-metrics table.

    Plan shape: see _skewcapped_pairs — one window stage over the skinny
    band table, singleton buckets dropped pre-checkpoint, no self-join on
    either path.
    """
    items = band_table(docs_fp).withColumnRenamed("url", "item")
    return _skewcapped_pairs(
        items, ["band_idx", "band_hash"], cfg.max_bucket_size, ctx=ctx,
        skew_name="lsh_bands", persisted=persisted,
    ).select(F.col("l").alias("url_l"), F.col("r").alias("url_r"))


def verify_pairs(
    pairs: DataFrame,
    docs_fp: DataFrame,
    cfg: FingerprintConfig = DEFAULT_CONFIG,
    sig_prefilter_margin: float | None = None,
    persisted: list | None = None,
) -> DataFrame:
    """Candidate pairs -> verified near-dup edges with EXACT shingle Jaccard.

    Two-stage: (1) cheap signature-estimate prefilter (join skinny sigs, drop
    pairs whose estimated Jaccard is hopeless), (2) exact shingle-set Jaccard
    via the precomputed sorted-distinct shingle arrays — pure Catalyst
    (array_intersect/array_union inside whole-stage codegen), so the verify
    stage ships fingerprint arrays instead of document TEXTS (5-20x less
    shuffle at web scale) and never re-tokenizes a doc once per pair.
    Final predicate == the oracle's definition, so pipeline precision is 1.0.

    Honest recall bound: the prefilter ITSELF is probabilistic — a true pair
    at exact Jaccard J >= threshold has Binomial(n_perms, J) agreeing slots,
    so with cutoff (threshold - margin) it is dropped with one-sided tail
    probability P(est < thr - margin).  The default margin is 4.5 sigma
    (sigma = sqrt(thr(1-thr)/n_perms) ~= 0.044 at 128 perms / thr 0.5), i.e.
    ~3e-6 per exactly-at-threshold pair and vanishing above it — pipeline
    recall is the LSH candidate recall (config.py S-curve: >=0.996 at
    threshold) times (1 - that tail), not exactly the candidate recall.
    Pass sig_prefilter_margin explicitly to trade exact-verify volume
    against the tail.

    Returns edges: url_l, url_r, jaccard (>= cfg.jaccard_threshold).
    """
    if sig_prefilter_margin is None:
        thr = cfg.jaccard_threshold
        sig_prefilter_margin = 4.5 * (thr * (1.0 - thr) / cfg.n_perms) ** 0.5
    sigs = docs_fp.select("url", "minhash")

    # estimated Jaccard = fraction of agreeing MinHash slots — zip_with +
    # aggregate fold, parsed from ONE SQL string: the python-lambda form
    # builds the same expression through dozens of py4j round trips
    # (~100 ms of driver time per pipeline construction).  A static
    # 128-term GetArrayItem chain (the ann-style rewrite) was tried in
    # round 6 and REVERTED: at n_perms=128 the generated code blew up
    # janino compilation (a 3.7 s driver stall and a 4 s first-task compile
    # per executor, vs ~0.3 s total for the interpreted fold).
    est_expr = F.expr(
        "aggregate(zip_with(sig_l, sig_r, (x, y) -> cast((x = y) as int)), "
        "0, (acc, x) -> acc + x) / greatest(size(sig_l), 1)"
    )
    pre = (
        pairs.join(sigs.withColumnsRenamed({"url": "url_l", "minhash": "sig_l"}), "url_l")
        .join(sigs.withColumnsRenamed({"url": "url_r", "minhash": "sig_r"}), "url_r")
        .withColumn("est_j", est_expr)
        .where(F.col("est_j") >= F.lit(max(0.0, cfg.jaccard_threshold - sig_prefilter_margin)))
        .select("url_l", "url_r")
        # FUSED with the exact stage (round 6): the prefilter's survivors
        # flow straight into the shingle joins in ONE query — the r04-era
        # persist+eager-count barrier here guarded against an AQE
        # re-planning pathology (observed 18s vs 1s at sf0.1) that no longer
        # reproduces on Spark 4.1 with the round-6 session config; the fused
        # job was A/B'd at 0.3s vs 0.75s for the split shape, and one fewer
        # materializing job per pipeline run.  The exact stage consumes the
        # prefilter output exactly once, so nothing recomputes.
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
    persisted: list | None = None,
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

    Plan shape: see _skewcapped_pairs (shared core) — the item is
    struct(url, simhash), so pairs carry both fingerprints out of the
    pairing stage and the Hamming verify never joins back to docs_fp.
    """
    # the 4-chunk pigeonhole only GUARANTEES candidates for Hamming <= 3: a
    # pair differing by >= 4 bits can miss every chunk.  A larger configured
    # radius would pass the verify filter but silently lose such pairs at
    # the blocking stage — refuse rather than under-recall.
    if cfg.simhash_hamming_max > 3 or cfg.simhash_bits != 64:
        raise ValueError(
            "simhash_edges blocks on 4 x 16-bit chunks of a 64-bit simhash: "
            f"requires simhash_bits=64 (got {cfg.simhash_bits}) and "
            f"simhash_hamming_max <= 3 (got {cfg.simhash_hamming_max}); use "
            "more/narrower chunks for a larger radius"
        )
    chunks = docs_fp.select(
        F.struct("url", "simhash").alias("item"),
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
    ).select("item", "c.chunk_idx", "c.chunk_val")

    pairs = _skewcapped_pairs(
        chunks, ["chunk_idx", "chunk_val"], chunk_cap, ctx=ctx,
        skew_name="simhash_chunks", persisted=persisted,
    ).select(
        F.col("l.url").alias("url_l"),
        F.col("r.url").alias("url_r"),
        F.col("l.simhash").alias("sh_l"),
        F.col("r.simhash").alias("sh_r"),
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r"))),  # JVM popcount
        )
        .where(F.col("hamming") <= F.lit(cfg.simhash_hamming_max))
        .select("url_l", "url_r", "hamming")
    )
