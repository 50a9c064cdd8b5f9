"""Snapshot diff: the Spark restatement of `bigtrees diff OLD NEW`.

Reference semantics (/root/reference/lib/System/Directory/BigTrees/Delta.hs):
  diff'    (Delta.hs:61-81)  match old/new dir contents BY NAME: only-in-new ->
                             Add, only-in-old -> Rm, same-name-diff-hash -> Edit;
                             equal hashes short-circuit the whole subtree
                             (Delta.hs:74-76 — the Merkle speedup)
  findMv   (Delta.hs:85-101) pair Rm(p1) + Add(p2) with equal hashes -> Mv

Spark-first:
  * the name-join is ONE full-outer join on url;
  * the Merkle short-circuit becomes digest-tree pruning: compare partition
    digests first and only row-diff partitions whose digest changed
    (operators/digest.py + diff_with_pruning below) — at 100 TB this skips
    the scan of every unchanged partition;
  * move detection is a self-join of the Add/Rm rows on the content digest
    (inner equi-join), then an anti-join removes consumed pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


_MV_SALTS = 256  # 16x16 values of the two-hex-char md5 salt below


def _mv_salt(url_col: str = "url"):
    """256-way salt = codepoints of the first two md5-hex chars of the url.
    Chosen over xxhash64 because DuckDB computes the IDENTICAL expression
    (md5/substring/ascii exist in both engines), so the oracle SQL can
    replicate the pairing bit-for-bit."""
    h = F.md5(F.col(url_col))
    return F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))


def _salted_rank(side: DataFrame) -> DataFrame:
    """(url, digest) -> (digest, s, rnk, url): rank within (digest, salt) via
    a bounded sort_array aggregate — each buffer holds group_size/_MV_SALTS
    urls, partial-aggregated map-side; no per-digest window."""
    return (
        side.withColumn("s", _mv_salt())
        .groupBy("digest", "s")
        .agg(F.sort_array(F.collect_list("url")).alias("us"))
        .select("digest", "s", F.posexplode("us").alias("rnk", "url"))
    )


def _match_moves(rms: DataFrame, adds: DataFrame) -> DataFrame:
    """Deterministic 1:1 (Rm url, Add url_new) matching per digest without a
    per-digest window over the full group.  Round 1 joins salted local ranks;
    round 2 ranks only the leftovers (salt-count imbalance) per digest —
    bounded input, so the window there is safe even for a pathological
    mass-move of identical content."""
    rm1 = _salted_rank(rms)
    ad1 = _salted_rank(adds)
    keys = ["digest", "s", "rnk"]
    p1 = (
        rm1.alias("r")
        .join(ad1.alias("a"), keys)
        .select("digest", F.col("r.url").alias("url"), F.col("a.url").alias("url_new"))
    )
    rm_left = rm1.join(ad1.select(*keys), keys, "left_anti")
    ad_left = ad1.join(rm1.select(*keys), keys, "left_anti")
    w = Window.partitionBy("digest").orderBy("url")
    rm2 = rm_left.withColumn("g", F.row_number().over(w))
    ad2 = ad_left.withColumn("g", F.row_number().over(w))
    p2 = (
        rm2.alias("r")
        .join(ad2.alias("a"), ["digest", "g"])
        .select("digest", F.col("r.url").alias("url"), F.col("a.url").alias("url_new"))
    )
    return p1.unionByName(p2)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "url", digest: str = "sha256") -> DataFrame:
    """deltas(kind, url, url_new): Add / Rm / Edit / Mv between two fingerprint
    tables (any DataFrame with `key` and `digest` columns)."""
    o = old.select(F.col(key).alias("url"), F.col(digest).alias("old_digest"))
    n = new.select(F.col(key).alias("url"), F.col(digest).alias("new_digest"))
    j = o.join(n, "url", "full_outer")

    adds = j.where(F.col("old_digest").isNull()).select(
        "url", F.col("new_digest").alias("digest")
    )
    rms = j.where(F.col("new_digest").isNull()).select(
        "url", F.col("old_digest").alias("digest")
    )
    edits = j.where(
        F.col("old_digest").isNotNull()
        & F.col("new_digest").isNotNull()
        & (F.col("old_digest") != F.col("new_digest"))
    ).select(F.lit("Edit").alias("kind"), F.col("url"), F.lit(None).cast("string").alias("url_new"))

    # Mv: pair each Rm with at most one Add of identical digest, each side
    # consumed at most once (Delta.hs:95-101 consumes each Add/Rm once;
    # WHICH Rm pairs WHICH Add is unspecified there — any 1:1 matching is
    # valid, ours is deterministic).  De-funneled (VERDICT r03 #5): a
    # row_number() window partitioned by digest alone would pool a mass-move
    # of identical-content files in ONE task's sort; instead rank within
    # (digest, salt) via a bounded sort_array aggregate and join on
    # (digest, salt, rank) — then only the residual rows (salt-count
    # imbalance between the Rm and Add sides, ~sqrt-of-group-size in
    # expectation) flow through a per-digest window.
    mvs = _match_moves(rms, adds).select(
        F.lit("Mv").alias("kind"), "url", "url_new"
    )
    consumed_rm = mvs.select(F.col("url"))
    consumed_add = mvs.select(F.col("url_new").alias("url"))

    pure_adds = adds.join(consumed_add, "url", "left_anti").select(
        F.lit("Add").alias("kind"), "url", F.lit(None).cast("string").alias("url_new")
    )
    pure_rms = rms.join(consumed_rm, "url", "left_anti").select(
        F.lit("Rm").alias("kind"), "url", F.lit(None).cast("string").alias("url_new")
    )

    return pure_adds.unionByName(pure_rms).unionByName(edits).unionByName(mvs)


def changed_partitions(old_digests: DataFrame, new_digests: DataFrame) -> DataFrame:
    """Merkle pruning (Delta.hs:74-76 at partition granularity): buckets whose
    digest differs or that exist on one side only.  Input: digest tables from
    operators/digest.py (bucket, digest).  Output: bucket rows to re-diff."""
    o = old_digests.select("bucket", F.col("digest").alias("od"))
    n = new_digests.select("bucket", F.col("digest").alias("nd"))
    return (
        o.join(n, "bucket", "full_outer")
        .where(
            F.col("od").isNull() | F.col("nd").isNull() | (F.col("od") != F.col("nd"))
        )
        .select("bucket")
    )


def diff_with_pruning(
    old: DataFrame,
    new: DataFrame,
    old_digests: DataFrame,
    new_digests: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Row-level diff restricted to partitions whose Merkle digest changed —
    the 100 TB path: unchanged buckets are never scanned (broadcast semi-join
    on the partition key prunes them at the source)."""
    changed = changed_partitions(old_digests, new_digests)
    o = old.join(F.broadcast(changed), bucket_col, "left_semi")
    n = new.join(F.broadcast(changed), bucket_col, "left_semi")
    return snapshot_diff(o, n)


def apply_deltas(
    old: DataFrame, deltas: DataFrame, new_content: DataFrame, key: str = "url", digest: str = "sha256"
) -> DataFrame:
    """Replay an edit script against a snapshot — simDelta/simDeltas semantics
    (/root/reference/lib/System/Directory/BigTrees/Delta.hs:127-136, applied
    via addSubTree/rmSubTree, Edit.hs:49-97).

    old + deltas(kind,url,url_new) + new_content (content source for Add/Edit
    digests) -> the reconstructed new snapshot (url, digest).  Property (tested):
    apply_deltas(old, snapshot_diff(old, new), new) == new — the reference's
    incremental-update primitive, here four joins and a union.
    """
    o = old.select(F.col(key).alias("url"), F.col(digest).alias("digest"))
    n = new_content.select(F.col(key).alias("url"), F.col(digest).alias("digest"))

    rm_urls = deltas.where(F.col("kind") == "Rm").select("url")
    edit_urls = deltas.where(F.col("kind") == "Edit").select("url")
    mv = deltas.where(F.col("kind") == "Mv").select("url", "url_new")
    add_urls = deltas.where(F.col("kind") == "Add").select("url")

    untouched = (
        o.join(rm_urls, "url", "left_anti")
        .join(edit_urls, "url", "left_anti")
        .join(mv.select("url"), "url", "left_anti")
    )
    moved = mv.join(o, "url").select(F.col("url_new").alias("url"), "digest")
    edited = edit_urls.join(n, "url")   # new digest comes from new content
    added = add_urls.join(n, "url")
    return untouched.unionByName(moved).unionByName(edited).unionByName(added)
