"""Exact deduplication: the Spark restatement of `bigtrees dupes`.

Reference lifecycle (/root/reference/lib/System/Directory/BigTrees/DupeMap.hs):
  pathsByHash   (DupeMap.hs:72-114)  insert every node keyed by hash, merging
                                     (count-sum, path-set-union)
  dupesByNNodes (DupeMap.hs:119-126) drop singletons, score, sort desc
  scoreSets     (DupeMap.hs:133-139) score = n-1 for files (bytes weighting ours)
  simplifyDupes (DupeMap.hs:147-154) containment pruning of redundant groups

Spark-first: ONE hash aggregation (partial + final, map-side combine is
automatic) — the cuckoo-hashtable merge becomes HashAggregateExec.  The sort
is a TakeOrderedAndProject when a report limit is given, i.e. no global sort
materialization at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dupe_groups(docs_fp: DataFrame, key: str = "sha256") -> DataFrame:
    """groupBy(content digest) -> duplicate groups with savings score.

    Columns: sha256, n_members, n_bytes (per copy), savings (bytes reclaimed by
    keeping one copy = (n-1) * nbytes), members (sorted urls, reference sorts
    group members lexicographically, DupeMap.hs:126).
    Singletons dropped per scoreSets (DupeMap.hs:133-135).
    """
    return (
        docs_fp.groupBy(key)
        .agg(
            F.count("*").alias("n_members"),
            F.first("nbytes").alias("n_bytes"),
            F.sort_array(F.collect_list("url")).alias("members"),
        )
        .where(F.col("n_members") > 1)
        .withColumn("savings", (F.col("n_members") - F.lit(1)) * F.col("n_bytes"))
    )


def dupes_report(docs_fp: DataFrame, limit: int | None = None) -> DataFrame:
    """Ordered dupes report (dupesByNNodes semantics: desc by savings, ties
    broken by digest for determinism).  With a limit, Spark plans
    TakeOrderedAndProject — no full sort at scale."""
    rep = exact_dupe_groups(docs_fp).orderBy(F.desc("savings"), F.asc("sha256"))
    return rep.limit(limit) if limit else rep


def canonical_docs(docs_fp: DataFrame, key: str = "sha256") -> DataFrame:
    """One representative per exact-dup group: earliest (warc_ts, url).

    This is the reference's 'keep one copy' decision generalized, and the
    input reduction for the near-dup stage (SURVEY.md §7: dedup exact-equal
    docs BEFORE pairing so boilerplate-heavy exact groups never explode the
    LSH pair join).

    The winner rank is min(struct(warc_ts, url)) — struct min orders
    lexicographically by field, i.e. exactly earliest-(warc_ts, url) — as a
    plain AGGREGATE on a skinny projection: partial-aggregates map-side and
    never funnels a mega exact-dup group (boilerplate copied 10^9 times)
    through one window-sort task the way row_number().over(partitionBy(key))
    would.  The wide rows come back via semi-join on (key, *order).
    """
    order = [c for c in ("warc_ts", "url") if c in docs_fp.columns]
    if not order:
        # no identity columns to rank on: any single row per digest satisfies
        # the contract (rows tie on every ranking column we know about)
        return docs_fp.dropDuplicates([key])
    winners = (
        docs_fp.groupBy(key)
        .agg(F.min(F.struct(*[F.col(c) for c in order])).alias("_w"))
        .select(key, *[F.col(f"_w.{c}").alias(c) for c in order])
    )
    # fully duplicated identity rows (same key AND order values — common in
    # re-crawled WARC dumps) would ALL survive the semi-join; dedupe AFTER it
    # so the one-row-per-digest contract holds.  Deduping post-collapse keeps
    # the wide shuffle bounded by the canonical set (~unique digests), not the
    # raw corpus — deduping docs_fp up front would shuffle every wide row.
    return docs_fp.join(winners, [key, *order], "left_semi").dropDuplicates(
        [key, *order]
    )


def prefix_dupe_groups(docs_fp: DataFrame, prefix_expr=None) -> DataFrame:
    """Duplicate groups at url-PREFIX granularity — the directory-level dupe
    analog.  A prefix's digest is the Merkle hash of its sorted member digests
    (hashContents rule, HashTree/Base.hs:69-70), so two sections with
    identical content sets collide exactly like two identical directories.

    Returns: prefix_digest, n_prefixes, prefixes (sorted), n_docs_each.
    """
    if prefix_expr is None:
        # https://site/section/doc -> https://site/section
        prefix_expr = F.regexp_extract("url", r"^(.*)/[^/]*$", 1)
    per_prefix = (
        docs_fp.withColumn("prefix", prefix_expr)
        .groupBy("prefix")
        .agg(
            F.sha2(F.concat_ws("\n", F.sort_array(F.collect_list("sha256"))), 256).alias(
                "prefix_digest"
            ),
            F.count("*").alias("n_docs"),
            F.sum("nbytes").alias("n_bytes"),
        )
    )
    return (
        per_prefix.groupBy("prefix_digest")
        .agg(
            F.count("*").alias("n_prefixes"),
            F.sort_array(F.collect_list("prefix")).alias("prefixes"),
            F.first("n_docs").alias("n_docs_each"),
            F.first("n_bytes").alias("n_bytes_each"),
        )
        .where(F.col("n_prefixes") > 1)
        .withColumn("savings", (F.col("n_prefixes") - 1) * F.col("n_bytes_each"))
    )


def simplify_dupes(doc_groups: DataFrame, prefix_groups: DataFrame) -> DataFrame:
    """simplifyDupes containment pruning (DupeMap.hs:147-154): drop doc-level
    dupe groups whose EVERY member lies under some prefix of an already
    reported prefix-level group — the doc group is redundant detail of the
    bigger finding.  Anti-join on the member->prefix relation.

    No broadcast hint on covered_prefixes: it is DERIVED and unbounded (a
    mirror-heavy corpus yields millions of covered prefixes), and a forced
    broadcast bypasses AQE's size check — driver OOM at scale.  AQE picks
    broadcast itself whenever the set is actually small."""
    covered_prefixes = prefix_groups.select(
        F.explode("prefixes").alias("prefix")
    ).distinct()
    exploded = doc_groups.select(
        "sha256", F.explode("members").alias("url")
    ).withColumn("prefix", F.regexp_extract("url", r"^(.*)/[^/]*$", 1))
    # groups with at least one member OUTSIDE covered prefixes survive
    uncovered = (
        exploded.join(covered_prefixes, "prefix", "left_anti")
        .select("sha256")
        .distinct()
    )
    return doc_groups.join(uncovered, "sha256", "left_semi")


def exact_cluster_assignments(docs_fp: DataFrame, key: str = "sha256") -> DataFrame:
    """clusters(url, cluster_id) for exact duplicates only: cluster_id =
    min(url) within the digest group (deterministic canonical label);
    singletons are their own cluster.

    groupBy+join, not min().over(partitionBy(key)): the agg partial-
    aggregates map-side and AQE broadcasts the small per-digest min table,
    so a mega exact-dup group never pools in one window task."""
    mins = docs_fp.groupBy(key).agg(F.min("url").alias("cluster_id"))
    return docs_fp.select("url", key).join(mins, key).select("url", "cluster_id")
