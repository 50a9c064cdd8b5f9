"""Hash-set tables: the .bigset analog and its set algebra.

Reference (/root/reference/lib/System/Directory/BigTrees/HashSet.hs):
  SetData {sdNodes, sdBytes, sdNote}; rows `hash\tnnodes\tnbytes\tnote`
  (HashSet.hs:113-129, writer :230-236)
  set-add: union N trees' hashes into an existing set, last-note-wins upsert
  (/root/reference/app/Cmd/SetAdd.hs:34-69, note override HashSet.hs:326-327)
  membership/exclusion used by `find` (HashTree/Find.hs:43-48,108)

Spark-first: a hash set is a small DataFrame (sha256, n_docs, n_bytes, note);
union = unionByName + groupBy upsert; exclusion = broadcast left anti-join;
membership = broadcast left semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SET_SCHEMA_COLS = ["sha256", "n_docs", "n_bytes", "note"]


def hash_set_from_docs(docs_fp: DataFrame, note: str = "") -> DataFrame:
    """Build a hash-set table from a fingerprint table: one row per distinct
    digest with occurrence count and total bytes (HashSet.hs:155-177
    semantics: nodes/bytes accumulated per hash)."""
    return (
        docs_fp.groupBy("sha256")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nbytes").alias("n_bytes"),
        )
        .withColumn("note", F.lit(note))
        .select(*SET_SCHEMA_COLS)
    )


def set_add(existing: DataFrame | None, additions: list[DataFrame]) -> DataFrame:
    """Union sets; on digest collision counts/bytes take the max-information
    row and the LAST note wins (SetAdd.hs:34-69 + HashSet.hs:326-327: later
    sources override the note).  `additions` are applied in order."""
    parts = ([existing] if existing is not None else []) + additions
    tagged = [
        p.select(*SET_SCHEMA_COLS).withColumn("_ord", F.lit(i)) for i, p in enumerate(parts)
    ]
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    return (
        allrows.groupBy("sha256")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("n_bytes").alias("n_bytes"),
            F.max_by("note", "_ord").alias("note"),
        )
        .select(*SET_SCHEMA_COLS)
    )


def exclude(docs_fp: DataFrame, hash_set: DataFrame) -> DataFrame:
    """Set difference by digest: left anti-join against the set (the
    reference's --exclude-set, Find.hs:43-48,108).  No forced broadcast: a
    user set can be a whole snapshot's digests (unbounded), so the strategy
    is left to AQE — small sets still become runtime BroadcastHashJoins."""
    return docs_fp.join(hash_set.select("sha256"), "sha256", "left_anti")


def member(docs_fp: DataFrame, hash_set: DataFrame) -> DataFrame:
    """Set intersection by digest — left semi-join (setContainsHash,
    HashSet.hs:341-342, vectorized over the whole table).  Join strategy
    left to AQE for the same unbounded-set reason as exclude()."""
    return docs_fp.join(hash_set.select("sha256"), "sha256", "left_semi")


def set_contains(hash_set: DataFrame, digest: str) -> bool:
    """Point membership lookup (HashSet.hs:341-342)."""
    return hash_set.where(F.col("sha256") == digest).limit(1).count() > 0


def write_set(hash_set: DataFrame, path: str) -> None:
    """Canonical on-disk form: sorted by digest (HashSet.hs:200-206)."""
    hash_set.orderBy("sha256").write.mode("overwrite").parquet(path)


def read_set(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
