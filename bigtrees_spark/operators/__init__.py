"""Dedup / query operators re-expressing the reference's semantics Spark-first."""
