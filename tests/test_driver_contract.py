"""Driver-contract invariants of __spark_entry__ (pure python — no
SparkSession).  The driver compares queries() vs oracle_sql() by name, so a
key drift or an undocumented rows-only row silently weakens the correctness
gate; these guards fail the suite instead."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def test_every_oracle_has_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs), f"orphan oracle keys: {sorted(set(os_) - set(qs))}"


def test_rows_only_queries_declare_why():
    """A queries() entry without an oracle gets only the driver's weaker
    rows-only check; the contract (module docstring) is that each such query
    justifies the non-SQL-expressibility in its own docstring."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    undocumented = [
        name
        for name in set(qs) - set(os_)
        if "rows-only" not in (qs[name].__doc__ or "").lower()
        and "rows only" not in (qs[name].__doc__ or "").lower()
    ]
    assert not undocumented, f"rows-only queries missing justification: {undocumented}"


def test_oracle_sql_targets_registered_views_only():
    """Oracles run on DuckDB views named after the driver tables; a typo'd
    table name fails at driver time — catch it here.  Heuristic: every FROM/
    JOIN target that is a bare identifier must be a driver table or a CTE
    defined in the same query."""
    import re

    tables = set(
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    )
    for name, sql in entry.oracle_sql().items():
        ctes = {m.lower() for m in re.findall(r"(\w+)\s+AS\s*\(", sql, re.IGNORECASE)}
        targets = {
            m.lower()
            for m in re.findall(r"\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql, re.IGNORECASE)
        }
        unknown = targets - tables - ctes - {"unnest", "range"}
        assert not unknown, f"{name}: oracle references unknown relations {sorted(unknown)}"
