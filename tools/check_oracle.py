"""Local replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count + columns +
order-insensitive values (sorted by column name, rows sorted)."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from bigtrees_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical string form per cell (duckdb HUGEINT sums arrive as object
    dtype; spark as int64 — compare values, not dtypes)."""
    import decimal
    import numbers

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, (int,)) or isinstance(v, decimal.Decimal):
            f = float(v)
            return str(int(f)) if f == int(f) else repr(round(f, 5))
        if isinstance(v, numbers.Real):
            f = round(float(v), 5)
            return str(int(f)) if f == int(f) else repr(f)
        return str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(cell)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(cores=8, app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in os_:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name != "lsh_ann_pairs":
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "OK  " if ok_vals else "FAIL"
        if not ok_vals:
            failures += 1
        print(
            f"{status} {name}: spark={len(a)} duckdb={len(b)} cols_ok={ok_cols} "
            f"({time.time()-t0:.1f}s)"
        )
        if not ok_vals and ok_cols and ok_rows:
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
        elif not ok_cols:
            print(f"  spark cols: {list(a.columns)}\n  duck cols:  {list(b.columns)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    sys.exit(1 if main(only=only) else 0)
