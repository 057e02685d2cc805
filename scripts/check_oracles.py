"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 through Spark AND its
oracle_sql() through DuckDB, then compares row count, column names, and
order-insensitive values (sorted by all columns). Exit 0 iff all match.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pcompress_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error {e}")
            continue
        ns, no = normalize(sdf), normalize(odf)
        if list(ns.columns) != list(no.columns):
            failures.append((name, f"schema {list(ns.columns)} vs {list(no.columns)}"))
            print(f"[FAIL] {name}: schema {list(ns.columns)} vs {list(no.columns)}")
            continue
        if len(ns) != len(no):
            failures.append((name, f"rows {len(ns)} vs {len(no)}"))
            print(f"[FAIL] {name}: rows {len(ns)} vs {len(no)}")
            continue
        if not ns.equals(no):
            neq = (ns != no).any(axis=1)
            diff = pd.concat(
                [ns[neq].head(3).add_suffix("_spark"), no[neq].head(3).add_suffix("_duck")],
                axis=1,
            )
            failures.append((name, f"{int(neq.sum())} differing rows"))
            print(f"[FAIL] {name}: {int(neq.sum())} differing rows\n{diff}")
            continue
        print(f"[ OK ] {name}: {len(ns)} rows")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
