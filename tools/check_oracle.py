"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted-column
schema, and values (exact for non-floats, tiny-tolerance report for
floats so we can see whether raw value-hashes would match).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: sort by all columns (stringify for mixed types)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        return [f"row count {len(a)} vs {len(b)}"]
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns {sorted(a.columns)} vs {sorted(b.columns)}"]
    a, b = normalize(a), normalize(b)
    for col in a.columns:
        x, y = a[col], b[col]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = x.astype(float).to_numpy()
            yv = y.astype(float).to_numpy()
            exact = np.array_equal(xv, yv, equal_nan=True)
            close = np.allclose(xv, yv, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                worst = float(np.nanmax(np.abs(xv - yv))) if len(xv) else 0.0
                problems.append(
                    f"col {col}: float not BIT-exact (close={close}, max|d|={worst:.3e})"
                )
        else:
            if not x.astype(str).equals(y.astype(str)):
                bad = (x.astype(str) != y.astype(str)).to_numpy().nonzero()[0][:3]
                problems.append(f"col {col}: mismatch at rows {bad.tolist()}, e.g. {x.iloc[bad[0]]!r} vs {y.iloc[bad[0]]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from webindex_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle, rows-only check) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(sdf)} [{t_spark:.1f}s spark / {t_duck:.1f}s duck]")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"PASS {name}: rows={len(sdf)} [{t_spark:.1f}s spark / {t_duck:.1f}s duck]")
    print(f"\n{failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
