"""Bucketed table layout — the co-located-join lever at 100 TB.

A fact⋈fact join (orders⋈lineitem, state⋈delta, corpus⋈corpus) pays a
full shuffle of BOTH sides every run unless the data already lives
hash-clustered on the join key.  Spark's bucketed tables persist that
clustering: `bucketBy(n, key)` writes each partition's rows into
`n` hash buckets, and a join between two tables bucketed by the same
key with the same `n` reads co-located buckets — the physical plan's
SortMergeJoin has NO Exchange on either side (verified in
tests/test_bucketed_join.py).  This is the at-rest complement to the
engine's in-flight discipline (the (host,salt)-bucketed seen table,
the cell-partitioned IVF corpus): pay the shuffle once at write time,
never again per query.

Local caveat: bucketing rides the session catalog (`saveAsTable`), so
callers pass a table name, not a path; the default warehouse dir is
spark.sql.warehouse.dir.  At cluster scale the same call targets the
shared metastore/Iceberg catalog (Iceberg calls this a `bucket(n,
key)` partition transform — the dry-run seam in sources/iceberg_sql.py
maps it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-clustered on ``key`` into ``n_buckets``
    buckets (optionally sorted within buckets, which lets the bucketed
    SortMergeJoin skip its sort too)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
