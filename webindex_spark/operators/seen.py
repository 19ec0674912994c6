"""Partitioned-Bloom URL-seen set (SURVEY.md §7.2 M3; north-rule core).

Two tiers, exactly as the scale design demands:

  * **Bloom tier (cheap negative)**: a DataFrame of ``(pid:int,
    bitmap:binary)`` partitions.  Membership hashing happens JVM-side
    (``xxhash64`` — Spark's own vectorized 64-bit hash) so the only Python
    work is numpy bit-tests over Arrow batches in a cogrouped
    applyInPandas; candidates that miss the filter are *definitely new*
    and skip the expensive tier.
  * **Exact tier**: candidates the Bloom flags as maybe-seen are confirmed
    with a LEFT ANTI join against the seen table.  The Bloom's false
    positives only cost extra anti-join input (at fpp=1% that's 1% of new
    URLs), never correctness — the final membership is EXACT, which is
    what the north rule's "matching URL-seen membership" requires.

Sizing (documented formula, SURVEY.md §7.3): bits = -n * ln(p) / (ln 2)^2.
For the 10^10-URL target at p = 0.01 that is ~1.2 * 10^11 bits ≈ 14.4 GiB,
sharded over ``n_partitions`` binary rows (1024 partitions → ~14 MiB per
bitmap, each comfortably a single Arrow batch).  Tests exercise the same
code at small n.

The bitmap column never travels through a shuffle wider than its own
partition row: probes and inserts cogroup candidates with their single
matching bitmap row by ``pid``.
"""

from __future__ import annotations

import math
from collections.abc import Iterator  # noqa: F401

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
    ]
)


def bloom_params(expected_n: int, fpp: float = 0.01, n_partitions: int = 64):
    """(n_partitions, bits_per_partition, k hashes). bits rounded to bytes."""
    total_bits = max(1024, int(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
    bits = ((total_bits // n_partitions) + 7) // 8 * 8
    k = max(1, round(math.log(2) * total_bits / max(1, expected_n)))
    return n_partitions, bits, min(k, 16)


def empty_bloom(spark: SparkSession, n_partitions: int, bits: int) -> DataFrame:
    zero = bytearray(bits // 8)
    rows = [(p, bytes(zero)) for p in range(n_partitions)]
    return spark.createDataFrame(rows, schema=BLOOM_SCHEMA)


def _with_hashes(df: DataFrame, uri_col: str, n_partitions: int) -> DataFrame:
    """JVM-side hashing: partition id + two independent 64-bit hashes
    (Kirsch-Mitzenmacher double hashing gives k index functions)."""
    c = F.col(uri_col)
    return (
        df.withColumn("pid", F.pmod(F.xxhash64(F.lit("pid"), c), F.lit(n_partitions)).cast("int"))
        .withColumn("h1", F.xxhash64(F.lit("h1"), c))
        .withColumn("h2", F.xxhash64(F.lit("h2"), c))
    )


def _indices(h1: np.ndarray, h2: np.ndarray, k: int, bits: int) -> np.ndarray:
    """(len, k) bit indices, uint64 wrap-around arithmetic."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    ks = np.arange(k, dtype=np.uint64)
    return (a[:, None] + ks[None, :] * b[:, None]) % np.uint64(bits)


# Below this total filter size the whole bloom is shipped to every task and
# probed in a shuffle-free mapInPandas; above it, candidates shuffle to
# their bitmap's partition (cogroup) — the only option when the filter is
# tens of GiB (the 10^10-URL sizing).  512 MiB is a comfortable executor
# broadcast budget.
BROADCAST_BLOOM_MAX_BYTES = 512 * 1024 * 1024


def bloom_probe(
    candidates: DataFrame, bloom: DataFrame, uri_col: str, k: int, bits: int,
    n_partitions: int,
) -> DataFrame:
    """candidates + boolean ``maybe_seen``. Mode auto-selected by size."""
    if n_partitions * (bits // 8) <= BROADCAST_BLOOM_MAX_BYTES:
        return _bloom_probe_broadcast(candidates, bloom, uri_col, k, bits, n_partitions)
    return _bloom_probe_cogroup(candidates, bloom, uri_col, k, bits, n_partitions)


def _bloom_probe_broadcast(
    candidates: DataFrame, bloom: DataFrame, uri_col: str, k: int, bits: int,
    n_partitions: int,
) -> DataFrame:
    """Shuffle-free probe: bitmaps broadcast once per executor, candidates
    stream through mapInPandas in place.  The hashes are still computed
    JVM-side; Python does only the numpy bit tests."""
    spark = candidates.sparkSession
    bitmaps = {
        int(r["pid"]): np.frombuffer(r["bitmap"], dtype=np.uint8)
        for r in bloom.collect()
    }
    bc = spark.sparkContext.broadcast(bitmaps)
    cand = _with_hashes(candidates, uri_col, n_partitions)
    cols = [c for c in cand.columns if c not in ("pid", "h1", "h2")]
    out_schema = T.StructType(
        [f for f in cand.schema.fields if f.name in cols]
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = bc.value
        for pdf in batches:
            idx = _indices(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), k, bits)
            byte_i = (idx >> np.uint64(3)).astype(np.int64)
            bit_i = (idx & np.uint64(7)).astype(np.uint8)
            pid = pdf["pid"].to_numpy()
            res = np.zeros(len(pdf), dtype=bool)
            for p in np.unique(pid):
                m = pid == p
                bmp = bm.get(int(p))
                if bmp is None:
                    continue
                hit = (bmp[byte_i[m]] >> bit_i[m]) & 1
                res[m] = hit.all(axis=1)
            out = pdf[cols].copy()
            out["maybe_seen"] = res
            yield out

    return cand.mapInPandas(probe, schema=out_schema)


def _bloom_probe_cogroup(
    candidates: DataFrame, bloom: DataFrame, uri_col: str, k: int, bits: int,
    n_partitions: int,
) -> DataFrame:
    cand = _with_hashes(candidates, uri_col, n_partitions)
    out_schema = T.StructType(
        cand.schema.fields[:-2] + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cols = [f.name for f in cand.schema.fields[:-2]]  # drop h1,h2; keep pid

    def probe(key, cdf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if len(bdf) == 0:
            res = np.zeros(len(cdf), dtype=bool)
        else:
            bitmap = np.frombuffer(bdf["bitmap"].iloc[0], dtype=np.uint8)
            idx = _indices(cdf["h1"].to_numpy(), cdf["h2"].to_numpy(), k, bits)
            byte_i = (idx >> np.uint64(3)).astype(np.int64)
            bit_i = (idx & np.uint64(7)).astype(np.uint8)
            hit = (bitmap[byte_i] >> bit_i) & 1
            res = hit.all(axis=1)
        out = cdf[cols].copy()
        out["maybe_seen"] = res
        return out

    return (
        cand.groupBy("pid")
        .cogroup(bloom.groupBy("pid"))
        .applyInPandas(probe, schema=out_schema)
        .drop("pid")
    )


def bloom_insert(
    uris: DataFrame, bloom: DataFrame, uri_col: str, k: int, bits: int,
    n_partitions: int,
) -> DataFrame:
    """Returns the updated bloom table (all n_partitions rows present)."""
    cand = _with_hashes(uris.select(uri_col), uri_col, n_partitions)

    def insert(key, cdf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        if len(bdf):
            bitmap = np.frombuffer(bdf["bitmap"].iloc[0], dtype=np.uint8).copy()
        else:
            bitmap = np.zeros(bits // 8, dtype=np.uint8)
        if len(cdf):
            idx = _indices(cdf["h1"].to_numpy(), cdf["h2"].to_numpy(), k, bits)
            byte_i = (idx >> np.uint64(3)).astype(np.int64).ravel()
            bit_i = (idx & np.uint64(7)).astype(np.uint8).ravel()
            np.bitwise_or.at(bitmap, byte_i, np.uint8(1) << bit_i)
        return pd.DataFrame({"pid": [pid], "bitmap": [bitmap.tobytes()]})

    return (
        cand.groupBy("pid")
        .cogroup(bloom.groupBy("pid"))
        .applyInPandas(insert, schema=BLOOM_SCHEMA)
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None,
    uri_col: str = "uri",
    *,
    k: int,
    bits: int,
    n_partitions: int,
) -> DataFrame:
    """The two-tier unseen filter.

    Definitely-new candidates (Bloom miss) pass straight through; only the
    maybe-seen slice pays the anti-join against the exact seen table.
    Without a bloom (None) everything takes the exact tier.
    """
    if bloom is None:
        return candidates.join(seen.select(uri_col), uri_col, "left_anti")
    probed = bloom_probe(candidates, bloom, uri_col, k, bits, n_partitions)
    # Both union branches consume `probed`; without materialization Spark
    # would run the Python probe twice (once per branch).  A lazy local
    # checkpoint computes it once and truncates lineage.
    probed = probed.localCheckpoint(eager=False)
    fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen.select(uri_col), uri_col, "left_anti")
    return fresh.unionByName(confirmed_new)
