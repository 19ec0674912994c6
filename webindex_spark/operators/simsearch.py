"""Approximate-nearest-neighbor search over embedding columns.

Three paths, as the training-pipeline brief requires:

  * **brute force** (the correctness baseline): query × corpus cosine via
    higher-order functions (``zip_with`` + ``aggregate``) — dot products
    run JVM-side inside codegen, queries are broadcast, the corpus never
    shuffles.  Exact; O(|corpus| · |queries|).
  * **LSH-bucketed** (the scale path): random-hyperplane signatures — H
    seeded hyperplanes, sign-bit signature per vector, computed with the
    same JVM-side dot product (the planes are literal arrays, no UDF, no
    Python).  Vectors sharing a signature bucket (under any of ``tables``
    independent plane sets) are candidates; exact cosine re-ranks inside
    buckets only.  Recall tunes with H (bucket granularity) and tables;
    the candidate join is hash-partitioned by bucket so it scales the way
    a 100 TB ANN sweep must — no global pairwise stage.
  * **IVF** (inverted-file, the other classic scale path): a coarse
    quantizer assigns every corpus vector to its nearest centroid cell
    ONCE (one Arrow matmul pass — the same legitimate-pandas-UDF case as
    add_signatures); queries probe their ``n_probe`` nearest cells and
    exact cosine re-ranks only inside probed cells.  At 100 TB the corpus
    is partitioned by cell at rest, so a query touches n_probe/n_cells of
    the data; probing ALL cells recovers exact brute force (the
    equivalence pytest locks this).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_emb",
) -> DataFrame:
    """Top-k cosine neighbors per query (queries broadcast)."""
    from pyspark.sql import Window

    j = corpus.crossJoin(F.broadcast(queries)).where(
        F.col(id_col) != F.col(q_id_col)
    )
    scored = j.select(
        F.col(q_id_col), F.col(id_col),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def _planes(dim: int, n_planes: int, table: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.Generator(np.random.PCG64(seed + 7919 * table))
    return rng.standard_normal((n_planes, dim)).tolist()


def add_signature(
    df: DataFrame, dim: int, n_planes: int = 12, table: int = 0,
    vec_col: str = "embedding", out_col: str = "bucket",
) -> DataFrame:
    """Single-table random-hyperplane signature as a packed long
    (one-table convenience wrapper over :func:`add_signatures`)."""
    sigs = add_signatures(df, dim, n_planes, (table,), vec_col, "__sigs")
    return sigs.withColumn(out_col, F.col("__sigs")[0]).drop("__sigs")


def add_signatures(
    df: DataFrame, dim: int, n_planes: int = 12, tables=(0, 1, 2),
    vec_col: str = "embedding", out_col: str = "buckets",
) -> DataFrame:
    """Random-hyperplane signatures for ALL hash tables in ONE pass:
    ``out_col`` is an array<long>, one packed signature per table.

    One Arrow-batched matmul per batch (vectors × stacked-planesᵀ, sign →
    bits) computes every table's signature together — the corpus is
    scanned once instead of once per table (the round-1 form re-scanned it
    ``tables``× ).  A pure-expression form (tables × n_planes × dim literal
    constants) was tried first and rejected: thousands of constants per
    projection blow up codegen compile time, while the numpy matmul is a
    single BLAS call — this is the legitimate pandas-UDF case (dense
    numeric kernel)."""
    tables = tuple(tables)
    stacked_t = np.concatenate(
        [np.asarray(_planes(dim, n_planes, t), dtype=np.float64) for t in tables]
    ).T  # (dim, len(tables)*n_planes)
    n_tab = len(tables)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        bits = (m @ stacked_t) >= 0  # (rows, n_tab*n_planes)
        out = np.zeros((len(m), n_tab), dtype=np.int64)
        for t in range(n_tab):
            for i in range(n_planes):
                out[:, t] |= bits[:, t * n_planes + i].astype(np.int64) << i
        return pd.Series(list(out))

    return df.withColumn(out_col, sig(F.col(vec_col)))


def near_dup_pairs(
    corpus: DataFrame, dim: int, threshold: float = 0.9,
    n_planes: int = 6, tables: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (id_a < id_b,
    cosine >= threshold) — the dedup-stack entry for embedding columns.

    Same scale posture as lsh_topk: signatures for all hash tables in one
    corpus pass, a SELF-join per (table, bucket) generates candidates
    (never a global all-pairs stage), distinct-ed pairs pay one exact
    cosine.  Recall tunes with n_planes (bucket granularity) and tables;
    candidates outside every shared bucket are never compared — exactly
    the trade a 100 TB near-dup sweep makes.
    """
    sigs = add_signatures(corpus, dim, n_planes, tuple(range(tables)),
                          vec_col, "__sigs").select(
        id_col, vec_col, F.posexplode("__sigs").alias("tbl", "bucket")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("__va"),
            F.col(f"b.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = cosine_col(F.col("__va"), F.col("__vb"))
    return (
        cands.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = 42) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids.

    Seeded-random (not trained) so the DuckDB oracle can replay them as
    SQL literals — the production path would train them with k-means||
    over a corpus sample and broadcast the result; every shape downstream
    (assign, probe, re-rank) is identical either way."""
    rng = np.random.Generator(np.random.PCG64(seed + 104729))
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame, dim: int, n_cells: int = 16, n_probe: int = 1,
    vec_col: str = "embedding", out_col: str = "cells", seed: int = 42,
) -> DataFrame:
    """``out_col`` = the ``n_probe`` nearest cells (array<int>, by dot
    with the unit centroids, descending; ties to the lower cell id —
    centroids are unit-norm so argmax dot == argmax cosine).  One BLAS
    matmul per Arrow batch; corpus assignment uses n_probe=1."""
    cent_t = ivf_centroids(dim, n_cells, seed).T  # (dim, n_cells)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        d = m @ cent_t                                # (rows, n_cells)
        # stable sort: dot DESC then cell ASC (lexsort's last key is primary)
        order = np.lexsort(
            (np.broadcast_to(np.arange(n_cells), d.shape), -d), axis=1
        )[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return df.withColumn(out_col, cells(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_cells: int = 16, n_probe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_emb",
) -> DataFrame:
    """IVF ANN top-k: probe the query's ``n_probe`` nearest cells, exact
    cosine re-rank inside them (HOF dot — JVM-side, bit-stable).

    Scale posture: the corpus is assigned once and joins on its single
    cell key (at rest this is the table's partition column); queries
    broadcast with their probed-cell list exploded, so a query scans
    ~n_probe/n_cells of the corpus and no stage is all-pairs."""
    from pyspark.sql import Window

    c = ivf_assign(corpus, dim, n_cells, 1, vec_col, "__cells", seed).select(
        id_col, vec_col, F.col("__cells")[0].alias("cell")
    )
    q = ivf_assign(
        queries, dim, n_cells, n_probe, q_vec_col, "__cells", seed
    ).select(q_id_col, q_vec_col, F.explode("__cells").alias("cell"))
    cands = (
        c.join(F.broadcast(q), "cell")
        .where(F.col(id_col) != F.col(q_id_col))
        .select(q_id_col, id_col, vec_col, q_vec_col)
    )
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_planes: int = 12, tables: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_emb",
) -> DataFrame:
    """ANN top-k: per-table bucket joins, exact re-rank inside buckets.

    All ``tables`` signatures are computed in a single corpus pass
    (add_signatures) and posexploded to (table, bucket) join keys; the
    query side broadcasts.  Candidates are distinct-ed per (query, vector);
    only candidates pay the exact cosine.
    """
    from pyspark.sql import Window

    tabs = tuple(range(tables))
    c = add_signatures(corpus, dim, n_planes, tabs, vec_col, "__sigs").select(
        id_col, vec_col, F.posexplode("__sigs").alias("tbl", "bucket")
    )
    q = add_signatures(queries, dim, n_planes, tabs, q_vec_col, "__sigs").select(
        q_id_col, q_vec_col, F.posexplode("__sigs").alias("tbl", "bucket")
    )
    cands = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col(id_col) != F.col(q_id_col))
        .select(q_id_col, id_col, vec_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
