"""Corpus-level structural dedup: repeated-line removal and exact
substring (token-window) duplication coverage.

The reference's dedup surface is page-level (content hash / near-dup);
a training-data pipeline additionally needs the two *sub-document*
exact-dedup passes popularized by the RefinedWeb / MassiveText /
"Deduplicating Training Data Makes Language Models Better" line of
work:

* :func:`corpus_line_dedup` — drop every line whose exact text repeats
  across the corpus at least ``min_count`` times (navigation chrome,
  cookie banners, copyright footers).  Rebuilds each document from its
  surviving lines in order.
* :func:`window_dedup_stats` — the scalable stand-in for suffix-array
  exact-substring dedup: hash every ``w``-token rolling window, find
  windows occurring ≥ ``min_count`` times corpus-wide, and report each
  document's duplicated-window count plus the exact number of token
  positions covered by the union of its duplicated windows (interval
  union, computed with one ordered window pass — no per-doc Python).

Scale shape (both): the corpus-wide duplicate dictionary is built with
a map-side-combined aggregate and joined back BROADCAST, so the corpus
body is shuffled exactly once (the per-document reassembly /
aggregation).  At 100 TB the duplicate dictionary is the set of lines
(or windows) repeated ≥ min_count — orders of magnitude smaller than
the corpus; if it still exceeds driver memory, pass
``broadcast_dict=False`` to fall back to a shuffle join keyed by the
line/window hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def corpus_line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    min_chars: int = 5,
    sep: str = "\n",
    broadcast_dict: bool = True,
) -> DataFrame:
    """Remove lines duplicated ≥ ``min_count`` times across the corpus.

    Lines shorter than ``min_chars`` characters are never dropped (blank
    separators and one-word bullets repeat legitimately).  Returns one
    row per document: ``(id, n_lines, n_dropped, clean_text)`` where
    ``clean_text`` is the surviving lines re-joined with ``sep`` in
    their original order ('' when every line was boilerplate).

    Plan: split+posexplode; the duplicate dictionary is
    ``groupBy(md5(line))`` (partial agg) filtered to ``>= min_count``,
    broadcast back onto the line stream; reassembly is the single
    corpus shuffle (``groupBy(id)`` with an ordered struct collect).
    """
    # the line stream feeds two consumers (dictionary + rebuild) —
    # materialize once instead of re-splitting the corpus (the tf_idf
    # idiom; at cluster scale this is persist-or-reuse-shuffle)
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
    ).localCheckpoint(eager=False)
    lh = F.md5(F.col("line")).alias("lh")
    dup = (
        lines.where(F.length("line") >= min_chars)
        .groupBy(lh)
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("lh", F.lit(1).alias("_dup"))
    )
    if broadcast_dict:
        dup = F.broadcast(dup)
    marked = lines.select("id", "pos", "line", lh).join(dup, "lh", "left")
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pos").alias("pos"),
                F.when(F.col("_dup").isNull(), F.col("line")).alias("line"),
            )
        )
    )
    kept_join = F.array_join(
        F.transform(ordered, lambda x: x["line"]), sep, null_replacement=None
    )
    # array_join skips nulls entirely (dropped lines vanish, no double sep)
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("n_dropped"),
            kept_join.alias("clean_text"),
        )
        .withColumnRenamed("id", id_col)
    )


def window_dedup_cut(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    min_count: int = 2,
    broadcast_dict: bool = True,
    token_hash_fn=None,
    compose_fn=None,
) -> DataFrame:
    """Exact substring dedup with CUTTING (Lee et al. 2022 semantics):
    every occurrence of a duplicated ``w``-token window is removed
    except the corpus-first keeper — the instance with the smallest
    (id, pos) for that window hash.  Tokens covered by at least one
    non-keeper duplicated window are dropped; each document is rebuilt
    from its surviving (lowercased) tokens in order.

    Returns ``(id_col, n_tokens, n_cut, clean_text)``.

    Plan: the duplicate dictionary now carries the keeper coordinate
    (``min(struct(id, pos))`` inside the same partial aggregate that
    counts occurrences) and is broadcast back; per-document cut
    intervals are collected once (bounded by the window count) and the
    rebuild is a pure in-row array filter — the corpus body again
    shuffles exactly once.  The coverage test deliberately runs on the
    UNMERGED interval list (`exists` over ≤ windows-per-doc entries):
    merging first would save comparisons but costs an extra ordered
    fold, and the per-row bound is already linear in document length.
    """
    from webindex_spark.operators.textstats import exploded_ngram_hashes

    grams = exploded_ngram_hashes(
        docs, id_col, text_col, n=w,
        token_hash_fn=token_hash_fn, compose_fn=compose_fn,
    ).localCheckpoint(eager=False)  # dictionary + cut join (measured ~30%)
    dup = (
        grams.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct(F.col("id").alias("kid"), F.col("pos").alias("kpos"))).alias("kp"),
        )
        .where(F.col("c") >= min_count)
        .select("gh", "kp")
    )
    if broadcast_dict:
        dup = F.broadcast(dup)
    cut = (
        grams.join(dup, "gh")
        .where(
            ~((F.col("id") == F.col("kp.kid")) & (F.col("pos") == F.col("kp.kpos")))
        )
        .groupBy("id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("pos").alias("s"), (F.col("pos") + w).alias("e")
                )
            ).alias("iv")
        )
    )
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    iv = F.coalesce(
        F.col("iv"), F.array().cast("array<struct<s:int,e:int>>")
    )
    indexed = F.transform(
        F.col("toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            iv, lambda v: (v["s"] <= x["i"]) & (x["i"] < v["e"])
        ),
    )
    return base.join(cut, "id", "left").select(
        F.col("id").alias(id_col),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_cut"),
        F.array_join(F.transform(kept, lambda x: x["t"]), " ").alias("clean_text"),
    )


def window_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    min_count: int = 2,
    broadcast_dict: bool = True,
    token_hash_fn=None,
    compose_fn=None,
) -> DataFrame:
    """Exact ``w``-token window duplication census per document.

    A window is *duplicated* when its composed hash occurs ≥
    ``min_count`` times corpus-wide (including within one document —
    self-plagiarism dedupes too).  Output per document::

        (id_col, n_tokens, n_windows, n_dup_windows, dup_token_cov,
         dup_frac)

    ``dup_token_cov`` is the exact size of the union of the duplicated
    windows' ``[pos, pos+w)`` token intervals (the classic
    sort + running-max-end island pass, expressed as one ordered
    window over the already-id-partitioned gram stream — it adds NO
    shuffle).  Documents shorter than ``w`` tokens contribute their
    single clamped whole-document gram, whose coverage is clamped to
    ``n_tokens``.

    Hashing rides :func:`textstats.exploded_ngram_hashes` — each token
    hashed once, gram hashes composed in O(1) ints per window; pass
    ``token_hash_fn``/``compose_fn`` to swap xxhash64 for the
    engine-portable polynomial pair.
    """
    from webindex_spark.operators.textstats import exploded_ngram_hashes

    grams = exploded_ngram_hashes(
        docs, id_col, text_col, n=w,
        token_hash_fn=token_hash_fn, compose_fn=compose_fn,
    ).localCheckpoint(eager=False)  # dictionary + mark join, one hash pass
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("gh", F.lit(1).alias("_dup"))
    )
    if broadcast_dict:
        dup = F.broadcast(dup)
    marked = grams.join(dup, "gh", "left")

    prev_dup_end = F.max(
        F.when(F.col("_dup").isNotNull(), F.col("pos") + w)
    ).over(
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.when(
        F.col("_dup").isNotNull(),
        F.greatest(
            F.lit(0),
            (F.col("pos") + w)
            - F.greatest(F.col("pos"), F.coalesce(prev_dup_end, F.col("pos"))),
        ),
    ).otherwise(F.lit(0))
    per_doc = (
        marked.select(
            "id",
            F.coalesce(F.col("_dup"), F.lit(0)).alias("d"),
            contrib.alias("contrib"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("d").cast("long").alias("n_dup_windows"),
            F.sum("contrib").cast("long").alias("raw_cov"),
        )
    )
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    base = docs.select(
        F.col(id_col).alias("id"), F.size(toks).cast("long").alias("n_tokens")
    )
    cov = F.least(F.coalesce(F.col("raw_cov"), F.lit(0)), F.col("n_tokens"))
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
        cov.alias("dup_token_cov"),
        F.round(cov / F.greatest(F.col("n_tokens"), F.lit(1)), 6).alias("dup_frac"),
    )
