"""Inverted-index construction: term → posting list.

The reference serves its index out of sorted KV rows (page rank rows,
domain maps — modules/data IndexClient surface); the missing classic is
the *text* inverted index a search tier builds from the same crawl.
:func:`inverted_postings` produces, per term: document frequency, total
term frequency, and a bounded posting string of the top documents by
in-document frequency.

Scale shape: two shuffles total — (term, doc) partial-aggregated term
frequencies, then one term-keyed exchange reused by BOTH the per-term
stats aggregate and the rank-limited posting collect (same key, no
extra exchange).  The posting list is capped *before* collection via a
row_number filter that Spark compiles to WindowGroupLimit — each task
keeps a running top-``post_len`` heap per term, so a stopword term with
a billion postings never materializes them (the posting array is
bounded by construction, the same discipline as the dedup stack's
``max_bucket`` guards).  The final df-ranked head is
TakeOrderedAndProject, not a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def prefix_suggestions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_prefix: int = 5,
    top_k: int = 5,
) -> DataFrame:
    """Search-suggest index: for every term prefix (length 1..
    ``max_prefix``), the ``top_k`` corpus terms by total frequency —
    ``(prefix, n_terms, suggest)`` with the suggestion list as an
    ordered comma string.

    Shape: ONE corpus shuffle (the per-term tf aggregate, map-side
    combined); the prefix explosion (≤ max_prefix rows per DISTINCT
    term) runs on the vocabulary-sized table, so a billion-document
    corpus pays vocabulary cost for the entire suggest build.  Top-k
    per prefix is the WindowGroupLimit pair again.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    tf = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # vocab-sized; 2 downstream branches
    )
    pref = tf.select(
        "term",
        "tf",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(F.length("term"), F.lit(max_prefix))),
                lambda i: F.col("term").substr(F.lit(1), i),
            )
        ).alias("prefix"),
    )
    rn = F.row_number().over(
        Window.partitionBy("prefix").orderBy(F.desc("tf"), F.asc("term"))
    )
    ranked = pref.withColumn("rn", rn)
    stats = ranked.groupBy("prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    top = (
        ranked.where(F.col("rn") <= top_k)
        .groupBy("prefix")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "term"))),
                    lambda x: x["term"],
                ),
                ",",
            ).alias("suggest")
        )
    )
    return stats.join(top, "prefix")


def fuzzy_term_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 200,
) -> DataFrame:
    """Edit-distance-1 term pairs via the symmetric-delete trick
    (SymSpell): two terms are within one edit iff they share a
    single-deletion variant (or one IS the other's variant), so the
    candidate set is a bucket join on deletion variants — never an
    all-pairs comparison.  The spell-correction / query-normalization
    primitive of a search tier.

    Returns ``(term_a, term_b, dist)`` with ``term_a < term_b`` and
    ``dist`` the exact levenshtein (1 after the verify filter; the
    built-in runs JVM-side in both engines).

    Scale shape: variants explode ≤ len+1 rows per DISTINCT term
    (vocabulary cost, like the suggest build); the variant bucket join
    carries the lsh_candidates ``max_bucket`` guard — a variant shared
    by thousands of terms (short strings) is dropped whole rather than
    expanded quadratically; pairs are emitted JVM-side from the sorted
    in-bucket array.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    terms = (
        docs.select(F.explode(toks).alias("term")).distinct()
        .localCheckpoint(eager=False)  # vocab-sized; variants + verify
    )
    # variants: the term itself (deletion at "no position") plus each
    # single-character deletion — concat of the prefix and suffix
    variants = terms.select(
        "term",
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.transform(
                    F.sequence(F.lit(1), F.length("term")),
                    lambda i: F.concat(
                        F.col("term").substr(F.lit(1), i - 1),
                        F.col("term").substr(i + 1, F.length("term")),
                    ),
                ),
            )
        ).alias("v"),
    )
    buckets = variants.groupBy("v").agg(
        F.array_sort(F.collect_set("term")).alias("ts")
    )
    kept = buckets.where(
        (F.size("ts") >= 2) & (F.size("ts") <= max_bucket)
    )
    ts = F.col("ts")
    combos = F.flatten(
        F.transform(
            ts,
            lambda x, i: F.transform(
                F.slice(ts, i + F.lit(2), F.size(ts) - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        kept.select(F.explode(combos).alias("p"))
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
        .distinct()
    )
    return pairs.select(
        "term_a",
        "term_b",
        F.levenshtein("term_a", "term_b").cast("long").alias("dist"),
    ).where(F.col("dist") == 1)


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_terms: int = 100,
    post_len: int = 20,
) -> DataFrame:
    """Build capped posting lists: ``(term, df, total_tf, posting)``.

    ``posting`` is ``"doc:tf,doc:tf,..."`` for the ``post_len`` highest
    tf documents (ties broken by ascending doc id), ordered by that
    rank; the output keeps the ``top_terms`` highest-df terms (ties by
    term) so the result is deterministic end to end.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    t = docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    # two consumers (per-term stats, rank-limited posting collect) —
    # materialize the compact (term, id, tf) table once (the tf_idf
    # idiom) instead of re-tokenizing the corpus per branch
    tf = (
        t.groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )

    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )

    rn = F.row_number().over(
        Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("id"))
    )
    ranked = tf.withColumn("rn", rn).where(F.col("rn") <= post_len)
    posting = ranked.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "id", "tf"))),
                lambda x: F.concat(
                    x["id"].cast("string"), F.lit(":"), x["tf"].cast("string")
                ),
            ),
            ",",
        ).alias("posting")
    )
    return (
        stats.join(posting, "term")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top_terms)
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("total_tf").cast("long").alias("total_tf"),
            "posting",
        )
    )
