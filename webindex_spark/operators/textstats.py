"""Text analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting (winnowing over rolling k-gram hashes).  The first
three are pure built-in expression pipelines (see also the oracle-checked
query forms in plans/crawl_queries.py); the winnowing fingerprint uses the
same JVM-side shingle hashing as the dedup stack plus a windowed min —
no Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

def exploded_ngrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, pos, gram): word n-grams via posexplode + lead windows.

    The obvious ``transform(sequence(...), i -> concat_ws(slice(toks,...)))``
    form re-evaluates the tokenizer per array element (Catalyst inlines
    outer expressions into higher-order lambdas — no CSE), costing
    O(tokens × grams) per document.  This form tokenizes once, explodes,
    and builds each gram from ``lead`` values over a doc-keyed window —
    linear, one shuffle, and the (id, gram) stream is exactly what the
    dedup/fingerprint consumers need anyway.

    Documents shorter than ``n`` tokens yield their single whole-document
    gram (``concat_ws`` skips the null leads), matching ``slice``
    semantics.
    """
    from pyspark.sql import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    t = docs.select(F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("id").orderBy("pos")
    cnt = F.count(F.lit(1)).over(Window.partitionBy("id"))
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    g = t.select(
        "id", "pos",
        F.concat_ws(" ", *parts).alias("gram"),
        cnt.alias("__cnt"),
    )
    return g.where(
        (F.col("pos") <= F.col("__cnt") - n)
        | ((F.col("pos") == 0) & (F.col("__cnt") < n))
    ).drop("__cnt")


def exploded_ngram_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    token_hash_fn=None, compose_fn=None,
) -> DataFrame:
    """(id, pos, gh): word n-gram HASHES with each token hashed once.

    Hashing the gram *string* (phash/xxhash over the concatenated chars)
    costs O(chars × n) per document — every character is re-folded by
    each of the n grams containing its token, and that char fold was the
    measured dominant cost of the round-2 dedup/fingerprint queries.
    Here each token is hashed ONCE (O(chars) total) and the gram hash is
    composed from the n token hashes via ``compose_fn`` — n integer ops
    on already-computed longs per gram.  Same stream shape as
    :func:`exploded_ngrams` (posexplode + lead windows, one shuffle).

    Empty tokens are dropped BEFORE position numbering, so a document
    whose text trims to nothing contributes no rows (``split`` of ''
    yields ['']).

    ``token_hash_fn``: token Column -> int64 Column (default xxhash64).
    ``compose_fn``: list of n (possibly null-tailed) token-hash Columns
    -> gram-hash Column.  Default ``xxhash64(*cols)`` — Spark hash
    expressions skip null inputs, which matches the single clamped
    short-document gram (< n tokens).  The oracle-checked queries pass
    ``portable_hash.phash62`` / ``portable_hash.compose62`` so DuckDB
    recomputes identical values from the same per-token hash list.

    Plan shape: the gram windows are composed IN-ROW from the per-doc
    token-hash array (``transform`` + ``try_element_at`` null-tailing)
    and exploded once — zero shuffles.  The earlier formulation
    (posexplode the tokens, then ``lead()`` windows per doc) paid a
    full exchange + sort of the token stream just to see the next n-1
    hashes, which at corpus scale is a shuffle of every token.
    """
    token_hash_fn = token_hash_fn or F.xxhash64
    compose_fn = compose_fn or (lambda cols: F.xxhash64(*cols))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    # the token-hash array is materialized in its OWN projection and
    # referenced by name below: inlining it into the gram lambda would
    # re-evaluate the whole per-token hash transform once per
    # try_element_at (n per gram — measured quadratic blowup)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: token_hash_fn(t)).alias("__th"),
    )
    th = F.col("__th")
    n_t = F.size(th)
    # gram count: cnt-n+1 full windows, else one clamped whole-doc gram
    # (empty docs contribute none)
    npos = F.when(n_t >= n, n_t - n + 1).otherwise(F.least(n_t, F.lit(1)))
    idx = F.when(npos > 0, F.sequence(F.lit(0), npos - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            compose_fn(
                [F.try_element_at(th, i + j + 1) for j in range(n)]
            ).alias("gh"),
        ),
    )
    return base.select("id", F.explode(grams).alias("g")).select(
        "id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh")
    )


ENGLISH_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
]


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        (F.length(text_col) / F.size(toks)).alias("chars_per_token"),
    )


# BPE-style pre-tokenizer regex (the GPT-2 pattern's engine-portable
# core): contraction suffix | space?+letters | space?+digit-chunk(<=3,
# GPT-4-style number splitting) | space?+punct-run | whitespace-run.
# Alternation is ORDERED in both Java regex (Spark) and RE2's default
# mode (DuckDB), and the explicit [ \t\n\r] class avoids the \s
# divergence (Java includes \x0B, RE2 does not).  Counting matches of
# this pattern approximates a BPE token count without a vocab.
BPE_REGEX = r"'[A-Za-z]{1,2}| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9 \t\n\r']+|[ \t\n\r]+"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer-free BPE-ish token count per document (training-data
    sizing: the whitespace count in :func:`token_stats` underestimates
    sub-word inflation; this regex tracks a byte-pair pre-tokenizer).
    Pure built-in `regexp_extract_all` — JVM codegen, no UDF."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        (F.size(pieces) / F.size(ws)).alias("bpe_per_word"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality heuristics + a single [0,1] score."""
    text = F.col(text_col)
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(text, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(
        *[F.lit(w) for w in ENGLISH_STOPWORDS]
    )))
    score = (
        F.least(alpha / n, F.lit(0.9)) * 0.5
        + F.least(stop_hits.cast("double") / 8.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(digits / n * 5, F.lit(1.0))) * 0.2
    )
    return docs.select(
        F.col(id_col),
        (alpha / n).alias("alpha_ratio"),
        (digits / n).alias("digit_ratio"),
        (punct / n).alias("punct_ratio"),
        stop_hits.cast("long").alias("stopword_kinds"),
        score.alias("quality"),
    )


def _rep_gram_fold(toks: F.Column, n: int) -> F.Column:
    """struct(tc, tg, dup): top in-document n-gram count, the winning
    gram (smallest-lexicographic among count ties), and the total
    characters inside duplicated n-grams (count × gram length summed
    over every gram occurring ≥ 2 times) — all from ONE sort + ONE
    linear fold over the in-row gram array.  Zero shuffle: the Gopher
    repetition rules are per-document, so the scalable form never
    leaves the row (the relational explode/groupBy/window form costs
    two corpus shuffles for the same numbers — that form is the DuckDB
    oracle, not the engine path).

    Documents with 0 < tokens < n contribute their single clamped
    whole-document gram (slice clamps), matching
    :func:`exploded_ngrams`; empty documents yield the zero struct.
    """
    cnt = F.size(toks)
    grams = F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("tc"), F.lit("").alias("tg"), zero.alias("dup"),
    )

    def merge(acc, g):
        run2 = F.when(acc["prev"] == g, acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        glen = F.length(g).cast("long")
        add = (
            F.when(run2 == 2, glen * 2)
            .when(run2 > 2, glen)
            .otherwise(F.lit(0).cast("long"))
        )
        better = run2 > acc["tc"]
        return F.struct(
            g.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["tc"]).alias("tc"),
            F.when(better, g).otherwise(acc["tg"]).alias("tg"),
            (acc["dup"] + add).alias("dup"),
        )

    return F.aggregate(
        F.array_sort(grams), init, merge,
        lambda acc: F.struct(
            acc["tc"].alias("tc"), acc["tg"].alias("tg"), acc["dup"].alias("dup")
        ),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = 0.20,
    top3_max: float = 0.18,
    dup2_max: float = 0.60,
) -> DataFrame:
    """Gopher-style in-document repetition filters (Rae et al. 2021
    §A1.1: "fraction of characters in the most common n-gram" and
    "fraction of characters in duplicated n-grams"), computed map-only
    via :func:`_rep_gram_fold`.

    Per document: ``top2_chars``/``top2_frac`` (most common word
    2-gram), ``top3_chars``/``top3_frac`` (3-gram), ``dup2_chars``/
    ``dup2_frac`` (all 2-grams occurring ≥ 2×), and ``rep_pass`` —
    true when every rounded fraction sits at or under its threshold.
    Fractions are char-ratio vs ``length(text)`` rounded to 6 digits
    (the cross-engine float idiom used by every gated fraction)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    n_chars = F.length(F.col(text_col)).cast("long")
    f2 = _rep_gram_fold(toks, 2)
    f3 = _rep_gram_fold(toks, 3)
    denom = F.greatest(n_chars, F.lit(1))
    top2_frac = F.round((f2["tc"] * F.length(f2["tg"])) / denom, 6)
    top3_frac = F.round((f3["tc"] * F.length(f3["tg"])) / denom, 6)
    dup2_frac = F.round(f2["dup"] / denom, 6)
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        (f2["tc"] * F.length(f2["tg"])).cast("long").alias("top2_chars"),
        top2_frac.alias("top2_frac"),
        (f3["tc"] * F.length(f3["tg"])).cast("long").alias("top3_chars"),
        top3_frac.alias("top3_frac"),
        f2["dup"].cast("long").alias("dup2_chars"),
        dup2_frac.alias("dup2_frac"),
        (
            (top2_frac <= top2_max)
            & (top3_frac <= top3_max)
            & (dup2_frac <= dup2_max)
        ).alias("rep_pass"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            min_hits: int = 3) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(
        *[F.lit(w) for w in ENGLISH_STOPWORDS[:8]]
    )))
    return docs.select(
        F.col(id_col),
        hits.cast("long").alias("stopword_kinds"),
        (hits >= min_hits).alias("looks_english"),
    )


def tf_idf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Corpus-weighted keyword extraction: the ``top_k`` most
    distinctive terms per document by tf-idf.

    Shape: tokenize + explode once; per-(doc, term) term frequency via
    one groupBy; document frequency by re-aggregating that (vocab-sized)
    table — the df table is tiny relative to the corpus and is
    BROADCAST back onto the tf stream, so the whole plan is one
    corpus-sized shuffle (the tf groupBy) plus vocab-sized work.

    Ranking uses ``tf/df`` (a double DIVISION — IEEE-exact, hence
    bit-identical across engines) with the term string as tiebreak, so
    row_number is deterministic and oracle-replayable; the reported
    ``tfidf = tf * ln((N+1)/(df+1))`` (smoothed idf) is rounded to 6
    digits for cross-engine float comparison.  ``N`` (corpus size) is
    a scalar driver aggregate — one count, same class as the split
    sampler and epoch meters.
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    t = docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    # two consumers (the score join and the df aggregate) — materialize
    # the compact (id, term, tf) table once instead of letting Catalyst
    # re-scan + re-tokenize the corpus for the df branch
    tf = (
        t.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        F.col("id").alias(id_col),
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("__score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("term"))
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0)))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def fingerprint_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, window: int = 4, token_hash_fn=None, compose_fn=None,
) -> DataFrame:
    """Winnowing fingerprint as exploded scalar rows: (id, fingerprint)
    distinct — the driver-gate/oracle-friendly shape (one row per selected
    k-gram hash; the array form below is collect_set over this stream).

    Gram hashes come from :func:`exploded_ngram_hashes` — per-token
    hashing with composed gram hashes (defaults xxhash64/xxhash64 for
    production; the oracle-checked query passes the engine-portable
    ``phash62``/``compose62`` pair so DuckDB recomputes the whole
    winnowing pipeline bit-exactly).
    """
    from pyspark.sql import Window

    g = exploded_ngram_hashes(
        docs, id_col, text_col, k, token_hash_fn, compose_fn
    ).select(F.col("id").alias(id_col), "pos", "gh")
    w_min = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    w_cnt = Window.partitionBy(id_col)
    mins = (
        g.select(
            F.col(id_col),
            F.col("pos"),
            F.min("gh").over(w_min).alias("m"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        # only full windows (plus the single short window of a short doc)
        .where((F.col("pos") <= F.col("n") - window) | (F.col("pos") == 0))
    )
    return mins.select(id_col, F.col("m").alias("fingerprint")).distinct()


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, window: int = 4, token_hash_fn=None, compose_fn=None,
) -> DataFrame:
    """Winnowing fingerprint set per document (MOSS-style signature):
    k-gram rolling hashes -> per-window minimum -> distinct sorted array.
    Returns (id, fingerprints: array<bigint> sorted)."""
    rows = fingerprint_rows(
        docs, id_col, text_col, k, window, token_hash_fn, compose_fn
    )
    return rows.groupBy(id_col).agg(
        F.array_sort(F.collect_set("fingerprint")).alias("fingerprints")
    )
