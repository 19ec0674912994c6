"""Structural dedup + index lane: corpus line dedup, token-window
(substring) dedup coverage, Gopher repetition stats, inverted postings,
priority sampling, triangle census.

Python oracles throughout: line/window dedup recomputed with dict
counters over the raw strings (no hashing — catches hash-plumbing bugs),
repetition stats with collections.Counter, triangles on graphs with
known closed-form counts.
"""

from __future__ import annotations

from collections import Counter

import pytest

from webindex_spark.operators.curation import priority_sample
from webindex_spark.operators.invindex import inverted_postings
from webindex_spark.operators.linedup import corpus_line_dedup, window_dedup_stats
from webindex_spark.operators.textstats import repetition_stats
from webindex_spark.operators.triangles import triangle_census


# ----------------------------------------------------------- line dedup


def _line_docs(spark):
    nav = "navigation home about contact us"
    foot = "copyright example corp"
    rows = [
        (0, f"{nav}\nunique first body line\n{foot}\nad"),
        (1, f"{nav}\nanother body entirely\n{foot}\nad"),
        (2, f"{nav}\nthird body text here\n{foot}\nad"),
        (3, "no boilerplate at all in this one"),
        (4, f"{nav}\n{foot}"),                      # all lines are boilerplate
        (5, f"twice only line\n{nav}"),
        (6, "twice only line\nsolo content"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_drops_corpus_boilerplate(spark):
    out = {
        r["doc_id"]: r
        for r in corpus_line_dedup(
            _line_docs(spark), min_count=3, min_chars=5
        ).collect()
    }
    # nav (5x) and foot (4x) cross the threshold; 'ad' (3x) is under
    # min_chars; 'twice only line' (2x) is under min_count
    assert out[0]["clean_text"] == "unique first body line\nad"
    assert out[0]["n_lines"] == 4 and out[0]["n_dropped"] == 2
    assert out[3]["clean_text"] == "no boilerplate at all in this one"
    assert out[3]["n_dropped"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_dropped"] == 2
    assert out[5]["clean_text"] == "twice only line"
    assert out[6]["clean_text"] == "twice only line\nsolo content"


def test_line_dedup_shuffle_join_matches_broadcast(spark):
    docs = _line_docs(spark)
    a = corpus_line_dedup(docs, min_count=3, min_chars=5, broadcast_dict=True)
    b = corpus_line_dedup(docs, min_count=3, min_chars=5, broadcast_dict=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --------------------------------------------------------- window dedup


def _win_docs(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    rows = [
        (0, f"one two three {passage} four five"),
        (1, f"six seven {passage} eight nine ten"),
        (2, "entirely original words without any repeated runs at all"),
        (3, passage),                               # doc == the passage
        (4, "tiny doc"),                            # shorter than w
        (5, ""),                                    # empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_window_stats(rows, w=8, min_count=2):
    wins = []
    for did, text in rows:
        toks = text.lower().split()
        if not toks:
            continue
        if len(toks) < w:
            wins.append((did, 0, tuple(toks)))
        else:
            wins.extend(
                (did, i, tuple(toks[i:i + w])) for i in range(len(toks) - w + 1)
            )
    counts = Counter(key for _, _, key in wins)
    out = {}
    for did, text in rows:
        toks = text.lower().split()
        mine = [(p, key) for d, p, key in wins if d == did]
        dup = [(p, min(p + w, len(toks)) if len(toks) >= w else len(toks))
               for p, key in mine if counts[key] >= min_count]
        covered = set()
        for s, e in dup:
            covered.update(range(s, e))
        out[did] = (
            len(toks), len(mine), len(dup), min(len(covered), len(toks))
        )
    return out


def test_window_dedup_counts_and_coverage(spark):
    rows = [(r["doc_id"], r["text"]) for r in _win_docs(spark).collect()]
    exp = _py_window_stats(rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_dup_windows"], r["dup_token_cov"]
        )
        for r in window_dedup_stats(_win_docs(spark), w=8, min_count=2).collect()
    }
    assert got == exp
    # the planted passage is duplicated across docs 0/1/3; doc 2 is clean
    assert got[0][2] >= 1 and got[1][2] >= 1 and got[3][2] == 1
    assert got[2][2] == 0 and got[5] == (0, 0, 0, 0)


def test_window_dedup_overlapping_runs_union_exactly(spark):
    # two overlapping duplicated runs: coverage must union, not sum
    shared = "a b c d e f g h i j"        # 10 tokens -> 3 windows of 8
    docs = spark.createDataFrame(
        [(0, shared), (1, shared), (2, "x " + shared)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in
           window_dedup_stats(docs, w=8, min_count=2).collect()}
    # doc 0: all 3 windows duplicated, union covers all 10 tokens (not 24)
    assert got[0]["n_dup_windows"] == 3 and got[0]["dup_token_cov"] == 10
    assert got[0]["dup_frac"] == 1.0
    # doc 2's windows starting at 'x' shift the grid: windows [1..3] match
    assert got[2]["n_dup_windows"] == 3 and got[2]["dup_token_cov"] == 10


def _py_window_cut(rows, w=8, min_count=2):
    wins, toks_by = [], {}
    for did, text in rows:
        toks = text.lower().split()
        toks_by[did] = toks
        if not toks:
            continue
        if len(toks) < w:
            wins.append((did, 0, tuple(toks)))
        else:
            wins.extend(
                (did, i, tuple(toks[i:i + w])) for i in range(len(toks) - w + 1)
            )
    counts = Counter(key for _, _, key in wins)
    keeper = {}
    for did, pos, key in sorted(wins):
        if counts[key] >= min_count and key not in keeper:
            keeper[key] = (did, pos)
    out = {}
    for did, toks in toks_by.items():
        cut = set()
        for d, pos, key in wins:
            if d != did or counts[key] < min_count or keeper[key] == (d, pos):
                continue
            cut.update(range(pos, min(pos + w, len(toks)) if len(toks) >= w else len(toks)))
        kept = [t for i, t in enumerate(toks) if i not in cut]
        out[did] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


def test_window_dedup_cut_keeps_first_occurrence(spark):
    from webindex_spark.operators.linedup import window_dedup_cut

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"intro words here {passage} outro"),
        (1, f"other doc {passage} trailing bits"),
        (2, passage),
        (3, "independent text with no shared runs anywhere at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exp = _py_window_cut(rows)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_text"])
        for r in window_dedup_cut(docs, w=8, min_count=2).collect()
    }
    assert got == exp
    # the corpus-first copy (doc 0) survives; later copies are cut
    assert "alpha" in got[0][2] and "alpha" not in got[1][2]
    assert got[2] == (8, 8, "")
    assert got[3][1] == 0


# ----------------------------------------------------- repetition stats


def _py_rep(text, n):
    toks = text.lower().split()
    if not toks:
        return 0, "", 0
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    c = Counter(grams)
    # tie-break: highest count, then lexicographically smallest gram
    best_cnt = max(c.values())
    best_gram = min(g for g, k in c.items() if k == best_cnt)
    dup = sum(k * len(g) for g, k in c.items() if k >= 2)
    return best_cnt, best_gram, dup


def test_repetition_stats_match_python(spark):
    rows = [
        (0, "spam spam spam spam eggs"),
        (1, "all words here are completely distinct tokens because the "
            "sentence keeps introducing fresh vocabulary items until its "
            "length comfortably exceeds every repetition threshold bound"),
        (2, "ab ab ab xy xy zz"),
        (3, "single"),
        (4, "the cat sat on the cat sat again"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    for did, text in rows:
        c2, g2, d2 = _py_rep(text, 2)
        c3, g3, _ = _py_rep(text, 3)
        r = got[did]
        assert r["top2_chars"] == c2 * len(g2), (did, r)
        assert r["top3_chars"] == c3 * len(g3), (did, r)
        assert r["dup2_chars"] == d2, (did, r)
        assert r["n_chars"] == len(text)
    assert got[0]["rep_pass"] is False       # 'spam spam' dominates
    assert got[1]["rep_pass"] is True


def test_fuzzy_term_pairs_symmetric_delete(spark):
    from webindex_spark.operators.invindex import fuzzy_term_pairs

    docs = spark.createDataFrame(
        [
            (1, "spark spar sparc park cat cart card bat"),
            (2, "completely unrelated vocabulary words"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["term_a"], r["term_b"]) for r in fuzzy_term_pairs(docs).collect()}
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    vocab = sorted(set(
        "spark spar sparc park cat cart card bat completely unrelated "
        "vocabulary words".split()
    ))
    exp = {(a, b) for a, b in itertools.combinations(vocab, 2) if lev(a, b) == 1}
    assert got == exp
    assert ("spar", "spark") in got and ("cart", "cat") in got
    assert ("bat", "card") not in got       # distance 3


def test_fuzzy_term_pairs_hot_bucket_guard(spark):
    from webindex_spark.operators.invindex import fuzzy_term_pairs

    # 30 single-char terms all share the '' deletion variant: with
    # max_bucket below the bucket size the whole bucket is dropped and
    # no quadratic expansion happens
    text = " ".join(chr(ord("a") + i) for i in range(26)) + " aa ab"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = fuzzy_term_pairs(docs, max_bucket=10).collect()
    # '' bucket (26 single chars) dropped; pairs via 'a'/'b' buckets
    # like (a,aa),(a,ab),(aa,ab),(b,ab) survive
    pairs = {(r["term_a"], r["term_b"]) for r in got}
    assert ("a", "b") not in pairs          # only shared '' -> dropped
    assert ("a", "aa") in pairs and ("aa", "ab") in pairs


# ----------------------------------------------------- inverted postings


def test_inverted_postings_caps_and_orders(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple apple"),
            (2, "apple banana banana"),
            (3, "apple cherry"),
            (4, "date"),
        ],
        ["doc_id", "text"],
    )
    out = {r["term"]: r for r in
           inverted_postings(docs, top_terms=3, post_len=2).collect()}
    # top_terms=3 by df: apple(3), banana(2), cherry/date(1) -> cherry by name
    assert set(out) == {"apple", "banana", "cherry"}
    a = out["apple"]
    assert a["df"] == 3 and a["total_tf"] == 5
    # post_len=2: top docs by tf desc then id: doc1(tf3), doc2(tf1)<->doc3(tf1) tie -> doc2
    assert a["posting"] == "1:3,2:1"
    assert out["banana"]["posting"] == "2:2,1:1"


def test_prefix_suggestions_rank_and_truncation(spark):
    from webindex_spark.operators.invindex import prefix_suggestions

    docs = spark.createDataFrame(
        [
            (1, "car car car cart cat dog"),
            (2, "car cab cabs dog dog dog dog"),
        ],
        ["doc_id", "text"],
    )
    got = {r["prefix"]: r for r in
           prefix_suggestions(docs, max_prefix=3, top_k=2).collect()}
    # 'ca' prefix covers car(4) cab(1) cabs(1) cart(1) cat(1): top2 by
    # (tf desc, term asc) = car, cab; n_terms counts ALL matching terms
    assert got["ca"]["suggest"] == "car,cab"
    assert got["ca"]["n_terms"] == 5
    assert got["d"]["suggest"] == "dog"
    # prefixes longer than max_prefix are absent
    assert "cart" not in got and "cab" in got


# ------------------------------------------------------ priority sample


def test_priority_sample_deterministic_and_weighted(spark):
    rows = [(i, "en" if i % 2 else "de", 10 + i) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    a = priority_sample(docs, weight_col="n_chars", k=5).collect()
    b = priority_sample(docs, weight_col="n_chars", k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = Counter(r["lang"] for r in a)
    assert per == {"en": 5, "de": 5}
    # priorities are the integer quotient, so kept priorities per stratum
    # are the stratum's k smallest
    from webindex_spark.functions import portable_hash  # noqa: F401

    def py_phash(s, base):
        h = 0
        for ch in s:
            h = (h * base + ord(ch)) % (1 << 31)
        return h

    for lang in ("en", "de"):
        pri = {}
        for i, lg, w in rows:
            if lg != lang:
                continue
            h = py_phash(str(i), 31) + py_phash(str(i), 131) * (1 << 31)
            pri[i] = h // max(w, 1)
        kept = sorted(r["doc_id"] for r in a if r["lang"] == lang)
        exp = sorted(i for i, _ in sorted(pri.items(), key=lambda kv: (kv[1], kv[0]))[:5])
        assert kept == exp


def test_samplers_stable_under_resharding(spark):
    """The no-RNG claim, executed: both deterministic samplers return
    the IDENTICAL row set at different physical partitionings (seeded
    per-partition RNG would not)."""
    from webindex_spark.operators.curation import (
        hash_stratified_sample,
        priority_sample,
    )

    rows = [(i, "en" if i % 3 else "de", 10 + (i * 7) % 90) for i in range(200)]
    base = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    for df2 in (base.repartition(1), base.repartition(13, "lang"), base.coalesce(2)):
        a = sorted(map(tuple, priority_sample(base, "n_chars", 7).collect()))
        b = sorted(map(tuple, priority_sample(df2, "n_chars", 7).collect()))
        assert a == b
        c = sorted(map(tuple, hash_stratified_sample(
            base, {"en": 0.3, "de": 0.5}).collect()))
        d = sorted(map(tuple, hash_stratified_sample(
            df2, {"en": 0.3, "de": 0.5}).collect()))
        assert c == d


def test_priority_sample_zero_weight_clamped(spark):
    docs = spark.createDataFrame(
        [(1, "en", 0), (2, "en", 5)], ["doc_id", "lang", "n_chars"]
    )
    out = priority_sample(docs, weight_col="n_chars", k=2).collect()
    assert len(out) == 2 and all(r["priority"] >= 0 for r in out)


# ------------------------------------------------------ triangle census


def test_triangle_census_k4_plus_tail(spark):
    # K4 on {a,b,c,d} = 4 triangles, 6 edges; pendant edge d-e adds none.
    # Includes duplicates, reversals and a self-loop to exercise
    # canonicalization.
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
        ("b", "d"), ("c", "d"), ("d", "c"), ("d", "e"), ("e", "e"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_census(df).collect()[0]
    assert row["n_nodes"] == 5 and row["n_edges"] == 7
    assert row["triangles"] == 4
    # wedges: degs a=3 b=3 c=3 d=4 e=1 -> 3+3+3+6+0 = 15
    assert row["wedges"] == 15
    assert row["global_cc"] == round(12 / 15, 6)


def test_triangle_census_triangle_free(spark):
    # star graph: no triangles, wedges = C(4,2)
    edges = [("hub", x) for x in ("a", "b", "c", "d")]
    row = triangle_census(spark.createDataFrame(edges, ["src", "dst"])).collect()[0]
    assert row["triangles"] == 0 and row["wedges"] == 6
    assert row["global_cc"] == 0.0
