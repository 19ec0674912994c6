"""Training-data operators: dedup stack, simsearch, text fingerprints.

Python oracles: true Jaccard on shingle sets for minhash verification,
numpy cosine for ANN recall, hamming recomputation for simhash.
"""

from __future__ import annotations

import numpy as np
import pytest

from webindex_spark.operators import dedup, simsearch, textstats

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge today"
)


def _docs(spark):
    rows = [
        (0, BASE, "en", "w", len(BASE)),
        (1, BASE, "en", "w", len(BASE)),                       # exact dup of 0
        (2, BASE.replace("fox", "cat"), "en", "w", 1),          # near dup of 0
        (3, BASE.replace("rain", "snow").replace("boy", "girl"), "en", "w", 1),
        (4, "completely different text about spark catalyst optimizer plans "
            "and shuffle partitions in distributed query engines today", "en", "w", 1),
        (5, "numbers 123 456 789 000 111 222 333 444 555 666 777 888", "xx", "w", 1),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _py_shingles(text, n=3):
    toks = text.lower().split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard(a, b, n=3):
    sa, sb = _py_shingles(a, n), _py_shingles(b, n)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark):
    out = dedup.exact_dedup(_docs(spark)).collect()
    groups = {r["keep_doc_id"]: r["n_copies"] for r in out}
    assert groups[0] == 2  # docs 0 and 1 identical
    assert sum(groups.values()) == 6


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    pairs = dedup.minhash_dedup(docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    # precision: every reported jaccard equals the true python jaccard
    for (a, b), j in got.items():
        assert j == pytest.approx(_py_jaccard(texts[a], texts[b]))
        assert j >= 0.5
    # recall on the planted high-sim pairs
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got and (1, 2) in got
    # unrelated docs are not paired
    assert not any(4 in p or 5 in p for p in got)


def test_simhash_properties(spark):
    docs = _docs(spark)
    sig = dedup.simhash(docs).collect()
    h = {r["id"]: r["simhash"] for r in sig}
    assert h[0] == h[1]  # identical text -> identical fingerprint
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[2]) < ham(h[0], h[4])  # near dup closer than unrelated
    # near-pair detection agrees with recomputed hamming
    pairs = dedup.simhash_near_pairs(
        spark.createDataFrame([(k, v) for k, v in h.items()], ["id", "simhash"]),
        max_hamming=3,
    ).collect()
    for r in pairs:
        assert r["hamming"] == ham(h[r["id_a"]], h[r["id_b"]]) <= 3
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)


def test_simhash_hot_bucket_guard(spark):
    """90%-identical corpus (the boilerplate-skew shape): 270 clones of
    one signature put 270 ids on a single (blk, chunk) value in every
    block.  Unguarded, that bucket alone emits C(270,2)=36k candidate
    pairs; the guard drops hot buckets whole, keeps the candidate count
    bounded by max_bucket²/2 per bucket, and still finds the planted
    near pair among the distinct tail."""
    import random

    rng = random.Random(7)
    clone_sig = rng.getrandbits(63)
    base = rng.getrandbits(63)
    near = base ^ (1 << 3) ^ (1 << 40)  # hamming 2
    rows = [(f"c{i}", clone_sig) for i in range(270)]
    rows += [("base", base), ("near", near)]
    rows += [(f"r{i}", rng.getrandbits(63)) for i in range(28)]
    sig = spark.createDataFrame(rows, ["id", "simhash"])

    guarded = dedup.simhash_near_pairs(sig, max_hamming=3, max_bucket=50)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in guarded.collect()}
    assert got.get(("base", "near")) == 2          # recall survives the guard
    assert not any(a.startswith("c") or b.startswith("c") for a, b in got)
    # every surviving bucket obeys the cap, so output pairs are bounded
    assert len(got) < 50 * 49 / 2

    # the dropped-bucket census names exactly the boilerplate cluster:
    # one hot bucket per block, each holding all 270 clones
    dropped = dedup.dropped_block_buckets(sig, blocks=4, max_bucket=50).collect()
    assert len(dropped) == 4 and all(r["n"] == 270 for r in dropped)

    # lifting the cap shows what the guard saved: the clone cluster's
    # all-pairs explosion (C(270,2) = 36_315 identical-hash pairs)
    unguarded = dedup.simhash_near_pairs(
        sig, max_hamming=3, max_bucket=1_000_000
    ).count()
    assert unguarded >= 270 * 269 // 2


def test_fingerprint_winnowing(spark):
    docs = _docs(spark)
    fp = {r["doc_id"]: list(r["fingerprints"]) for r in
          textstats.fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[4]
    # near-dup shares most fingerprints
    inter = len(set(fp[0]) & set(fp[2]))
    assert inter / len(set(fp[0]) | set(fp[2])) > 0.5


def test_quality_and_langid(spark):
    docs = _docs(spark)
    q = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert q[0]["quality"] > q[5]["quality"]  # prose beats digit soup
    assert q[5]["digit_ratio"] > 0.5
    l = {r["doc_id"]: r["looks_english"] for r in textstats.lang_id(docs).collect()}
    assert l[0] and not l[5]


# ------------------------------------------------------------------ ANN


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    dim, n = 16, 200
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant: vector i+100 is a tiny perturbation of vector i (i<20)
    for i in range(20):
        base[100 + i] = base[i] + rng.standard_normal(dim).astype(np.float32) * 0.05
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in base[i]]) for i in range(20)],
        ["q_id", "q_emb"],
    )
    return base, corpus, queries


def test_brute_force_topk_matches_numpy(spark, vectors):
    base, corpus, queries = vectors
    out = simsearch.brute_force_topk(corpus, queries, k=1)
    got = {r["q_id"]: (r["vec_id"], r["cosine"]) for r in out.collect()}
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -2)
    for q in range(20):
        exp_id = int(np.argmax(sims[q]))
        assert got[q][0] == exp_id
        assert got[q][1] == pytest.approx(float(sims[q][exp_id]), rel=1e-5)
        assert got[q][0] == q + 100  # the planted neighbor wins


def test_lsh_topk_recall(spark, vectors):
    base, corpus, queries = vectors
    out = simsearch.lsh_topk(corpus, queries, dim=16, k=1, n_planes=10, tables=4)
    got = {r["q_id"]: r["vec_id"] for r in out.collect()}
    hits = sum(1 for q in range(20) if got.get(q) == q + 100)
    assert hits >= 14  # >=70% top-1 recall on planted neighbors (deterministic seeds)


def test_ivf_full_probe_equals_brute_force(spark, vectors):
    """Probing ALL cells makes IVF exact — bit-identical to brute force
    (both re-rank with the same HOF cosine), the IVF correctness anchor."""
    base, corpus, queries = vectors
    ivf = simsearch.ivf_topk(
        corpus, queries, dim=16, k=3, n_cells=8, n_probe=8
    )
    bf = simsearch.brute_force_topk(corpus, queries, k=3)
    key = lambda r: (r["q_id"], r["rank"])
    got = {key(r): (r["vec_id"], r["cosine"]) for r in ivf.collect()}
    want = {key(r): (r["vec_id"], r["cosine"]) for r in bf.collect()}
    assert got == want


def test_ivf_topk_recall_and_cell_assignment(spark, vectors):
    base, corpus, queries = vectors
    out = simsearch.ivf_topk(
        corpus, queries, dim=16, k=1, n_cells=8, n_probe=3
    )
    got = {r["q_id"]: r["vec_id"] for r in out.collect()}
    hits = sum(1 for q in range(20) if got.get(q) == q + 100)
    # a 0.05-sigma perturbation rarely crosses a Voronoi boundary; with
    # 3/8 cells probed the planted neighbor's cell is nearly always seen
    assert hits >= 14
    # cell assignment matches the numpy oracle exactly (argmax dot with
    # the shared seeded unit centroids, ties to lower cell)
    cells = simsearch.ivf_assign(corpus, dim=16, n_cells=8, n_probe=1)
    got_cells = {r["vec_id"]: r["cells"][0] for r in cells.collect()}
    cent = simsearch.ivf_centroids(16, 8)
    want_cells = np.argmax(base.astype(np.float64) @ cent.T, axis=1)
    assert got_cells == {i: int(want_cells[i]) for i in range(len(base))}


def test_bpe_token_stats_matches_python_re(spark):
    """The BPE-ish regex counter equals python re.findall on the same
    pattern (Java regex ≡ python re for this alternation), including
    contractions, digit chunking, punct runs, and whitespace runs."""
    import re

    pat = re.compile(textstats.BPE_REGEX)
    rows = [
        (0, "Hello world, it's 12345 tokens-ish!  \n tab\there"),
        (1, "plain"),
        (2, "a1b2c3 ... 9999999 don't CamelCase2024"),
        (3, "   leading and trailing   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
        for r in textstats.bpe_token_stats(df).collect()
    }
    for i, t in rows:
        assert got[i][0] == len(pat.findall(t)), (i, pat.findall(t))
        assert got[i][1] == len(t.strip().split()) or not t.strip()
