"""Curation-lane operators (operators/curation.py, textstats.tf_idf_top_terms)
vs small python oracles: planted contamination, PII redaction shapes,
hash-sample determinism, distributed prefix-sum exactness, packing grid."""

from __future__ import annotations

from pyspark.sql import functions as F

from webindex_spark.operators.curation import (
    decontaminate,
    distributed_cumsum,
    hash_stratified_sample,
    pii_scrub,
    seq_pack,
)
from webindex_spark.operators.textstats import tf_idf_top_terms

SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_decontaminate_planted_span(spark):
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {SPAN} closing words here"),        # contaminated
            (2, "totally unrelated text about ships and sails"),  # clean
            (3, f"another leak {SPAN} tail"),                     # contaminated
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, f"question: {SPAN} answer: none")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["shared_fp"]
        for r in decontaminate(corpus, bench, min_shared=1).collect()
    }
    assert set(got) == {(1, 100), (3, 100)}
    assert all(v >= 1 for v in got.values())


def test_decontaminate_min_shared_threshold(spark):
    corpus = spark.createDataFrame([(1, f"x {SPAN} y")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, SPAN)], ["doc_id", "text"])
    loose = decontaminate(corpus, bench, min_shared=1).collect()
    assert len(loose) == 1
    strict = decontaminate(corpus, bench, min_shared=10_000).collect()
    assert strict == []


def test_pii_scrub_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.org and 10.0.0.1 plus 123-45-6789"),
            (2, "clean text no pii at all"),
            (3, "two mails x@y.co z@w.io one ip 192.168.255.254"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_ssn"]) == (1, 1, 1)
    assert out[1]["scrubbed"] == "mail <email> and <ipv4> plus <ssn>"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_ssn"]) == (0, 0, 0)
    assert out[2]["scrubbed"] == "clean text no pii at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"]) == (2, 1)


def test_pii_scrub_no_double_count(spark):
    # the digits+dots inside an email domain must not ALSO count as an
    # IPv4 once the email is redacted first
    docs = spark.createDataFrame([(1, "u@1.2.3.4.example.com")], ["doc_id", "text"])
    r = pii_scrub(docs).collect()[0]
    assert (r["n_email"], r["n_ipv4"]) == (1, 0)
    assert r["scrubbed"] == "<email>"


def _phash62_py(s: str) -> int:
    a = b = 0
    for ch in s:
        a = (a * 31 + ord(ch)) % (1 << 31)
        b = (b * 131 + ord(ch)) % (1 << 31)
    return a + b * (1 << 31)


def test_hash_sample_deterministic_and_exact(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        ["doc_id", "lang"],
    )
    rates = {"en": 0.3, "de": 0.7}
    out1 = hash_stratified_sample(docs, rates).collect()
    out2 = hash_stratified_sample(docs, rates).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # the verdict is exactly the documented hash predicate, row by row
    kept = {r["doc_id"]: r["sample_key"] for r in out1}
    for i in range(400):
        key = _phash62_py(str(i)) % 10_000
        expect = key < (3000 if i % 2 == 0 else 7000)
        assert (i in kept) == expect
        if expect:
            assert kept[i] == key
    # and the per-stratum volumes land near the rates
    n_en = sum(1 for i in kept if i % 2 == 0)
    n_de = sum(1 for i in kept if i % 2 == 1)
    assert 0.2 < n_en / 200 < 0.4 and 0.6 < n_de / 200 < 0.8


def test_distributed_cumsum_matches_serial(spark):
    rows = [(i, (i * 7919) % 97) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(7)  # scrambled in
    got = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(df, "k", "v", num_partitions=5).collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc
    # more partitions than rows: empty range partitions must not break offsets
    tiny = spark.createDataFrame(rows[:3], ["k", "v"])
    got3 = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(tiny, "k", "v", num_partitions=8).collect()
    }
    assert got3 == {0: 0, 1: 7919 % 97, 2: (7919 % 97) + (2 * 7919) % 97}


def test_seq_pack_grid(spark):
    # budget 8: docs of 5, 6, 0, 9 tokens -> starts 0, 5, 11, 11
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "f g h i j k"),
            (3, "   "),
            (4, "l m n o p q r s t"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"], r["n_splits"])
        for r in seq_pack(docs, budget=8).collect()
    }
    assert out[1] == (5, 0, 0, 1)   # tokens 0..4 in seq 0
    assert out[2] == (6, 0, 5, 2)   # tokens 5..10 span seqs 0-1
    assert out[3] == (0, 1, 3, 0)   # empty doc occupies nothing
    assert out[4] == (9, 1, 3, 2)   # tokens 11..19 span seqs 1-2


def test_tf_idf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common common common"),
            (2, "banana cherry common common"),
            (3, "cherry cherry cherry common"),
        ],
        ["doc_id", "text"],
    )
    out = tf_idf_top_terms(docs, top_k=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    # doc 1: apple tf=2 df=1 (score 2.0) beats common tf=3 df=3 (1.0)
    top1 = next(r for r in by_doc[1] if r["rank"] == 1)
    assert top1["term"] == "apple" and (top1["tf"], top1["df"]) == (2, 1)
    # doc 3: cherry tf=3 df=2 beats common tf=1 df=3
    top3 = next(r for r in by_doc[3] if r["rank"] == 1)
    assert top3["term"] == "cherry"
    import math

    assert top3["tfidf"] == round(3 * math.log(4.0 / 3.0), 6)
