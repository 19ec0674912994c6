"""Engine-portable hash contract: the Spark Column expressions and the
DuckDB SQL twins in functions/portable_hash.py must agree bit-exactly —
this is what lets the driver gate verify the minhash/simhash/winnowing/ANN
pipelines end-to-end (plans/crawl_queries.py) instead of rows-only."""

import duckdb
import pyspark.sql.functions as F

from webindex_spark.functions import portable_hash as ph

STRINGS = [
    "hello world", "a", "", "spark fast merge", "the quick brown fox",
    "x" * 200, "MiXeD CaSe 123 !?", "tok1 tok2 tok3 tok4",
]


def test_phash_parity_spark_vs_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = df.select(
        "s",
        ph.phash31(F.col("s")).alias("h31"),
        ph.phash62(F.col("s")).alias("h62"),
        ph.fold31([F.length("s").cast("long"), ph.phash31(F.col("s"))]).alias("f31"),
    ).collect()
    con = duckdb.connect()
    vals = ", ".join(f"({s!r})" for s in STRINGS)
    sql = (
        f"SELECT s, {ph.sql_phash31('s')} AS h31, {ph.sql_phash62('s')} AS h62, "
        f"{ph.sql_fold31(['CAST(length(s) AS BIGINT)', ph.sql_phash31('s')])} AS f31 "
        f"FROM (VALUES {vals}) t(s)"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    for r in got:
        assert (r["h31"], r["h62"], r["f31"]) == want[r["s"]], r["s"]
    # range contracts: 31-bit and 62-bit positive
    for r in got:
        assert 0 <= r["h31"] < (1 << 31)
        assert 0 <= r["h62"] < (1 << 62)


def test_simhash_portable_matches_bitwise_definition(spark):
    """Lane-packed aggregation == the naive per-bit sign definition."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
         (2, "one two three four five six seven"), (3, "zzz")],
        ["doc_id", "text"],
    )
    from webindex_spark.operators import dedup

    got = {r["id"]: r["simhash"]
           for r in dedup.simhash(docs, hash_fn=ph.phash62, nbits=62).collect()}

    def py_phash(s, base):
        h = 0
        for c in s:
            h = (h * base + ord(c)) % (1 << 31)
        return h

    import re
    for did, text in [(0, "alpha beta gamma delta"), (2, "one two three four five six seven"), (3, "zzz")]:
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        hs = [py_phash(t, 31) + py_phash(t, 131) * (1 << 31) for t in toks]
        sig = 0
        for i in range(62):
            s = sum(1 if (h >> i) & 1 else -1 for h in hs)
            if s > 0:
                sig |= 1 << i
        assert got[did] == sig, did
    assert got[0] == got[1]  # identical text -> identical fingerprint


def test_schedule_query_runs_production_operator(spark):
    """q_schedule must route through politeness.schedule (the salted
    two-phase path): its plan contains BOTH window stages."""
    from webindex_spark.plans.crawl_queries import q_schedule

    plan = q_schedule(spark, "/root/testdata/sf0.001")._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") >= 2, plan
    assert "__salt" in plan or "_salt" in plan, plan


def test_phash_parity_non_ascii_and_astral(spark):
    """Spark split('')+ascii() must equal DuckDB's per-codepoint unicode()
    beyond ASCII: accented Latin, CJK, and astral-plane (surrogate-pair)
    characters — the divergence surface the dedup/fingerprint oracles
    stand on."""
    strings = [
        "héllo", "日本語テキスト", "naïve café résumé", "Ω≈ç√∫",
        "\U0001d11e clef", "emoji \U0001f600\U0001f680 mid", "mixéd 漢字 \U0001f9ea end",
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r["s"]: (r["h31"], r["h62"])
        for r in df.select(
            "s",
            ph.phash31(F.col("s")).alias("h31"),
            ph.phash62(F.col("s")).alias("h62"),
        ).collect()
    }
    con = duckdb.connect()
    for s in strings:
        w31, w62 = con.execute(
            f"SELECT {ph.sql_phash31('s')}, {ph.sql_phash62('s')} FROM (SELECT ? AS s)",
            [s],
        ).fetchone()
        assert got[s] == (w31, w62), s


def test_compose62_parity_with_sql_slice(spark):
    """compose62 over null-tailed lead columns == sql_compose62_slice over
    a clamped list slice (the short-document gram equivalence)."""
    from webindex_spark.operators.textstats import exploded_ngram_hashes

    texts = [
        (1, "the quick brown fox jumps"), (2, "ab"), (3, "one two"),
        (4, "   "), (5, "a b c d"), (6, "doublé  spacé  tökens"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["id"], r["pos"], r["gh"])
        for r in exploded_ngram_hashes(
            docs, "doc_id", "text", 3, ph.phash62, ph.compose62
        ).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {t!r})" for i, t in texts)
    con.execute(f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) v(doc_id, text)")
    from webindex_spark.plans.crawl_queries import _sql_gram_hashes

    want = sorted(
        tuple(r)
        for r in con.execute(
            f"{_sql_gram_hashes(3, with_pos=True)} SELECT id, pos, gh FROM gr"
        ).fetchall()
    )
    assert got == want


def test_simhash_token_cap_matches_sql_twin(spark):
    """A document past the 32767-token cap hashes the same token multiset
    in Spark and the DuckDB twin (cap counts NON-EMPTY tokens, applied as
    a clamped slice on both sides)."""
    import duckdb as _dd

    from webindex_spark.operators import dedup
    from webindex_spark.plans.crawl_queries import _sql_simhash

    long_text = " ".join(f"w{i % 97}" for i in range(33_000))
    texts = [(0, long_text), (1, "short doc here")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["id"]: r["simhash"]
        for r in dedup.simhash(docs, hash_fn=ph.phash62, nbits=62).collect()
    }
    con = _dd.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0, ?), (1, 'short doc here')) v(doc_id, text)",
        [long_text],
    )
    want = dict(con.execute(_sql_simhash()).fetchall())
    assert got == want


def test_mix32_parity_spark_vs_duckdb(spark):
    """The Murmur finalizer twin — including the 16-bit split-multiply
    edges (0, 1, all-ones, high-bit-only) and hashed real strings."""
    xs = [0, 1, 0xFFFF, 0x10000, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF,
          0xDEADBEEF, 12345]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["x"]: r["m"] for r in df.select(
        "x", ph.mix32(F.col("x")).alias("m")).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"(CAST({x} AS BIGINT))" for x in xs)
    sql = f"SELECT x, {ph.sql_mix32('x')} AS m FROM (VALUES {vals}) t(x)"
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
    for v in got.values():
        assert 0 <= v < (1 << 32)
    # avalanche sanity: distinct inputs stay distinct here and spread
    assert len(set(got.values())) == len(xs)
