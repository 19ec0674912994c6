"""Training-data curation operators: benchmark decontamination, PII
scrubbing, deterministic stratified sampling, and concat-then-chunk
sequence packing over a distributed prefix sum.

These are the corpus-curation steps a pretraining pipeline runs after
dedup (operators/dedup.py, components.py) and quality scoring
(operators/textstats.py):

 - :func:`decontaminate` — flag corpus documents that share winnowing
   fingerprints with a benchmark/eval set (train-test contamination);
 - :func:`pii_scrub` — count + redact PII spans (email/IPv4/SSN shapes)
   with engine-portable regexes, pure JVM ``regexp_replace``;
 - :func:`hash_stratified_sample` — per-stratum Bernoulli sampling
   keyed on a deterministic portable hash: ZERO shuffle, reproducible
   across runs, engines, and reshardings (no ``rand()``);
 - :func:`distributed_cumsum` / :func:`seq_pack` — a global prefix sum
   computed in two balanced phases (never a single-task global window),
   then GPT-style concat-then-chunk packing: every document mapped to
   (seq_id, offset) in a stream of fixed ``budget``-token sequences.

Reference parity: the reference engine (astralway/webindex) has no
training-data lane; these operators extend SURVEY.md §2's corpus stack
per the brief's training-pipeline axis.  All four are oracle-gated in
plans/crawl_queries.py (decontaminate / pii_scrub / strat_sample /
seq_pack) with DuckDB twins replaying the same hashes and regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from webindex_spark.functions import portable_hash as ph
from webindex_spark.operators.textstats import fingerprint_rows

# ----------------------------------------------------------- decontamination


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    token_hash_fn=None,
    compose_fn=None,
) -> DataFrame:
    """Train-test contamination check: corpus documents sharing >=
    ``min_shared`` winnowing fingerprints with any benchmark document.

    Both sides run the same MOSS-style winnowing pipeline
    (textstats.fingerprint_rows: k-gram rolling hashes -> windowed min
    -> distinct), then join on the fingerprint value.  Returns
    (id_col, bench_id_col, shared_fp) — one row per contaminated
    (corpus doc, benchmark doc) pair with the shared-fingerprint count.

    Scale posture (100 TB corpus vs MB-scale eval suites): the
    benchmark fingerprint table is tiny and BROADCAST, so the corpus
    side streams through tokenize/hash/winnow exactly once with no
    corpus-sized join shuffle; the only corpus shuffle is the per-doc
    winnowing window (partitioned by doc id, balanced).  The final
    groupBy is on contaminated pairs only — a vanishing fraction.
    """
    fp_c = fingerprint_rows(
        corpus, id_col, text_col, k, window, token_hash_fn, compose_fn
    )
    fp_b = fingerprint_rows(
        bench, id_col, text_col, k, window, token_hash_fn, compose_fn
    ).select(F.col(id_col).alias(bench_id_col), "fingerprint")
    hits = (
        fp_c.join(F.broadcast(fp_b), "fingerprint")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("shared_fp"))
    )
    return hits.where(F.col("shared_fp") >= min_shared)


# ----------------------------------------------------------------- PII scrub

# Engine-portable PII shapes: bounded quantifiers, no alternation
# ambiguity, so Java regex (leftmost-first, Spark) and RE2
# (leftmost-longest, DuckDB) find the identical spans.  \b is supported
# with the same semantics in both.  These are SHAPE detectors (the
# standard scrubbing pass of a web-corpus pipeline), not validators.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Count and redact PII spans, returning
    ``(id, n_<name>..., scrubbed)``.

    Patterns apply IN ORDER, each counting matches on the text as
    already scrubbed by the previous patterns (so an IPv4-looking run
    inside an already-redacted email is not double-counted) and
    replacing every match with ``<name>``.  Pure built-in
    ``regexp_extract_all`` / ``regexp_replace`` — JVM codegen, no UDF,
    no shuffle: this is a map-only pass that scales embarrassingly.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, f"<{name}>")
    return docs.select(F.col(id_col), *counts, cur.alias("scrubbed"))


# --------------------------------------------------- deterministic sampling


def hash_stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    denom: int = 10_000,
) -> DataFrame:
    """Per-stratum Bernoulli sampling keyed on a deterministic hash of
    the document id: keep iff ``phash62(id) mod denom < rate * denom``.

    Unlike ``df.sample()`` (seeded per-partition RNG — resharding or
    task retry changes the sample), the verdict for a document depends
    only on its id, so the sample is reproducible across runs, stable
    under repartitioning, and REPLAYABLE BY THE ORACLE.  It is also a
    pure filter: zero shuffle, predicate evaluated at the scan —
    exactly what per-language mixture weighting needs at 100 TB.

    Returns (id_col, stratum_col, sample_key) for kept rows;
    ``sample_key`` is the hash bucket in [0, denom) so downstream can
    sub-sample further without rehashing.  Strata missing from
    ``rates`` use ``default_rate``.
    """
    key = F.pmod(ph.phash62(F.col(id_col).cast("string")), F.lit(denom))
    thr: Column = F.lit(int(round(default_rate * denom)))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(rate * denom)))
        ).otherwise(thr)
    return (
        docs.select(
            F.col(id_col), F.col(stratum_col), key.alias("sample_key"), thr.alias("__thr")
        )
        .where(F.col("sample_key") < F.col("__thr"))
        .drop("__thr")
    )


def priority_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    ``k`` items per stratum with the smallest *priority*
    ``phash62(id) // weight`` (integer division — the fixed-point form
    of priority sampling's ``u/w``: a uniform key scaled down by the
    weight, so heavier items win proportionally more often).

    Like :func:`hash_stratified_sample` this replaces RNG state with a
    content-keyed hash — reproducible across runs/retries/explains and
    replayable by the oracle — but selects an exact per-stratum COUNT
    with weight-proportional inclusion instead of a Bernoulli rate.
    Integer-only arithmetic: no float pow/log, so both engines compute
    bit-identical priorities.

    Plan: one shuffle (the per-stratum window); the rank filter
    compiles to WindowGroupLimit, so each partition keeps only its
    running top-k instead of materializing the full stratum.  Weights
    must be ≥ 1 (clamped).
    """
    from pyspark.sql import Window

    keyed = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        F.col(weight_col).cast("long").alias("weight"),
        ph.phash62(F.col(id_col).cast("string")).alias("__h"),
        F.greatest(F.col(weight_col).cast("long"), F.lit(1)).alias("__w"),
    ).withColumn(
        # `div` = exact int64 division (floor(__h / __w) via double would
        # misround: 62-bit numerators overflow the 53-bit mantissa)
        "priority", F.expr("__h div __w")
    )
    w = Window.partitionBy(stratum_col).orderBy("priority", id_col)
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, stratum_col, "weight", "priority")
    )


# ------------------------------------------- prefix sum + sequence packing


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global INCLUSIVE prefix sum of ``value_col`` in ``order_col``
    order, without ever shipping the whole table through one task.

    A plain ``sum().over(Window.orderBy(order_col))`` puts the entire
    input in a single unpartitioned window task — the classic global-
    window scale trap.  This is the standard two-phase decomposition:

      1. ``repartitionByRange(order_col)`` — balanced, order-aligned
         partitions; stamp each row with its physical partition id;
      2. per-partition running sums (window keyed by that pid — each
         window group IS one balanced range partition, so parallelism
         equals the partition count);
      3. per-partition totals — #partitions rows, a tiny aggregate —
         prefix-summed into exclusive offsets (the only global window,
         over #partitions rows) and BROADCAST back.

    ``order_col`` values must be unique (ties would make "prefix"
    ill-defined; with RANGE window frames both Spark and ANSI SQL give
    tied rows equal cumsums, which seq_pack's exclusive-start
    subtraction would misread).  The ranged exchange is materialized
    with ``localCheckpoint`` so phases 2 and 3 read one consistent pid
    assignment instead of recomputing the range sampler per branch.
    """
    sess = df.sparkSession
    n = num_partitions or sess.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("__pid").orderBy(order_col)
    local = d.withColumn("__local", F.sum(F.col(value_col)).over(w_local))
    totals = d.groupBy("__pid").agg(F.sum(F.col(value_col)).alias("__tot"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def seq_pack(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-then-chunk packing: documents are concatenated
    in ``id_col`` order into one token stream that is cut into fixed
    ``budget``-token training sequences; every document is mapped to
    the sequence grid.

    Returns ``(id, n_tokens, seq_id, seq_offset, n_splits)`` where
    ``seq_id``/``seq_offset`` locate the document's first token and
    ``n_splits`` is how many sequences the document spans (0 for an
    empty document).  Token counts are whitespace tokens with empties
    dropped (swap in ``textstats.bpe_token_stats`` upstream for
    BPE-aware budgets).

    The global cumsum comes from :func:`distributed_cumsum`, so packing
    100 TB never serializes through one window task.  With a
    power-of-two ``budget`` every division below is exact in binary
    floating point, which keeps the arithmetic bit-identical across
    engines (the oracle twin replays it in SQL).
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    counts = docs.select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    cum = distributed_cumsum(
        counts, id_col, "n_tokens", out_col="__c", num_partitions=num_partitions
    )
    start = F.col("__c") - F.col("n_tokens")
    # integer `div`, never F.floor(x / budget): double division
    # misrounds past 2^53 and the cumulative token count is unbounded
    # (the priority_sample discipline).  Both numerators are
    # non-negative wherever the result is used (start >= 0 always;
    # last_seq only feeds n_splits on n_tokens > 0 rows, where
    # __c >= 1), and div == floor-div for non-negatives.
    first_seq = F.expr(f"(__c - n_tokens) div {int(budget)}L")
    last_seq = F.expr(f"(__c - 1) div {int(budget)}L")
    n_splits = F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
        last_seq - first_seq + 1
    )
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        first_seq.cast("long").alias("seq_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("seq_offset"),
        n_splits.cast("long").alias("n_splits"),
    )
