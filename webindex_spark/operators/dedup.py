"""Deduplication stack for training-data pipelines.

Four tiers, all expressed Spark-first (single-shuffle aggregates, JVM-side
hashing, no Python in the hot path):

  * **exact**      — content-hash groupBy (md5), representative = min id;
  * **minhash+LSH**— word-shingle -> xxhash64 -> k min-aggregates (the
    signature is k ``min()`` aggregations over one shuffle, not a UDF),
    banded into b buckets; same-bucket pairs are near-dup candidates;
    candidates are verified with TRUE n-gram Jaccard via a shingle join;
  * **simhash**    — 64-bit sign-of-weighted-sum fingerprint, computed as
    64 conditional sums in one aggregate; hamming-close pairs are dups;
  * **ngram-jaccard** — the exact verifier, also usable standalone.

Scale notes: every tier is one or two hash-partitioned shuffles keyed by
doc_id or band bucket; LSH banding bounds the candidate-pair explosion the
way it does in production dedup (the all-pairs O(n²) verify only ever runs
inside a bucket).  Hot buckets (boilerplate shingles) are bounded by
``max_bucket`` — buckets above it are dropped and logged, the standard
spam-cluster guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# deterministic Carter-Wegman-ish mixers for the k minhash functions
_P = (1 << 61) - 1


def _mix_consts(k: int, seed: int = 7):
    a, out = seed, []
    for _ in range(k):
        a = (a * 6364136223846793005 + 1442695040888963407) % _P
        b = (a * 2862933555777941757 + 3037000493) % _P
        out.append((a | 1, b))
    return out


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, keep_doc_id, n_copies) — the hash-groupBy tier."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3, token_hash_fn=None, compose_fn=None) -> DataFrame:
    """(id, shingle_hash) distinct word n-gram shingles, hashed JVM-side.

    Built on the explode+lead per-token-hash stream
    (textstats.exploded_ngram_hashes): each token is hashed once and the
    gram hash is composed from the n token hashes — O(chars) total char
    work instead of the O(chars × n) a per-gram string hash costs.
    Defaults are xxhash64 token hashes composed with xxhash64
    (production); the oracle-checked query surface passes the
    engine-portable ``phash62``/``compose62`` pair so DuckDB can
    recompute the pipeline (functions/portable_hash.py).
    """
    from webindex_spark.operators.textstats import exploded_ngram_hashes

    return (
        exploded_ngram_hashes(docs, id_col, text_col, n, token_hash_fn, compose_fn)
        .select("id", F.col("gh").alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, k: int = 32) -> DataFrame:
    """(id, mh_0..mh_{k-1}): k universal-hash minima in ONE aggregate.

    Arithmetic stays within int64 (ANSI mode): the shingle hash is folded
    to 31 bits and the multipliers to 31 bits, so a*h+b < 2^63.
    """
    h31 = F.pmod(F.col("shingle_hash"), F.lit(1 << 31))
    aggs = []
    for i, (a, b) in enumerate(_mix_consts(k)):
        a31, b61 = (a % (1 << 31)) | 1, b % _P
        aggs.append(
            F.min(F.pmod(F.lit(a31) * h31 + F.lit(b61), F.lit(_P))).alias(f"mh_{i}")
        )
    return sh.groupBy("id").agg(*aggs)


def lsh_candidates(
    sig: DataFrame, k: int = 32, bands: int = 8, max_bucket: int = 50,
    bucket_fn=None,
) -> DataFrame:
    """Same-band-bucket pairs (id_a < id_b). rows-per-band = k // bands.

    ``bucket_fn(cols) -> Column`` folds a band's r signature columns into
    the bucket key; defaults to ``xxhash64`` (portable alternative:
    portable_hash.fold31)."""
    bucket_fn = bucket_fn or (lambda cols: F.xxhash64(*cols))
    r = k // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * r + j}") for j in range(r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), bucket_fn(cols).alias("bucket"))
        )
    exploded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # ONE shuffle total: collect each (band, bucket)'s member ids, apply
    # the spam-cluster guard (boilerplate-shingle buckets bigger than
    # max_bucket are dropped whole — identical semantics to an anti-join
    # against a hot-key census, minus that plan's extra checkpoint +
    # census aggregation + broadcast + self-join stages), then expand the
    # ≤ max_bucket² in-bucket pairs JVM-side with indexed transforms over
    # the sorted id array (sortedness gives id_a < id_b for free).
    buckets = (
        exploded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, threshold: float = 0.7,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """TRUE Jaccard over shingle sets for candidate pairs.

    |A∩B| via a (pair ⋈ shingles) double join keyed by shingle_hash;
    |A∪B| = |A|+|B|-|A∩B|.  Only candidate pairs pay this cost.
    (A broadcast-semi slice of ``sh`` down to candidate ids measured
    SLOWER at bench scale — the extra materialization + broadcast jobs
    outweigh shuffling the corpus' 8-byte shingle rows; at corpus sizes
    where that flips, slice before calling.)

    ``sizes`` (id, sz) overrides the per-id set-size aggregate when the
    caller already has it (minhash_dedup's one-groupBy plan)."""
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), "shingle_hash"),
            ["id_b", "shingle_hash"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, k: int = 32, bands: int = 8, threshold: float = 0.7,
    token_hash_fn=None, compose_fn=None, bucket_fn=None,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash -> LSH -> verify.

    ONE corpus-sized shuffle total: the exploded gram hashes go through
    a single ``groupBy(id).collect_set`` whose array output feeds all
    three consumers — the k minima (array-transform minima, no second
    groupBy), the set sizes (``F.size``, no third groupBy), and the
    verify-stage shingle rows (re-explode, a narrow op).  The previous
    plan shuffled the ~50-shingles-per-doc corpus three times (distinct,
    signature agg, size agg); results are identical because
    collect_set ≡ distinct per id and the minima are order-free."""
    from webindex_spark.operators.textstats import exploded_ngram_hashes

    gr = exploded_ngram_hashes(docs, id_col, text_col, n, token_hash_fn, compose_fn)
    sets = gr.groupBy("id").agg(F.collect_set("gh").alias("ghs")).cache()
    def _mix(a: int, b: int):
        a31, b61 = (a % (1 << 31)) | 1, b % _P
        return lambda h: F.pmod(
            F.lit(a31) * F.pmod(h, F.lit(1 << 31)) + F.lit(b61), F.lit(_P)
        )

    sig = sets.select(
        "id",
        *[
            F.array_min(F.transform(F.col("ghs"), _mix(a, b))).alias(f"mh_{i}")
            for i, (a, b) in enumerate(_mix_consts(k))
        ],
    )
    cand = lsh_candidates(sig, k, bands, bucket_fn=bucket_fn)
    sh = sets.select("id", F.explode("ghs").alias("shingle_hash"))
    sizes = sets.select("id", F.size("ghs").cast("long").alias("sz"))
    return jaccard_verify(cand, sh, threshold, sizes=sizes)


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    hash_fn=None, nbits: int = 64, max_tokens: int = 32767,
) -> DataFrame:
    """(id, simhash): nbits-wide token-weighted sign fingerprint.

    bit_i(doc) = sign( Σ_tokens (2*((hash(token)>>i)&1) - 1) ), equivalently
    bit_i = [2*c_i > n] with c_i = #tokens whose hash has bit i set.

    The aggregation is **lane-packed**: a naive form sums nbits separate ±1
    columns, making every partial-aggregate shuffle row nbits×8 B wide
    (512 B at nbits=64 — the dominant cost of this operator at scale).
    Here each aggregate long packs FOUR per-bit set-counts in 15-bit lanes
    (shifts 0/15/30/45), cutting the shuffle row width 4×.  Lane safety:
    counts are bounded by ``max_tokens`` (docs are truncated to their
    first 32767 NON-EMPTY tokens — the standard long-document cap), so a
    lane never carries (c_i ≤ 0x7FFF) and the running sum stays < 2^61
    (ANSI-safe).  ``max_tokens=None`` disables the cap (then the caller
    owns lane-overflow safety for >32767-token documents).

    ``hash_fn``/``nbits`` default to xxhash64/64 (production).  The
    oracle-checked query passes the portable 62-bit polynomial hash
    (functions/portable_hash.phash62) with nbits=62 so DuckDB recomputes
    the identical fingerprints.
    """
    hash_fn = hash_fn or F.xxhash64
    # empty tokens are dropped BEFORE the cap counts positions, and the
    # cap is a slice on the filtered array (pre-explode — fewer rows out
    # of the generator), so the SQL oracle twin can mirror it exactly as
    # list_filter(...)[1:max_tokens] (crawl_queries._sql_simhash)
    toks_ne = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    capped = F.slice(toks_ne, 1, max_tokens) if max_tokens else toks_ne
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(capped).alias("tok")
    ).select("id", hash_fn(F.col("tok")).alias("h"))
    lanes = 4
    n_longs = (nbits + lanes - 1) // lanes
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(n_longs):
        n_live = min(lanes, nbits - j * lanes)
        # nibble -> packed-lane contribution lookup: ONE shift+mask+
        # element_at per token per agg column instead of 4 bit extractions
        # (the per-bit expression tree was measured slower than the row
        # width it saved at small scale; the LUT wins on both axes)
        lut = [
            sum(((n >> lane) & 1) << (15 * lane) for lane in range(n_live))
            for n in range(16)
        ]
        nib = F.shiftright(F.col("h"), j * lanes).bitwiseAND(F.lit(15))
        contrib = F.element_at(
            F.array(*[F.lit(v).cast("long") for v in lut]), nib.cast("int") + 1
        )
        aggs.append(F.sum(contrib).alias(f"c_{j}"))
    sums = toks.groupBy("id").agg(*aggs)
    # Unpack lanes -> sign bits -> packed signature with ONE small
    # higher-order fold over bit positions.  An unrolled 62/64-term
    # expression chain was measured ~1.5 s SLOWER per query at sf0.1 —
    # all optimizer+codegen time on a ~1000-node tree — while this runs
    # on already-grouped rows (one per doc), where interpreted HOF eval
    # is microseconds.  2^i via pow() is exact (powers of two).
    cs = F.array(*[F.col(f"c_{j}") for j in range(n_longs)])
    top = min(nbits, 63)  # bit 63 (sign) handled outside the fold
    def _lane_count(i):
        # shift amount must be a literal: branch over the 4 lane shifts
        c_j = F.element_at(cs, (i / lanes).cast("int") + 1)
        lane = F.pmod(i, F.lit(lanes))
        out = F.shiftrightunsigned(c_j, 0)
        for ln in range(1, lanes):
            out = F.when(lane == ln, F.shiftrightunsigned(c_j, 15 * ln)).otherwise(out)
        return out.bitwiseAND(F.lit(0x7FFF))

    body = F.aggregate(
        F.sequence(F.lit(0), F.lit(top - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            _lane_count(i) * 2 > F.col("n"),
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    if nbits == 64:
        c63 = F.shiftrightunsigned(F.col(f"c_{63 // lanes}"), 15 * (63 % lanes)).bitwiseAND(F.lit(0x7FFF))
        body = body + F.when(
            c63 * 2 > F.col("n"), F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", body.alias("simhash"))


def _block_chunks(sig: DataFrame, blocks: int) -> DataFrame:
    """(id, simhash, blk, chunk): the signature split into ``blocks``
    64/blocks-bit chunks (the block-trick key table)."""
    width = 64 // blocks
    return sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
            )
            for b in range(blocks)
        ])).alias("c"),
    ).select("id", "simhash", F.col("c.blk").alias("blk"), F.col("c.chunk").alias("chunk"))


def dropped_block_buckets(
    sig: DataFrame, blocks: int = 4, max_bucket: int = 200
) -> DataFrame:
    """(blk, chunk, n) census of the buckets ``simhash_near_pairs`` DROPS
    under its hot-bucket guard — the observability hook for logging what
    the guard cut (count/collect this delta-sized frame and log it next
    to the near-pair job; the skew test asserts it is exactly the
    boilerplate cluster and nothing else)."""
    return (
        _block_chunks(sig, blocks)
        .groupBy("blk", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
    )


def simhash_near_pairs(
    sig: DataFrame, max_hamming: int = 3, blocks: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Hamming-close pairs via the block trick: split 64 bits into
    ``blocks`` chunks; any pair within ``max_hamming < blocks`` shares at
    least one exact chunk -> bucket by chunk value, verify full distance.

    **Hot-bucket guard** (``max_bucket``, on by default): a (blk, chunk)
    bucket holding n members contributes n(n-1)/2 candidate pairs, and a
    boilerplate-heavy corpus (exactly what web crawl text and
    near-duplicate image sets look like at 100 TB) piles thousands of
    ids onto one 16-bit chunk value — an unguarded self-join emits
    millions of pairs per hot bucket before the bit_count verify.
    Buckets larger than ``max_bucket`` are dropped whole, the same
    spam-cluster guard ``lsh_candidates`` applies; use
    ``dropped_block_buckets`` to log what was cut.  Dropping trades
    recall inside mega-clusters for a hard ≤ max_bucket²/2 pair bound
    per bucket (a pair is only lost when ALL ``blocks`` of its shared
    chunks are hot, and members of a dropped boilerplate cluster are
    found by the exact tier anyway).

    Physically ONE corpus shuffle: groupBy (blk, chunk) collects each
    bucket's (id, simhash) members sorted by id, the guard filters on
    array size, and the ≤ max_bucket² in-bucket pairs expand JVM-side
    with indexed transforms (sortedness gives id_a < id_b for free) —
    the previous self-join shape paid a second exchange plus an eager
    checkpoint of the chunk table.
    """
    chunks = _block_chunks(sig, blocks)
    buckets = (
        chunks.groupBy("blk", "chunk")
        .agg(F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    ms = F.col("ms")
    combos = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms) - i - 1),
                lambda y: F.struct(
                    x["id"].alias("id_a"), y["id"].alias("id_b"),
                    x["simhash"].alias("h_a"), y["simhash"].alias("h_b"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b", "p.h_a", "p.h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
