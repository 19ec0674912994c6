"""Benchmark jobs for the north-rule throughput metrics.

Two jobs, sized so they are compute-bound (not fixed-overhead-bound) at
local[8..32]:

  * **frontier_throughput_job** — the engine's scheduling path on a
    synthetic N-URL frontier generated *inside Spark* (``spark.range`` →
    string exprs, deterministic, no driver materialization): bloom-probe +
    exact-tier unseen filter, robots broadcast gate, salted politeness
    window.  Metric: frontier URLs scheduled/sec.
  * **image_verify_throughput_job** — decode + phash + caption check over
    N generated image rows (PNG/raw/lossy mix) via the mapInPandas
    verifier.  Metric: fetched-image rows/sec.

Both are pure functions of (n, seed-free range ids) so every run at every
parallelism level processes identical data.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from webindex_spark.operators import images as img_ops
from webindex_spark.operators import politeness, robots as robots_ops, seen as seen_ops


def synth_frontier(spark: SparkSession, n: int, n_hosts: int) -> DataFrame:
    """N candidate URLs over n_hosts hosts with a deliberate hot host:
    host 0 receives an extra 10% of all URLs (skew exercises the salted
    politeness path and AQE skew handling)."""
    r = spark.range(n)
    hot = F.col("id") % 10 == 0
    hostnum = F.when(hot, F.lit(0)).otherwise(F.col("id") % n_hosts)
    return r.select(
        F.concat(F.lit("com.h"), hostnum.cast("string"), F.lit(">>o>/p/"),
                 F.col("id").cast("string")).alias("uri"),
        F.concat(F.lit("h"), hostnum.cast("string"), F.lit(".com")).alias("host"),
        F.concat(F.lit("/p/"), F.col("id").cast("string")).alias("path"),
        (F.pmod(F.xxhash64(F.lit("prio"), F.col("id")), F.lit(10000)) / 100.0)
        .alias("priority"),
    )


def synth_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    r = spark.range(n_hosts)
    return r.select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com")).alias("host"),
        F.when(F.col("id") % 5 == 2, F.array(F.lit("/p/4"))).otherwise(
            F.array().cast("array<string>")
        ).alias("disallow"),
        (F.lit(1.0) + (F.col("id") % 3).cast("double")).alias("crawl_delay"),
    )


def frontier_throughput_job(
    spark: SparkSession, n_urls: int = 2_000_000, n_hosts: int = 50_000,
    budget: int = 20, seen_frac: int = 4,
) -> tuple[int, float]:
    """Returns (urls_scheduled, wall_seconds). Every 'seen_frac'-th URL is
    pre-seen (bloom + exact table) so both unseen-filter tiers do real work."""
    n_parts, bits, k = seen_ops.bloom_params(n_urls, 0.01, 64)
    frontier = synth_frontier(spark, n_urls, n_hosts)
    robots = synth_robots(spark, n_hosts)
    pre_seen = frontier.where(
        F.pmod(F.xxhash64(F.lit("seen"), F.col("uri")), F.lit(seen_frac)) == 0
    ).select("uri")
    bloom = seen_ops.bloom_insert(
        pre_seen, seen_ops.empty_bloom(spark, n_parts, bits), "uri", k, bits, n_parts
    )
    bloom = bloom.localCheckpoint(eager=True)         # build cost excluded
    pre_seen = pre_seen.localCheckpoint(eager=True)

    t0 = time.time()
    unseen = seen_ops.filter_unseen(
        frontier, pre_seen, bloom, "uri", k=k, bits=bits, n_partitions=n_parts
    )
    gated = robots_ops.apply_robots(unseen, robots)
    sched = politeness.schedule(
        gated.where(F.col("allowed")), budget=budget, n_salts=8
    )
    n_scheduled = sched.count()
    return n_scheduled, time.time() - t0


def _gen_images_batchwise(ids: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from webindex_spark.operators import synth

    for pdf in ids:
        out = synth.gen_images_pandas(
            [f"com.img>>o>/i/{int(i)}.png" for i in pdf["id"]], w=48, h=32
        )
        yield out


IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def image_verify_throughput_job(
    spark: SparkSession, n_images: int = 30_000, tmp_dir: str = "/tmp/webindex_bench_images"
) -> tuple[int, float]:
    """Returns (rows_verified, wall_seconds). Generation happens once into
    parquet (excluded from timing); the timed section is decode + phash +
    caption verification — the real multimodal hot path."""
    import os

    from webindex_spark.operators import synth

    data_dir = os.path.join(tmp_dir, f"data_{n_images}")
    marker = os.path.join(tmp_dir, f"_done_{n_images}")
    if not os.path.exists(marker):
        spark.range(n_images).repartition(64).mapInPandas(
            _gen_images_batchwise, schema=IMG_SCHEMA
        ).write.mode("overwrite").parquet(data_dir)
        open(marker, "w").close()
    images = spark.read.parquet(data_dir)

    t0 = time.time()
    verified = img_ops.verify_images(images, synth.image_pixels, synth.image_caption)
    n_ok = verified.where(F.col("ok")).count()
    dt = time.time() - t0
    assert n_ok == n_images, f"verification failed: {n_ok}/{n_images}"
    return n_ok, dt
