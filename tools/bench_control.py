"""In-window bench control (round-5 verdict ask 1).

BENCH_r04 drifted a near-uniform 1.29x vs r03 across 30/31 shared
queries — consistent with the host's documented 30-70% same-day window
variance, but unproven because no same-window control was published.
This runs, in ONE session (one window):

  1. the full timed suite TWICE back-to-back (pass_a vs pass_b — a
     stable host gives ~equal passes; a drifting one shows here);
  2. the two r4 slow suspects (minhash_pairs, simhash_near_pairs)
     INTERLEAVED with an untouched control query (uri_counts), three
     rounds each — suspect-vs-control ratios are window-free;
  3. the two bench.py throughput probes, twice each.

Usage: python tools/bench_control.py  (defaults match bench.py: sf0.1,
local[$SPARK_GRAFT_CPUS]).  Emits one JSON line; the verdict note lands
in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from bench import BENCH_SKIP, _force, run_queries  # noqa: E402
from webindex_spark.session import get_spark  # noqa: E402


def timed(fn, spark, sf_dir):
    t0 = time.time()
    _force(fn(spark, sf_dir))
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-control", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from webindex_spark.plans.crawl_queries import QUERIES

    _force(spark.read.parquet(f"{sf_dir}/region.parquet"))
    pass_a = run_queries(spark, sf_dir, warmup=True)
    pass_b = run_queries(spark, sf_dir, warmup=False)
    print(f"# pass_a total {sum(pass_a.values()):.1f}s, "
          f"pass_b total {sum(pass_b.values()):.1f}s", file=sys.stderr)

    interleaved = []
    for _ in range(3):
        row = {}
        for name in ("uri_counts", "minhash_pairs", "uri_counts",
                     "simhash_near_pairs"):
            fn = QUERIES[name][0]
            key = name
            sec = timed(fn, spark, sf_dir)
            row.setdefault(key, []).append(sec)
        interleaved.append(row)
        print(f"# interleaved: {row}", file=sys.stderr)

    from webindex_spark.plans import bench_jobs

    probes = {"frontier_urls_per_sec": [], "image_verify_rows_per_sec": []}
    bench_jobs.frontier_throughput_job(spark, 200_000, 20_000)  # warm
    bench_jobs.image_verify_throughput_job(spark, 2_000)        # warm
    for _ in range(2):
        n_urls = 4_000_000
        _, f_dt = bench_jobs.frontier_throughput_job(spark, n_urls, 50_000)
        probes["frontier_urls_per_sec"].append(round(n_urls / f_dt, 1))
        n_img, i_dt = bench_jobs.image_verify_throughput_job(spark, 40_000)
        probes["image_verify_rows_per_sec"].append(round(n_img / i_dt, 1))
    print(f"# probes: {probes}", file=sys.stderr)

    print(json.dumps({
        "metric": "bench_inwindow_control",
        "sf_dir": sf_dir, "cpus": cpus,
        "skipped": sorted(BENCH_SKIP),
        "pass_a": pass_a, "pass_b": pass_b,
        "pass_a_total": round(sum(pass_a.values()), 3),
        "pass_b_total": round(sum(pass_b.values()), 3),
        "interleaved": interleaved,
        "throughput_probes": probes,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
