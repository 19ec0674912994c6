"""Scaling-efficiency benchmark for the dedup lane (N vs 4N executors).

Same harness discipline as tools/bench_scaling.py (real local-cluster
executor JVMs, 2-core executors for bus headroom, interleaved level
pairs to cancel host-window drift), applied to the round-5 flagship
LLM-pipeline operator: substring dedup with cutting
(operators/linedup.window_dedup_cut under the production xxhash64).

The corpus is generated once into parquet (untimed) so every level
reads identical bytes; the timed section is tokenize → composed 8-gram
hashes → duplicate dictionary (with keeper coordinates) → broadcast
mark → in-row rebuild — one corpus shuffle plus the dictionary
aggregate, the plan whose efficiency the north rule cares about.

Usage:  python tools/bench_dedup_scaling.py [--quick|--big]
  --quick    30k docs, 1 round, 1 pass   (~3 min)
  --big      300k docs, 2 rounds, best of 2 passes (~12 min) — the
             compute-bound size: at 100k the 4N level finishes in ~7 s
             and fixed overhead (checkpoint barriers, broadcast, stage
             scheduling) still eats ~30% of the window
(no flags)   100k docs, 2 rounds, best of 2 passes

Output: one JSON summary line (consumed into BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
n_exec, n_docs, passes = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
from webindex_spark.session import get_spark
from webindex_spark.plans import bench_jobs

spark = get_spark(
    "bench-dedup-scaling",
    master=f"local-cluster[{n_exec},2,7168]",
    shuffle_partitions=48,
    extra_conf={
        "spark.local.dir": "/dev/shm/spark-bench",
        "spark.executor.memory": "6g",
        "spark.driver.memory": "8g",
    },
)
spark.sparkContext.setLogLevel("ERROR")

bench_jobs.dedup_throughput_job(spark, n_docs // 10)   # warmup (also gens)
rates = []
for _ in range(passes):
    n, dt = bench_jobs.dedup_throughput_job(spark, n_docs)
    rates.append(n / dt)
print(json.dumps({"n_exec": n_exec, "docs_per_sec": round(max(rates), 1)}))
spark.stop()
"""


def run_level(n_exec: int, n_docs: int, passes: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_exec), str(n_docs), str(passes)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"level {n_exec} executors failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


USAGE = """usage: python tools/bench_dedup_scaling.py [--quick]

Dedup-lane scaling (N vs 4N local-cluster executors, window_dedup_cut).
Flags are strict: an unknown argument exits here instead of silently
starting a long run."""


def main():
    known = {"--quick", "--big"}
    extra = [a for a in sys.argv[1:] if a not in known]
    if extra:
        print(USAGE, file=sys.stderr)
        raise SystemExit(
            0 if extra[0] in ("-h", "--help") else f"unknown argument: {extra[0]}"
        )
    quick = "--quick" in sys.argv
    n_docs = 30_000 if quick else (300_000 if "--big" in sys.argv else 100_000)
    passes = 1 if quick else 2
    rounds = 1 if quick else 2

    os.makedirs("/dev/shm/spark-bench", exist_ok=True)
    pairs = []
    for r in range(rounds):
        a = run_level(1, n_docs, passes)
        b = run_level(4, n_docs, passes)
        eff = b["docs_per_sec"] / a["docs_per_sec"] / 4
        pairs.append(
            {
                "round": r,
                "n1_docs_per_sec": a["docs_per_sec"],
                "n4_docs_per_sec": b["docs_per_sec"],
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(pairs[-1]))
    med = sorted(p["efficiency"] for p in pairs)[len(pairs) // 2]
    print(
        json.dumps(
            {
                "metric": "dedup_scaling_efficiency",
                "job": "window_dedup_cut",
                "n_docs": n_docs,
                "pairs": pairs,
                "median_efficiency": med,
            }
        )
    )


if __name__ == "__main__":
    main()
