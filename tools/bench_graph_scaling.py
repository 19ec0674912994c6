"""Scaling-efficiency benchmark for the iterative-graph lane
(N vs 4N executors, fixed-point PageRank).

Same local-cluster harness discipline as tools/bench_scaling.py /
bench_dedup_scaling.py, applied to the round-5 slow class: bounded-
round iterative graph jobs (two linear shuffles + one scalar probe per
iteration, lineage truncated per round).  PageRank is the
representative member; hits/kcore/bfs share the shape.

Usage:  python tools/bench_graph_scaling.py [--quick]
  --quick    1M edges, 1 round, 1 pass
(no flags)   5M edges, 2 rounds, best of 2 passes

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
n_exec, n_edges, passes = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
from webindex_spark.session import get_spark
from webindex_spark.plans import bench_jobs

spark = get_spark(
    "bench-graph-scaling",
    master=f"local-cluster[{n_exec},2,7168]",
    shuffle_partitions=48,
    extra_conf={
        "spark.local.dir": "/dev/shm/spark-bench",
        "spark.executor.memory": "6g",
        "spark.driver.memory": "8g",
    },
)
spark.sparkContext.setLogLevel("ERROR")

bench_jobs.pagerank_throughput_job(spark, n_edges // 10)   # warmup (also gens)
rates = []
for _ in range(passes):
    n, dt = bench_jobs.pagerank_throughput_job(spark, n_edges)
    rates.append(n / dt)
print(json.dumps({"n_exec": n_exec, "edge_iters_per_sec": round(max(rates), 1)}))
spark.stop()
"""


def run_level(n_exec: int, n_edges: int, passes: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_exec), str(n_edges), str(passes)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"level {n_exec} executors failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


USAGE = """usage: python tools/bench_graph_scaling.py [--quick]

Iterative-graph scaling (N vs 4N local-cluster executors, pagerank).
Flags are strict: an unknown argument exits here instead of silently
starting a long run."""


def main():
    known = {"--quick"}
    extra = [a for a in sys.argv[1:] if a not in known]
    if extra:
        print(USAGE, file=sys.stderr)
        raise SystemExit(
            0 if extra[0] in ("-h", "--help") else f"unknown argument: {extra[0]}"
        )
    quick = "--quick" in sys.argv
    n_edges = 1_000_000 if quick else 5_000_000
    passes = 1 if quick else 2
    rounds = 1 if quick else 2

    os.makedirs("/dev/shm/spark-bench", exist_ok=True)
    pairs = []
    for r in range(rounds):
        a = run_level(1, n_edges, passes)
        b = run_level(4, n_edges, passes)
        eff = b["edge_iters_per_sec"] / a["edge_iters_per_sec"] / 4
        pairs.append(
            {
                "round": r,
                "n1_edge_iters_per_sec": a["edge_iters_per_sec"],
                "n4_edge_iters_per_sec": b["edge_iters_per_sec"],
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(pairs[-1]))
    med = sorted(p["efficiency"] for p in pairs)[len(pairs) // 2]
    print(
        json.dumps(
            {
                "metric": "graph_scaling_efficiency",
                "job": "pagerank",
                "n_edges": n_edges,
                "pairs": pairs,
                "median_efficiency": med,
            }
        )
    )


if __name__ == "__main__":
    main()
