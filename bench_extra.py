"""Per-query isolation harness (guide §1.4): times individual gates with
the noop sink and captures .explain("formatted") plans, without touching
the frozen driver contract in bench.py.

Usage:
  python bench_extra.py q1 q2 ...            # warmup + timed run per gate
  python bench_extra.py --repeat 3 q1        # median of 3 timed runs
  python bench_extra.py --explain plans/r07 --suffix before q1 q2
  python bench_extra.py --all                # every non-streaming gate

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--explain", metavar="DIR", default=None,
                    help="write <dir>/<name>_<suffix>.txt formatted plans")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from webindex_spark.session import get_spark
    from webindex_spark.plans.crawl_queries import QUERIES

    spark = get_spark(
        "webindex-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    _force(spark.read.parquet(f"{sf_dir}/region.parquet"))

    names = list(QUERIES) if args.all else args.names
    out: dict[str, dict] = {}
    for name in names:
        fn, _sql = QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        if not args.no_warmup:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            _force(fn(spark, sf_dir))
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"timed:{name}#{i}")
            t0 = time.time()
            _force(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {n: v["median"] for n, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
