"""SparkSession factory with the engine's tuned defaults.

Scale posture (SURVEY.md §4, §7): AQE on (skew-join splitting + partition
coalescing are the runtime half of our skew story; explicit salting in
``operators.politeness`` is the other half), Arrow enabled for every pandas
UDF kernel, and shuffle parallelism sized from the environment rather than
the Spark default of 200 so local runs don't drown in empty partitions
while cluster runs can raise it via config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "webindex-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or cores
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow joins to reuse a child partitioning that hashes a SUBSET of
        # the join keys (host+salt are functions of uri in the frontier
        # pipeline): this is what lets the seen anti-join and the politeness
        # windows share ONE exchange (operators/sched_pipeline.py)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # let the planner choose shuffled-hash joins when its size checks
        # pass (guide §3.1/§9): sort-merge pays two full per-partition
        # sorts that SHJ skips, and AQE's small advisory partitions keep
        # the per-partition build side bounded.  ABAB-measured on the 20
        # join-heaviest gates at sf0.1: −7.5% total, triangles −25%
        # (BENCH/shj_sweep_r07.json).  SPARK_GRAFT_PREFER_SMJ=true
        # restores the Spark default for memory-tight clusters where a
        # build-side partition might not fit.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        # local-mode default (64m) coalesces medium shuffles down to a
        # handful of tasks, capping parallelism; 8m keeps all cores busy at
        # bench scale while still coalescing away empty partitions.  On a
        # real cluster raise this back toward 64-128m.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch Python/IPC overhead in the
        # vectorized kernels (measured: probe thrpt +2.5x going 64k->256k);
        # actual batch memory stays bounded by partition size
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if not master.startswith("local[") :
        ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship webindex_spark to executor Python workers (the local analog of
    ``spark-submit --py-files``).  Needed for any master with separate
    executor processes (local-cluster, standalone, YARN, k8s); plain
    ``local[n]`` shares the driver's sys.path."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", "webindex_spark_pkg.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path + ".tmp", "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py") or f.endswith(".dat"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "webindex_spark", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
        os.replace(zip_path + ".tmp", zip_path)
    spark.sparkContext.addPyFile(zip_path)
