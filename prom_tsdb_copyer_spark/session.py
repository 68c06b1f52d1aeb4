"""SparkSession builders tuned for this engine.

Local mode is a stand-in for a multi-executor cluster: parallelism choices
(`local[N]`, shuffle partition count) are the sandbox analog of executor
count, which is how the N-vs-4N scaling criterion is evidenced
(BASELINE.md). All sessions pin UTC so epoch-aligned window math matches
the reference's UTC-epoch alignment (/root/reference/copyer.go:43) and the
DuckDB oracle's naive-UTC timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "prom-tsdb-copyer-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    cores=None -> local[*]. Shuffle partitions default to the core count:
    the right size for local mode (the stock 200 over-parallelizes small
    data and under-parallelizes big data; at cluster scale this knob is
    sized so one shuffle partition fits executor memory).
    """
    # under spark-submit the master arrives as the spark.master system
    # property; setting .master() here would override --master, so
    # inherit it and only default to local[N] when running standalone
    from pyspark import SparkConf

    submitted_master = SparkConf().get("spark.master", None)
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        if submitted_master and not cores_env:
            master = None  # spark-submit owns the master / executor count
            n = os.cpu_count() or 8
        else:
            master = f"local[{cores_env}]" if cores_env else "local[*]"
            n = int(cores_env) if cores_env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 4)

    # glibc returns >128KB blocks to the OS on free; on kernels with
    # expensive page faults that makes every large numpy temporary in a
    # UDF re-fault its pages (~30 MB/s observed here vs GB/s warm).
    # Keeping large blocks on the heap makes the Arrow-UDF codec path
    # ~25x faster in steady state. Python workers inherit the driver's
    # env in local mode; executorEnv covers cluster mode.
    malloc_env = {"MALLOC_MMAP_MAX_": "0", "MALLOC_TRIM_THRESHOLD_": "-1"}
    os.environ.update(malloc_env)

    builder = (
        (SparkSession.builder.master(master) if master else SparkSession.builder)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.python.worker.reuse", "true")
        # min/max/count over raw parquet columns answered from footer
        # stats (time_extent, the sink's range hint) instead of a scan
        .config("spark.sql.parquet.aggregatePushDown", "true")
        # let AQE rewrite sort-merge joins to shuffled-hash when every
        # post-shuffle partition's map output is small (guide §3.1):
        # the tier-to-tier equi-joins (vector_binop and friends) have
        # already-aggregated sides whose partitions are far below this
        # bound, and skipping both sorts measured 6.0 -> 3.9 s on the
        # 13M-row 1h ratio join (r9). SIZE-conditioned, not core-count-
        # conditioned: at any scale the rewrite only fires when a
        # partition's build side fits comfortably in task memory, and
        # partitions a cluster job sizes to ~advisory bytes stay under
        # it; env-overridable for deployments that want plain SMJ.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "256m"),
        )
    )
    for k, v in malloc_env.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
