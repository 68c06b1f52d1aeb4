"""Write-option matrix for the tier sink (guide §1/§6): time the 1m
tier write leg under codec/dictionary/sort variants to decide the
sink defaults. Not part of the driver contract."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_INPUT = "/tmp/bench_transcripts_c48000_s42_f250k"
SERIES = ["conv_id", "role", "tool"]


def main():
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.rollup import rollup
    from prom_tsdb_copyer_spark.session import get_spark
    from prom_tsdb_copyer_spark.sources.tables import time_extent

    spark = get_spark(app_name="writeopts", cores=CPUS,
                      shuffle_partitions=max(2 * CPUS, 8))
    transcripts = spark.read.parquet(BENCH_INPUT)
    hint = time_extent(transcripts, "ts")
    n_parts = max(2 * spark.sparkContext.defaultParallelism, 8)
    chunk = max((hint[1] - hint[0] + 1) // (8 * n_parts), 1)
    cl = (hint[0], chunk, n_parts)
    t1m = rollup(transcripts, SERIES, "value", "1m", cluster=cl)
    out = t1m.withColumn(
        "part_day", F.to_date(F.timestamp_millis(F.col("bucket_ms")))
    )
    sort_cols = ["part_day", *SERIES, "bucket_ms"]
    path = "/tmp/bx_writeopts"

    def run(label, codec, level, dictionary, sort):
        d = out.sortWithinPartitions(*sort_cols) if sort else out
        w = (
            d.write.option("partitionOverwriteMode", "dynamic")
            .option("compression", codec)
            .option("parquet.enable.dictionary", dictionary)
        )
        if level is not None:
            w = w.option("parquet.compression.codec.zstd.level", level)
        runs = []
        for _ in range(3):
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.monotonic()
            w.partitionBy("part_day").mode("overwrite").parquet(path)
            runs.append(time.monotonic() - t0)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path) for f in fs
        )
        nf = sum(1 for dp, _, fs in os.walk(path)
                 for f in fs if f.endswith(".parquet"))
        print(f"{label}: min={min(runs):.2f} runs="
              f"{[round(x, 2) for x in runs]} bytes={size} files={nf}",
              flush=True)

    run("zstd1_nodict_sort   (current)", "zstd", "1", "false", True)
    run("snappy_nodict_sort", "snappy", None, "false", True)
    run("lz4_nodict_sort", "lz4", None, "false", True)
    run("uncompressed_nodict_sort", "none", None, "false", True)
    run("zstd1_nodict_nosort", "zstd", "1", "false", False)
    run("snappy_dict_sort", "snappy", None, "true", True)
    spark.stop()


if __name__ == "__main__":
    main()
