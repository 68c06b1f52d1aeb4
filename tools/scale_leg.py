"""~10x scale leg for the bench record (VERDICT r7 #6): run the full
1m/1h/1d cascade over a ~220M-row synthetic transcripts table (sf~1,
10x the per-round bench input) and one cold dedup key at 10x its bench
corpus, recording wall times, throughput, loadavg contention fields,
and the Spark-measured memory/spill counters the judge asked for.

Input generation is CHUNKED (ten 22M-row chunks, disjoint
conv-id namespaces, seeds 42..51): a single 220M-row pandas frame
would not fit the generator's memory budget; chunking keeps the
per-chunk peak identical to the proven sf0.1 path while the resulting
table is one directory of ~890 zstd files.

Usage:  python tools/scale_leg.py  [--chunks N] [--convs-per-chunk N]
Emits one JSON line; paste/record into BENCH.md ("Scale leg" section).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_DIR = "/tmp/scale10x_transcripts"
OUT_DIR = "/tmp/scale10x_tiers"


def ensure_input(chunks: int, convs: int) -> int:
    from prom_tsdb_copyer_spark.datagen import write_bench_parquet

    marker = os.path.join(INPUT_DIR, f"_ROWS_{chunks}_{convs}")
    if os.path.exists(marker):
        return int(open(marker).read())
    if os.path.isdir(INPUT_DIR):
        shutil.rmtree(INPUT_DIR)
    total = 0
    for i in range(chunks):
        t0 = time.monotonic()
        total += write_bench_parquet(
            INPUT_DIR, convs, seed=42 + i,
            conv_prefix=f"c{i:02d}", file_prefix=f"chunk{i:02d}",
        )
        print(f"chunk {i}: {total} rows so far "
              f"({time.monotonic() - t0:.0f}s)", file=sys.stderr)
    with open(marker, "w") as f:
        f.write(str(total))
    return total


def executor_metrics(spark) -> dict:
    """Memory/spill counters from the local app's REST API (the
    observations VERDICT r7 #6 asks for): total shuffle bytes,
    memory/disk spill, and peak execution memory across stages."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        gb = 1024 ** 3
        return {
            "stages": len(stages),
            "shuffle_write_gb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / gb, 2
            ),
            "memory_spill_gb": round(
                sum(s.get("memoryBytesSpilled", 0) for s in stages) / gb, 2
            ),
            "disk_spill_gb": round(
                sum(s.get("diskBytesSpilled", 0) for s in stages) / gb, 2
            ),
            "peak_execution_memory_gb": round(
                max(
                    (s.get("peakExecutionMemory", 0) for s in stages),
                    default=0,
                ) / gb, 2
            ),
            "input_gb": round(
                sum(s.get("inputBytes", 0) for s in stages) / gb, 2
            ),
        }
    except Exception as e:  # REST UI off -> record why, not nothing
        return {"error": str(e)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--convs-per-chunk", type=int, default=48000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    n_rows = ensure_input(args.chunks, args.convs_per_chunk)
    print(f"input ready: {n_rows} rows", file=sys.stderr)

    from prom_tsdb_copyer_spark.plans.copy_job import (
        CopyJob,
        run_and_write_rollups,
    )
    from prom_tsdb_copyer_spark.session import get_spark

    spark = get_spark(
        app_name="scale-leg", cores=args.cpus,
        shuffle_partitions=max(2 * args.cpus, 8),
        # the session normally disables the UI; the REST stage API is
        # this script's spill/memory evidence source, so turn it on
        extra_conf={"spark.ui.enabled": "true"},
    )
    transcripts = spark.read.parquet(INPUT_DIR)
    rec: dict = {
        "metric": "scale_leg_10x",
        "rows": n_rows,
        "cpus": args.cpus,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    t0 = time.monotonic()
    run_and_write_rollups(
        spark, transcripts, CopyJob(), OUT_DIR, collect_counts=False
    )
    cold = time.monotonic() - t0
    rec["cascade_cold_sec"] = round(cold, 1)
    rec["cascade_cold_rows_per_sec"] = round(n_rows / cold, 1)
    rec["loadavg_after_cold"] = [round(x, 2) for x in os.getloadavg()]

    # one warm pass (fresh target outside the timer, the bench.py rule)
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    t0 = time.monotonic()
    run_and_write_rollups(
        spark, transcripts, CopyJob(), OUT_DIR, collect_counts=False
    )
    warm = time.monotonic() - t0
    rec["cascade_warm_sec"] = round(warm, 1)
    rec["cascade_warm_rows_per_sec"] = round(n_rows / warm, 1)
    rec["cascade_metrics"] = executor_metrics(spark)

    # one COLD dedup key at 10x its bench corpus: MinHash-LSH near-dup
    # pairs over 10x the sf0.1 documents (each copy id-offset and
    # suffix-tagged so planted near-dup structure repeats per copy
    # instead of collapsing into exact cross-copy dups)
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_base = base.count()
    docs10 = None
    for i in range(10):
        part = base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
        )
        docs10 = part if docs10 is None else docs10.unionByName(part)
    docs10 = docs10.persist()
    rec["dedup_docs"] = docs10.count()
    assert rec["dedup_docs"] == 10 * n_base

    from prom_tsdb_copyer_spark.operators.dedup import minhash_dedup_pairs

    reg: list = []
    t0 = time.monotonic()
    pairs = minhash_dedup_pairs(docs10, threshold=0.5, cache_registry=reg)
    rec["minhash_pairs"] = pairs.count()
    rec["minhash_lsh_pairs_cold_sec"] = round(time.monotonic() - t0, 1)
    rec["dedup_metrics"] = executor_metrics(spark)
    rec["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    for c in reg:
        c.unpersist()
    docs10.unpersist()
    spark.stop()
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
