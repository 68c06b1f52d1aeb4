"""Session-config A/B for the r9 round (guide §1.2 step 3): join
strategy preference and Arrow batch size, measured on the bench's own
shapes. Not part of the driver contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_INPUT = "/tmp/bench_transcripts_c48000_s42_f250k"
SERIES = ["conv_id", "role", "tool"]


def run_case(extra_conf, which):
    """Fresh JVM per config (subprocess) -- configs like codegen and
    join planning are session-wide."""
    import json
    import subprocess

    env = dict(os.environ, CONF_JSON=json.dumps(extra_conf), WHICH=which)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, capture_output=True, text=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    print(f"{which} {extra_conf}: {line[-1] if line else out.stderr[-500:]}",
          flush=True)


def child():
    import json

    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.session import get_spark

    conf = json.loads(os.environ["CONF_JSON"])
    which = os.environ["WHICH"]
    spark = get_spark(app_name="confopts", cores=CPUS,
                      shuffle_partitions=max(2 * CPUS, 8),
                      extra_conf=conf)
    t = spark.read.parquet(BENCH_INPUT)
    if which == "binop":
        from prom_tsdb_copyer_spark.operators.binop import vector_binop
        from prom_tsdb_copyer_spark.operators.rollup import rollup

        th = rollup(t, SERIES, "value", "1h")
        sums = th.select(*SERIES, "bucket_ms",
                         F.col("sum_val").alias("value"))
        cnts = th.select(*SERIES, "bucket_ms",
                         F.col("cnt").cast("double").alias("value"))
        ratio = vector_binop(sums, cnts, "/", SERIES)
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            ratio.count()
            runs.append(time.monotonic() - t0)
        plan = ratio._jdf.queryExecution().executedPlan().toString()
        print(f"RESULT min={min(runs):.2f} runs={[round(x,2) for x in runs]} "
              f"smj={plan.count('SortMergeJoin')} "
              f"shj={plan.count('ShuffledHashJoin')}")
    elif which == "gorilla":
        from prom_tsdb_copyer_spark.functions.gorilla import encode_tier_chunks

        enc = encode_tier_chunks(t, SERIES, "1h")
        enc.count()
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            enc.count()
            runs.append(time.monotonic() - t0)
        print(f"RESULT min={min(runs):.2f} runs={[round(x,2) for x in runs]}")
    spark.stop()


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        run_case({}, "binop")
        run_case({"spark.sql.join.preferSortMergeJoin": "false"}, "binop")
        run_case({
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "256m",
        }, "binop")
        run_case({}, "gorilla")
        run_case({"spark.sql.execution.arrow.maxRecordsPerBatch": "131072"},
                 "gorilla")
        run_case({"spark.sql.execution.arrow.maxRecordsPerBatch": "32768"},
                 "gorilla")
