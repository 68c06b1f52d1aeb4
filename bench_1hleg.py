"""A/B the 1h reaggregation leg: clustered single-exchange (current,
exchanges all 22.3M finer rows) vs classic partial-agg two-exchange
(partial combine shrinks the exchange to ~13M rows, but the sink pays
its own clustering exchange). Guide §2.3 'aggregate before you
shuffle' vs §2.4 'share one exchange' -- measured, not guessed."""

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
    from prom_tsdb_copyer_spark.operators.rollup import reaggregate, rollup
    from prom_tsdb_copyer_spark.session import get_spark
    from prom_tsdb_copyer_spark.sources.tables import time_extent, write_tier

    spark = get_spark(app_name="leg1h", cores=CPUS,
                      shuffle_partitions=max(2 * CPUS, 8))
    t = spark.read.parquet(BENCH_INPUT)
    hint = time_extent(t, "ts")
    n_parts = 64
    chunk = max((hint[1] - hint[0] + 1) // (8 * n_parts), 1)
    cl = (hint[0], chunk, n_parts)
    # materialize the 1m tier once as the shared input
    p1m = "/tmp/bx_leg1h_1m"
    if not os.path.isdir(p1m):
        write_tier(rollup(t, SERIES, "value", "1m", cluster=cl), p1m,
                   range_hint=hint, pre_clustered=True, sort_labels=SERIES)
    prev = spark.read.parquet(p1m).drop("part_day")
    p1h = "/tmp/bx_leg1h_1h"

    def run(label, tier_df, pre_clustered):
        runs = []
        for _ in range(3):
            shutil.rmtree(p1h, ignore_errors=True)
            t0 = time.monotonic()
            write_tier(tier_df, p1h, range_hint=hint,
                       pre_clustered=pre_clustered, sort_labels=SERIES)
            runs.append(time.monotonic() - t0)
        print(f"{label}: min={min(runs):.2f} "
              f"runs={[round(x, 2) for x in runs]}", flush=True)

    clustered = reaggregate(prev, SERIES, "1h", cluster=cl)
    classic = reaggregate(prev, SERIES, "1h")
    run("clustered(current)", clustered, True)
    run("classic_partial_agg", classic, False)
    run("clustered_again", clustered, True)
    spark.stop()


if __name__ == "__main__":
    main()
