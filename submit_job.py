"""spark-submit entry point (north rule: `spark-submit --py-files` on a
multi-executor cluster at N and 4N executors).

    python tools/package_pyfiles.py
    spark-submit --master <cluster-master> \\
        --num-executors <N or 4N> \\
        --py-files dist/pyfiles.zip \\
        submit_job.py --source <transcripts parquet> --target <tier root> \\
        [--from ... --to ... -l MATCHER -T K=V -B 24h --tiers 1m,1h,1d]

Thin shim over the package CLI: the session builder inherits
spark.master from spark-submit (session.py), so the identical job runs
local[N] in tests and on N/4N executors unchanged -- scaling efficiency
between the two cluster sizes is the ratio of their manifest-recorded
wall times over the same input (the local[2]/local[8] evidence in
BENCH.md is the sandbox analog).
"""

from __future__ import annotations

import sys

from prom_tsdb_copyer_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
