"""spark-submit entry point for the corpus-cleaning pipeline
(prom_tsdb_copyer_spark/pipeline.py -- the LLM-data counterpart of
submit_job.py's copy tool):

    spark-submit --master <cluster> --num-executors <N or 4N> \\
        --py-files dist/pyfiles.zip \\
        pipeline_job.py --source docs.parquet --target out/ \\
        --stages scrub,line-dedup,dedup,neardup,quality \\
        [--eval-set eval.parquet] [--chunk 512:64] [--pack 1000000]
"""

from __future__ import annotations

import sys

from prom_tsdb_copyer_spark.pipeline import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
