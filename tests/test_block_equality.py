"""Block-equality invariant (FIXTURES.md §3.4; reference copyer.go:58-171
+ compact.go:26-45): the same input copied with different query-duration
splits yields identical tier points; re-running a range is idempotent.
"""

from __future__ import annotations

import pandas as pd

from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.operators.windows import DAY_MS, HOUR_MS
from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_rollups, sliced_rollup
from prom_tsdb_copyer_spark.sources.tables import time_extent

SERIES = ["conv_id", "role", "tool"]
KEY = SERIES + ["bucket_ms"]


def _canon(df):
    return (
        df.toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def test_slicing_granularity_invisible(spark, transcripts):
    """2h slices vs 24h slices vs no slicing -> identical 1m tier points
    (the invariant that makes the reference's compaction a semantic
    no-op)."""
    lo, hi = time_extent(transcripts)
    job = CopyJob()
    direct = rollup(transcripts, SERIES, "value", "1m")
    via_2h = sliced_rollup(transcripts, job, "1m", 2 * HOUR_MS, lo, hi)
    via_24h = sliced_rollup(transcripts, job, "1m", DAY_MS, lo, hi)
    d, s2, s24 = _canon(direct), _canon(via_2h), _canon(via_24h)
    pd.testing.assert_frame_equal(d, s2, check_dtype=False)
    pd.testing.assert_frame_equal(d, s24, check_dtype=False)


def test_unaligned_range_slices_split_buckets_still_merge(spark, transcripts):
    """Slice boundaries that split a 1h bucket mid-way: partials must
    re-merge exactly (compaction merge, M2)."""
    lo, hi = time_extent(transcripts)
    job = CopyJob()
    # 45-minute slices do NOT divide 1h buckets -> forced partial rows
    via_45m = sliced_rollup(transcripts, job, "1h", 45 * 60 * 1000, lo, hi)
    direct = rollup(transcripts, SERIES, "value", "1h")
    pd.testing.assert_frame_equal(
        _canon(direct), _canon(via_45m), check_dtype=False
    )


def test_rerun_idempotent(spark, transcripts):
    """Copying the same range twice produces the same rows (deterministic
    recompute -- the reference's re-copy model, SURVEY.md §2.9)."""
    job = CopyJob(matchers=("role=~(user|assistant)",))
    a = _canon(run_rollups(transcripts, job)["1m"])
    b = _canon(run_rollups(transcripts, job)["1m"])
    pd.testing.assert_frame_equal(a, b)
