"""Retention expiry (M4 analog) + file compaction (M2 physical leg).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.compaction import compact_partitions
from prom_tsdb_copyer_spark.operators.retention import (
    RetentionPolicy,
    enforce_retention_df,
    expire_partitions,
)
from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.operators.windows import DAY_MS, HOUR_MS, MINUTE_MS
from prom_tsdb_copyer_spark.sources.tables import time_extent, write_tier

SERIES = ["conv_id", "role", "tool"]


def test_retention_policy_cutoffs_align():
    pol = RetentionPolicy({"1m": 2 * DAY_MS, "1h": 7 * DAY_MS, "1d": 30 * DAY_MS})
    now = 1767225600000 + 5 * DAY_MS + 12345
    for tier, tier_ms in [("1m", MINUTE_MS), ("1h", HOUR_MS), ("1d", DAY_MS)]:
        cut = pol.cutoff_ms(tier, now)
        assert cut % tier_ms == 0
        assert now - pol.keep_ms[tier] - tier_ms < cut <= now - pol.keep_ms[tier]
    # finer tier expires sooner (north rule)
    assert pol.cutoff_ms("1m", now) > pol.cutoff_ms("1d", now)


def test_logical_and_physical_expiry(spark, transcripts, tmp_path):
    tier = rollup(transcripts, SERIES, "value", "1h")
    path = str(tmp_path / "t1h")
    write_tier(tier, path)
    lo, hi = time_extent(transcripts)
    cutoff = ((lo + 2 * DAY_MS) // DAY_MS) * DAY_MS  # drop first ~2 days

    logical = enforce_retention_df(tier, cutoff)
    assert logical.where(F.col("bucket_ms") < cutoff).count() == 0

    deleted = expire_partitions(path, cutoff)
    assert deleted, "expected at least one expired day partition"
    back = spark.read.parquet(path)
    assert back.where(F.col("bucket_ms") < cutoff).count() == 0
    # surviving rows match the logical filter exactly
    assert back.count() == logical.count()


def test_compaction_preserves_rows(spark, transcripts, tmp_path):
    # fragment on purpose: two disjoint appends -> >=2 files per day
    # (write_tier itself clusters by day, so one write = one file)
    tier = rollup(transcripts, SERIES, "value", "1m")
    path = str(tmp_path / "frag")
    write_tier(tier.where(F.col("conv_id") < "conv-00000025"), path, mode="append")
    write_tier(tier.where(F.col("conv_id") >= "conv-00000025"), path, mode="append")
    before = spark.read.parquet(path)
    n_before = before.count()
    sum_before = before.agg(F.sum("sum_val")).first()[0]

    done = compact_partitions(spark, path, target_files_per_partition=1)
    assert done, "fragmented partitions should compact"
    import glob

    for part in glob.glob(f"{path}/part_day=*"):
        assert len(glob.glob(f"{part}/*.parquet")) == 1

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert abs(after.agg(F.sum("sum_val")).first()[0] - sum_before) < 1e-6


def test_compaction_single_file_passthrough(spark, transcripts, tmp_path):
    """compact.go:29-32 quirk: single-input partitions left untouched."""
    tier = rollup(transcripts, SERIES, "value", "1d").coalesce(1)
    path = str(tmp_path / "single")
    write_tier(tier, path)
    import glob
    import os

    mtimes = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/part_day=*/*.parquet")
    }
    done = compact_partitions(spark, path)
    assert done == {}
    for f, m in mtimes.items():
        assert os.stat(f).st_mtime_ns == m  # bytes untouched


def test_compaction_crash_hygiene(spark, transcripts, tmp_path):
    """Staging/backup dirs are dot-prefixed (never match the partition
    glob) and a crash between the two renames is rolled back on the next
    pass: the backup is restored if the live partition vanished."""
    from prom_tsdb_copyer_spark.operators.compaction import compact_partitions
    from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_and_write_rollups

    root = str(tmp_path / "t")
    run_and_write_rollups(spark, transcripts, CopyJob(tiers=("1h",)), root,
                          collect_counts=False)
    tier = tmp_path / "t" / "tier=1h"
    before = spark.read.parquet(str(tier)).count()
    parts = sorted(tier.glob("part_day=*"))
    assert parts
    # simulate a crash between rename(backup) and rename(live)
    victim = parts[0]
    victim.rename(victim.with_name(".old." + victim.name))
    # stale staging from another interrupted pass
    (tier / (".compact-tmp." + parts[-1].name)).mkdir()
    # readers between the renames never see the hidden dirs as partitions
    assert spark.read.parquet(str(tier)).count() < before
    compact_partitions(spark, str(tier))
    assert spark.read.parquet(str(tier)).count() == before
    assert not list(tier.glob(".compact-tmp.*")) and not list(tier.glob(".old.*"))
