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


def test_retention_overrides_first_match_wins(spark, transcripts):
    """Per-label retention overrides vs a pandas recompute of the same
    first-match-wins rule table: tool=search kept ~forever, role=tool
    (which INCLUDES every search row -- the shadowing that makes
    first-match-wins observable) expired harder than base, everything
    else on the base cutoff; the physical drop floor is the min
    cutoff."""
    from prom_tsdb_copyer_spark.operators.retention import (
        enforce_retention_overrides,
        min_cutoff_ms,
    )
    from prom_tsdb_copyer_spark.operators.rollup import rollup

    series = ["conv_id", "role", "tool"]
    tier = rollup(transcripts, series, "value", "1h")
    lo = tier.agg(F.min("bucket_ms")).first()[0]
    hi = tier.agg(F.max("bucket_ms")).first()[0]
    base = lo + (hi - lo) // 2
    keep_all, drop_more = lo, lo + 3 * (hi - lo) // 4
    # every tool=search row also matches role=tool: the FIRST rule must
    # win or search rows would expire at drop_more
    rules = [(["tool=search"], keep_all), (["role=tool"], drop_more)]
    got = {
        (r["conv_id"], r["role"], r["tool"], r["bucket_ms"])
        for r in enforce_retention_overrides(tier, base, rules).collect()
    }
    p = tier.toPandas()

    def cutoff(row):
        if (row["tool"] or "") == "search":
            return keep_all
        if row["role"] == "tool":
            return drop_more
        return base

    keep = p[p.apply(lambda r: r["bucket_ms"] >= cutoff(r), axis=1)]
    want = {
        (r.conv_id, r.role, r.tool, int(r.bucket_ms))
        for r in keep.itertuples()
    }
    assert got == want and got
    # all three regimes genuinely exercised:
    assert any(
        k[3] < base and k[2] == "search" for k in got
    )  # search rows below base survive (rule 1 beat rule 2)
    dropped = {
        (r.conv_id, r.role, r.tool, int(r.bucket_ms))
        for r in p.itertuples()
    } - want
    assert any(
        base <= k[3] < drop_more and k[1] == "tool" for k in dropped
    )  # non-search tool rows above base died (rule 2 applied)
    assert any(k[3] >= base and k[1] != "tool" for k in got)
    assert min_cutoff_ms(base, rules) == keep_all
