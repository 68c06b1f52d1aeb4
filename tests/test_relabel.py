"""Relabel/append semantics (FIXTURES.md §3.2; reference copyer.go:99-105,
upsert per main.go:44): appended labels overwrite, and identity changes
propagate to grouping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.relabel import label_append, parse_label_pairs
from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_rollups


def test_append_new_label_on_every_series(spark, transcripts):
    out = label_append(transcripts, {"storage": "persistent"})
    assert out.where(F.col("storage") != "persistent").count() == 0
    t = rollup(out, ["conv_id", "role", "tool", "storage"], "value", "1d")
    assert t.where(F.col("storage") != "persistent").count() == 0


def test_append_overwrites_existing_key(spark, transcripts):
    """Upsert semantics: no existence check, existing label replaced."""
    out = label_append(transcripts, {"role": "merged"})
    assert out.select("role").distinct().count() == 1


def test_merge_changes_grouping_identity(spark, transcripts):
    """Overwriting `role` merges formerly-distinct series; per-bucket
    counts must equal the sum over the original role split."""
    series = ["conv_id", "role", "tool"]
    before = rollup(transcripts, series, "value", "1d")
    merged = rollup(
        label_append(transcripts, {"role": "all"}), series, "value", "1d"
    )
    sum_before = (
        before.groupBy("conv_id", "bucket_ms").agg(F.sum("cnt").alias("n"))
    )
    sum_after = merged.groupBy("conv_id", "bucket_ms").agg(F.sum("cnt").alias("n"))
    assert sum_before.exceptAll(sum_after).count() == 0
    assert sum_after.exceptAll(sum_before).count() == 0
    # distinct (role, tool) collapse: merged has exactly one role value
    assert merged.select("role").distinct().collect()[0][0] == "all"


def test_parse_label_pairs():
    assert parse_label_pairs(["a=1", "b=x=y", "a=2"]) == {"a": "2", "b": "x=y"}


def test_job_level_append(spark, transcripts):
    tiers = run_rollups(transcripts, CopyJob(label_append=("env=prod",)))
    assert "env" in tiers["1m"].columns
    assert tiers["1m"].where(F.col("env") != "prod").count() == 0
