"""Per-turn text-equality invariant (BASELINE.json input_hint;
FIXTURES.md §3.4 'text rides along'): a full raw-copy pass (filter ->
relabel -> partitioned write -> read-back) preserves every turn's text
exactly under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, copy_raw


def test_copy_preserves_text(spark, transcripts, transcripts_pdf, tmp_path):
    path = str(tmp_path / "copied")
    copy_raw(transcripts, CopyJob(), path)
    back = spark.read.parquet(path)

    got = (
        back.select("conv_id", "turn_idx", "text", "role", "ts")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts_pdf[["conv_id", "turn_idx", "text", "role", "ts"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_filtered_copy_preserves_surviving_text(spark, transcripts, tmp_path):
    path = str(tmp_path / "copied_filtered")
    job = CopyJob(matchers=("role=assistant",), label_append=("env=prod",))
    copy_raw(transcripts, job, path)
    back = spark.read.parquet(path)
    assert back.where(F.col("role") != "assistant").count() == 0
    assert back.where(F.col("env") != "prod").count() == 0

    orig = transcripts.where(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", "text"
    )
    got = back.select("conv_id", "turn_idx", "text")
    assert got.exceptAll(orig).count() == 0
    assert orig.exceptAll(got).count() == 0


def test_ordering_stable_within_conversation(spark, transcripts, tmp_path):
    """turn_idx is dense 0..n-1 per conversation after the round trip,
    and ts is non-decreasing along it."""
    path = str(tmp_path / "copied_order")
    copy_raw(transcripts, CopyJob(), path)
    back = spark.read.parquet(path)
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    checked = back.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).alias("expect_idx"),
        (F.lag("ts").over(w) <= F.col("ts")).alias("mono"),
    )
    assert checked.where(F.col("turn_idx") != F.col("expect_idx")).count() == 0
    assert checked.where(F.col("mono") == False).count() == 0  # noqa: E712
