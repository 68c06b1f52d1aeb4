"""Chunk tables as part of the resumable pipeline: the hybrid tier shape
(rolled-up points + Gorilla chunk tables) written per window, decodable
back to exactly the filtered raw points.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.functions.gorilla import (
    decode_tier_chunks,
    encode_chunk,
    encode_chunks_batched,
)
from prom_tsdb_copyer_spark.operators.windows import DAY_MS, unix_ms
from prom_tsdb_copyer_spark.plans.copy_job import CopyJob
from prom_tsdb_copyer_spark.sources.manifest import ResumableRollup
from prom_tsdb_copyer_spark.sources.tables import time_extent

SERIES = ["conv_id", "role", "tool"]


def test_pipeline_writes_decodable_chunks(spark, transcripts, tmp_path):
    lo, hi = time_extent(transcripts)
    root = str(tmp_path / "hybrid")
    job = CopyJob(tiers=("1h",), chunk_tiers=("1h",),
                  matchers=("role=assistant",))
    ResumableRollup(job, root, 7 * DAY_MS).run(transcripts, lo, hi)

    chunks = spark.read.parquet(f"{root}/chunks=1h").drop("part_day")
    points = decode_tier_chunks(chunks, SERIES)
    orig = transcripts.where(F.col("role") == "assistant").select(
        *SERIES, unix_ms(F.col("ts")).alias("ts_ms"), F.col("value")
    )
    assert points.count() == orig.count()
    assert points.exceptAll(orig).count() == 0
    # chunk tier and rollup tier agree on counts per (series, bucket)
    tier = spark.read.parquet(f"{root}/tier=1h").drop("part_day")
    key = [*SERIES, "bucket_ms"]
    joined = tier.select(*key, "cnt").join(
        chunks.select(*key, F.col("cnt").alias("ccnt")),
        on=[tier[k].eqNullSafe(chunks[k]) for k in key],
    )
    assert joined.where(F.col("cnt") != F.col("ccnt")).count() == 0


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**8),
                  st.floats(allow_nan=True, width=64)),
        min_size=1, max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_batched_encoder_equals_single(data):
    """Property: batch encoding == per-chunk encoding, byte for byte."""
    data.sort(key=lambda t: t[0])
    gids_raw = np.array([g for g, _, _ in data])
    # re-densify group ids to 0..G-1
    _, gids = np.unique(gids_raw, return_inverse=True)
    order = np.argsort(gids, kind="stable")
    gids = gids[order]
    gaps = np.array([g for _, g, _ in data], dtype=np.int64)[order]
    vals = np.array([v for _, _, v in data], dtype=np.float64)[order]
    # ascending ts within group
    ts = np.zeros(len(data), dtype=np.int64)
    for g in np.unique(gids):
        m = gids == g
        ts[m] = np.cumsum(gaps[m])
    batched = encode_chunks_batched(ts, vals, gids)
    for g in np.unique(gids):
        m = gids == g
        assert batched[g] == encode_chunk(ts[m], vals[m])
