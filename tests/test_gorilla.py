"""Gorilla chunk codec (SURVEY.md §2.10; fixtures FIXTURES.md §3.5).

Round-trip bit-exactness, golden bytes pinning the canonical encoding,
property tests over random monotone series, and the Spark
applyInPandas/mapInPandas layer.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prom_tsdb_copyer_spark.functions.gorilla import (
    decode_chunk,
    decode_tier_chunks,
    encode_chunk,
    encode_tier_chunks,
)

GOLDEN_INPUT = (np.array([0, 15000, 30000]), np.array([1.0, 1.0, 2.5]))
GOLDEN_HEX = (
    "03000000260000000000000000000000000000000000f03ff40001d4b904cffe80d45dd2fd"
)


def roundtrip(ts, vs):
    t2, v2 = decode_chunk(encode_chunk(ts, vs))
    assert np.array_equal(np.asarray(ts, np.int64), t2)
    assert np.array_equal(
        np.asarray(vs, np.float64).view(np.uint64), v2.view(np.uint64)
    )


def test_golden_bytes_pinned():
    assert encode_chunk(*GOLDEN_INPUT).hex() == GOLDEN_HEX


def test_constant_deltas_compress():
    """Regular 15s scrape with a constant value -> dod and xor all zero:
    ~1 bit per sample per stream after the header."""
    n = 120
    ts = np.arange(0, n * 15000, 15000, dtype=np.int64)
    vs = np.full(n, 42.0)
    chunk = encode_chunk(ts, vs)
    roundtrip(ts, vs)
    # header 24B + first-delta field (5+32 bits) + 1 bit/sample/stream
    # thereafter + crc 4B -> well under 0.5 B/sample
    assert len(chunk) <= 24 + (37 + (n - 2) + (n - 1) + 7) // 8 + 4


def test_special_floats_bit_exact():
    ts = np.array([0, 1, 10**13, 10**13 + 5, 10**13 + 6])
    vs = np.array([np.nan, np.inf, -np.inf, 5e-324, -0.0])
    roundtrip(ts, vs)
    # NaN payload preserved bit-exactly
    weird_nan = np.array([np.uint64(0x7FF80000DEADBEEF)]).view(np.float64)
    roundtrip(np.array([0, 10]), np.array([weird_nan[0], 1.0]))


def test_single_sample_and_boundary():
    roundtrip(np.array([1767225600000]), np.array([3.14]))
    n = 120
    rng = np.random.default_rng(7)
    roundtrip(np.cumsum(rng.integers(1, 10**6, n)), rng.normal(size=n))


def test_sign_flips():
    roundtrip(np.array([0, 2, 3, 10, 11]), np.array([-0.0, 0.0, 1.0, 1.0, -1.0]))


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_chunk(np.array([], dtype=np.int64), np.array([]))
    with pytest.raises(ValueError):
        encode_chunk(np.array([5, 1]), np.array([1.0, 2.0]))
    with pytest.raises(ValueError):
        encode_chunk(np.array([1, 2]), np.array([1.0]))


def test_corruption_detected():
    chunk = bytearray(encode_chunk(*GOLDEN_INPUT))
    chunk[10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        decode_chunk(bytes(chunk))


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 10**7),  # gap ms
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=300,
    ),
    start=st.integers(0, 2**40),
)
@settings(max_examples=100, deadline=None)
def test_property_roundtrip(data, start):
    gaps = np.array([g for g, _ in data], dtype=np.int64)
    ts = start + np.cumsum(gaps)
    vs = np.array([v for _, v in data], dtype=np.float64)
    roundtrip(ts, vs)


def test_spark_layer_roundtrip(spark, transcripts):
    """encode via applyInPandas per (series, 1h bucket), decode via
    mapInPandas -> exactly the original points."""
    series = ["conv_id", "role", "tool"]
    chunks = encode_tier_chunks(transcripts, series, "1h")
    points = decode_tier_chunks(chunks, series)
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.windows import unix_ms

    orig = transcripts.select(
        *series, unix_ms(F.col("ts")).alias("ts_ms"), F.col("value")
    )
    assert points.count() == orig.count()
    assert points.exceptAll(orig).count() == 0
    assert orig.exceptAll(points).count() == 0
    # chunk header stats match the group extents
    bad = chunks.where(
        (F.col("t_min_ms") < F.col("bucket_ms"))
        | (F.col("t_max_ms") >= F.col("bucket_ms") + 3600 * 1000)
        | (F.col("cnt") <= 0)
    )
    assert bad.count() == 0
