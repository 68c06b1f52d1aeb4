"""Window algebra (SURVEY.md §2.5 W1; fixtures FIXTURES.md §3.3).

Pure-python `get_query_range` is checked against the reference's
documented behavior (/root/reference/copyer.go:36-56) and against Spark's
`F.window` bucket assignment at ms resolution.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.windows import (
    HOUR_MS,
    MINUTE_MS,
    QueryRange,
    bucket_ms_col,
    get_query_range,
)

H = HOUR_MS


def ms(h, m=0, s=0, msec=0):
    return ((h * 60 + m) * 60 + s) * 1000 + msec


def test_unaligned_from():
    # (01:30, 05:45, 2h) -> [01:30-01:59:59.999, 02:00-03:59:59.999, 04:00-05:45]
    got = get_query_range(ms(1, 30), ms(5, 45), 2 * H)
    assert got == [
        QueryRange(ms(1, 30), ms(1, 59, 59, 999)),
        QueryRange(ms(2), ms(3, 59, 59, 999)),
        QueryRange(ms(4), ms(5, 45)),
    ]


def test_to_on_boundary_degenerate_window():
    # `to` exactly on a window start -> 1-ms [to, to] window emitted
    got = get_query_range(ms(0), ms(4), 2 * H)
    assert got[-1] == QueryRange(ms(4), ms(4))
    assert len(got) == 3


def test_d_zero_single_window():
    assert get_query_range(123, 456, 0) == [QueryRange(123, 456)]


def test_from_equals_to():
    assert get_query_range(ms(3), ms(3), 2 * H) == [QueryRange(ms(3), ms(3))]


def test_aligned_exact():
    got = get_query_range(ms(2), ms(6) - 1, 2 * H)
    assert got == [
        QueryRange(ms(2), ms(3, 59, 59, 999)),
        QueryRange(ms(4), ms(5, 59, 59, 999)),
    ]


@given(
    from_ms=st.integers(0, 10**10),
    span=st.integers(0, 10**8),
    d=st.sampled_from([MINUTE_MS, HOUR_MS, 24 * HOUR_MS, 7 * 24 * HOUR_MS]),
)
@settings(max_examples=200, deadline=None)
def test_properties(from_ms, span, d):
    to_ms = from_ms + span
    wins = get_query_range(from_ms, to_ms, d)
    # coverage: concatenation of windows is exactly [from, to], no gaps/overlap
    assert wins[0].start_ms == from_ms and wins[-1].end_ms == to_ms
    for a, b in zip(wins, wins[1:]):
        assert b.start_ms == a.end_ms + 1
    # alignment: every interior boundary is epoch-aligned
    for w in wins[1:]:
        assert w.start_ms % d == 0


def test_matches_spark_window_buckets(spark, transcripts):
    """Reference window [s, s+d-1ms] ≡ Spark window [s, s+d) at ms
    resolution, and ≡ our bucket_ms_col arithmetic."""
    df = transcripts.select(
        "ts",
        bucket_ms_col(F.col("ts"), MINUTE_MS).alias("bucket_ms"),
        F.unix_millis(F.window("ts", "1 minute").start).alias("spark_win_ms"),
    )
    assert df.where(F.col("bucket_ms") != F.col("spark_win_ms")).count() == 0


def test_bucket_matches_query_range_assignment(transcripts_pdf):
    """Row-level bucket == the window get_query_range would put the row in."""
    sample = transcripts_pdf.head(500)
    d = HOUR_MS
    for ts in sample["ts"]:
        t_ms = int(ts.value // 10**6)
        wins = get_query_range(t_ms, t_ms, d)
        assert len(wins) == 1
        bucket = d * (t_ms // d)
        w_full = get_query_range(bucket, bucket + d - 1, d)
        assert w_full == [QueryRange(bucket, bucket + d - 1)]
        assert bucket <= t_ms <= bucket + d - 1
