"""Bucketed interval-containment join: correctness vs a hand-computed
reference (including intervals spanning many buckets, overlapping
intervals, boundary inclusivity), left-join nulls, and plan shape
(equi-join only, never an inequality cross product)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.rangejoin import interval_join

SERIES = ["k"]


@pytest.fixture(scope="module")
def frames(spark):
    points = [
        ("a", 100), ("a", 1000), ("a", 1500), ("a", 2500), ("a", 99999),
        ("b", 500), ("c", 700),
    ]
    intervals = [
        ("a", "i1", 100, 1500),     # matches 100 (lo-inclusive), 1000, 1500 (hi-inclusive)
        ("a", "i2", 1400, 9000),    # overlaps i1: 1500 + 2500 match both/it
        ("a", "i3", 0, 50),         # empty
        ("b", "i4", 0, 100000),     # spans ~100 buckets
    ]
    p = spark.createDataFrame(points, "k string, t long")
    iv = spark.createDataFrame(intervals, "k string, iv string, lo long, hi long")
    return p, iv


def _expected(points, intervals):
    out = set()
    for k, t in points:
        for k2, iv, lo, hi in intervals:
            if k == k2 and lo <= t <= hi:
                out.add((k, t, iv))
    return out


def test_matches_reference_all_cases(spark, frames):
    p, iv = frames
    got = {
        (r["k"], r["t"], r["iv"])
        for r in interval_join(p, iv, SERIES, "t", "lo", "hi", bucket_ms=1000).collect()
    }
    want = _expected(
        [(r["k"], r["t"]) for r in p.collect()],
        [(r["k"], r["iv"], r["lo"], r["hi"]) for r in iv.collect()],
    )
    assert got == want
    # bucket size must not change results
    for b in (1, 7, 250000):
        got_b = {
            (r["k"], r["t"], r["iv"])
            for r in interval_join(p, iv, SERIES, "t", "lo", "hi", bucket_ms=b).collect()
        }
        assert got_b == want, f"bucket_ms={b}"


def test_left_join_keeps_unmatched(spark, frames):
    p, iv = frames
    out = interval_join(p, iv, SERIES, "t", "lo", "hi", bucket_ms=1000, how="left")
    rows = {(r["k"], r["t"]): r["iv"] for r in out.where(F.col("iv").isNull()).collect()}
    assert ("a", 99999) in rows and ("c", 700) in rows
    matched = _expected(
        [(r["k"], r["t"]) for r in p.collect()],
        [(r["k"], r["iv"], r["lo"], r["hi"]) for r in iv.collect()],
    )
    assert out.count() == len(matched) + 2


def test_plan_has_no_inequality_join(spark, frames):
    p, iv = frames
    plan = interval_join(p, iv, SERIES, "t", "lo", "hi", bucket_ms=1000)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_randomized_against_bruteforce(spark):
    """Seeded random points/intervals (mixed lengths, overlaps, empties):
    bucketed join == O(n*m) containment at several bucket sizes."""
    import numpy as np

    rng = np.random.default_rng(23)
    points = [(f"s{int(rng.integers(3))}", int(rng.integers(0, 5_000)))
              for _ in range(250)]
    ivs = []
    for i in range(60):
        lo = int(rng.integers(0, 5_000))
        ivs.append((f"s{int(rng.integers(4))}", f"iv{i}",
                    lo, lo + int(rng.integers(0, 800))))
    p = spark.createDataFrame(points, "k string, t long").distinct()
    iv = spark.createDataFrame(ivs, "k string, iv string, lo long, hi long")
    want = {
        (k, t, name)
        for (k, t) in {tuple(r) for r in p.collect()}
        for (k2, name, lo, hi) in ivs
        if k == k2 and lo <= t <= hi
    }
    for b in (37, 1000):
        got = {
            (r["k"], r["t"], r["iv"])
            for r in interval_join(p, iv, SERIES, "t", "lo", "hi",
                                   bucket_ms=b).collect()
        }
        assert got == want, f"bucket_ms={b}"
