"""As-of join: semantics vs pandas.merge_asof (independent reference),
tolerance, equal-time matching, tie determinism, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.asofjoin import asof_join

SERIES = ["k"]


@pytest.fixture(scope="module")
def frames(spark):
    samples = [
        ("a", 1000, 1.0, 1), ("a", 2000, 2.0, 2), ("a", 5000, 5.0, 3),
        ("b", 1500, 15.0, 4), ("b", 1500, 16.0, 5),  # tie at t=1500
        ("c", 9000, 9.0, 6),
    ]
    probes = [
        ("a", 500), ("a", 2000), ("a", 2001), ("a", 9999),
        ("b", 1499), ("b", 1500), ("b", 8000),
        ("c", 1), ("d", 5000),
    ]
    s = spark.createDataFrame(samples, "k string, t long, value double, event_id long")
    p = spark.createDataFrame(probes, "k string, t long")
    return p, s


def test_matches_pandas_merge_asof(spark, frames):
    p, s = frames
    got = {
        (r["k"], r["t"]): r["asof_value"]
        for r in asof_join(
            p, s, SERIES, probe_ts="t", sample_ts="t",
            tiebreak_col="event_id",
        ).collect()
    }
    # pandas oracle (drop the tie row that loses: merge_asof keeps the
    # LAST among equal keys, same as our max-tiebreak pick)
    sp = pd.DataFrame(s.collect(), columns=["k", "t", "value", "event_id"]).sort_values(["t", "event_id"])
    pp = pd.DataFrame(p.collect(), columns=["k", "t"]).sort_values("t")
    m = pd.merge_asof(pp, sp, on="t", by="k", direction="backward")
    for _, row in m.iterrows():
        want = None if pd.isna(row["value"]) else row["value"]
        assert got[(row["k"], row["t"])] == want, (row["k"], row["t"])


def test_equal_time_matches_and_tie_is_deterministic(spark, frames):
    p, s = frames
    out = {
        (r["k"], r["t"]): (r["asof_value"], r["asof_ts_ms"])
        for r in asof_join(
            p, s, SERIES, probe_ts="t", sample_ts="t",
            tiebreak_col="event_id",
        ).collect()
    }
    assert out[("a", 2000)] == (2.0, 2000)   # sample AT probe time matches
    assert out[("b", 1499)] == (None, None)  # strictly before first sample
    assert out[("b", 1500)] == (16.0, 1500)  # tie -> max event_id wins
    assert out[("d", 5000)] == (None, None)  # unseen series


def test_tolerance_nulls_stale_matches(spark, frames):
    p, s = frames
    out = {
        (r["k"], r["t"]): r["asof_value"]
        for r in asof_join(
            p, s, SERIES, probe_ts="t", sample_ts="t",
            tolerance_ms=1000, tiebreak_col="event_id",
        ).collect()
    }
    assert out[("a", 2001)] == 2.0     # 1ms stale: within tolerance
    assert out[("a", 9999)] is None    # 4999ms stale: nulled
    assert out[("b", 8000)] is None


def test_plan_is_single_window_no_join(spark, frames):
    p, s = frames
    plan = asof_join(p, s, SERIES, probe_ts="t", sample_ts="t")._jdf \
        .queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "ShuffledHashJoin"):
        assert bad not in plan
    assert plan.count("Window") >= 1


def test_randomized_against_bruteforce(spark):
    """Seeded random streams: asof_join must equal the O(n*m) definition
    on every probe (multiple series, duplicate probe times, sample-time
    ties broken by event_id)."""
    import numpy as np

    rng = np.random.default_rng(17)
    samples = [
        (f"s{int(rng.integers(4))}", int(rng.integers(0, 10_000)),
         float(np.round(rng.uniform(0, 100), 2)), i)
        for i in range(300)
    ]
    probes = [
        (f"s{int(rng.integers(5))}", int(rng.integers(0, 12_000)))
        for _ in range(200)
    ]
    s = spark.createDataFrame(samples, "k string, t long, value double, event_id long")
    p = spark.createDataFrame(probes, "k string, t long").distinct()
    got = {
        (r["k"], r["t"]): (r["asof_value"], r["asof_ts_ms"])
        for r in asof_join(p, s, SERIES, probe_ts="t", sample_ts="t",
                           tiebreak_col="event_id").collect()
    }
    for k, t in {(k, t) for k, t in [tuple(r) for r in p.collect()]}:
        eligible = [x for x in samples if x[0] == k and x[1] <= t]
        want = (None, None)
        if eligible:
            best = max(eligible, key=lambda x: (x[1], x[3]))
            want = (best[2], best[1])
        assert got[(k, t)] == want, (k, t)
