"""LTTB per-series downsampling: invariants + spike preservation vs a
naive stride sample, and kernel equivalence to a straightforward
pure-python reference implementation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.downsample import (
    _lttb_indices,
    lttb_downsample,
)

SERIES = ["conv_id", "role", "tool"]


def _reference_lttb(t, v, n_out):
    """Independent scalar-loop LTTB (same bucket convention)."""
    n = len(t)
    if n_out >= n:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo = edges[i + 1]
        nhi = n if i == n_out - 3 else edges[i + 2]
        cx, cy = t[nlo:nhi].mean(), v[nlo:nhi].mean()
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((t[a] - cx) * (v[j] - v[a]) - (t[a] - t[j]) * (cy - v[a]))
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        a = best
    out.append(n - 1)
    return out


def test_kernel_matches_reference():
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 1e6, 500))
    v = np.cumsum(rng.normal(size=500))
    for n_out in (3, 10, 77, 499, 500, 600):
        got = _lttb_indices(t, v, n_out).tolist()
        want = _reference_lttb(t, v, n_out) if n_out <= 500 else list(range(500))
        assert got == want, n_out


def test_lttb_spark_invariants(spark, transcripts):
    n_out = 20
    out = lttb_downsample(transcripts, SERIES, n_out)
    sizes = out.groupBy(*SERIES).agg(
        F.count("*").alias("n"),
        F.min("ts_ms").alias("lo"),
        F.max("ts_ms").alias("hi"),
    )
    orig = transcripts.groupBy(*SERIES).agg(
        F.count("*").alias("n0"),
        F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("lo0"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("hi0"),
    )
    # null-safe join: the tool label is NULL for non-tool turns and a
    # plain equi-join would silently drop those series
    o = orig.select(*[F.col(c).alias(f"o_{c}") for c in SERIES], "n0", "lo0", "hi0")
    cond = [sizes[c].eqNullSafe(o[f"o_{c}"]) for c in SERIES]
    j = sizes.join(o, cond, how="inner")
    # size budget respected; first/last timestamps always kept
    assert j.where(F.col("n") > F.least(F.col("n0"), F.lit(n_out))).count() == 0
    assert j.where((F.col("lo") != F.col("lo0")) | (F.col("hi") != F.col("hi0"))).count() == 0
    assert j.count() == orig.count()


def test_lttb_keeps_spike_stride_misses(spark):
    """A single spike in a flat series must survive LTTB at a budget
    where a naive stride sampler can drop it."""
    n, spike_at = 1000, 501
    rows = [("s", i * 1000, 100.0 if i == spike_at else 0.0) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, ts_ms long, value double")
    df = df.withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms")
    out = lttb_downsample(df, ["k"], 50)
    vals = [r["value"] for r in out.collect()]
    assert len(vals) == 50 and max(vals) == pytest.approx(100.0)
    # the stride sampler at the same budget misses it
    stride = [r[2] for i, r in enumerate(rows) if i % (n // 50) == 0]
    assert max(stride) == 0.0
