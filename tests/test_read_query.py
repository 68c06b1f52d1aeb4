"""Read-side query operators vs pandas recompute (rate has no SQL oracle
in the contract; cover it here).
"""

from __future__ import annotations

import numpy as np

from prom_tsdb_copyer_spark.operators.query import (
    avg_over_time,
    increase,
    rate_per_sec,
    select_series,
)
from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.operators.windows import DAY_MS

SERIES = ["conv_id", "role", "tool"]


def _tier(transcripts):
    return rollup(transcripts, SERIES, "value", "1h")


def test_rate_vs_pandas(spark, transcripts, transcripts_pdf):
    got = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["window_ms"]):
            r["rate_per_sec"]
        for r in rate_per_sec(_tier(transcripts), SERIES, "1d").collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["us"] = p["ts"].astype("int64") // 1000
    p["window_ms"] = (p["us"] // 1000 // DAY_MS) * DAY_MS
    for key, g in p.groupby(["conv_id", "role", "tool", "window_ms"]):
        g = g.sort_values("us")
        el = (g["us"].iloc[-1] - g["us"].iloc[0]) / 1e6
        want = round((g["value"].iloc[-1] - g["value"].iloc[0]) / el, 6) if el > 0 else None
        have = got[key]
        if want is None:
            assert have is None
        else:
            assert abs(have - want) < 1e-9, (key, have, want)


def test_increase_monotone_counter(spark, transcripts):
    """value = turn_idx is per-conversation monotone, so the daily
    increase is last-first >= 0 wherever the series has >= 1 point."""
    inc = increase(_tier(transcripts), SERIES, "1d")
    assert inc.where("increase < 0").count() == 0


def test_select_series_matcher_and_range(spark, transcripts):
    tier = _tier(transcripts)
    lo = tier.agg({"bucket_ms": "min"}).first()[0]
    out = select_series(
        tier, SERIES, matchers=["role=assistant"], from_ms=lo, to_ms=lo + 2 * DAY_MS
    )
    assert out.where("role != 'assistant'").count() == 0
    assert out.where(f"bucket_ms > {lo + 2 * DAY_MS}").count() == 0
    assert out.count() > 0


def test_avg_over_time_weighted(spark, transcripts):
    avg = avg_over_time(_tier(transcripts), SERIES, "1d")
    row = avg.first()
    assert row["cnt"] >= 1 and np.isfinite(row["avg_value"])
