"""PromQL scalar value functions + histogram_fraction: edge laws vs
python recomputes and a DuckDB twin for the engine-identical subset.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.scalars import (
    clamp,
    round_to_nearest,
    value_fn,
)


def _vals(spark, xs):
    return spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i long, value double"
    )


def _out(df):
    return {r["i"]: r["value"] for r in df.collect()}


def test_value_fns_edge_laws(spark):
    xs = [4.0, 0.0, -3.0, 0.25, None]
    df = _vals(spark, xs)
    ln = _out(value_fn(df, "ln"))
    assert ln[0] == math.log(4.0) and ln[1] == float("-inf")
    assert math.isnan(ln[2]) and ln[3] == math.log(0.25) and ln[4] is None
    sq = _out(value_fn(df, "sqrt"))
    assert sq[0] == 2.0 and sq[1] == 0.0 and math.isnan(sq[2])
    assert sq[4] is None
    lg2 = _out(value_fn(df, "log2"))
    assert lg2[0] == 2.0 and lg2[3] == -2.0 and lg2[1] == float("-inf")
    sgn = _out(value_fn(df, "sgn"))
    assert (sgn[0], sgn[1], sgn[2]) == (1.0, 0.0, -1.0)
    for fn, ref in [("abs", abs), ("ceil", math.ceil),
                    ("floor", math.floor), ("exp", math.exp)]:
        got = _out(value_fn(df, fn))
        for i, x in enumerate(xs):
            if x is None:
                assert got[i] is None
            else:
                assert got[i] == pytest.approx(float(ref(x)))
    with pytest.raises(ValueError, match="unknown fn"):
        value_fn(df, "cbrt")


def test_clamp_and_round_laws(spark, transcripts, transcripts_pdf):
    """clamp/round vs a DuckDB twin on real data (these laws are
    engine-identical: greatest/least and floor arithmetic), plus the
    PromQL edges: min > max -> NaN, ties round UP (2.5 -> 3, -2.5 ->
    -2: Go's Floor(v+0.5), NOT half-even or half-away)."""
    import duckdb

    df = transcripts.select("conv_id", "turn_idx", "value")
    got_c = {
        (r["conv_id"], r["turn_idx"]): r["value"]
        for r in clamp(df, 10.0, 100.0).collect()
    }
    got_r = {
        (r["conv_id"], r["turn_idx"]): r["value"]
        for r in round_to_nearest(df, 5.0).collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    rows = con.sql("""
        SELECT conv_id, turn_idx,
               least(greatest(value, 10.0), 100.0) AS c,
               floor(value / 5.0 + 0.5) * 5.0 AS r
        FROM transcripts
    """).fetchall()
    assert got_c == {(c, int(t)): float(cv) for c, t, cv, _ in rows}
    assert got_r == {(c, int(t)): float(rv) for c, t, _, rv in rows}
    assert len(rows) > 100

    edge = _vals(spark, [2.5, -2.5, 7.49, None])
    r1 = _out(round_to_nearest(edge, 1.0))
    assert (r1[0], r1[1], r1[2]) == (3.0, -2.0, 7.0) and r1[3] is None
    nan_all = _out(clamp(_vals(spark, [5.0, None]), 9.0, 1.0))
    assert math.isnan(nan_all[0]) and nan_all[1] is None
    lo_only = _out(clamp(_vals(spark, [5.0, -1.0]), min_val=0.0))
    assert (lo_only[0], lo_only[1]) == (5.0, 0.0)
    with pytest.raises(ValueError):
        clamp(df)
    with pytest.raises(ValueError):
        round_to_nearest(df, 0.0)


def test_hist_fraction_laws(spark):
    """histogram_fraction vs a hand recompute on planted buckets:
    interpolation inside a bucket, full-range == 1, +Inf mass, empty
    histogram -> NaN, and monotonicity in upper."""
    from prom_tsdb_copyer_spark.operators.histogram import hist_fraction

    bounds = (1.0, 2.0, 4.0)
    # cumulative buckets: [10, 30, 60], +Inf total 100; count 100
    df = spark.createDataFrame(
        [(1, [10, 30, 60], 100), (2, [0, 0, 0], 0)],
        "g int, hist_buckets array<long>, hist_count long",
    )
    def frac(lo, hi):
        out = hist_fraction(df, lo, hi, bounds).collect()
        return {r["g"]: r["fraction"] for r in out}

    # upper=1.5 interpolates bucket 2: 10 + 20*0.5 = 20 -> 0.2
    assert frac(0.0, 1.5)[1] == pytest.approx(0.2)
    # full finite range: cum(4)=60 -> 0.6; everything: 1.0
    assert frac(0.0, 4.0)[1] == pytest.approx(0.6)
    assert frac(0.0, 1e12)[1] == pytest.approx(1.0)
    # (1, 2]: 30-10 -> 0.2; (2, 3]: 30 + 30*0.5 - 30 = 15 -> 0.15
    assert frac(1.0, 2.0)[1] == pytest.approx(0.2)
    assert frac(2.0, 3.0)[1] == pytest.approx(0.15)
    # empty histogram -> NaN
    assert math.isnan(frac(0.0, 2.0)[2])
    # monotone in upper
    fs = [frac(0.0, u)[1] for u in (0.5, 1.0, 2.0, 3.0, 4.0, 5.0)]
    assert fs == sorted(fs)
    with pytest.raises(ValueError):
        hist_fraction(df, 2.0, 1.0, bounds)


def test_time_fns_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Calendar functions over the 1h tier's bucket_ms vs DuckDB's
    date-part algebra (UTC both sides; day_of_week re-based to
    PromQL's 0=Sunday)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.rollup import rollup
    from prom_tsdb_copyer_spark.operators.scalars import time_fn

    t = rollup(
        transcripts, ["conv_id", "role", "tool"], "value", "1h"
    ).select("conv_id", "role", "tool", "bucket_ms")
    fields = ["minute", "hour", "day_of_month", "day_of_week",
              "days_in_month", "month", "year"]
    got = {
        (r["conv_id"], r["role"], r["tool"], r["bucket_ms"]):
            tuple(r[f] for f in fields)
        for r in time_fn(t, fields).collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    want = {
        (c, ro, tl, int(b)): tuple(int(x) for x in rest)
        for c, ro, tl, b, *rest in con.sql("""
        WITH tier AS (
          SELECT DISTINCT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms
          FROM transcripts),
        t AS (SELECT *, make_timestamp(bucket_ms * 1000) AS ts FROM tier)
        SELECT conv_id, role, tool, bucket_ms,
               minute(ts), hour(ts), day(ts),
               dayofweek(ts),  -- duckdb: 0=Sunday already
               day(last_day(ts)), month(ts), year(ts)
        FROM t
        """).fetchall()
    }
    assert got == want and len(want) > 100

    import pytest

    with pytest.raises(ValueError, match="unknown time"):
        time_fn(t, ["quarter"])


def test_query_range_offset_modifier(spark, transcripts, tmp_path):
    """PromQL `offset`: query_range(offset_ms=1h) returns the same
    relation as the unshifted query over [from-1h, to-1h) with every
    bucket_ms moved forward by exactly the offset."""
    from prom_tsdb_copyer_spark.operators.query import query_range
    from prom_tsdb_copyer_spark.operators.windows import HOUR_MS
    from prom_tsdb_copyer_spark.plans.copy_job import (
        CopyJob,
        run_and_write_rollups,
    )

    series = ["conv_id", "role", "tool"]
    out_root = str(tmp_path / "tiers")
    run_and_write_rollups(spark, transcripts, CopyJob(), out_root)
    lo = transcripts.agg(
        F.min(F.unix_millis(F.col("ts").cast("timestamp")))
    ).first()[0]
    frm, to = lo + 6 * HOUR_MS, lo + 18 * HOUR_MS
    plain = query_range(
        spark, out_root, series, from_ms=frm - HOUR_MS,
        to_ms=to - HOUR_MS, step_ms=HOUR_MS,
    )
    shifted = query_range(
        spark, out_root, series, from_ms=frm, to_ms=to,
        step_ms=HOUR_MS, offset_ms=HOUR_MS,
    )
    def keyed(df, delta):
        return {
            (r["conv_id"], r["role"], r["tool"],
             r["bucket_ms"] + delta): (r["cnt"], r["sum_val"])
            for r in df.collect()
        }
    assert keyed(shifted, 0) == keyed(plain, HOUR_MS)
    assert keyed(shifted, 0)


def test_value_fn_nonfinite_edges(spark):
    """ADVICE r8 #2/#3: ceil/floor/round/clamp on NaN/+-Inf must
    propagate the input (Go math semantics), never the BIGINT-cast
    artifacts (NaN->0, Inf->2^63); huge finite doubles (already
    integers) pass through exactly."""
    inf, nan = float("inf"), float("nan")
    big = 2.0**63 * 4  # > int64: BIGINT ceil would corrupt it
    xs = [nan, inf, -inf, big, -big, 2.5, None]
    df = _vals(spark, xs)
    for fn in ("ceil", "floor"):
        got = _out(value_fn(df, fn))
        assert math.isnan(got[0])
        assert got[1] == inf and got[2] == -inf
        assert got[3] == big and got[4] == -big
        assert got[5] == (3.0 if fn == "ceil" else 2.0)
        assert got[6] is None
    got = _out(round_to_nearest(df, 2.0))
    assert math.isnan(got[0]) and got[1] == inf and got[2] == -inf
    assert got[3] == big and got[4] == -big  # ties/integers unscathed
    assert got[6] is None
    got = _out(clamp(df, 0.0, 10.0))
    assert math.isnan(got[0])  # NOT clamped to max_val
    assert got[1] == 10.0 and got[2] == 0.0 and got[6] is None
    got = _out(clamp(df, min_val=0.0))
    assert math.isnan(got[0]) and got[1] == inf and got[2] == 0.0


def test_query_range_offset_must_align_to_grain(spark, transcripts, tmp_path):
    """ADVICE r8 #4: a non-multiple offset would relabel fixed tier
    buckets instead of evaluating shifted windows -- refuse."""
    from prom_tsdb_copyer_spark.operators.query import query_range
    from prom_tsdb_copyer_spark.plans.copy_job import (
        CopyJob, run_and_write_rollups,
    )

    out_root = str(tmp_path / "tiers")
    run_and_write_rollups(
        spark, transcripts, CopyJob(tiers=("1h",)), out_root
    )
    with pytest.raises(ValueError, match="offset_ms"):
        query_range(
            spark, out_root, ["conv_id", "role", "tool"],
            step_ms=3_600_000, offset_ms=1_234, tiers=("1h",),
        )
