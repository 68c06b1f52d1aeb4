"""Read-side query operators vs pandas recompute (rate has no SQL oracle
in the contract; cover it here).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

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


def test_delta_matches_increase_algebra(spark, transcripts):
    from prom_tsdb_copyer_spark.operators.query import delta_over_time

    inc = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): r["increase"]
        for r in increase(_tier(transcripts), SERIES, "1d").collect()
    }
    dlt = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): r["delta"]
        for r in delta_over_time(_tier(transcripts), SERIES, "1d").collect()
    }
    # identical selection algebra on this fixture (delta == increase
    # when values are gauges; the functions differ only in intent)
    assert dlt == inc and len(dlt) > 100


def test_idelta_irate_vs_pandas(spark, transcripts, transcripts_pdf):
    from prom_tsdb_copyer_spark.operators.query import idelta_irate

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (
            r["idelta"], r["irate_per_sec"]
        )
        for r in idelta_irate(transcripts, SERIES, "1d").collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].where(p["tool"].notna(), None)
    p["us"] = p["ts"].astype("int64") // 1000
    p["window_ms"] = (p["us"] // 1000 // DAY_MS) * DAY_MS
    p = p.sort_values("us", kind="stable")
    n_checked = 0
    for key, g in p.groupby(["conv_id", "role"], dropna=False):
        for tool, gt in g.groupby("tool", dropna=False):
            gt = gt.sort_values("us", kind="stable")
            prev_v = gt["value"].shift(1)
            prev_t = gt["us"].shift(1)
            prev_win = (prev_t // 1000 // DAY_MS) * DAY_MS
            gt = gt.assign(
                _pd=gt["value"] - prev_v,
                _dt=gt["us"] - prev_t,
                _pw=prev_win,
            )
            for win, gw in gt.groupby("window_ms"):
                # PromQL range semantics: BOTH samples inside the window
                gw2 = gw[gw["_dt"].notna() & (gw["_pw"] == win)]
                if gw2.empty:
                    continue
                last = gw2.iloc[-1]
                v = last["value"]
                pv = v - last["_pd"]
                inc = last["_pd"] if v >= pv else v
                want = (last["_pd"], inc / (last["_dt"] / 1e6))
                k = (key[0], key[1], tool if isinstance(tool, str) else None, win)
                assert k in got
                assert abs(got[k][0] - want[0]) < 1e-9
                assert abs(got[k][1] - want[1]) < 1e-9
                n_checked += 1
    assert n_checked > 100
    # and nothing extra: every emitted (series, window) had a within-window pair
    assert len(got) == n_checked


def test_deriv_and_predict_linear(spark, transcripts, transcripts_pdf):
    """Least-squares slope per (series, day) vs numpy.polyfit, and
    predict_linear == slope * (t_last + ahead) + intercept."""
    from prom_tsdb_copyer_spark.operators.query import deriv

    ahead = 3600.0
    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (
            r["deriv_per_sec"], r["predicted"]
        )
        for r in deriv(
            transcripts, SERIES, "1d", predict_ahead_s=ahead
        ).collect()
    }
    p = transcripts_pdf.copy()
    p["us"] = p["ts"].astype("int64") // 1000
    p["window_ms"] = (p["us"] // 1000 // DAY_MS) * DAY_MS
    n_checked = 0
    for key, g in p.groupby(["conv_id", "role", "tool", "window_ms"], dropna=False):
        k = (key[0], key[1], key[2] if isinstance(key[2], str) else None, key[3])
        assert k in got
        t = g["us"].to_numpy() / 1e6 - key[3] / 1000.0
        v = g["value"].to_numpy()
        slope_got, pred_got = got[k]
        if len(g) < 2 or np.ptp(t) == 0:
            assert slope_got is None
            continue
        slope, intercept = np.polyfit(t, v, 1)
        assert abs(slope_got - slope) < 1e-6 * max(1.0, abs(slope))
        want_pred = slope * (t.max() + ahead) + intercept
        # predictions extrapolate: compare in slope units
        assert abs(pred_got - want_pred) < 1e-4 * max(1.0, abs(want_pred))
        n_checked += 1
    assert n_checked > 100


def test_pick_tier_resolution_selection():
    from prom_tsdb_copyer_spark.operators.query import pick_tier
    from prom_tsdb_copyer_spark.operators.windows import DAY_MS, HOUR_MS, MINUTE_MS

    assert pick_tier(DAY_MS) == "1d"
    assert pick_tier(7 * DAY_MS) == "1d"
    assert pick_tier(HOUR_MS) == "1h"
    assert pick_tier(6 * HOUR_MS) == "1h"  # 6h % 1d != 0 -> 1h
    assert pick_tier(MINUTE_MS) == "1m"
    assert pick_tier(90 * 1000) == "1m"  # 90s: 1m doesn't divide -> finest
    assert pick_tier(1000) == "1m"  # below finest grain -> finest
    assert pick_tier(2 * DAY_MS, tiers=(60_000, 3_600_000)) == 3_600_000


def test_read_tier_auto_prunes_and_matches(spark, transcripts, tmp_path):
    """read_tier_auto must pick the right tier, return values identical
    to querying that tier directly, and show BOTH partition-level and
    row-group pruning in the physical plan."""
    from prom_tsdb_copyer_spark.operators.query import read_tier_auto
    from prom_tsdb_copyer_spark.operators.windows import DAY_MS, HOUR_MS
    from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_and_write_rollups
    from prom_tsdb_copyer_spark.sources.tables import time_extent

    root = str(tmp_path / "tiers")
    run_and_write_rollups(spark, transcripts, CopyJob(), root)
    lo, hi = time_extent(transcripts)
    q_lo = (lo // DAY_MS + 1) * DAY_MS
    q_hi = q_lo + 3 * DAY_MS - 1

    tier, df = read_tier_auto(spark, root, HOUR_MS, q_lo, q_hi)
    assert tier == "1h"
    direct = (
        spark.read.parquet(f"{root}/tier=1h")
        .where(F.col("bucket_ms").between(q_lo, q_hi))
    )
    got = sorted(map(tuple, df.drop("part_day").collect()))
    want = sorted(map(tuple, direct.drop("part_day").collect()))
    assert got and got == want

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_day" in plan.split(
        "PartitionFilters"
    )[1][:200], "day-partition pruning not engaged"
    assert "PushedFilters" in plan and "bucket_ms" in plan.split(
        "PushedFilters"
    )[1][:400], "bucket_ms stats pushdown not engaged"

    tier_d, _ = read_tier_auto(spark, root, 7 * DAY_MS)
    assert tier_d == "1d"


def test_query_range_end_to_end(spark, transcripts, tmp_path):
    """query_range = resolution pick + matchers + step re-bucketing over
    the materialized cascade; values must equal rolling up the
    matcher-filtered RAW data at the step grain directly."""
    from prom_tsdb_copyer_spark.matchers import matchers_predicate
    from prom_tsdb_copyer_spark.operators.query import query_range
    from prom_tsdb_copyer_spark.operators.windows import DAY_MS
    from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_and_write_rollups

    root = str(tmp_path / "tiers")
    run_and_write_rollups(spark, transcripts, CopyJob(), root)

    step = 2 * DAY_MS  # coarser than every tier -> re-bucket from 1d
    out = query_range(
        spark, root, SERIES, matchers=["role=assistant"], step_ms=step
    )
    labels = {c: F.col(c) for c in SERIES}
    labels["__name__"] = F.lit("turns")
    raw = transcripts.where(matchers_predicate(["role=assistant"], labels))
    want = rollup(raw, SERIES, "value", step)

    key = SERIES + ["bucket_ms"]
    a = out.toPandas().fillna({"tool": "<null>"}).sort_values(key).reset_index(drop=True)
    b = want.toPandas().fillna({"tool": "<null>"}).sort_values(key).reset_index(drop=True)
    assert len(a) and set(a.columns) == set(b.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)],
                                  check_dtype=False)


def test_query_range_misaligned_step_raises(spark, tmp_path):
    """ADVICE r4: a step that no tier grain divides (e.g. 90 s over a
    1m finest tier) must raise instead of silently re-bucketing on a
    misaligned grid (floor-assignment would misattribute samples)."""
    import pytest

    from prom_tsdb_copyer_spark.operators.query import query_range

    with pytest.raises(ValueError, match="not a multiple"):
        query_range(spark, str(tmp_path / "never_read"), SERIES,
                    step_ms=90_000)


def test_query_instant_matches_raw_argmax(spark, transcripts, tmp_path):
    """query_instant over the materialized cascade == arg_max over the
    raw samples in the same closed-bucket window (last_val/last_ord are
    selections, so equality is exact), and series with no sample inside
    the lookback are absent."""
    from prom_tsdb_copyer_spark.operators.query import query_instant
    from prom_tsdb_copyer_spark.operators.windows import HOUR_MS, unix_ms
    from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_and_write_rollups

    root = str(tmp_path / "tiers")
    run_and_write_rollups(spark, transcripts, CopyJob(), root)

    lo, hi = (
        transcripts.agg(
            F.min(unix_ms(F.col("ts"))), F.max(unix_ms(F.col("ts")))
        ).first()
    )
    # an instant 1/3 into the extent, minute-aligned minus 1ms so the
    # closed-bucket window is exactly [t+1-lookback, t] in raw terms
    t = ((lo + (hi - lo) // 3) // 60_000) * 60_000 - 1
    lookback = 6 * HOUR_MS

    got = {
        tuple(r[c] for c in SERIES): (r["value"], r["sample_ord"])
        for r in query_instant(spark, root, SERIES, t, lookback).collect()
    }

    raw = transcripts.withColumn("_ms", unix_ms(F.col("ts"))).where(
        F.col("_ms").between(t + 1 - lookback, t)
    )
    want = {
        tuple(r[c] for c in SERIES): (r["value"], r["sample_ord"])
        for r in raw.groupBy(*SERIES).agg(
            F.max_by("value", (F.col("_ms") * 1000)).alias("value"),
            F.max(F.col("_ms") * 1000).alias("sample_ord"),
        ).collect()
    }
    assert len(got) >= 10  # 32 of ~150 series are active in the window
    assert got == want


def test_stddev_and_quantile_over_time_vs_numpy(spark, transcripts, transcripts_pdf):
    """Raw-scan range aggregates vs numpy (population variance, linear
    interpolation quantile -- PromQL semantics on both)."""
    import numpy as np

    from prom_tsdb_copyer_spark.operators.query import (
        quantile_over_time,
        stddev_over_time,
    )

    sd = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (r["n_samples"], r["stdvar"])
        for r in stddev_over_time(transcripts, SERIES, "1d").collect()
    }
    qt = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): r["quantile"]
        for r in quantile_over_time(transcripts, SERIES, "1d", q=0.9).collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].where(p["tool"].notna(), None)
    p["window_ms"] = (p["ts"].astype("int64") // 1_000_000 // DAY_MS) * DAY_MS
    n_checked = 0
    for key, g in p.groupby(["conv_id", "role", "tool", "window_ms"], dropna=False):
        k = (key[0], key[1], key[2] if isinstance(key[2], str) else None, key[3])
        v = g["value"].to_numpy()
        n, var = sd[k]
        assert n == len(v)
        assert abs(var - np.var(v)) < 1e-9 * max(1.0, np.var(v))
        assert abs(qt[k] - np.quantile(v, 0.9)) < 1e-9, k
        n_checked += 1
    assert n_checked > 200


def test_pivot_counts_match_groupby(spark, transcripts):
    """Pivot surface kept pytest-covered after its gate slot rotated to
    streaming_tier_cascade in r6: the pivoted per-(role, day) cells must
    equal the plain groupBy counts (the reshape-only law -- the same
    cells cube_counts gates at the oracle)."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.windows import DAY_MS, bucket_ms_col

    roles = [r["role"] for r in transcripts.select("role").distinct().collect()]
    day = transcripts.withColumn("bucket_ms", bucket_ms_col(F.col("ts"), DAY_MS))
    piv = day.groupBy("bucket_ms").pivot("role", roles).count().na.fill(0, roles)
    flat = {
        (r["bucket_ms"], r["role"]): r["cnt"]
        for r in day.groupBy("bucket_ms", "role")
        .agg(F.count("*").alias("cnt")).collect()
    }
    n_cells = 0
    for r in piv.collect():
        for role in roles:
            assert r[role] == flat.get((r["bucket_ms"], role), 0)
            n_cells += 1
    assert n_cells >= len(roles) * 2


def test_label_values_and_series_list(spark, transcripts, transcripts_pdf):
    """Prometheus metadata-API analogs vs a pandas recompute: sorted
    distinct label values (nulls as ""), matcher-restricted variant,
    and the distinct label-set listing."""
    from prom_tsdb_copyer_spark.operators.query import (
        label_values,
        series_list,
    )

    tier = _tier(transcripts)
    got = [r["value"] for r in label_values(tier, "tool", SERIES).collect()]
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("")
    assert got == sorted(p["tool"].unique())
    # matcher-restricted: only tools that co-occur with role=assistant
    got_m = [
        r["value"]
        for r in label_values(
            tier, "tool", SERIES, matchers=["role=assistant"]
        ).collect()
    ]
    assert got_m == sorted(p[p["role"] == "assistant"]["tool"].unique())
    # series listing: exact distinct label tuples, ordered
    got_s = [(r["conv_id"], r["role"], r["tool"])
             for r in series_list(tier, SERIES).collect()]
    want_s = sorted(
        {(c, r, t) for c, r, t in zip(p["conv_id"], p["role"], p["tool"])}
    )
    assert got_s == want_s


def test_label_values_pushdown(spark, transcripts, tmp_path):
    """The matcher + range predicates reach the parquet scan and the
    read schema prunes to the selected columns (no full-width scan for
    a one-column metadata query)."""
    import io
    from contextlib import redirect_stdout

    from prom_tsdb_copyer_spark.operators.query import label_values

    path = str(tmp_path / "tier")
    _tier(transcripts).write.parquet(path)
    tier = spark.read.parquet(path)
    q = label_values(tier, "tool", SERIES, matchers=["role=assistant"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain()
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "role" in plan
    assert "value#" not in plan.split("ReadSchema")[-1]


def test_label_values_series_list_vs_duckdb(spark, transcripts,
                                            transcripts_pdf):
    """Gate-ready oracle SQL for the metadata-API analogs (VERDICT r6
    "pytest-only without a twin" list; r8 rotation candidates): DuckDB
    recomputes both listings from the RAW table under the same matcher
    + hour-bucket range law the Spark side applies to the materialized
    tier -- tier-derived metadata must equal raw-derived metadata
    exactly (a tier bucket lies in [from, to] iff its raw rows' hour
    buckets do)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import (
        label_values,
        series_list,
    )

    tier = _tier(transcripts)
    lo = tier.agg(F.min("bucket_ms")).first()[0]
    from_ms, to_ms = lo, lo + 6 * 3600_000

    got_lv = [
        r["value"]
        for r in label_values(
            tier, "tool", SERIES, matchers=["role=assistant"],
            from_ms=from_ms, to_ms=to_ms,
        ).collect()
    ]
    got_sl = [
        (r["conv_id"], r["role"], r["tool"])
        for r in series_list(
            tier, SERIES, matchers=["tool!~(s|w).*"],
            from_ms=from_ms, to_ms=to_ms,
        ).collect()
    ]

    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    lv_sql = f"""
        SELECT DISTINCT coalesce(CAST(tool AS VARCHAR), '') AS value
        FROM transcripts
        WHERE role = 'assistant'
          AND (epoch_ms(ts) // 3600000) * 3600000
              BETWEEN {from_ms} AND {to_ms}
        ORDER BY 1
    """
    want_lv = [r[0] for r in con.sql(lv_sql).fetchall()]
    assert got_lv == want_lv and want_lv  # nonempty, order included
    # null label ≡ "" on BOTH the projection and the matcher input
    sl_sql = f"""
        SELECT DISTINCT coalesce(CAST(conv_id AS VARCHAR), '') AS conv_id,
               coalesce(role, '') AS role, coalesce(tool, '') AS tool
        FROM transcripts
        WHERE NOT regexp_full_match(coalesce(tool, ''), '(?:(s|w).*)')
          AND (epoch_ms(ts) // 3600000) * 3600000
              BETWEEN {from_ms} AND {to_ms}
        ORDER BY 1, 2, 3
    """
    want_sl = [tuple(r) for r in con.sql(sl_sql).fetchall()]
    assert got_sl == want_sl and want_sl


def test_idelta_irate_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for idelta/irate (r9 rotation fuel, the
    r7->r8 twin-then-promote protocol): DuckDB recomputes the
    last-two-samples law independently -- lag window per series,
    PromQL both-samples-inside-the-window restriction, arg_max picks.
    All outputs are SELECTIONS (never accumulated sums), so the values
    are bit-deterministic across partitionings -- the property that
    makes this twin promotable to a value-hashed gate row."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import idelta_irate

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (
            r["idelta"], round(r["irate_per_sec"], 9)
        )
        for r in idelta_irate(transcripts, SERIES, "1d").collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        WITH s AS (
          SELECT conv_id, role, tool, value, epoch_us(ts) AS us,
                 (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms,
                 lag(value) OVER w AS pv,
                 lag(epoch_us(ts)) OVER w AS pt
          FROM transcripts
          WINDOW w AS (PARTITION BY conv_id, role, tool
                       ORDER BY epoch_us(ts))),
        p AS (SELECT *, (pt // 1000 // {DAY_MS}) * {DAY_MS} AS pw
              FROM s WHERE pt IS NOT NULL)
        SELECT conv_id, role, tool, window_ms,
               arg_max(value - pv, us) AS idelta,
               arg_max(CASE WHEN value >= pv THEN value - pv
                            ELSE value END, us)
                 / (arg_max(us - pt, us) / 1000000.0) AS irate_per_sec
        FROM p WHERE pw = window_ms
        GROUP BY 1, 2, 3, 4
    """
    want = {
        (c, r, t, int(w)): (float(i), round(float(ir), 9))
        for c, r, t, w, i, ir in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 100


def test_quantile_over_time_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for quantile_over_time (r9 rotation
    fuel): DuckDB's quantile_cont implements the same linear-
    interpolation rule as Spark's percentile (PromQL's rule). The
    aggregate is order-INDEPENDENT (a sorted-multiset selection, not
    an accumulated float sum), so round-to-6 values are stable enough
    for a hashed gate row -- unlike stddev/deriv, whose accumulated
    sums stay tolerance-compared in their numpy pytests."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import quantile_over_time

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]):
            (r["n_samples"], round(r["quantile"], 6))
        for r in quantile_over_time(
            transcripts, SERIES, "1d", q=0.9
        ).collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        SELECT conv_id, role, tool,
               (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms,
               count(value) AS n_samples,
               round(quantile_cont(value, 0.9), 6) AS quantile
        FROM transcripts
        GROUP BY 1, 2, 3, 4
    """
    want = {
        (c, r, t, int(w)): (int(n), float(q))
        for c, r, t, w, n, q in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 100


def test_deriv_vs_duckdb_tolerance(spark, transcripts, transcripts_pdf):
    """deriv's least-squares slope recomputed in DuckDB from the same
    window-recentered sums. Accumulated float sums are order-dependent
    at the ulp level, so this twin compares with a relative tolerance
    and deriv deliberately stays OFF the hashed gate (the contract's
    accumulated-DOUBLE rule) -- the twin still pins the algebra against
    an independent engine."""
    import math

    import duckdb

    from prom_tsdb_copyer_spark.operators.query import deriv

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): r["deriv_per_sec"]
        for r in deriv(transcripts, SERIES, "1d").collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        WITH d AS (
          SELECT conv_id, role, tool, value,
                 (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms,
                 epoch_us(ts) / 1000000.0
                   - ((epoch_ms(ts) // {DAY_MS}) * {DAY_MS}) / 1000.0
                   AS t_s
          FROM transcripts)
        SELECT conv_id, role, tool, window_ms,
               CASE WHEN count(*) > 1
                     AND count(*) * sum(t_s * t_s)
                         - sum(t_s) * sum(t_s) != 0
                    THEN (count(*) * sum(t_s * value)
                          - sum(t_s) * sum(value))
                         / (count(*) * sum(t_s * t_s)
                            - sum(t_s) * sum(t_s)) END AS deriv_per_sec
        FROM d GROUP BY 1, 2, 3, 4
    """
    want = {
        (c, r, t, int(w)): (None if s is None else float(s))
        for c, r, t, w, s in con.sql(sql).fetchall()
    }
    assert set(got) == set(want) and len(want) > 100
    for k, v in want.items():
        g = got[k]
        if v is None or g is None:
            assert v == g, k
        else:
            assert math.isclose(g, v, rel_tol=1e-6, abs_tol=1e-9), (k, g, v)


def test_count_values_vs_duckdb(spark, transcripts, transcripts_pdf):
    """count_values (value-distribution per window + distinct-series
    count) against an independent DuckDB twin. Exact BIGINT counts over
    double group keys -- grouping compares values bitwise in both
    engines, so the twin is value-hash promotable (r9 gate fuel)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import count_values

    got = {
        (r["window_ms"], r["value"]): (r["n_samples"], r["n_series"])
        for r in count_values(
            transcripts, "1d", series_cols=SERIES
        ).collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        SELECT (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms,
               value,
               count(*)::BIGINT AS n_samples,
               count(DISTINCT conv_id || chr(31) || role
                     || chr(31) || coalesce(tool, ''))::BIGINT AS n_series
        FROM transcripts GROUP BY 1, 2
    """
    want = {
        (int(w), float(v)): (int(ns), int(nr))
        for w, v, ns, nr in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 100


def test_holt_winters_vs_scalar_reference(spark, transcripts,
                                          transcripts_pdf):
    """holt_winters_smooth == a pure-python recompute of the PromQL
    double-exponential-smoothing recurrence on identically-sorted
    samples; <2-sample windows emit NULL. Accumulated float state =>
    tolerance comparison, off the hashed gate (the deriv rule)."""
    import math

    from prom_tsdb_copyer_spark.operators.query import holt_winters_smooth

    sf, tf = 0.4, 0.3
    got = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["window_ms"]):
            (r["n_samples"], r["smoothed"])
        for r in holt_winters_smooth(
            transcripts, SERIES, "1d", sf=sf, tf=tf,
            tiebreak_cols=["turn_idx"],
        ).collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["us"] = p["ts"].astype("int64") // 1000
    p["window_ms"] = (p["us"] // 1000 // DAY_MS) * DAY_MS
    n_checked = 0
    for key, g in p.groupby(["conv_id", "role", "tool", "window_ms"]):
        g = g.sort_values(["us", "turn_idx"], kind="mergesort")
        x = g["value"].to_numpy()
        n, have = got[key]
        assert n == len(x), key
        if len(x) < 2:
            assert have is None, key
            continue
        s, b = x[0], x[1] - x[0]
        for t in range(1, len(x)):
            s_prev = s
            s = sf * x[t] + (1.0 - sf) * (s + b)
            b = tf * (s - s_prev) + (1.0 - tf) * b
        assert math.isclose(have, s, rel_tol=1e-9, abs_tol=1e-12), (
            key, have, s,
        )
        n_checked += 1
    assert n_checked > 50
    import pytest as _pytest

    with _pytest.raises(ValueError):
        holt_winters_smooth(transcripts, SERIES, "1d", sf=1.5)


def test_mad_over_time_vs_duckdb(spark, transcripts, transcripts_pdf):
    """mad_over_time == an independent DuckDB recompute (median, then
    median of absolute deviations, both quantile_cont -- the same
    interpolation law the quantile twin pins). Selection aggregates,
    order-independent: r9 gate fuel."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import mad_over_time

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]):
            (r["n_samples"], round(r["mad"], 6))
        for r in mad_over_time(transcripts, SERIES, "1d").collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        WITH b AS (
          SELECT conv_id, role, tool, value,
                 (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms
          FROM transcripts),
        med AS (
          SELECT conv_id, role, tool, window_ms,
                 quantile_cont(value, 0.5) AS med,
                 count(value) AS n
          FROM b GROUP BY 1, 2, 3, 4)
        SELECT b.conv_id, b.role, b.tool, b.window_ms,
               any_value(med.n) AS n_samples,
               round(quantile_cont(abs(b.value - med.med), 0.5), 6) AS mad
        FROM b JOIN med
          ON b.conv_id = med.conv_id AND b.role = med.role
         AND (b.tool = med.tool OR (b.tool IS NULL AND med.tool IS NULL))
         AND b.window_ms = med.window_ms
        GROUP BY 1, 2, 3, 4
    """
    want = {
        (c, r, t, int(w)): (int(n), round(float(m), 6))
        for c, r, t, w, n, m in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 100


def test_last_over_time_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for last/count/present_over_time (r9
    rotation fuel): DuckDB recomputes the law independently -- arg_max
    by sample time per (series, day window) plus the sample count.
    Selections and integer counts only: value-hash promotable. The
    fixture's per-series timestamps are strictly increasing
    (FIXTURES.md §1) so the time order key is unique; ties in other
    data are broken by `tiebreak_cols` (exercised in the absent test's
    composed path)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import last_over_time

    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (
            r["last_val"], int(r["last_ts_us"]), int(r["cnt"]), r["present"]
        )
        for r in last_over_time(transcripts, SERIES, "1d").collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = f"""
        SELECT conv_id, role, tool,
               (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS window_ms,
               arg_max(value, epoch_us(ts)) AS last_val,
               max(epoch_us(ts)) AS last_ts_us,
               count(value) AS cnt,
               TRUE AS present
        FROM transcripts
        GROUP BY 1, 2, 3, 4
    """
    want = {
        (c, r, t, int(w)): (float(v), int(u), int(n), bool(p))
        for c, r, t, w, v, u, n, p in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 100


def test_absent_over_time_vs_duckdb(spark, transcripts, transcripts_pdf):
    """absent_over_time over an explicit query range: DuckDB twin
    builds the same window calendar (generate_series over the aligned
    range x distinct observed series) and left-joins per-window
    counts; absent == no samples. Planted coverage: the fixture's
    conversations are bursty at day grain, so BOTH values of `absent`
    must occur (asserted) -- and the per-series default-extent variant
    must agree with gapfill's bounded-calendar law (no absent=True row
    outside a gap)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.query import absent_over_time

    p = transcripts_pdf
    lo = int(p["ts"].astype("int64").min() // 1_000_000)
    hi = int(p["ts"].astype("int64").max() // 1_000_000) + 1
    got = {
        tuple(r[c] for c in [*SERIES, "window_ms"]): (
            bool(r["absent"]), int(r["cnt"])
        )
        for r in absent_over_time(
            transcripts, SERIES, 6 * 3_600_000, range_ms=(lo, hi)
        ).collect()
    }
    assert any(a for a, _ in got.values())
    assert any(not a for a, _ in got.values())

    w_ms = 6 * 3_600_000
    lo_al = (lo // w_ms) * w_ms
    last = ((hi - 1) // w_ms) * w_ms
    con = duckdb.connect()
    con.register("transcripts", p)
    sql = f"""
        WITH counts AS (
          SELECT conv_id, role, tool,
                 (epoch_ms(ts) // {w_ms}) * {w_ms} AS window_ms,
                 count(*) AS cnt
          FROM transcripts GROUP BY 1, 2, 3, 4),
        cal AS (
          SELECT DISTINCT conv_id, role, tool, w.window_ms
          FROM counts, (SELECT unnest(generate_series(
                 {lo_al}, {last}, {w_ms})) AS window_ms) w)
        SELECT cal.conv_id, cal.role, cal.tool, cal.window_ms,
               c.cnt IS NULL AS absent,
               coalesce(c.cnt, 0) AS cnt
        FROM cal LEFT JOIN counts c
          ON c.conv_id = cal.conv_id AND c.role = cal.role
         AND (c.tool = cal.tool OR (c.tool IS NULL AND cal.tool IS NULL))
         AND c.window_ms = cal.window_ms
    """
    want = {
        (c, r, t, int(w)): (bool(a), int(n))
        for c, r, t, w, a, n in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > len(
        {k[:3] for k in want}
    )  # calendar is dense: more rows than series

    # default (per-series extent) variant: absent rows are exactly the
    # interior gaps -- never before the first or after the last sample
    dflt = absent_over_time(transcripts, SERIES, 6 * 3_600_000).collect()
    ext = {}
    for (c, r, t, w), (_, n) in want.items():
        if n:
            cur = ext.get((c, r, t))
            ext[(c, r, t)] = (
                (w, w) if cur is None
                else (min(cur[0], w), max(cur[1], w))
            )
    for row in dflt:
        k = (row["conv_id"], row["role"], row["tool"])
        lo_k, hi_k = ext[k]
        assert lo_k <= row["window_ms"] <= hi_k
        assert row["absent"] == (want[(*k, row["window_ms"])][1] == 0)
