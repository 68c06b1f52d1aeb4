"""Tier rollup + cascade exactness (SURVEY.md §2.4 A6, §5 test_tiers).

Invariants: 1h == reagg(1m) == direct-from-raw 1h; same for 1d; pandas
oracle recompute for point values.
"""

from __future__ import annotations

import pandas as pd

from prom_tsdb_copyer_spark.operators.rollup import cascade, reaggregate, rollup
from prom_tsdb_copyer_spark.operators.windows import DAY_MS, HOUR_MS, MINUTE_MS

SERIES = ["conv_id", "role", "tool"]
KEY = SERIES + ["bucket_ms"]


def _collect(df):
    pdf = df.toPandas().sort_values(KEY).reset_index(drop=True)
    return pdf.fillna({"tool": "<null>"})


def _oracle(pdf: pd.DataFrame, tier_ms: int) -> pd.DataFrame:
    p = pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["ts_ms"] = p["ts"].astype("int64") // 10**6
    p["bucket_ms"] = (p["ts_ms"] // tier_ms) * tier_ms
    p["ord"] = p["ts"].astype("int64") // 10**3  # ns -> µs
    g = p.sort_values("ord").groupby(KEY, dropna=False)
    out = g.agg(
        cnt=("value", "size"),
        sum_val=("value", "sum"),
        min_val=("value", "min"),
        max_val=("value", "max"),
        first_val=("value", "first"),
        last_val=("value", "last"),
        first_ord=("ord", "min"),
        last_ord=("ord", "max"),
    ).reset_index()
    return out.sort_values(KEY).reset_index(drop=True)


def test_rollup_1m_matches_oracle(spark, transcripts, transcripts_pdf):
    got = _collect(rollup(transcripts, SERIES, "value", "1m"))
    want = _oracle(transcripts_pdf, MINUTE_MS)
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64"}), want.astype({"cnt": "int64"}), check_dtype=False
    )


def test_cascade_exactness(spark, transcripts, transcripts_pdf):
    tiers = cascade(transcripts, SERIES, "value")
    for tier, tier_ms in [("1h", HOUR_MS), ("1d", DAY_MS)]:
        got = _collect(tiers[tier])
        direct = _collect(rollup(transcripts, SERIES, "value", tier))
        pd.testing.assert_frame_equal(got, direct, check_dtype=False)
        want = _oracle(transcripts_pdf, tier_ms)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_reagg_path_independence(spark, transcripts):
    """1d from 1m directly == 1d from 1h from 1m (associativity)."""
    t1m = rollup(transcripts, SERIES, "value", "1m")
    via_1h = reaggregate(reaggregate(t1m, SERIES, "1h"), SERIES, "1d")
    direct = reaggregate(t1m, SERIES, "1d")
    pd.testing.assert_frame_equal(
        _collect(via_1h), _collect(direct), check_dtype=False
    )


def test_aggregate_by_labels_vs_duckdb(spark, transcripts,
                                       transcripts_pdf):
    """PromQL `sum by (role) (...)` / `... without (tool)` over the 1h
    tier vs an independent DuckDB recompute from RAW rows (the twin
    does not reuse the tier relation, so the tier build is re-verified
    inside it). Exact integer/min-max algebra: r9 gate candidate. Also
    pins by/without equivalence and the arg-validation contract."""
    import duckdb
    import pytest

    from prom_tsdb_copyer_spark.operators.rollup import (
        aggregate_by_labels,
        rollup,
    )

    t1h = rollup(transcripts, SERIES, "value", "1h")
    by = aggregate_by_labels(t1h, SERIES, by=["role"])
    got = {
        (r["role"], r["bucket_ms"]): (
            int(r["n_series"]), int(r["cnt"]), round(r["sum_val"], 6),
            r["min_val"], r["max_val"],
        )
        for r in by.collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    sql = """
        WITH tier AS (
          SELECT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 count(value) AS cnt, sum(value) AS sum_val,
                 min(value) AS min_val, max(value) AS max_val
          FROM transcripts GROUP BY 1, 2, 3, 4)
        SELECT role, bucket_ms, count(*) AS n_series, sum(cnt) AS cnt,
               sum(sum_val) AS sum_val, min(min_val) AS min_val,
               max(max_val) AS max_val
        FROM tier GROUP BY 1, 2
    """
    want = {
        (r, int(b)): (int(ns), int(n), round(float(s), 6),
                      float(lo), float(hi))
        for r, b, ns, n, s, lo, hi in con.sql(sql).fetchall()
    }
    assert got == want and len(want) > 50

    # `without` keeps the complement, preserving series_cols order
    wo = aggregate_by_labels(t1h, SERIES, without=["conv_id", "tool"])
    assert wo.columns == by.columns
    assert {
        (r["role"], r["bucket_ms"]): int(r["cnt"]) for r in wo.collect()
    } == {k: v[1] for k, v in got.items()}

    with pytest.raises(ValueError):
        aggregate_by_labels(t1h, SERIES)
    with pytest.raises(ValueError):
        aggregate_by_labels(t1h, SERIES, by=["role"], without=["tool"])
    with pytest.raises(ValueError):
        aggregate_by_labels(t1h, SERIES, by=["nope"])


def test_aggregate_values_and_topk_by_labels_vs_duckdb(
    spark, transcripts, transcripts_pdf
):
    """The statistical + ranked PromQL aggregation operators over the
    1h tier's last_val: quantiles (selection law -> exact equality vs
    quantile_cont), avg/stddev/stdvar (accumulated floats -> tolerance,
    the deriv rule), and topk/bottomk row sets (deterministic under the
    pinned tiebreak)."""
    import duckdb
    import pytest

    from prom_tsdb_copyer_spark.operators.rollup import (
        aggregate_values_by_labels,
        rollup,
        topk_by_labels,
    )

    t = rollup(transcripts, SERIES, "value", "1h")
    got = {
        (r["role"], r["bucket_ms"]): r
        for r in aggregate_values_by_labels(
            t, SERIES, "last_val", by=["role"], quantiles=(0.5, 0.9)
        ).collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    rows = con.sql("""
        WITH tier AS (
          SELECT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 arg_max(value, epoch_us(ts)) AS last_val
          FROM transcripts GROUP BY 1, 2, 3, 4)
        SELECT role, bucket_ms, count(last_val) AS n,
               avg(last_val) AS a, stddev_pop(last_val) AS sd,
               var_pop(last_val) AS vr,
               quantile_cont(last_val, 0.5) AS q5,
               quantile_cont(last_val, 0.9) AS q9
        FROM tier GROUP BY 1, 2
    """).fetchall()
    assert len(rows) > 50 and len(rows) == len(got)
    for role, b, n, a, sd, vr, q5, q9 in rows:
        g = got[(role, int(b))]
        assert g["n_series"] == int(n)
        assert g["avg_val"] == pytest.approx(float(a), rel=1e-9)
        if n > 1:
            assert g["stddev_val"] == pytest.approx(float(sd), rel=1e-9)
            assert g["stdvar_val"] == pytest.approx(float(vr), rel=1e-9)
        # quantiles are selections/interpolations of two order stats:
        # exact to rounding
        assert g["q_0_5"] == pytest.approx(float(q5), abs=1e-9)
        assert g["q_0_9"] == pytest.approx(float(q9), abs=1e-9)

    top = topk_by_labels(t, SERIES, "last_val", 2, by=["role"])
    got_top = {
        (r["role"], r["bucket_ms"], r["rank"]):
            (r["conv_id"], r["tool"], r["last_val"])
        for r in top.collect()
    }
    want_top = {
        (role, int(b), int(rk)): (c, tl, float(v))
        for role, b, rk, c, tl, v in con.sql("""
        WITH tier AS (
          SELECT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 arg_max(value, epoch_us(ts)) AS last_val
          FROM transcripts GROUP BY 1, 2, 3, 4),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY role, bucket_ms
            ORDER BY last_val DESC, conv_id, role, tool) AS rk
          FROM tier)
        SELECT role, bucket_ms, rk, conv_id, tool, last_val
        FROM r WHERE rk <= 2
        """).fetchall()
    }
    assert got_top == want_top and got_top
    # bottomk inverts the value order
    bot = topk_by_labels(t, SERIES, "last_val", 1, by=["role"],
                         bottom=True)
    for r in bot.collect():
        grp = [
            v for (role, b, _), (_, _, v) in want_top.items()
            if role == r["role"] and b == r["bucket_ms"]
        ]
        if grp:
            assert r["last_val"] <= min(grp)

    with pytest.raises(ValueError):
        aggregate_values_by_labels(t, SERIES, "last_val", by=["role"],
                                   quantiles=(1.5,))
    with pytest.raises(ValueError):
        topk_by_labels(t, SERIES, "last_val", 0, by=["role"])
