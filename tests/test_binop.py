"""PromQL vector-matching binary ops (operators/binop.py) vs
independent DuckDB recomputes of the same join-and-operate law.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.binop import vector_binop
from prom_tsdb_copyer_spark.operators.rollup import (
    aggregate_by_labels,
    rollup,
)

SERIES = ["conv_id", "role", "tool"]

TIER_SQL = """
    WITH tier AS (
      SELECT conv_id, role, tool,
             (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
             count(value) AS cnt, sum(value) AS sum_val
      FROM transcripts GROUP BY 1, 2, 3, 4)
"""


def _tiers(transcripts):
    t = rollup(transcripts, SERIES, "value", "1h")
    sums = t.select(*SERIES, "bucket_ms", F.col("sum_val").alias("value"))
    cnts = t.select(
        *SERIES, "bucket_ms", F.col("cnt").cast("double").alias("value")
    )
    return t, sums, cnts


def test_binop_1to1_ratio_vs_duckdb(spark, transcripts, transcripts_pdf):
    """sum_val / cnt, 1:1 over the full label set == the DuckDB ratio;
    output labels collapse to the match keys + time (PromQL drops the
    metric name; here both sides share the full set so nothing else
    drops)."""
    _, sums, cnts = _tiers(transcripts)
    out = vector_binop(sums, cnts, "/", SERIES)
    assert set(out.columns) == {*SERIES, "bucket_ms", "value"}
    got = {
        (r["conv_id"], r["role"], r["tool"], r["bucket_ms"]):
            round(r["value"], 9)
        for r in out.collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    want = {
        (c, ro, t, int(b)): round(float(v), 9)
        for c, ro, t, b, v in con.sql(
            TIER_SQL
            + "SELECT conv_id, role, tool, bucket_ms,"
              " sum_val / cnt FROM tier"
        ).fetchall()
    }
    assert got == want and len(want) > 100


def test_binop_group_left_share_vs_duckdb(spark, transcripts,
                                          transcripts_pdf):
    """Per-series share of its role's hourly total: many-to-one
    ``sums / on(role, bucket) group_left role_total`` -- the right
    side is the label-aggregated relation (aggregate_by_labels), the
    output carries the LEFT side's full label set."""
    _, sums, _ = _tiers(transcripts)
    t = rollup(transcripts, SERIES, "value", "1h")
    totals = aggregate_by_labels(t, SERIES, by=["role"]).select(
        "role", "bucket_ms", F.col("sum_val").alias("value")
    ).where("value <> 0")  # zero totals make shares +/-Inf (IEEE law
    # covered by test_binop_ieee_edge_laws); keep this twin finite
    out = vector_binop(
        sums, totals, "/", SERIES, on=["role"], group="group_left",
        strict=True,
    )
    assert set(out.columns) == {*SERIES, "bucket_ms", "value"}
    got = {
        (r["conv_id"], r["role"], r["tool"], r["bucket_ms"]):
            round(r["value"], 9)
        for r in out.collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    want = {
        (c, ro, t, int(b)): round(float(v), 9)
        for c, ro, t, b, v in con.sql(
            TIER_SQL + """
            , totals AS (
              SELECT role, bucket_ms, sum(sum_val) AS tot
              FROM tier GROUP BY 1, 2
              HAVING sum(sum_val) <> 0)
            SELECT t.conv_id, t.role, t.tool, t.bucket_ms,
                   t.sum_val / x.tot
            FROM tier t JOIN totals x
              ON x.role = t.role AND x.bucket_ms = t.bucket_ms
            """
        ).fetchall()
    }
    assert got == want and len(want) > 100
    # shares sum to 1 per (role, bucket)
    sums_by_group = (
        out.groupBy("role", "bucket_ms").agg(F.sum("value").alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums_by_group)


def test_binop_comparison_filter_and_bool(spark, transcripts):
    """`sums > cnts` filters keeping the left value; with bool_mode it
    emits 1.0/0.0 for every matched pair (no filtering)."""
    _, sums, cnts = _tiers(transcripts)
    base = vector_binop(sums, cnts, "/", SERIES).count()
    filt = vector_binop(sums, cnts, ">", SERIES)
    boolv = vector_binop(sums, cnts, ">", SERIES, bool_mode=True)
    n_filt, n_bool = filt.count(), boolv.count()
    assert n_bool == base  # bool keeps every matched pair
    assert 0 < n_filt < base  # fixture has values above AND below cnt
    assert boolv.where(~F.col("value").isin(0.0, 1.0)).count() == 0
    assert boolv.where("value = 1.0").count() == n_filt
    # filtered rows keep the LEFT (sum) value: every kept value must
    # exceed its count, and appear in the sums relation
    joined = filt.join(
        sums.withColumnRenamed("value", "sv"),
        on=[*SERIES, "bucket_ms"],
        how="left",
    )
    assert joined.where("value <> sv").count() == 0


def test_binop_validation_and_strict(spark, transcripts):
    _, sums, cnts = _tiers(transcripts)
    with pytest.raises(ValueError, match="at most one"):
        vector_binop(sums, cnts, "/", SERIES, on=["role"],
                     ignoring=["tool"])
    with pytest.raises(ValueError, match="unknown op"):
        vector_binop(sums, cnts, "//", SERIES)
    with pytest.raises(ValueError, match="bool_mode"):
        vector_binop(sums, cnts, "+", SERIES, bool_mode=True)
    with pytest.raises(ValueError, match="match labels"):
        vector_binop(sums, cnts, "/", SERIES, on=["nope"])
    with pytest.raises(ValueError, match="group must be"):
        vector_binop(sums, cnts, "/", SERIES, group="left")
    # strict 1:1 with a genuinely many-to-many match (on role only):
    # PromQL's duplicate-series error
    with pytest.raises(ValueError, match="duplicate series"):
        vector_binop(sums, cnts, "/", SERIES, on=["role"], strict=True)


def test_binop_ieee_edge_laws(spark):
    """PromQL's IEEE division/mod edges, which ANSI Spark would raise
    on: x/0 -> +/-Inf, 0/0 -> NaN, x%0 -> NaN, null propagates."""
    import math

    rows = [(1.0, 0.0), (-2.0, 0.0), (0.0, 0.0), (7.0, 2.0),
            (None, 0.0), (3.0, None)]
    df = spark.createDataFrame(
        [("k", i, a, b) for i, (a, b) in enumerate(rows)],
        "g string, bucket_ms long, value double, bv double",
    )
    left = df.select("g", "bucket_ms", "value")
    right = df.select("g", "bucket_ms", F.col("bv").alias("value"))
    div = {
        r["bucket_ms"]: r["value"]
        for r in vector_binop(left, right, "/", ["g"]).collect()
    }
    assert div[0] == float("inf") and div[1] == float("-inf")
    assert math.isnan(div[2]) and div[3] == 3.5
    assert div[4] is None and div[5] is None
    mod = {
        r["bucket_ms"]: r["value"]
        for r in vector_binop(left, right, "%", ["g"]).collect()
    }
    assert math.isnan(mod[0]) and mod[3] == 1.0 and mod[4] is None


def test_binop_comparison_filter_group_right_keeps_left_value(
    spark, transcripts
):
    """ADVICE r8 #1: in filter-mode comparisons under group_right the
    surviving rows carry the RIGHT (many) side's labels but the LEFT
    operand's VALUE (Prometheus vectorElemBinop propagates the left
    sample for non-bool comparisons). Mirror law: `totals < sums
    group_right` must keep exactly the pairs `sums > totals group_left`
    keeps, with the same (left-side) values attached to the same many-
    side label sets."""
    _, sums, cnts = _tiers(transcripts)
    totals = (
        cnts.groupBy("role", "bucket_ms")
        .agg(F.sum("value").alias("value"))
    )
    left_keep = vector_binop(
        sums, totals, ">", SERIES, on=["role"], group="group_left"
    )
    right_keep = vector_binop(
        totals, sums, "<", SERIES, on=["role"], group="group_right"
    )
    key = [*SERIES, "bucket_ms"]
    got_l = {tuple(r[c] for c in key): r["value"]
             for r in left_keep.collect()}
    got_r = {tuple(r[c] for c in key): r["value"]
             for r in right_keep.collect()}
    assert len(got_l) > 0
    # same surviving many-side elements
    assert set(got_l) == set(got_r)
    # group_left keeps the left=many sums value; group_right must keep
    # the left=one TOTALS value, not the many side's
    tot = {(r["role"], r["bucket_ms"]): r["value"]
           for r in totals.collect()}
    for k, v in got_r.items():
        role, bucket = k[1], k[3]
        assert v == tot[(role, bucket)]
        assert v != got_l[k] or tot[(role, bucket)] == got_l[k]
