"""Native-histogram sample path (F12; reference AppendHistogram,
copyer.go:117-122): merge algebra, cascade path-independence, quantile
semantics, and the ingest value-type dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.histogram import (
    DEFAULT_BOUNDS,
    hist_quantile,
    hist_reaggregate,
    hist_rollup,
    make_histogram,
)
from prom_tsdb_copyer_spark.sources.ingest import (
    UnsupportedValueTypeError,
    validate_samples,
    value_kind,
)

SERIES = ["conv_id", "role", "tool"]
N_BUCKETS = len(DEFAULT_BOUNDS) + 1


def _canon_hist(rows):
    """Set-canonical histogram rows; raw float sums are compared in
    exact milli-units (the gate's own discipline, functions/exact.py)
    so summation-order ULP noise between plans cannot flip equality."""
    def c(v):
        if isinstance(v, float):
            return round(v * 1000)
        return tuple(v) if isinstance(v, list) else v

    return {tuple(c(v) for v in r) for r in rows}


@pytest.fixture(scope="module")
def hists(transcripts):
    return make_histogram(transcripts).cache()


def test_rollup_matches_direct_aggregates(spark, hists):
    """Histogram merge must reproduce the plain float aggregates: count,
    sum, and each cumulative bucket == count of values <= bound."""
    t = hist_rollup(hists, SERIES, "1h", N_BUCKETS)
    direct = (
        hists.withColumn(
            "bucket_ms",
            (F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / 3600000)
             * 3600000).cast("long"),
        )
        .groupBy(*SERIES, "bucket_ms")
        .agg(
            F.count("*").alias("c"),
            F.sum("value").alias("s"),
            *[
                F.sum(F.when(F.col("value") <= b, 1).otherwise(0)).alias(f"b{i}")
                for i, b in enumerate(DEFAULT_BOUNDS)
            ],
        )
    )
    # dict-compare in python: series labels contain nulls (tool), which
    # an equi-join would silently drop
    got = {
        tuple(r[c] for c in [*SERIES, "bucket_ms"]): (
            r["hist_count"], r["hist_sum"], tuple(r["hist_buckets"])
        )
        for r in t.collect()
    }
    want = {
        tuple(r[c] for c in [*SERIES, "bucket_ms"]): (
            r["c"], r["s"],
            tuple([*(r[f"b{i}"] for i in range(len(DEFAULT_BOUNDS))), r["c"]]),
        )
        for r in direct.collect()
    }
    assert set(got) == set(want)
    for k, (c, s, buckets) in want.items():
        gc, gs, gb = got[k]
        # raw float sums: identical up to summation-order ULP noise
        assert gc == c and gb == buckets and abs(gs - s) < 1e-6


def test_cascade_path_independence(spark, hists):
    """1d via 1h reagg == 1d rolled directly from samples (histogram
    merge is associative -- the M2 invariant on the histogram path)."""
    via_1h = hist_reaggregate(
        hist_rollup(hists, SERIES, "1h", N_BUCKETS), SERIES, "1d", N_BUCKETS
    )
    direct = hist_rollup(hists, SERIES, "1d", N_BUCKETS)
    a = _canon_hist(via_1h.collect())
    b = _canon_hist(direct.collect())
    assert a == b


def test_quantile_brackets_and_monotonicity(spark, hists):
    """p50 must land in [0, max bound], be <= p99, and for buckets whose
    cumulative count crosses rank in the first bucket stay <= bounds[0]."""
    t = hist_rollup(hists, SERIES, "1d", N_BUCKETS)
    q50 = hist_quantile(t, 0.5, out_col="p50")
    q99 = hist_quantile(q50, 0.99, out_col="p99")
    rows = q99.select("p50", "p99").collect()
    assert rows
    hi = DEFAULT_BOUNDS[-1]
    for r in rows:
        assert 0.0 <= r["p50"] <= hi
        assert r["p50"] <= r["p99"] + 1e-9


def test_quantile_exact_on_known_histogram(spark):
    """Hand-checkable case: 10 obs, 4 in (<=10], 8 cumulative in (<=20]
    -> p50 rank=5 crosses in bucket 2: 10 + 10*(5-4)/4 = 12.5."""
    df = spark.createDataFrame(
        [("s", 0, 10, 5.0, [4, 8, 10, 10])],
        "k string, bucket_ms long, hist_count long, hist_sum double, "
        "hist_buckets array<bigint>",
    )
    got = hist_quantile(df, 0.5).collect()[0]["quantile"]
    assert got == pytest.approx(12.5, abs=1e-9)


def test_ingest_dispatch(spark):
    base = spark.createDataFrame(
        [("c", "user", "t", 1.5)], "conv_id string, role string, tool string, value double"
    ).withColumn("ts", F.current_timestamp())
    hist = make_histogram(base).drop("value").withColumnRenamed("hist", "value")
    assert value_kind(base) == "float"
    assert value_kind(hist) == "histogram"
    # histogram structs pass the gate untouched
    validate_samples(hist, ["conv_id", "role", "tool"])
    # arbitrary structs still raise, like the reference's unknown branch
    bad = base.withColumn("value", F.struct(F.lit(1).alias("x")))
    with pytest.raises(UnsupportedValueTypeError):
        value_kind(bad)
    with pytest.raises(UnsupportedValueTypeError):
        validate_samples(bad, ["conv_id", "role", "tool"])


def test_flagship_pipeline_dispatches_histograms(spark, hists, tmp_path):
    """run_and_write_rollups routes histogram-valued jobs through the
    bucket-wise merge path (the reference's inline float/histogram
    dispatch in its copy loop): written tiers == direct hist rollups,
    chunk tiers are rejected for histogram values, and ResumableRollup's
    rows_in bookkeeping reads hist_count."""
    from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_and_write_rollups
    from prom_tsdb_copyer_spark.sources.manifest import ResumableRollup, read_manifest
    from prom_tsdb_copyer_spark.operators.windows import DAY_MS
    from prom_tsdb_copyer_spark.sources.tables import time_extent

    df = hists.drop("value").withColumnRenamed("hist", "value")
    root = str(tmp_path / "h")
    job = CopyJob(tiers=("1h", "1d"))
    run_and_write_rollups(spark, df, job, root, collect_counts=False)

    got_1h = _canon_hist(
        spark.read.parquet(f"{root}/tier=1h").drop("part_day").collect()
    )
    want_1h = _canon_hist(
        hist_rollup(hists, SERIES, "1h", N_BUCKETS).collect()
    )
    assert got_1h == want_1h
    got_1d = _canon_hist(
        spark.read.parquet(f"{root}/tier=1d").drop("part_day").collect()
    )
    want_1d = _canon_hist(hist_rollup(hists, SERIES, "1d", N_BUCKETS).collect())
    assert got_1d == want_1d

    with pytest.raises(ValueError, match="chunk"):
        run_and_write_rollups(
            spark, df, CopyJob(tiers=("1h",), chunk_tiers=("1h",)),
            str(tmp_path / "h2"), collect_counts=False,
        )

    lo, hi = time_extent(df)
    root2 = str(tmp_path / "h3")
    ResumableRollup(CopyJob(tiers=("1h",)), root2, DAY_MS).run(df, lo, hi)
    total_in = sum(e.rows_in for e in read_manifest(root2).values())
    assert total_in == df.count()


def test_value_hist_tier_merge_law_quantile_and_duckdb(
    spark, transcripts, transcripts_pdf
):
    """Float-sample histogram tier (the cascade's mergeable quantile
    sketch): (1) 1m->1h re-aggregation == the 1h tier built from raw,
    cell for cell (lossless CDF merge); (2) the cells == a DuckDB
    recompute (exact BIGINT conditional counts); (3) hist_quantile
    over the derived tier brackets the true percentile within one
    bucket (the accuracy the bounds knob buys)."""
    import duckdb
    import numpy as np

    from prom_tsdb_copyer_spark.operators.histogram import (
        hist_quantile,
        hist_reaggregate,
        value_hist_tier,
    )

    series = ["conv_id", "role", "tool"]
    bounds = (5.0, 15.0, 40.0)
    t1m = value_hist_tier(transcripts, series, "1m", "value", bounds)
    merged = hist_reaggregate(t1m, series, "1h", len(bounds))
    direct = value_hist_tier(transcripts, series, "1h", "value", bounds)

    def cells(df):
        return {
            tuple(r[c] for c in [*series, "bucket_ms"]):
                (r["hist_count"], tuple(r["hist_buckets"]))
            for r in df.collect()
        }

    got = cells(direct)
    assert cells(merged) == got and got

    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    conds = ", ".join(
        f"count(*) FILTER (value <= {b})::BIGINT" for b in bounds
    )
    want = {
        (c, ro, tl, int(bm)): (int(n), tuple(int(x) for x in bs))
        for c, ro, tl, bm, n, *bs in con.sql(f"""
        SELECT conv_id, role, tool,
               (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
               count(value)::BIGINT, {conds}
        FROM transcripts GROUP BY 1, 2, 3, 4
        """).fetchall()
    }
    assert got == want

    # quantile bracket: q50 from the sketch lies within the bucket
    # that contains the true (interpolated) median
    q = {
        tuple(r[c] for c in [*series, "bucket_ms"]): r["quantile"]
        for r in hist_quantile(direct, 0.5, bounds).collect()
    }
    p = transcripts_pdf.copy()
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    checked = 0
    for key, g in p.groupby(["conv_id", "role", "tool", "bucket_ms"],
                            dropna=False):
        key = (key[0], key[1], None if key[2] != key[2] else key[2],
               int(key[3]))
        if key not in q:
            continue
        true_med = float(np.percentile(g["value"], 50))
        got_q = q[key]
        if true_med > bounds[-1]:
            assert got_q == bounds[-1]  # +Inf convention
        else:
            import bisect

            b_i = bisect.bisect_left(bounds, true_med)
            lo = 0.0 if b_i == 0 else bounds[b_i - 1]
            hi = bounds[b_i]
            assert lo - 1e-9 <= got_q <= hi + 1e-9, (key, got_q, true_med)
        checked += 1
    assert checked > 100


def test_value_hist_tier_equals_struct_path(spark, transcripts):
    """The direct conditional-count form == make_histogram |>
    hist_rollup on the shared bound prefix (the struct path carries an
    extra explicit +Inf slot that must equal hist_count)."""
    from prom_tsdb_copyer_spark.operators.histogram import (
        hist_rollup,
        make_histogram,
        value_hist_tier,
    )

    series = ["conv_id", "role", "tool"]
    bounds = (5.0, 15.0, 40.0)
    direct = value_hist_tier(transcripts, series, "1h", "value", bounds)
    struct = hist_rollup(
        make_histogram(transcripts, "value", bounds),
        series, "1h", len(bounds) + 1,
    )

    def keyed(df, n):
        return {
            tuple(r[c] for c in [*series, "bucket_ms"]):
                (r["hist_count"], round(r["hist_sum"], 6),
                 tuple(r["hist_buckets"][:n]))
            for r in df.collect()
        }

    d = keyed(direct, len(bounds))
    st = keyed(struct, len(bounds))
    assert d == st and d
    # the struct path's +Inf slot == hist_count everywhere
    assert all(
        r["hist_buckets"][-1] == r["hist_count"]
        for r in struct.collect()
    )
