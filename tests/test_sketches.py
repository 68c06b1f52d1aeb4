"""Mergeable HLL distinct-count tiers: the merge law (union of finer
sketches == sketch of the raw slice), accuracy vs exact distinct, and
the cascade's raw-touched-once shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.sketches import (
    hll_cascade,
    hll_reaggregate,
    hll_tier,
    with_estimate,
)

SERIES = ["conv_id", "role", "tool"]


def test_merge_law_and_accuracy(spark, transcripts, transcripts_pdf):
    """(1) estimate(union of 1m sketches over each hour) ==
    estimate(sketch built directly from the hour's raw rows) -- the
    law that makes the cascade correct; (2) every estimate within 5%
    of the exact distinct count (lgK=12 ~ 1.6% RSE)."""
    t1m = hll_tier(transcripts, SERIES, "1m", "text")
    t1h_merged = with_estimate(hll_reaggregate(t1m, SERIES, "1h"))
    t1h_direct = with_estimate(hll_tier(transcripts, SERIES, "1h", "text"))
    def keyed(rows):
        return {
            (r["conv_id"], r["role"], r["tool"] or "<null>",
             r["bucket_ms"]): r["n_distinct"]
            for r in rows
        }

    m = keyed(t1h_merged.collect())
    d = keyed(t1h_direct.collect())
    assert m == d and m  # estimate-identical, nonempty

    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    exact = p.groupby(
        ["conv_id", "role", "tool", "bucket_ms"]
    )["text"].nunique()
    for k, est in m.items():
        want = int(exact.loc[k])
        assert abs(est - want) <= max(1, 0.05 * want), (k, est, want)


def test_cascade_shapes_and_monotonicity(spark, transcripts):
    """1d >= 1h >= per-bucket sanity via total distinct conservation:
    summing per-bucket estimates can only overcount vs the coarser
    union (distinct sets overlap), never undercount by more than the
    sketch error."""
    tiers = hll_cascade(transcripts, SERIES, "text")
    est_1h = with_estimate(tiers["1h"]).agg(
        F.sum("n_distinct").alias("s")
    ).first()["s"]
    est_1d = with_estimate(tiers["1d"]).agg(
        F.sum("n_distinct").alias("s")
    ).first()["s"]
    assert est_1d <= est_1h * 1.01  # union <= sum of parts (mod RSE)
    # plan shape: the 1d tier's plan contains NO scan of the raw input
    # (raw is touched once, by the 1m tier; 1d unions 1h sketches)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        tiers["1d"].explain()
    plan = buf.getvalue()
    assert plan.count("hll_union_agg") >= 1
    assert "hll_sketch_agg" in plan  # the single finest-tier build
    # raw input scanned exactly once (1m builds from raw; 1h/1d union)
    assert plan.count("LocalTableScan") == 1
