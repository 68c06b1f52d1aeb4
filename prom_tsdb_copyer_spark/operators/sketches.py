"""Mergeable-sketch continuous aggregates: distinct counts that
RE-AGGREGATE exactly through the tier cascade.

`cnt`/`sum`/`min`/`max` reaggregate losslessly from a finer tier
(operators/rollup.py), but COUNT DISTINCT does not -- distinct sets
don't add. The classic continuous-aggregate answer (TimescaleDB's
hyperloglog rollups, Druid/Pinot sketch columns -- public designs) is
to store a MERGEABLE sketch per bucket and union sketches upward.
Spark ships Apache DataSketches HLL natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`, JVM-side aggregates), so the
whole path stays in built-ins: no UDF, map-side partial merges, one
shuffle per tier exactly like the numeric rollup.

The merge law -- union of the 1m sketches over an hour == the sketch
built directly from the hour's raw rows, estimate-identical -- is
what makes the cascade CORRECT, not just cheap; it is pinned in
tests/test_sketches.py, alongside the accuracy gate vs exact distinct
counts (HLL lgK=12 => ~1.6% relative standard error, far inside the
gate's bounds-check tolerance).

Reference scope note: the Go copyer has no sketch surface (568-LoC
block copier); this extends the engine's continuous-aggregate family
the same way the histogram/LTTB tiers do (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import TIER_MS, bucket_ms_col

#: Datasketches HLL lgConfigK: 2^12 registers, ~1.6% RSE -- the
#: TimescaleDB-ish default; raise for tighter estimates (memory per
#: sketch is 2^lgK bytes-ish, per (series, bucket) group)
DEFAULT_LGK = 12


def hll_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    distinct_col: str,
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Raw rows -> (series..., bucket_ms, sketch): one Datasketches HLL
    sketch of `distinct_col` per (series, bucket). Same single-shuffle
    shape as the numeric rollup: the sketch aggregate combines
    map-side, so each reducer receives one partial sketch per
    (group, partition), never the raw values."""
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        F.col(distinct_col).alias("__d"),
    )
    return prepared.groupBy(*series_cols, "bucket_ms").agg(
        F.hll_sketch_agg("__d", F.lit(lgk)).alias("sketch")
    )


def hll_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    coarser: str | int,
) -> DataFrame:
    """Finer sketch tier -> coarser: re-bucket and UNION the sketches
    (`hll_union_agg`) -- the merge that plain count-distinct cannot do.
    One shuffle moving |finer-tier| sketch rows, combined map-side;
    the raw table is never touched again (the continuous-aggregate
    property, same contract as rollup.reaggregate)."""
    coarser_ms = TIER_MS[coarser] if isinstance(coarser, str) else int(coarser)
    rebucket = (
        F.floor(F.col("bucket_ms") / F.lit(coarser_ms)) * F.lit(coarser_ms)
    ).alias("bucket_ms")
    return (
        tier_df.select(*series_cols, rebucket, "sketch")
        .groupBy(*series_cols, "bucket_ms")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def with_estimate(
    sketch_df: DataFrame, out_col: str = "n_distinct"
) -> DataFrame:
    """Materialize the estimate column (read-side projection; the
    sketch column stays available for further merging)."""
    return sketch_df.withColumn(
        out_col, F.hll_sketch_estimate("sketch")
    )


def hll_cascade(
    df: DataFrame,
    series_cols: list[str],
    distinct_col: str,
    tiers: tuple = ("1m", "1h", "1d"),
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
) -> dict[str, DataFrame]:
    """The sketch twin of the numeric tier cascade: the finest tier is
    built from raw ONCE; every coarser tier unions the next-finer
    tier's sketches. Returns {tier: sketch_df}."""
    out: dict[str, DataFrame] = {}
    finest = tiers[0]
    out[finest] = hll_tier(
        df, series_cols, finest, distinct_col, ts_col, lgk
    )
    for finer, coarser in zip(tiers, tiers[1:]):
        out[coarser] = hll_reaggregate(out[finer], series_cols, coarser)
    return out
