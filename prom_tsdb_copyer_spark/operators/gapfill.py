"""Gap-fill with last-observation-carried-forward (SURVEY.md §2.5 W4).

Extension required by the north rule (absent in the reference, whose
blocks simply omit empty ranges). Per series: materialize the calendar of
tier buckets bounded to that series' own observed [min_bucket,
max_bucket] (bounding is load-bearing at scale -- an unbounded 1m
calendar over the full table extent would dwarf the data), left-join the
observed tier points, then carry the last non-null observation forward
with an ordered window. Leading holes stay null.

All built-in ops: `sequence` + `explode` for the calendar, `F.last(...,
ignorenulls=True)` over an unbounded-preceding window for the LOCF.
Shuffle profile: one shuffle on (series, bucket) for the join, one on
(series) for the window -- the second reuses the first's clustering in
practice since (series, bucket) hash-clusters series together only
per-key; at 100TB scale prefer `repartition(series)` once upfront.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import TIER_MS


def gapfill_locf(
    tier_df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    fill_cols: tuple[str, ...] = ("last_val",),
    persist_tier: bool = False,
    null_safe: bool = True,
) -> DataFrame:
    """Tier table -> dense per-series calendar with LOCF-filled values.

    Output: series cols, bucket_ms, is_filled, and ``<c>_filled`` for each
    requested fill column (original columns kept, null on gap rows).

    `persist_tier=True`: the tier relation feeds BOTH the per-series
    bounds aggregate and the calendar join's right side, and
    ReusedExchange does not deduplicate them (verified: 2 source scans
    in the executed plan -- the r5 iterative-relation rule, PLANS.md).
    Opt in when `tier_df` is computed from raw (the rollup would run
    twice); leave off when it is a cheap read of a materialized tier
    table (two pruned columnar scans beat pinning it).
    """
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    if persist_tier:
        from pyspark import StorageLevel

        tier_df = tier_df.persist(StorageLevel.MEMORY_AND_DISK)
    bounds = tier_df.groupBy(*series_cols).agg(
        F.min("bucket_ms").alias("_lo"), F.max("bucket_ms").alias("_hi")
    )
    calendar = bounds.select(
        *series_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(tier_ms).cast("long"))
        ).alias("bucket_ms"),
    )
    # series labels can legitimately be null (e.g. `tool` -- Prometheus
    # treats absent labels as ""), so the join must be NULL-safe: a plain
    # equi-join would drop every null-labeled series' observations.
    # `null_safe=False` is the bucketed-tier fast path (the binop rule,
    # operators/binop.py): over a ""-normalized bucketed tier, plain
    # equality keys match the table's hash distribution so the calendar
    # join runs without an exchange; eqNullSafe's coalesce/isnull keys
    # cannot
    right = tier_df
    for c in [*series_cols, "bucket_ms"]:
        right = right.withColumnRenamed(c, f"_r_{c}")
    cond = F.lit(True)
    for c in [*series_cols, "bucket_ms"]:
        pair = (
            F.col(c).eqNullSafe(F.col(f"_r_{c}"))
            if null_safe
            else F.col(c) == F.col(f"_r_{c}")
        )
        cond = cond & pair
    dense = calendar.join(right, on=cond, how="left").drop(
        *[f"_r_{c}" for c in [*series_cols, "bucket_ms"]]
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("bucket_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = dense.withColumn("is_filled", F.col(fill_cols[0]).isNull())
    for c in fill_cols:
        out = out.withColumn(f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(w))
    return out
