"""Native-histogram sample path (SURVEY.md §2.2 F12, closing the one
reference data path with no engine equivalent in round 1).

The reference copies histogram samples via a dedicated append on the
value-type dispatch (/root/reference/copyer.go:117-122: ValHistogram /
ValFloatHistogram -> AppendHistogram), i.e. histograms are first-class
samples, not an error. Here the statically-typed analog is a struct
column

    hist: struct<count: bigint, sum: double, buckets: array<bigint>>

where ``buckets[i]`` is the cumulative count of observations <=
``bounds[i]`` and the last element is the +Inf bucket (== count), the
classic Prometheus layout. Everything below is pure DataFrame algebra:
histograms AGGREGATE by element-wise bucket addition, so tier rollups
and cascades work exactly like the float path -- a fixed, schema-known
bucket count means the element-wise sum is a static ``array(sum(b[0]),
..., sum(b[n]))`` projection, all JVM, no explode and no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import TIER_MS, bucket_ms_col

#: default observation-bucket upper bounds (+Inf bucket is implicit last)
DEFAULT_BOUNDS: tuple[float, ...] = (10.0, 20.0, 40.0)


def make_histogram(
    df: DataFrame,
    value_col: str = "value",
    bounds: tuple[float, ...] = DEFAULT_BOUNDS,
    hist_col: str = "hist",
) -> DataFrame:
    """Observation -> single-sample histogram struct (count=1, sum=value,
    cumulative le-buckets). The ingest shape a histogram-native source
    would deliver directly; used by tests/bench to synthesize histogram
    streams deterministically from float samples."""
    v = F.col(value_col)
    buckets = F.array(
        *[F.when(v <= b, 1).otherwise(0).cast("long") for b in bounds],
        F.lit(1).cast("long"),  # +Inf
    )
    return df.withColumn(
        hist_col,
        F.struct(
            F.lit(1).cast("long").alias("count"),
            v.cast("double").alias("sum"),
            buckets.alias("buckets"),
        ),
    )


def _bucket_sums(hist_col: str, n_buckets: int) -> Column:
    """Element-wise sum over a static-length bucket array -- one JVM
    aggregate per slot, reassembled into an array (no explode)."""
    return F.array(
        *[F.sum(F.col(hist_col)["buckets"][i]) for i in range(n_buckets)]
    )


def hist_rollup(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    n_buckets: int,
    hist_col: str = "hist",
    ts_col: str = "ts",
    cluster: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Per (series, tier bucket): histogram merge = sum of counts, sum of
    sums, element-wise bucket sums (AppendHistogram's batch analog;
    histogram merge is associative+commutative, so the shuffle combines
    partials map-side like any algebraic aggregate). ``cluster`` enables
    the single-shuffle clustered mode (rollup.py module docstring)."""
    from .rollup import _clustered

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.withColumn("bucket_ms", bucket_ms_col(F.col(ts_col), tier_ms))
    extra: list[str] = []
    if cluster is not None:
        prepared, extra = _clustered(prepared, cluster)
    out = (
        prepared
        .groupBy(*extra, *series_cols, "bucket_ms")
        .agg(
            F.sum(F.col(hist_col)["count"]).alias("hist_count"),
            # raw double sum: rounding belongs at presentation time
            # (milli_units for gated outputs); keeping the accumulator
            # raw keeps the cascade algebra exact
            F.sum(F.col(hist_col)["sum"]).alias("hist_sum"),
            _bucket_sums(hist_col, n_buckets).alias("hist_buckets"),
        )
    )
    return out.drop(*extra) if extra else out


def hist_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    n_buckets: int,
    cluster: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Coarser tier from a finer histogram tier (cascade leg): refloor
    bucket_ms and merge -- exact because histogram merge is associative."""
    from .rollup import _clustered

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = tier_df.withColumn(
        "bucket_ms",
        (F.floor(F.col("bucket_ms") / tier_ms) * tier_ms).cast("long"),
    )
    extra: list[str] = []
    if cluster is not None:
        prepared, extra = _clustered(prepared, cluster)
    out = (
        prepared
        .groupBy(*extra, *series_cols, "bucket_ms")
        .agg(
            F.sum("hist_count").alias("hist_count"),
            F.sum("hist_sum").alias("hist_sum"),
            F.array(
                *[F.sum(F.col("hist_buckets")[i]) for i in range(n_buckets)]
            ).alias("hist_buckets"),
        )
    )
    return out.drop(*extra) if extra else out


def hist_quantile(
    tier_df: DataFrame,
    q: float,
    bounds: tuple[float, ...] = DEFAULT_BOUNDS,
    out_col: str = "quantile",
) -> DataFrame:
    """PromQL histogram_quantile analog over a rolled-up histogram tier:
    find the first cumulative bucket crossing rank q*count and linearly
    interpolate inside it (lower bound of the first bucket is 0; the +Inf
    bucket returns its lower bound, as PromQL does). Pure column algebra
    from exact integer counts and literal bounds -> deterministic across
    engines, oracle-expressible as nested CASE."""
    rank = F.lit(q) * F.col("hist_count")
    lo_bound, expr = F.lit(0.0), None
    prev_cum = F.lit(0).cast("long")
    for i, b in enumerate(bounds):
        cum = F.col("hist_buckets")[i]
        in_bucket = (
            lo_bound
            + (F.lit(b) - lo_bound)
            * (rank - prev_cum)
            / F.when(cum - prev_cum > 0, cum - prev_cum).otherwise(F.lit(1))
        )
        cond = cum >= rank
        expr = F.when(cond, in_bucket) if expr is None else expr.when(cond, in_bucket)
        lo_bound, prev_cum = F.lit(float(b)), cum
    expr = expr.otherwise(lo_bound)  # +Inf bucket -> its lower bound
    return tier_df.withColumn(out_col, F.round(expr, 6))


def hist_fraction(
    tier_df: DataFrame,
    lower: float,
    upper: float,
    bounds: tuple[float, ...] = DEFAULT_BOUNDS,
    out_col: str = "fraction",
) -> DataFrame:
    """PromQL histogram_fraction(lower, upper, h) analog: the estimated
    fraction of observations in (lower, upper], linearly interpolating
    inside buckets -- the inverse of hist_quantile's law, sharing its
    conventions (first bucket's lower bound is 0; mass above the last
    finite bound sits in +Inf and interpolates to the total). Pure
    column algebra over exact integer counts and literal bounds, same
    oracle class as hist_quantile (nested CASE). count == 0 -> NaN
    (PromQL's 0/0 law)."""
    if not upper >= lower:
        raise ValueError(f"upper {upper} must be >= lower {lower}")

    def cum_at(x: float) -> Column:
        # x is a LITERAL, so its bucket is picked driver-side -- the
        # result is one arithmetic expression, not a CASE chain
        if x <= 0:
            return F.lit(0).cast("double")
        prev_b = 0.0
        prev_cum = F.lit(0).cast("long")
        for i, b in enumerate(bounds):
            cum = F.col("hist_buckets")[i]
            if x <= b:
                frac = (x - prev_b) / (b - prev_b)
                return prev_cum + (cum - prev_cum) * F.lit(frac)
            prev_b, prev_cum = float(b), cum
        # x above the last finite bound: all observations count
        return F.col("hist_count").cast("double")

    mass = cum_at(upper) - cum_at(lower)
    frac = F.when(
        F.col("hist_count") > 0,
        mass / F.col("hist_count"),
    ).otherwise(F.lit(float("nan")))
    return tier_df.withColumn(out_col, F.round(frac, 6))


def value_hist_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    value_col: str,
    bounds: tuple[float, ...] = DEFAULT_BOUNDS,
    ts_col: str = "ts",
    cluster: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Derive a classic-histogram tier from RAW FLOAT samples: the
    mergeable quantile sketch of the cascade family. Where the numeric
    rollup loses the distribution (only min/max survive) and exact
    percentiles need the raw scan (`quantile_over_time`), this tier
    keeps a fixed-bin CDF per (series, bucket) that merges LOSSLESSLY
    upward (cumulative counts add) and answers quantile/fraction
    queries at any grain via the existing `hist_quantile` /
    `hist_fraction` interpolation laws -- the TimescaleDB
    percentile-rollup design, with bounds as the accuracy knob.

    Output schema == `hist_rollup`'s (hist_count, hist_sum,
    hist_buckets cumulative per bound), so `hist_reaggregate` and both
    read laws apply unchanged. One groupBy with len(bounds)
    conditional counts -- all algebraic, map-side combined, exact
    BIGINTs (DuckDB-twinnable cell for cell).

    Convention: observations are expected in [0, +inf) like classic
    Prometheus buckets; values above the last bound live in the +Inf
    mass (hist_count), values <= 0 land in every bucket and interpolate
    as first-bucket mass.

    Relation to the struct path: equals `make_histogram` |>
    `hist_rollup` on the shared bound prefix (equality pinned in
    tests) -- this direct form skips the per-row struct/array
    projection, aggregating the raw column straight into the
    conditional counts; the struct path remains the ingest shape for
    histogram-NATIVE sources and the streaming twin
    (`streaming_hist_tier_1m`)."""
    from .rollup import _clustered

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    v = F.col(value_col).cast("double")
    prepared = df.withColumn(
        "bucket_ms", bucket_ms_col(F.col(ts_col), tier_ms)
    )
    extra: list[str] = []
    if cluster is not None:
        prepared, extra = _clustered(prepared, cluster)
    out = (
        prepared.groupBy(*extra, *series_cols, "bucket_ms")
        .agg(
            F.count(v).cast("long").alias("hist_count"),
            F.sum(v).alias("hist_sum"),
            F.array(
                *[
                    F.count(F.when(v <= F.lit(float(b)), 1)).cast("long")
                    for b in bounds
                ]
            ).alias("hist_buckets"),
        )
    )
    return out.drop(*extra) if extra else out
