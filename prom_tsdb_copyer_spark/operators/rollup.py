"""Tier rollups: the engine's core aggregation (SURVEY.md §2.4 A1/A6).

The reference's core loop -- iterate series, consume that series' samples
in time order, append to an output block (/root/reference/copyer.go:91-156)
-- is in Spark exactly one hash-shuffled aggregation:

    groupBy(series labels, epoch-aligned bucket).agg(...)

Per (series, bucket) we keep the algebraic summary (count, sum, min, max,
first, last + the first/last order keys), chosen so coarser tiers are
*exact* re-aggregations of finer ones (1h = reagg(1m), 1d = reagg(1h)):
partial->final aggregation, the Spark-native analog of TSDB leveled
compaction producing coarser blocks. first/last are made deterministic
with ``min_by``/``max_by`` on an int64 microsecond order key rather than
relying on encounter order.

Scale notes: the single groupBy is THE shuffle of the pipeline; map-side
partial aggregation halves it, AQE coalesces the long tail, and hot
series are handled upstream by salting (operators/skew.py). No global
sort anywhere (the reference likewise iterates series unsorted,
copyer.go:91 ``sortSeries=false``).

Single-shuffle clustered mode (``cluster=(lo_ms, chunk_ms, n)``): the
materialized-write path needs tier rows clustered by time chunk so the
day-partitioned sink writes few, contiguous files -- naively that is a
SECOND full exchange after the aggregation one. Instead, a `_pid` time-
chunk id (a pure function of bucket_ms) is added to the GROUP KEYS and
the input is pre-partitioned on it: HashPartitioning(_pid) satisfies the
aggregation's clustering requirement (subset rule), so Catalyst inserts
NO further exchange and the agg output lands already time-clustered for
the writer. One shuffle instead of two -- measured ~15% off the finest-
tier write leg at 22M rows, and at 100TB it halves the largest shuffle
in the job. Best for low-reduction tiers (the finest); for the coarsest
tier partial aggregation compresses the classic exchange far below the
input size, so two-shuffle wins there (plans/copy_job.py picks per
tier). `cluster` changes partitioning only -- groups, and therefore
values, are identical (the chunk id is constant within a bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import TIER_MS, bucket_ms_col, unix_us

#: canonical tier table columns appended to (series..., bucket_ms)
AGG_COLS = ("cnt", "sum_val", "min_val", "max_val", "first_val", "last_val",
            "first_ord", "last_ord")


def _order_key(ts: Column) -> Column:
    """int64 microsecond order key; unique per series in both the
    transcripts fixture (strictly increasing ts per conversation,
    FIXTURES.md §1) and the driver's events table (verified unique)."""
    return unix_us(ts)


def _clustered(prepared: DataFrame, cluster: tuple[int, int, int]):
    """Add the `_pid` time-chunk key and pre-partition on it (see module
    docstring: single-shuffle clustered mode). Returns (df, extra_keys)."""
    lo, chunk, n = cluster
    d = prepared.withColumn(
        "_pid",
        ((F.col("bucket_ms") - F.lit(int(lo))) / F.lit(int(max(chunk, 1))))
        .cast("long"),
    )
    return d.repartition(n, "_pid"), ["_pid"]


def rollup(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    tier: str | int,
    ts_col: str = "ts",
    cluster: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Raw samples -> one tier table: (series..., bucket_ms, AGG_COLS).

    ``tier`` is "1m"/"1h"/"1d" or a duration in ms. ``cluster`` enables
    single-shuffle clustered mode (module docstring).
    """
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    val = F.col(value_col)
    ord_key = F.col("_ord")
    # project the order key ONCE: aggregate buffers don't share common
    # subexpressions, so the 4 aggregates referencing it would otherwise
    # each evaluate unix_micros(cast(ts)) per row (-27% measured)
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        _order_key(F.col(ts_col)).alias("_ord"),
        val,
    )
    extra: list[str] = []
    if cluster is not None:
        prepared, extra = _clustered(prepared, cluster)
    out = (
        prepared.groupBy(*extra, *series_cols, "bucket_ms")
        .agg(
            F.count(val).alias("cnt"),
            F.sum(val).alias("sum_val"),
            F.min(val).alias("min_val"),
            F.max(val).alias("max_val"),
            F.min_by(val, ord_key).alias("first_val"),
            F.max_by(val, ord_key).alias("last_val"),
            F.min(ord_key).alias("first_ord"),
            F.max(ord_key).alias("last_ord"),
        )
    )
    return out.drop(*extra) if extra else out


def reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    cluster: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Exact partial->final re-aggregation of a finer tier into a coarser
    one. All aggregates are algebraic, so this is lossless: count/sum add,
    min/max fold, first/last select by the carried order keys.
    """
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = tier_df.withColumn(
        "bucket_ms", (F.floor(F.col("bucket_ms") / tier_ms) * tier_ms).cast("long")
    )
    extra: list[str] = []
    if cluster is not None:
        prepared, extra = _clustered(prepared, cluster)
    out = (
        prepared.groupBy(*extra, *series_cols, "bucket_ms")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.min_by("first_val", F.col("first_ord")).alias("first_val"),
            F.max_by("last_val", F.col("last_ord")).alias("last_val"),
            F.min("first_ord").alias("first_ord"),
            F.max("last_ord").alias("last_ord"),
        )
    )
    return out.drop(*extra) if extra else out


def cascade(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
) -> dict[str, DataFrame]:
    """Raw -> finest tier, then each coarser tier from the previous one
    (never re-reading raw data -- the continuous-aggregate cascade)."""
    out: dict[str, DataFrame] = {}
    finest = tiers[0]
    out[finest] = rollup(df, series_cols, value_col, finest, ts_col)
    prev = out[finest]
    for tier in tiers[1:]:
        prev = reaggregate(prev, series_cols, tier)
        out[tier] = prev
    return out


def aggregate_by_labels(
    tier_df: DataFrame,
    series_cols: list[str],
    by: list[str] | None = None,
    without: list[str] | None = None,
) -> DataFrame:
    """PromQL aggregation across series at a tier grain: ``sum by
    (labels) (metric)`` / ``... without (labels)`` re-expressed over
    the materialized tier table (query.py reads tiers, never raw --
    the continuous-aggregate contract).

    Exactly one of `by`/`without` names the label dims to keep; the
    rest are aggregated away. Output: (kept..., bucket_ms, n_series,
    cnt, sum_val, min_val, max_val) -- the PromQL sum/count/min/max
    family in one relation, plus n_series (PromQL's ``count by`` is a
    count of SERIES, not samples; cnt carries the sample count).
    first/last are dropped: their order keys are per-series and PromQL
    defines no cross-series "first" either.

    Scale shape: one groupBy on (kept labels, bucket) whose inputs are
    |tier| rows (not raw samples); all aggregates are algebraic so the
    map-side partial combine absorbs the fan-in, and a hot label value
    (every series sharing one `role`, say) is exactly the AQE-skew
    posture the cascade already documents. Lossless integer/min-max
    algebra -- DuckDB-twinnable and hash-gateable."""
    if (by is None) == (without is None):
        raise ValueError("exactly one of by=/without= must be given")
    if by is not None:
        unknown = [c for c in by if c not in series_cols]
        if unknown:
            raise ValueError(f"by labels not in series_cols: {unknown}")
        kept = [c for c in series_cols if c in by]
    else:
        unknown = [c for c in without if c not in series_cols]
        if unknown:
            raise ValueError(f"without labels not in series_cols: {unknown}")
        kept = [c for c in series_cols if c not in without]
    return (
        tier_df.groupBy(*kept, "bucket_ms")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_series"),
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def aggregate_values_by_labels(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    by: list[str] | None = None,
    without: list[str] | None = None,
    quantiles: tuple[float, ...] = (),
) -> DataFrame:
    """The statistical half of PromQL's aggregation operators --
    ``avg/stddev/stdvar/quantile by (labels)`` -- over a per-series
    value relation at a bucket grain (a tier column, or any read-side
    result with (series..., bucket_ms, value)).

    Output: (kept..., bucket_ms, n_series, avg_val, stddev_val,
    stdvar_val, q_<q> per requested quantile). Variance is population
    (PromQL's stddev/stdvar law); quantiles are exact
    linear-interpolation percentiles (PromQL's quantile law) computed
    by ONE sort-based aggregate per group -- group size is |series per
    label cell|, the same bounded fan-in the label aggregation has,
    so no global sort. Float accumulations (avg/stddev) follow the
    deriv rule: tolerance-twinned, off the hashed gate; the quantile
    columns are selections and hash-stable."""
    if (by is None) == (without is None):
        raise ValueError("exactly one of by=/without= must be given")
    pool = by if by is not None else without
    unknown = [c for c in pool if c not in series_cols]
    if unknown:
        raise ValueError(f"labels not in series_cols: {unknown}")
    if by is not None:
        kept = [c for c in series_cols if c in by]
    else:
        kept = [c for c in series_cols if c not in without]
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    v = F.col(value_col).cast("double")
    aggs = [
        F.count(v).cast("long").alias("n_series"),
        F.avg(v).alias("avg_val"),
        F.stddev_pop(v).alias("stddev_val"),
        F.var_pop(v).alias("stdvar_val"),
    ]
    aggs += [
        F.percentile(v, F.lit(float(q))).alias(f"q_{str(q).replace('.', '_')}")
        for q in quantiles
    ]
    return df.groupBy(*kept, "bucket_ms").agg(*aggs)


def topk_by_labels(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    k: int,
    by: list[str] | None = None,
    without: list[str] | None = None,
    bottom: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL ``topk(k, v) by (labels)`` / ``bottomk``: the k series
    with the largest (smallest) value inside each (label cell, bucket)
    -- full input rows survive, ranked. ONE row_number window per
    group keyed on (kept labels, bucket): no global sort (the §2.6
    discipline), deterministic via the tiebreak columns (PromQL's own
    tie order is unspecified; we pin it). Hot label cells are the
    cap_per_group skew posture: the window sorts-and-spills."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if (by is None) == (without is None):
        raise ValueError("exactly one of by=/without= must be given")
    pool = by if by is not None else without
    unknown = [c for c in pool if c not in series_cols]
    if unknown:
        raise ValueError(f"labels not in series_cols: {unknown}")
    if by is not None:
        kept = [c for c in series_cols if c in by]
    else:
        kept = [c for c in series_cols if c not in without]
    v = F.col(value_col).cast("double")
    order = [v.asc() if bottom else v.desc()]
    order += [F.col(c).asc() for c in (tiebreak_cols or series_cols)]
    w = Window.partitionBy(*kept, "bucket_ms").orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
