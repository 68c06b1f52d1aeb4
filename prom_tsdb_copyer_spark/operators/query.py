"""Read-side query operators over tier tables (consumer API).

The reference is a copier, not a query engine -- but its output blocks
are meant to be queried by Prometheus afterwards. This module is that
consumer leg over OUR tier tables: select series by label matchers +
bucket-time range (the same matcher semantics as ingest, applied to
rolled-up data), and the classic time-series derived aggregates
(increase / rate / avg_over_time) computed from the algebraic tier
columns without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..matchers import matchers_predicate
from .windows import TIER_MS


def select_series(
    tier_df: DataFrame,
    series_cols: list[str],
    matchers: list[str] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
    metric_name: str = "turns",
) -> DataFrame:
    """Matcher + bucket-range selection on a tier table.

    bucket_ms is a plain BIGINT column, so the range predicate pushes to
    parquet stats directly; matchers reuse the ingest-side semantics
    (null label ≡ "")."""
    labels = {c: F.col(c) for c in series_cols}
    labels["__name__"] = F.lit(metric_name)
    out = tier_df.where(matchers_predicate(matchers, labels))
    if from_ms is not None:
        out = out.where(F.col("bucket_ms") >= from_ms)
    if to_ms is not None:
        out = out.where(F.col("bucket_ms") <= to_ms)
    return out


def increase(
    tier_df: DataFrame,
    series_cols: list[str],
    window: str | int,
) -> DataFrame:
    """Per (series, coarser window): last_val - first_val -- the
    monotone-counter increase, computed purely from tier columns
    (min_by/max_by over the carried order keys; exact because the tier
    stores true first/last, not samples)."""
    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    return (
        tier_df.withColumn(
            "window_ms", (F.floor(F.col("bucket_ms") / w_ms) * w_ms).cast("long")
        )
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.min_by("first_val", F.col("first_ord")).alias("first_val"),
            F.max_by("last_val", F.col("last_ord")).alias("last_val"),
            (F.max_by("last_val", F.col("last_ord"))
             - F.min_by("first_val", F.col("first_ord"))).alias("increase"),
        )
    )


def rate_per_sec(
    tier_df: DataFrame,
    series_cols: list[str],
    window: str | int,
) -> DataFrame:
    """increase / elapsed-seconds between first and last sample in the
    window (PromQL-rate-like, without extrapolation -- documented
    divergence: Prometheus extrapolates to the window edges)."""
    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    base = (
        tier_df.withColumn(
            "window_ms", (F.floor(F.col("bucket_ms") / w_ms) * w_ms).cast("long")
        )
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.min_by("first_val", F.col("first_ord")).alias("fv"),
            F.max_by("last_val", F.col("last_ord")).alias("lv"),
            F.min("first_ord").alias("fo"),
            F.max("last_ord").alias("lo"),
        )
    )
    elapsed_s = (F.col("lo") - F.col("fo")) / 1_000_000.0
    return base.select(
        *series_cols,
        "window_ms",
        F.when(elapsed_s > 0, F.round((F.col("lv") - F.col("fv")) / elapsed_s, 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("rate_per_sec"),
    )


def counter_resets(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL resets()/changes() analog over RAW samples: per (series,
    window), how many times the value dropped (counter reset) and how
    many times it changed at all. Needs the per-sample scan order, so
    unlike increase/avg it cannot be derived from tier aggregates -- one
    lag window per series (ordered by time + tiebreak for determinism),
    then a windowed count. Exact integer outputs."""
    from pyspark.sql import Window

    from .windows import TIER_MS, bucket_ms_col, unix_ms

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    order = [unix_ms(F.col(ts_col))] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*series_cols).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("window_ms", bucket_ms_col(F.col(ts_col), w_ms))
        .withColumn("_prev", prev)
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.count(F.when(F.col(value_col) < F.col("_prev"), 1)).alias("n_resets"),
            F.count(
                F.when(F.col(value_col) != F.col("_prev"), 1)
            ).alias("n_changes"),
            F.count("*").alias("n_samples"),
        )
    )


def extrema_over_time(
    tier_df: DataFrame, series_cols: list[str], window: str | int
) -> DataFrame:
    """min/max over the window from tier min/max columns (selection
    aggregates -- exact, no rounding needed)."""
    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    return (
        tier_df.withColumn(
            "window_ms", (F.floor(F.col("bucket_ms") / w_ms) * w_ms).cast("long")
        )
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def avg_over_time(
    tier_df: DataFrame, series_cols: list[str], window: str | int
) -> DataFrame:
    """Sample-weighted mean over the window from tier sums/counts.

    Determinism by TYPE, not rounding (functions/exact.py): the window
    sum is emitted as exact BIGINT milli-units (`sum_mills`) alongside
    the exact count; integers hash identically under any engine/version.
    `avg_value` is derived from those two exact integers (identical
    inputs -> identical IEEE quotient) and kept as API convenience --
    gated queries select the (sum_mills, cnt) pair instead."""
    from ..functions.exact import MILLI, milli_units

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    return (
        tier_df.withColumn(
            "window_ms", (F.floor(F.col("bucket_ms") / w_ms) * w_ms).cast("long")
        )
        .groupBy(*series_cols, "window_ms")
        .agg(
            milli_units(F.sum("sum_val")).alias("sum_mills"),
            F.sum("cnt").alias("cnt"),
        )
        .withColumn(
            "avg_value", F.col("sum_mills") / F.lit(MILLI) / F.col("cnt")
        )
    )


def delta_over_time(
    tier_df: DataFrame,
    series_cols: list[str],
    window: str | int,
) -> DataFrame:
    """PromQL delta() (gauge semantics): last - first over the window,
    from tier columns alone -- same selection algebra as increase() but
    without counter semantics (negative deltas are meaningful).
    Documented divergence from PromQL: no edge extrapolation."""
    return increase(tier_df, series_cols, window).select(
        *series_cols, "window_ms", F.col("increase").alias("delta")
    )


def idelta_irate(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL idelta()/irate(): difference (and per-second rate) of the
    LAST TWO samples in each window -- BOTH samples must lie inside the
    window (PromQL range semantics; a window whose last pair straddles
    the boundary emits nothing). Needs raw per-sample order (not
    tier-derivable): one lag window per series, then max_by(window) --
    the same single-shuffle shape as counter_resets. irate uses counter
    semantics (resets clamp to the new value); idelta is the plain
    difference."""
    from pyspark.sql import Window

    from .windows import TIER_MS, bucket_ms_col, unix_us

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    order = [unix_us(F.col(ts_col))] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*series_cols).orderBy(*order)
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_t = F.lag(unix_us(F.col(ts_col))).over(w)
    cur_t = unix_us(F.col(ts_col))
    d = df.withColumn("window_ms", bucket_ms_col(F.col(ts_col), w_ms)).select(
        *series_cols, "window_ms",
        cur_t.alias("_t"),
        (F.col(value_col) - prev_v).alias("_idelta"),
        # counter semantics for irate: a reset makes the increase the
        # new value itself (PromQL's behavior)
        F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v)
        .otherwise(F.col(value_col)).alias("_inc"),
        (cur_t - prev_t).alias("_dt_us"),
        # the PREVIOUS sample's window: pairs must not straddle
        (F.floor(prev_t / F.lit(1000) / w_ms) * w_ms).cast("long")
        .alias("_prev_window_ms"),
    )
    return (
        d.where(
            F.col("_dt_us").isNotNull()
            & (F.col("_prev_window_ms") == F.col("window_ms"))
        )
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.max_by("_idelta", F.col("_t")).alias("idelta"),
            (
                F.max_by("_inc", F.col("_t"))
                / (F.max_by("_dt_us", F.col("_t")) / 1_000_000.0)
            ).alias("irate_per_sec"),
        )
    )


def deriv(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    ts_col: str = "ts",
    value_col: str = "value",
    predict_ahead_s: float | None = None,
) -> DataFrame:
    """PromQL deriv() (and predict_linear() when `predict_ahead_s` is
    set): per-(series, window) simple least-squares regression of value
    on time, entirely as algebraic aggregates --

        slope = (n*S_tv - S_t*S_v) / (n*S_tt - S_t^2)

    computed over time RE-CENTERED on the window start (PromQL does the
    same centering for numerical stability: raw epoch-us squares would
    lose the signal to float cancellation). One shuffle, map-side
    partials, no window function, no UDF -- the shape that scales."""
    from .windows import TIER_MS, bucket_ms_col, unix_us

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    d = df.withColumn("window_ms", bucket_ms_col(F.col(ts_col), w_ms))
    t_s = (unix_us(F.col(ts_col)) / 1_000_000.0) - (F.col("window_ms") / 1000.0)
    v = F.col(value_col)
    agg = d.groupBy(*series_cols, "window_ms").agg(
        F.count(v).alias("_n"),
        F.sum(t_s).alias("_st"),
        F.sum(v).alias("_sv"),
        F.sum(t_s * v).alias("_stv"),
        F.sum(t_s * t_s).alias("_stt"),
        F.max(t_s).alias("_t_last"),
    )
    denom = F.col("_n") * F.col("_stt") - F.col("_st") * F.col("_st")
    slope = F.when(
        (F.col("_n") > 1) & (denom != 0),
        (F.col("_n") * F.col("_stv") - F.col("_st") * F.col("_sv")) / denom,
    )
    out = agg.withColumn("deriv_per_sec", slope)
    if predict_ahead_s is not None:
        intercept = (F.col("_sv") - slope * F.col("_st")) / F.col("_n")
        out = out.withColumn(
            "predicted",
            slope * (F.col("_t_last") + F.lit(float(predict_ahead_s))) + intercept,
        )
    return out.drop("_n", "_st", "_sv", "_stv", "_stt", "_t_last")


def pick_tier(step_ms: int, tiers=("1m", "1h", "1d")) -> str | int:
    """Resolution selection: the COARSEST tier whose grain still divides
    the requested step resolution (Thanos-style auto-downsampling pick
    -- the read-side payoff of keeping retention tiers at all: a
    year-long query at 1d step reads the 1d tier, ~1440x fewer rows
    than 1m). Falls back to the finest tier when nothing is coarse
    enough (step below the finest grain)."""
    grain = lambda t: TIER_MS[t] if isinstance(t, str) else int(t)  # noqa: E731
    ok = [t for t in tiers if grain(t) <= step_ms and step_ms % grain(t) == 0]
    if ok:
        return max(ok, key=grain)
    return min(tiers, key=grain)


def read_tier_auto(
    spark,
    out_root: str,
    step_ms: int,
    from_ms: int | None = None,
    to_ms: int | None = None,
    tiers=("1m", "1h", "1d"),
) -> tuple[str | int, DataFrame]:
    """Read the materialized tier cascade (`run_and_write_rollups`
    layout: `{out_root}/tier={t}/part_day=.../*.parquet`) at the right
    resolution for `step_ms`, with BOTH pruning layers engaged:

    * `part_day` range predicate -> directory-level partition pruning
      (the Iceberg `days(ts)` analog -- Spark lists only the matching
      day dirs, so a 3-day query over a year-long table touches 3
      directories regardless of table size);
    * `bucket_ms` range predicate -> parquet row-group stats pruning
      inside the surviving files (files are written bucket-clustered,
      so stats ranges are tight -- sources/tables.py).

    Returns (chosen_tier, DataFrame). Query operators in this module
    compose on top (select_series, increase, rate...)."""
    import os

    tier = pick_tier(step_ms, tiers)
    df = spark.read.parquet(os.path.join(out_root, f"tier={tier}"))
    if from_ms is not None or to_ms is not None:
        lo = from_ms if from_ms is not None else 0
        hi = to_ms if to_ms is not None else (1 << 53)
        df = df.where(
            F.col("part_day").between(
                F.to_date(F.timestamp_millis(F.lit(int(lo)))),
                F.to_date(F.timestamp_millis(F.lit(int(hi)))),
            )
            & F.col("bucket_ms").between(int(lo), int(hi))
        )
    return tier, df


def query_range(
    spark,
    out_root: str,
    series_cols: list[str],
    matchers: list[str] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
    step_ms: int = 60_000,
    metric_name: str = "turns",
    tiers=("1m", "1h", "1d"),
    offset_ms: int = 0,
) -> DataFrame:
    """The consumer-side getQueryRange analog over the MATERIALIZED
    cascade: resolution-select the tier for `step_ms`
    (`read_tier_auto`, both pruning layers engaged), apply label
    matchers (ingest-identical semantics), and re-bucket to the step
    grid when the step is coarser than the chosen tier's grain —
    an exact algebraic re-aggregation (same merge law as the cascade:
    counts/sums add, min/max fold, first/last pick by order key).
    Raises ValueError when `step_ms` is a multiple of NO tier grain --
    exact re-aggregation is impossible on a misaligned grid.
    ``offset_ms`` is PromQL's `offset` modifier: the window shifts
    back, the result timestamps do not.

    Output: (series..., bucket_ms, AGG_COLS) at step resolution — every
    read-side derived aggregate in this module composes on top. At
    100 TB this touches only the day partitions and row groups of ONE
    tier, the whole reason retention tiers exist."""
    from .rollup import reaggregate
    from .windows import TIER_MS

    tier = pick_tier(step_ms, tiers)
    grain = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    if step_ms % grain != 0:
        # ADVICE r4: pick_tier falls back to the finest tier when no
        # grain divides the step (e.g. step=90s over a 1m finest tier);
        # re-bucketing there floor-assigns straddling fine buckets to
        # the step window containing their START, silently misattributing
        # samples while this function promises exact algebraic
        # re-aggregation. Refuse instead of answering wrong.
        raise ValueError(
            f"step_ms={step_ms} is not a multiple of any tier grain in "
            f"{tuple(tiers)} (finest available: {grain} ms); exact "
            "re-aggregation needs step_ms to be a multiple of a tier "
            "grain -- snap the step or materialize a finer tier"
        )
    # PromQL `offset`: evaluate the window shifted back by offset_ms,
    # report at the ORIGINAL timestamps -- read [from-off, to-off)
    # (both pruning layers engage on the shifted range), then shift
    # bucket_ms forward again after the re-aggregation
    off = int(offset_ms)
    if off % grain != 0:
        # ADVICE r8 #4 (the step_ms alignment check's twin): a
        # non-multiple offset cannot shift fixed tier buckets -- the
        # +off relabel would report misaligned timestamps over
        # un-shifted window contents. Refuse instead of answering wrong.
        raise ValueError(
            f"offset_ms={off} is not a multiple of the chosen tier "
            f"grain ({grain} ms); snap the offset to the grain or "
            "materialize a finer tier"
        )
    tier, df = read_tier_auto(
        spark, out_root, step_ms,
        None if from_ms is None else from_ms - off,
        None if to_ms is None else to_ms - off,
        tiers,
    )
    df = select_series(df.drop("part_day"), series_cols,
                       matchers=matchers, metric_name=metric_name)
    if step_ms > grain:
        df = reaggregate(df, series_cols, int(step_ms))
    if off:
        df = df.withColumn(
            "bucket_ms", (F.col("bucket_ms") + F.lit(off)).cast("long")
        )
    return df


def query_instant(
    spark,
    out_root: str,
    series_cols: list[str],
    t_ms: int,
    lookback_ms: int = 5 * 60_000,
    matchers: list[str] | None = None,
    metric_name: str = "turns",
    tiers=("1m", "1h", "1d"),
) -> DataFrame:
    """The PromQL INSTANT-query analog over the materialized cascade
    (`query_range` is the range endpoint; this is the other one): for
    each series, the freshest sample value at-or-before `t_ms`, looking
    back at most `lookback_ms` (PromQL's 5m default).

    Resolution contract: reads the FINEST tier (instant semantics want
    the freshest value) and is exact at that tier's grain -- only
    buckets that END at or before `t_ms` participate, because a bucket
    straddling `t_ms` would fold in samples from after the instant.
    The per-bucket `last_val`/`last_ord` columns are selections of raw
    samples, so the answer equals the raw arg_max over the same window.

    Scale shape: both pruning layers bound the scan to ~lookback_ms of
    ONE tier (part_day directory pruning + bucket_ms row-group stats),
    then one groupBy(series) max_by -- the aggregation input is already
    tiny. No raw scan, no window function."""
    import os

    grain = lambda t: TIER_MS[t] if isinstance(t, str) else int(t)  # noqa: E731
    finest = min(tiers, key=grain)
    g = grain(finest)
    # last bucket fully closed at t: starts at hi_start, ends <= t_ms;
    # lookback_ms // g closed buckets participate, so when t_ms sits at
    # a bucket end the window covers exactly [t+1-lookback, t] raw ms
    hi_start = ((int(t_ms) + 1) // g - 1) * g
    n_buckets = max(int(lookback_ms) // g, 1)
    lo_start = hi_start - (n_buckets - 1) * g
    df = spark.read.parquet(os.path.join(out_root, f"tier={finest}"))
    df = df.where(
        F.col("part_day").between(
            F.to_date(F.timestamp_millis(F.lit(lo_start))),
            F.to_date(F.timestamp_millis(F.lit(hi_start + g - 1))),
        )
        & F.col("bucket_ms").between(lo_start, hi_start)
    )
    df = select_series(df.drop("part_day"), series_cols,
                       matchers=matchers, metric_name=metric_name)
    return df.groupBy(*series_cols).agg(
        F.max_by("last_val", "last_ord").alias("value"),
        F.max("last_ord").alias("sample_ord"),
        F.max("bucket_ms").alias("bucket_ms"),
    )


def stddev_over_time(
    raw: DataFrame,
    series_cols: list[str],
    window,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """PromQL stddev_over_time / stdvar_over_time per (series, window)
    from RAW samples (population semantics, like PromQL): the tier
    cascade deliberately does not carry sum-of-squares, so this is a
    raw-scan aggregate -- one shuffle, codegen'd.

    Output: (series..., window_ms, n_samples, stdvar, stddev)."""
    from .windows import TIER_MS, bucket_ms_col

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    val = F.col(value_col)
    out = (
        raw.withColumn("window_ms", bucket_ms_col(F.col(ts_col), w_ms))
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.count(val).alias("n_samples"),
            F.var_pop(val).alias("stdvar"),
            F.stddev_pop(val).alias("stddev"),
        )
    )
    return out


def quantile_over_time(
    raw: DataFrame,
    series_cols: list[str],
    window,
    q: float = 0.5,
    value_col: str = "value",
    ts_col: str = "ts",
    exact: bool = True,
) -> DataFrame:
    """PromQL quantile_over_time per (series, window) from RAW samples.

    `exact=True` uses `percentile` (linear interpolation, PromQL's
    rule) -- an exact aggregate whose per-group state is the value
    multiset; right for bounded windows (a series-window holds at most
    window/scrape-interval samples). `exact=False` switches to
    `percentile_approx` (bounded-memory sketch) for unbounded or
    adversarial group sizes -- the documented scale escape hatch.

    Output: (series..., window_ms, n_samples, quantile)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q={q} outside [0, 1]")
    from .windows import TIER_MS, bucket_ms_col

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    val = F.col(value_col)
    agg = (
        F.percentile(val, F.lit(float(q)))
        if exact
        else F.percentile_approx(val, F.lit(float(q)))
    )
    return (
        raw.withColumn("window_ms", bucket_ms_col(F.col(ts_col), w_ms))
        .groupBy(*series_cols, "window_ms")
        .agg(
            F.count(val).alias("n_samples"),
            agg.alias("quantile"),
        )
    )


def label_values(
    tier_df: DataFrame,
    label: str,
    series_cols: list[str],
    matchers: list[str] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
    metric_name: str = "turns",
) -> DataFrame:
    """Prometheus `/api/v1/label/<name>/values` analog: the sorted
    distinct values a label takes over the (matcher + time-range)
    selected slice. Null labels surface as "" (the ingest-side
    convention: an absent Prometheus label IS the empty string,
    matchers.py).

    Scale shape: the matcher/range predicates push into the scan
    (select_series), the projection prunes to ONE column before the
    distinct, and the distinct's map-side partials mean a label with
    few values costs one combiner row per partition regardless of
    corpus size. Sorting |values| rows is driver-trivial."""
    sel = select_series(
        tier_df, series_cols, matchers, from_ms, to_ms, metric_name
    )
    return (
        sel.select(
            F.coalesce(F.col(label).cast("string"), F.lit("")).alias(
                "value"
            )
        )
        .distinct()
        .orderBy("value")
    )


def series_list(
    tier_df: DataFrame,
    series_cols: list[str],
    matchers: list[str] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
    metric_name: str = "turns",
) -> DataFrame:
    """Prometheus `/api/v1/series` analog: the distinct label sets
    with at least one point in the selected slice, one row per series,
    labels nulls-as-"" normalized, ordered by the label tuple for a
    deterministic listing. Same pushdown + prune-then-distinct shape
    as `label_values` (the distinct moves |series| rows, not
    |points|)."""
    sel = select_series(
        tier_df, series_cols, matchers, from_ms, to_ms, metric_name
    )
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
        for c in series_cols
    ]
    return sel.select(*cols).distinct().orderBy(*series_cols)


def count_values(
    df: DataFrame,
    window: str | int,
    series_cols: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """PromQL `count_values` analog over raw samples: the distribution
    of observed values per window -- (window_ms, value, n_samples,
    n_series). PromQL's instant form counts series per value; over a
    range this is the value histogram plus the distinct-series count
    per value (two exact aggregates, BIGINT).

    Scale shape: one groupBy(window, value) whose map-side partials
    absorb repeated values; n_series is a two-stage distinct over
    (window, value, series) -- the same countDistinct topology the
    gated `distinct_series_per_day` pins. `series_cols` defaults to
    nothing extra moving: the distinct runs over the concatenated
    series key projection only when requested."""
    from .windows import bucket_ms_col

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    base = df.select(
        bucket_ms_col(F.col(ts_col), w_ms).alias("window_ms"),
        F.col(value_col).alias("value"),
        *(series_cols or []),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_samples")]
    if series_cols:
        key = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                      for c in series_cols]
        )
        aggs.append(
            F.countDistinct(key).cast("long").alias("n_series")
        )
    return base.groupBy("window_ms", "value").agg(*aggs)


def holt_winters_smooth(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    sf: float = 0.5,
    tf: float = 0.5,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL `holt_winters` (double exponential smoothing) per
    (series, window): s_1 = x_1, b_1 = x_2 - x_1, then
    s_t = sf*x_t + (1-sf)*(s_{t-1} + b_{t-1}),
    b_t = tf*(s_t - s_{t-1}) + (1-tf)*b_{t-1}; the output is the last
    smoothed level. Windows with < 2 samples emit NULL (PromQL drops
    them; the row is kept so the caller sees the gap).

    The recurrence is inherently sequential per group -- the one class
    the declarative built-ins genuinely can't express -- so this is an
    `applyInPandas` over (series, window) groups, the LTTB discipline:
    Arrow-batched, each group's samples sorted by (ts, tiebreak), the
    loop bounded by the window's sample count. Accumulated float state
    means tolerance tests, never the hashed gate (the deriv rule)."""
    if not (0 < sf < 1 and 0 < tf < 1):
        raise ValueError(f"need 0 < sf,tf < 1, got sf={sf} tf={tf}")
    import pandas as pd

    from .windows import bucket_ms_col, unix_us

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    tb = list(tiebreak_cols or [])
    base = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), w_ms).alias("window_ms"),
        unix_us(F.col(ts_col)).alias("__us"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tb)],
        F.col(value_col).cast("double").alias("__v"),
    )
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.schema
        if f.name in series_cols
    )
    schema = (
        f"{out_fields}, window_ms long, n_samples long, smoothed double"
    )
    sort_cols = ["__us"] + [f"__tb{i}" for i in range(len(tb))]
    keys = [*series_cols, "window_ms"]

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf["__v"].to_numpy()
        head = pdf.iloc[[0]][keys].reset_index(drop=True)
        if len(x) < 2:
            head["n_samples"] = len(x)
            head["smoothed"] = None
            return head
        s, b = x[0], x[1] - x[0]
        for t in range(1, len(x)):
            s_prev = s
            s = sf * x[t] + (1.0 - sf) * (s + b)
            b = tf * (s - s_prev) + (1.0 - tf) * b
        head["n_samples"] = len(x)
        head["smoothed"] = s
        return head

    return base.groupBy(*keys).applyInPandas(smooth, schema)


def mad_over_time(
    raw: DataFrame,
    series_cols: list[str],
    window,
    value_col: str = "value",
    ts_col: str = "ts",
    exact: bool = True,
) -> DataFrame:
    """PromQL `mad_over_time` per (series, window): median absolute
    deviation around the median, from RAW samples. Two selection
    aggregates -- the per-window median, then the median of
    |x - median| -- so like quantile_over_time the result is an
    order-independent multiset selection, not an accumulated float
    sum (DuckDB-twinnable; the interpolation law is the one the
    quantile twin already pins).

    Scale shape: the median join is per (series, window) -- the
    grouping the second aggregation needs anyway -- so the extra pass
    is one shuffle-free rejoin on an already-partitioned key plus one
    more grouped aggregate; `exact=False` swaps both percentiles for
    the bounded-memory sketch (the quantile_over_time escape hatch).

    Output: (series..., window_ms, n_samples, mad)."""
    from .windows import bucket_ms_col

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    base = raw.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), w_ms).alias("window_ms"),
        F.col(value_col).alias("__v"),
    )
    med_agg = (
        F.percentile(F.col("__v"), F.lit(0.5))
        if exact
        else F.percentile_approx(F.col("__v"), F.lit(0.5))
    )
    keys = [*series_cols, "window_ms"]
    med = base.groupBy(*keys).agg(
        med_agg.alias("__med"),
        F.count(F.col("__v")).alias("n_samples"),
    )
    dev = base.alias("b").join(
        med.alias("m"),
        [F.col(f"b.{k}").eqNullSafe(F.col(f"m.{k}")) for k in keys],
    ).select(
        *[F.col(f"b.{k}") for k in keys],
        F.col("m.n_samples").alias("n_samples"),
        F.abs(F.col("b.__v") - F.col("m.__med")).alias("__d"),
    )
    dev_agg = (
        F.percentile(F.col("__d"), F.lit(0.5))
        if exact
        else F.percentile_approx(F.col("__d"), F.lit(0.5))
    )
    return dev.groupBy(*keys).agg(
        F.first("n_samples").alias("n_samples"),
        dev_agg.alias("mad"),
    )


def last_over_time(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL last_over_time()/count_over_time()/present_over_time()
    in one relation over RAW samples: per (series, window) the most
    recent sample's value and timestamp, the sample count, and the
    present flag (trivially true on emitted rows -- it exists so a
    caller can left-join a window calendar and read false on the
    misses; `absent_over_time` below materializes that calendar).

    One groupBy with max_by on a (time, tiebreak...) struct -- the
    tier rollup's last_val law generalized to an explicit window, no
    window function, one shuffle with map-side combine. Selections and
    counts only (no accumulated floats): DuckDB-twinnable and
    hash-gateable."""
    from .windows import TIER_MS, bucket_ms_col, unix_us

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    ord_key = F.struct(
        unix_us(F.col(ts_col)).alias("_t"),
        *[F.col(c) for c in (tiebreak_cols or [])],
    )
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), w_ms).alias("window_ms"),
        F.col(value_col).alias("_v"),
        ord_key.alias("_ord"),
    )
    return prepared.groupBy(*series_cols, "window_ms").agg(
        F.max_by("_v", F.col("_ord")).alias("last_val"),
        F.max(F.col("_ord._t")).alias("last_ts_us"),
        F.count("_v").alias("cnt"),
        F.lit(True).alias("present"),
    )


def absent_over_time(
    df: DataFrame,
    series_cols: list[str],
    window: str | int,
    ts_col: str = "ts",
    range_ms: tuple[int, int] | None = None,
) -> DataFrame:
    """PromQL absent_over_time(): per (series, window) over a dense
    window calendar, flag the windows in which the series emitted NO
    samples. The series universe is the distinct series observed in
    `df` (a series the selection never saw cannot be enumerated --
    PromQL has the same limitation: absent() answers per selector).

    `range_ms=(lo, hi)` bounds the calendar to the query range
    ([lo, hi), window-aligned); default is each series' own observed
    extent (the gapfill bound -- load-bearing at scale, an unbounded
    calendar over the table extent would dwarf the data). Shape: one
    aggregate for counts, one tiny per-series bounds aggregate ->
    sequence/explode calendar -> null-safe left join (gapfill_locf's
    topology exactly). Integer/boolean algebra: DuckDB-twinnable."""
    from .windows import TIER_MS, bucket_ms_col

    w_ms = TIER_MS[window] if isinstance(window, str) else int(window)
    counts = (
        df.select(
            *series_cols,
            bucket_ms_col(F.col(ts_col), w_ms).alias("window_ms"),
        )
        .groupBy(*series_cols, "window_ms")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if range_ms is not None:
        lo, hi = range_ms
        lo = (int(lo) // w_ms) * w_ms
        last = ((int(hi) - 1) // w_ms) * w_ms
        if last < lo:
            raise ValueError(f"empty range {range_ms} at window {w_ms}")
        calendar = counts.select(*series_cols).distinct().select(
            *series_cols,
            F.explode(
                F.sequence(
                    F.lit(lo).cast("long"),
                    F.lit(last).cast("long"),
                    F.lit(w_ms).cast("long"),
                )
            ).alias("window_ms"),
        )
        counts = counts.where(
            (F.col("window_ms") >= lo) & (F.col("window_ms") <= last)
        )
    else:
        bounds = counts.groupBy(*series_cols).agg(
            F.min("window_ms").alias("_lo"), F.max("window_ms").alias("_hi")
        )
        calendar = bounds.select(
            *series_cols,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.lit(w_ms).cast("long")
                )
            ).alias("window_ms"),
        )
    right = counts
    for c in [*series_cols, "window_ms", "cnt"]:
        right = right.withColumnRenamed(c, f"_r_{c}")
    cond = F.lit(True)
    for c in [*series_cols, "window_ms"]:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    return calendar.join(right, on=cond, how="left").select(
        *series_cols,
        "window_ms",
        F.col("_r_cnt").isNull().alias("absent"),
        F.coalesce(F.col("_r_cnt"), F.lit(0)).cast("long").alias("cnt"),
    )
