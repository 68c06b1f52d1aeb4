"""PromQL scalar value functions over sample/tier relations.

The last slice of the PromQL function surface: elementwise math on the
value column (abs/ceil/floor/exp/ln/log2/log10/sqrt/sgn, clamp family,
round-to-nearest-multiple). All pure codegen projections -- no UDF, no
shuffle, fully pushdown-transparent -- with PromQL's IEEE edge laws
spelled out where ANSI Spark or Spark's null-on-domain-error functions
would otherwise diverge: ln(0) -> -Inf, ln(x<0) -> NaN, sqrt(x<0) ->
NaN, clamp with min > max -> NaN, round ties AWAY from zero upward
(Go's math.Floor(v/n + 0.5) * n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _nan() -> Column:
    return F.lit(float("nan"))


def _ninf() -> Column:
    return F.lit(float("-inf"))


def _ln_law(log_fn):
    def law(v: Column) -> Column:
        return (
            F.when(v > 0, log_fn(v))
            .when(v == 0, _ninf())
            .when(v.isNull(), F.lit(None).cast("double"))
            .otherwise(_nan())
        )

    return law


#: beyond 2^63 Spark's BIGINT ceil/floor would corrupt; every float64
#: with |v| >= 2^53 is already an integer, so passing v through is the
#: EXACT PromQL (Go math.Ceil/Floor) answer there -- and the same guard
#: catches NaN/+-Inf, which BIGINT ceil/floor would map to 0 / 2^63
#: (ADVICE r8 #2: ceil(NaN) must be NaN, ceil(Inf) must be Inf).
_INT64_EDGE = 9.223372036854776e18


def _int_law(int_fn):
    def law(v: Column) -> Column:
        return (
            F.when(
                v.isNull() | F.isnan(v) | (F.abs(v) >= F.lit(_INT64_EDGE)),
                v,
            )
            .otherwise(int_fn(v).cast("double"))
        )

    return law


VALUE_FNS = {
    "abs": F.abs,
    "ceil": _int_law(F.ceil),
    "floor": _int_law(F.floor),
    "exp": F.exp,
    "ln": _ln_law(F.log),
    "log2": _ln_law(F.log2),
    "log10": _ln_law(F.log10),
    "sqrt": lambda v: F.when(v >= 0, F.sqrt(v)).when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(_nan()),
    "sgn": F.signum,
}


def value_fn(
    df: DataFrame, fn: str, value_col: str = "value"
) -> DataFrame:
    """Apply a PromQL math function to `value_col` in place."""
    if fn not in VALUE_FNS:
        raise ValueError(
            f"unknown fn {fn!r}; one of {sorted(VALUE_FNS)}"
        )
    v = F.col(value_col).cast("double")
    return df.withColumn(value_col, VALUE_FNS[fn](v).cast("double"))


def clamp(
    df: DataFrame,
    min_val: float | None = None,
    max_val: float | None = None,
    value_col: str = "value",
) -> DataFrame:
    """PromQL clamp/clamp_min/clamp_max: give one bound for the _min/
    _max forms, both for clamp. clamp with min > max is NaN for every
    sample (PromQL's law); a one-sided form never is."""
    if min_val is None and max_val is None:
        raise ValueError("give at least one of min_val/max_val")
    v = F.col(value_col).cast("double")
    out = v
    if min_val is not None:
        out = F.greatest(out, F.lit(float(min_val)))
    if max_val is not None:
        out = F.least(out, F.lit(float(max_val)))
    if min_val is not None and max_val is not None and min_val > max_val:
        out = _nan()
    # NaN input short-circuits (ADVICE r8 #3): Spark's least/greatest
    # order NaN as GREATEST (least(NaN, max) == max), but PromQL's
    # clamp family (Go math.Min/Max) propagates NaN
    return df.withColumn(
        value_col,
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(F.isnan(v), v)
        .otherwise(out),
    )


def round_to_nearest(
    df: DataFrame, to_nearest: float = 1.0, value_col: str = "value"
) -> DataFrame:
    """PromQL round(v, to_nearest): nearest MULTIPLE of `to_nearest`,
    ties rounded up (Go: Floor(v/n + 0.5) * n) -- not banker's
    rounding, and not Spark's HALF_UP-on-decimal-digits F.round."""
    if to_nearest <= 0:
        raise ValueError(f"to_nearest must be > 0, got {to_nearest}")
    n = F.lit(float(to_nearest))
    v = F.col(value_col).cast("double")
    x = v / n + F.lit(0.5)
    # non-finite and >=2^63 inputs bypass the BIGINT floor (ADVICE r8
    # #2's round_to_nearest leg): Go's float64 Floor passes NaN/Inf
    # through, and beyond 2^53 scaled values are integers already --
    # returning v is the exact Go result for |x| past the int64 edge
    return df.withColumn(
        value_col,
        F.when(v.isNull() | F.isnan(v) | (F.abs(x) >= F.lit(_INT64_EDGE)), v)
        .otherwise(F.floor(x).cast("double") * n),
    )


TIME_FNS = {
    # PromQL calendar functions, UTC (the session pins UTC): name ->
    # expression over a timestamp column. day_of_week is 0=Sunday
    # (Spark's dayofweek is 1=Sunday -> shift).
    "minute": F.minute,
    "hour": F.hour,
    "day_of_month": F.dayofmonth,
    "day_of_week": lambda ts: F.dayofweek(ts) - F.lit(1),
    "days_in_month": lambda ts: F.dayofmonth(F.last_day(ts)),
    "month": F.month,
    "year": F.year,
}


def time_fn(
    df: DataFrame, fields: list[str], ts_col: str = "bucket_ms"
) -> DataFrame:
    """PromQL calendar functions (minute/hour/day_of_month/day_of_week/
    days_in_month/month/year) over an epoch-ms column, appended as one
    integer column per requested field. Pure codegen, UTC per the
    session contract; DuckDB-twinnable (make_timestamp + date parts)."""
    unknown = [f for f in fields if f not in TIME_FNS]
    if unknown:
        raise ValueError(
            f"unknown time fields {unknown}; from {sorted(TIME_FNS)}"
        )
    ts = F.timestamp_millis(F.col(ts_col).cast("long"))
    for f in fields:
        df = df.withColumn(f, TIME_FNS[f](ts).cast("int"))
    return df
