"""PromQL binary operations between series vectors (vector matching).

The reference copier never evaluates expressions, but the PromQL
surface its output blocks serve does: ``a / b``, ``a > b`` with
``on(...)`` / ``ignoring(...)`` label matching and ``group_left`` /
``group_right`` many-to-one fan-out (Prometheus docs, "Vector
matching"). This module re-expresses that algebra over the engine's
tier/instant relations: both operands are (labels..., bucket_ms,
value) frames at the SAME grain (the read-side operators produce
them), and matching is an equi-join on (match labels, bucket).

Spark-first shape: ONE null-safe equi-join on the match keys + time
-- shuffle-partitioned on exactly those keys, broadcastable when one
side is small (AQE decides; a `group_left` right side is typically a
label-aggregated relation orders of magnitude smaller than the left).
A hot match group (every series sharing one `role`) is the engine's
documented AQE-skew posture. Pure codegen arithmetic on doubles
(IEEE: x/0 -> Inf like PromQL, no integral ANSI traps), no UDF.

Error semantics: PromQL raises "found duplicate series for the match
group" at eval time when the ONE side of a match is not unique.
`strict=True` mirrors that with a driver-side duplicate probe (one
bounded aggregation action) before the lazy plan is returned; the
default trusts the caller's uniqueness (tier relations are unique per
(series, bucket) by construction) and documents it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _ieee_div(a: Column, b: Column) -> Column:
    """PromQL division is IEEE-754 (x/0 -> +/-Inf, 0/0 -> NaN) but
    Spark 4's default ANSI mode raises DIVIDE_BY_ZERO even on doubles
    -- spell the IEEE law out. A null operand propagates null."""
    return (
        F.when(b.isNull() | a.isNull(), F.lit(None).cast("double"))
        .when(b != 0, a / b)
        .when(a > 0, F.lit(float("inf")))
        .when(a < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


def _ieee_mod(a: Column, b: Column) -> Column:
    """Go's math.Mod(x, 0) is NaN (PromQL's % law); ANSI % raises."""
    return (
        F.when(b.isNull() | a.isNull(), F.lit(None).cast("double"))
        .when(b != 0, a % b)
        .otherwise(F.lit(float("nan")))
    )


_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": _ieee_div,
    "%": _ieee_mod,
    "^": lambda a, b: F.pow(a, b),
}
_CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


def _match_keys(
    series_cols: list[str],
    on: list[str] | None,
    ignoring: list[str] | None,
) -> list[str]:
    if on is not None and ignoring is not None:
        raise ValueError("give at most one of on=/ignoring=")
    pool = on if on is not None else ignoring
    if pool is not None:
        unknown = [c for c in pool if c not in series_cols]
        if unknown:
            raise ValueError(f"match labels not in series_cols: {unknown}")
    if on is not None:
        return [c for c in series_cols if c in on]
    return [c for c in series_cols if c not in (ignoring or [])]


def _assert_unique(df: DataFrame, keys: list[str], side: str) -> None:
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        vals = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"duplicate series for the match group on the {side} side: "
            f"{vals} (PromQL: found duplicate series for the match group)"
        )


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    series_cols: list[str],
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
    group: str | None = None,
    bool_mode: bool = False,
    value_col: str = "value",
    time_col: str = "bucket_ms",
    strict: bool = False,
    null_safe: bool = True,
) -> DataFrame:
    """``left <op> right`` with PromQL vector matching.

    * match keys: ``on`` if given, else all `series_cols` minus
      ``ignoring``; the time column always joins too (samples align
      per bucket).
    * ``group=None`` -> one-to-one (both sides unique per match group;
      output labels = the match keys). ``group_left`` -> many-to-one
      (right unique, output carries the LEFT side's full label set);
      ``group_right`` mirrors it.
    * arithmetic ops emit ``value = l <op> r`` (doubles, IEEE);
      comparisons FILTER (keeping the many side's value) unless
      ``bool_mode`` emits 1.0/0.0 like PromQL's ``bool`` modifier.
    * ``strict=True`` probes the one side(s) for duplicate match
      groups and raises (one bounded aggregation per checked side).
    * ``null_safe=False`` uses plain equality keys (rows with a null
      match label drop, like SQL) -- correct over ""-normalized
      relations (bucketed tiers) and required for the shuffle-free
      bucketed join path.
    """
    if op not in _ARITH and op not in _CMP:
        raise ValueError(f"unknown op {op!r}")
    if group not in (None, "group_left", "group_right"):
        raise ValueError(f"group must be None/'group_left'/'group_right'")
    if bool_mode and op not in _CMP:
        raise ValueError("bool_mode applies to comparison ops only")
    keys = _match_keys(series_cols, on, ignoring)
    jk = [*keys, time_col]

    # `many` keeps its full label set in the output; `one` contributes
    # only its value. group_left: many=left; group_right: many=right;
    # 1:1: both act as `one` (output = match keys).
    if group == "group_right":
        many, one = right, left
    else:
        many, one = left, right
    one_sel = one.select(
        *[F.col(c).alias(f"_o_{c}") for c in jk],
        F.col(value_col).cast("double").alias("_ov"),
    )
    if strict:
        _assert_unique(one_sel, [f"_o_{c}" for c in jk], "one")
        if group is None:
            _assert_unique(
                many.select(*jk), jk, "many"
            )
    many_keep = list(many.columns) if group else jk
    many_sel = many.select(
        *[c for c in many_keep if c != value_col],
        F.col(value_col).cast("double").alias("_mv"),
    )
    # null_safe=False is the bucketed-tier fast path: plain equality
    # keys match a bucketed table's hash distribution so Catalyst can
    # drop the shuffle (write_bucketed_tier normalizes null labels to
    # "" precisely to make this lossless); eqNullSafe's coalesce/isnull
    # key expressions cannot reuse the bucket distribution
    cond = F.lit(True)
    for c in jk:
        pair = (
            F.col(c).eqNullSafe(F.col(f"_o_{c}"))
            if null_safe
            else F.col(c) == F.col(f"_o_{c}")
        )
        cond = cond & pair
    joined = many_sel.join(one_sel, on=cond, how="inner")

    lv = F.col("_mv") if group != "group_right" else F.col("_ov")
    rv = F.col("_ov") if group != "group_right" else F.col("_mv")
    out_cols = [c for c in many_keep if c != value_col]
    if op in _ARITH:
        val: Column = _ARITH[op](lv, rv)
        return joined.select(*out_cols, val.alias(value_col))
    if bool_mode:
        val = F.when(_CMP[op](lv, rv), F.lit(1.0)).otherwise(F.lit(0.0))
        return joined.select(*out_cols, val.alias(value_col))
    # filter comparison: PromQL's vectorElemBinop always propagates the
    # LEFT operand's VALUE for non-bool comparisons, while the surviving
    # element's LABELS come from the many side. In the 1:1 and
    # group_left cases many == left so label source and value source
    # coincide (_mv); with group_right the rows carry the right (many)
    # side's labels but must keep the LEFT operand's value, which is
    # the `one` side there (_ov) -- ADVICE r8 #1.
    surviving = F.col("_ov") if group == "group_right" else F.col("_mv")
    return joined.where(_CMP[op](lv, rv)).select(
        *out_cols, surviving.alias(value_col)
    )
