"""Sessionization: split per-series event streams on inactivity gaps.

Training-data pipeline extension (not in the reference): conversations /
event streams often need re-segmentation by inactivity (e.g. a user
returning hours later starts a new logical session). Classic Spark
shape: lag() to get the previous event time per series, mark gap >
threshold as a session boundary, running sum of boundaries = session
index. One shuffle (window partitionBy series); entirely built-in
functions, SQL-oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import unix_ms


def sessionize(
    df: DataFrame,
    series_cols: list[str],
    gap_ms: int,
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Adds `session_idx` (0-based per series) and `is_session_start`.

    `tiebreak_cols` (e.g. a unique event id) makes the per-series scan
    order total when timestamps tie -- session indices are then
    deterministic across engines and partitionings, which the oracle
    gate requires (the boundary test itself only compares ts values, but
    the running-sum order must be total to be reproducible)."""
    order = [unix_ms(F.col(ts_col))] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*series_cols).orderBy(*order)
    prev = F.lag(unix_ms(F.col(ts_col))).over(w)
    is_start = prev.isNull() | (unix_ms(F.col(ts_col)) - prev > gap_ms)
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_idx",
        (F.sum(F.when(is_start, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1).cast("long"),
    )


def session_stats(
    df: DataFrame,
    series_cols: list[str],
    gap_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session summary: bounds, duration, event count, value sum.

    Every output column is an exact integer: the value sum is emitted as
    BIGINT milli-units (`sum_mills`, functions/exact.py) so the whole
    row hashes identically across engines -- the r1/r2 driver-gate
    lesson that rounding discipline on DOUBLEs does not survive a
    foreign environment."""
    from ..functions.exact import milli_units

    s = sessionize(df, series_cols, gap_ms, ts_col, tiebreak_cols)
    return s.groupBy(*series_cols, "session_idx").agg(
        F.min(unix_ms(F.col(ts_col))).alias("start_ms"),
        F.max(unix_ms(F.col(ts_col))).alias("end_ms"),
        (F.max(unix_ms(F.col(ts_col))) - F.min(unix_ms(F.col(ts_col)))).alias(
            "duration_ms"
        ),
        F.count("*").alias("n_events"),
        milli_units(F.sum(value_col)).alias("sum_mills"),
    )
