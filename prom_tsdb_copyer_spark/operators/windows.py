"""Epoch-aligned tumbling-window algebra.

Re-expresses the reference's ``getQueryRange`` window generator
(/root/reference/copyer.go:36-56): windows of duration ``d`` ms aligned to
the Unix epoch via integer floor (copyer.go:43), inclusive ends at
``start + d - 1`` ms (copyer.go:44), clamped to the requested ``[from,
to]`` (copyer.go:48), ``d == 0`` meaning one un-split window
(copyer.go:37-41). The degenerate case where ``to`` falls exactly on a
window start yields a 1-ms ``[to, to]`` window, exactly as the inner loop
of the reference does (the outer loop guards against it at copyer.go:238,
the inner one does not).

In the engine's hot path windows are not control flow: the same alignment
is a *bucket column* (`bucket_ms`) computed per row, which Catalyst folds
into the scan, and which is identical to Spark's own ``F.window`` bucket
assignment at ms resolution (reference window ``[s, s+d-1ms]`` == Spark
window ``[s, s+d)``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

MS = 1
SECOND_MS = 1000
MINUTE_MS = 60 * SECOND_MS
HOUR_MS = 60 * MINUTE_MS
DAY_MS = 24 * HOUR_MS

TIER_MS = {"1m": MINUTE_MS, "1h": HOUR_MS, "1d": DAY_MS}


def unix_ms(ts: Column) -> Column:
    """Epoch-ms of a timestamp column, tolerant of TIMESTAMP_NTZ sources
    (the driver's parquet): the session is pinned to UTC, so the NTZ->LTZ
    cast is an identity on the instant."""
    return F.unix_millis(ts.cast("timestamp"))


def unix_us(ts: Column) -> Column:
    return F.unix_micros(ts.cast("timestamp"))


@dataclass(frozen=True)
class QueryRange:
    """One inclusive window [start_ms, end_ms] (reference semantics)."""

    start_ms: int
    end_ms: int


def get_query_range(from_ms: int, to_ms: int, duration_ms: int) -> list[QueryRange]:
    """Driver-side window list, replicating copyer.go:36-56 exactly.

    Used for slicing/partition planning and for the parity fixtures; the
    per-row analog is :func:`bucket_ms_col`. Timestamps must be >= epoch
    (Go integer division truncates toward zero, so pre-1970 inputs would
    misalign; we assert instead of replicating an accident).
    """
    if from_ms < 0 or to_ms < 0:
        raise ValueError("timestamps before the Unix epoch are not supported")
    if duration_ms == 0:  # copyer.go:37-41
        return [QueryRange(from_ms, to_ms)]
    out: list[QueryRange] = []
    start = duration_ms * (from_ms // duration_ms)  # epoch floor, copyer.go:43
    while start <= to_ms:  # loop condition, copyer.go:52-55
        end = start + duration_ms - 1  # inclusive end, copyer.go:44
        out.append(QueryRange(max(start, from_ms), min(end, to_ms)))  # clamp, copyer.go:48
        start += duration_ms
    return out


def bucket_ms_col(ts: Column, duration_ms: int) -> Column:
    """Epoch-aligned bucket start in ms for each row's timestamp.

    ``floor(unix_millis(ts) / d) * d`` -- the vectorized, Catalyst-folded
    equivalent of the reference's window floor (copyer.go:43). Returned as
    BIGINT ms (not TimestampType) so the DuckDB oracle comparison is
    type-exact and the reference's int64-ms data model is preserved
    (copyer.go:75,115).
    """
    return (F.floor(unix_ms(ts) / duration_ms) * duration_ms).cast("long")


def bucket_ts_col(bucket_ms: Column) -> Column:
    """Bucket start as a TimestampType column (for partition specs/display)."""
    return F.timestamp_millis(bucket_ms)


def in_time_range(ts: Column, from_ms: int, to_ms: int) -> Column:
    """Inclusive-inclusive ms time-range predicate (Querier semantics,
    copyer.go:75). Spark BETWEEN is inclusive-inclusive -- exact match.

    NOTE: wraps the column in unix_millis, which BLOCKS parquet filter
    pushdown -- prefer :func:`time_range_pred` (needs the DataFrame) in
    scan paths; this form is kept for oracle-exact ms arithmetic on
    already-loaded data."""
    return unix_ms(ts).between(from_ms, to_ms)


def time_range_pred(df, ts_col: str, from_ms: int, to_ms: int) -> Column:
    """Pushdown-friendly inclusive time-range predicate.

    Compares the RAW timestamp column against literals of the column's
    own type (TIMESTAMP vs TIMESTAMP_NTZ), so Catalyst pushes the range
    to the parquet scan (row-group min/max skipping; partition pruning
    when the table is partitioned on a ts transform). A function-wrapped
    column (`unix_millis(cast(ts))`) reaches the scan as IsNotNull only
    -- at 100TB that is the difference between a pruned read and a full
    scan (verified via .explain: PushedFilters carries GreaterThanOrEqual
    /LessThan with this form).

    Semantics are ms-truncation-exact even for sub-ms (microsecond)
    data: `epoch_ms(ts) BETWEEN from AND to` == `ts >= from AND
    ts < to + 1ms`."""
    import datetime as _dt

    dtype = dict(df.dtypes)[ts_col]

    def _lit(ms: int) -> Column:
        if dtype == "timestamp_ntz":
            dt = _dt.datetime.fromtimestamp(ms / 1000, tz=_dt.timezone.utc)
            # constant-folded to a TIMESTAMP_NTZ literal (session is UTC)
            return F.lit(dt.replace(tzinfo=None)).cast("timestamp_ntz")
        return F.timestamp_millis(F.lit(ms))

    c = F.col(ts_col)
    return (c >= _lit(from_ms)) & (c < _lit(to_ms + 1))
