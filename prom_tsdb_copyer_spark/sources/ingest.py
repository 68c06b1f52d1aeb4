"""Ingest-time schema enforcement (SURVEY.md §2.2 F12).

The reference dispatches on the sample value type and aborts the slice
with ErrUnsupportValueType on anything but float/histogram
(/root/reference/copyer.go:108-127, error at copyer.go:21; the
histogram branch APPENDS via AppendHistogram, copyer.go:117-122). Our
data plane is statically typed, so the analog is a schema gate at
ingest that mirrors the same dispatch: float-convertible values route
to the float tier path, struct values matching the histogram shape
(count, sum, buckets array -- operators/histogram.py) route to the
histogram rollup path, and anything else raises
UnsupportedValueTypeError exactly like the reference's unknown-type
branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class UnsupportedValueTypeError(TypeError):
    """ErrUnsupportValueType analog (copyer.go:21)."""


_NUMERIC_OK = (T.DoubleType, T.FloatType, T.LongType, T.IntegerType,
               T.ShortType, T.ByteType)
_TS_OK = (T.TimestampType, T.TimestampNTZType)


def is_histogram_type(dt: T.DataType) -> bool:
    """True if `dt` is the native-histogram struct shape: (count numeric,
    sum numeric, buckets array<numeric>) -- the ValHistogram analog."""
    if not isinstance(dt, T.StructType):
        return False
    fields = {f.name: f.dataType for f in dt.fields}
    if set(fields) != {"count", "sum", "buckets"}:
        return False
    return (
        isinstance(fields["count"], _NUMERIC_OK)
        and isinstance(fields["sum"], _NUMERIC_OK)
        and isinstance(fields["buckets"], T.ArrayType)
        and isinstance(fields["buckets"].elementType, _NUMERIC_OK)
    )


def value_kind(df: DataFrame, value_col: str = "value") -> str:
    """The reference's value-type dispatch (copyer.go:108-127):
    'float' | 'histogram', raising on anything else."""
    vt = {f.name: f.dataType for f in df.schema.fields}[value_col]
    if isinstance(vt, _NUMERIC_OK):
        return "float"
    if is_histogram_type(vt):
        return "histogram"
    raise UnsupportedValueTypeError(
        f"unsupported sample value type {vt.simpleString()!r} "
        f"(float-convertible or histogram struct required)"
    )


def validate_samples(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    coerce: bool = True,
) -> DataFrame:
    """Gate a DataFrame into the sample model; raise on violations.

    - value must be numeric (coerced to double) or a histogram struct
      (count, sum, buckets -- routed to operators/histogram.py); other
      struct/array/map/decimal values raise UnsupportedValueTypeError
    - ts must be a timestamp type
    - series labels must be strings (coerced from atomics if `coerce`)
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in [*series_cols, value_col, ts_col]:
        if c not in schema:
            raise ValueError(f"missing required column {c!r}")

    vt = schema[value_col]
    is_hist = is_histogram_type(vt)
    if not isinstance(vt, _NUMERIC_OK) and not is_hist:
        raise UnsupportedValueTypeError(
            f"unsupported sample value type {vt.simpleString()!r} "
            f"(float-convertible or histogram struct required)"
        )
    if not isinstance(schema[ts_col], _TS_OK):
        raise UnsupportedValueTypeError(
            f"ts must be a timestamp, got {schema[ts_col].simpleString()!r}"
        )
    out = df
    if not is_hist and not isinstance(vt, T.DoubleType):
        if not coerce:
            raise UnsupportedValueTypeError(
                f"value is {vt.simpleString()}, not double (coerce=False)"
            )
        out = out.withColumn(value_col, F.col(value_col).cast("double"))
    for c in series_cols:
        st = schema[c]
        if isinstance(st, T.StringType):
            continue
        if coerce and isinstance(st, (T.LongType, T.IntegerType, T.BooleanType)):
            out = out.withColumn(c, F.col(c).cast("string"))
        else:
            raise UnsupportedValueTypeError(
                f"series label {c!r} must be string, got {st.simpleString()!r}"
            )
    return out
