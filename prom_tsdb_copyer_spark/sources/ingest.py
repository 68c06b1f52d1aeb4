"""Ingest-time schema enforcement (SURVEY.md §2.2 F12).

The reference dispatches on the sample value type and aborts the slice
with ErrUnsupportValueType on anything but float/histogram
(/root/reference/copyer.go:108-127, error at copyer.go:21). Our data
plane is statically typed, so the analog is a schema gate at ingest:
every operator downstream may assume (string labels, timestamp ts,
double value). Native histograms are documented out of scope
(SURVEY.md §7.5) and rejected here the same way the reference rejects
unknown value types.
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


def validate_samples(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    coerce: bool = True,
) -> DataFrame:
    """Gate a DataFrame into the sample model; raise on violations.

    - value must be numeric (coerced to double) -- struct/array/map/
      decimal/histogram-shaped values raise UnsupportedValueTypeError
    - ts must be a timestamp type
    - series labels must be strings (coerced from atomics if `coerce`)
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in [*series_cols, value_col, ts_col]:
        if c not in schema:
            raise ValueError(f"missing required column {c!r}")

    vt = schema[value_col]
    if not isinstance(vt, _NUMERIC_OK):
        raise UnsupportedValueTypeError(
            f"unsupported sample value type {vt.simpleString()!r} "
            f"(float-convertible required; histograms are out of scope)"
        )
    if not isinstance(schema[ts_col], _TS_OK):
        raise UnsupportedValueTypeError(
            f"ts must be a timestamp, got {schema[ts_col].simpleString()!r}"
        )
    out = df
    if not isinstance(vt, T.DoubleType):
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
