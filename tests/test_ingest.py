"""F12 value-type dispatch/rejection as ingest schema enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.sources.ingest import (
    UnsupportedValueTypeError,
    validate_samples,
)

SERIES = ["conv_id", "role", "tool"]


def test_valid_passthrough(spark, transcripts):
    out = validate_samples(transcripts, SERIES)
    assert dict(out.dtypes)["value"] == "double"


def test_int_value_coerced(spark, transcripts):
    df = transcripts.withColumn("value", F.col("turn_idx"))
    out = validate_samples(df, SERIES)
    assert dict(out.dtypes)["value"] == "double"
    with pytest.raises(UnsupportedValueTypeError):
        validate_samples(df, SERIES, coerce=False)


def test_partial_struct_rejected(spark, transcripts):
    """Struct values that are NOT the histogram shape (missing buckets)
    -> rejected (ErrUnsupportValueType analog); the full histogram
    struct is accepted -- dispatch covered in test_histogram.py."""
    df = transcripts.withColumn(
        "value", F.struct(F.lit(1.0).alias("sum"), F.lit(2).alias("count"))
    )
    with pytest.raises(UnsupportedValueTypeError):
        validate_samples(df, SERIES)


def test_string_value_rejected(spark, transcripts):
    df = transcripts.withColumn("value", F.col("text"))
    with pytest.raises(UnsupportedValueTypeError):
        validate_samples(df, SERIES)


def test_bad_ts_rejected(spark, transcripts):
    df = transcripts.withColumn("ts", F.unix_millis(F.col("ts")))
    with pytest.raises(UnsupportedValueTypeError, match="timestamp"):
        validate_samples(df, SERIES)


def test_missing_column(spark, transcripts):
    with pytest.raises(ValueError, match="missing"):
        validate_samples(transcripts.drop("tool"), SERIES)


def test_numeric_label_coerced(spark):
    df = spark.createDataFrame(
        [(1, "u", None, 1.0)], "conv_id long, role string, tool string, value double"
    ).withColumn("ts", F.current_timestamp())
    out = validate_samples(df, SERIES)
    assert dict(out.dtypes)["conv_id"] == "string"
