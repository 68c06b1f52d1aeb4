"""Skew handling: salting for hot series (SURVEY.md §4 P11).

The reference has no skew defense -- a hot series serializes inside its
goroutine (copyer.go:92-156). At 100TB a zipf-hot conversation would do
the same to one Spark task. Two mitigations, used by the pipelines here:

1. Algebraic aggregations (the tier rollup) need NO salting: Spark's
   partial (map-side) aggregation bounds any key's final-stage input to
   <= #map-partitions rows, so a hot (series, bucket) key is already
   combined before the shuffle. We keep AQE on to coalesce the tail.

2. Holistic per-group ops (the Gorilla encode's applyInPandas, where the
   whole group must colocate) use *bucketed* salting: the group key
   already includes the time bucket, which caps group size at (bucket
   span x max sample rate). For pathological single-bucket hotspots,
   `salt_col` adds a deterministic sub-split the caller re-merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(cols: list[str | Column], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a hash of `cols` -- stable
    across retries (xxhash64 is seed-stable), so task re-execution
    reproduces identical groupings."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def hot_keys(df: DataFrame, key_cols: list[str], threshold: int) -> DataFrame:
    """Cheap driver-side skew sketch: keys whose row count exceeds the
    threshold (one partial-agg pass; at scale, sample first)."""
    return (
        df.groupBy(*key_cols)
        .count()
        .where(F.col("count") > threshold)
    )


def repartition_for_series(
    df: DataFrame, series_cols: list[str], bucket_col: str, n: int, salt_buckets: int = 0
) -> DataFrame:
    """Cluster rows for per-(series, bucket) processing; optional salt
    column `_salt` appended to the key for pathological hotspots."""
    keys: list[Column | str] = [*series_cols, bucket_col]
    if salt_buckets > 1:
        df = df.withColumn("_salt", salt_col([F.col(c) for c in keys], salt_buckets))
        keys = [*keys, "_salt"]
    return df.repartition(n, *keys)
