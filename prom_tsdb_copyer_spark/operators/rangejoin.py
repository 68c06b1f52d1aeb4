"""Range (interval-containment) join: points joined to the intervals
that contain them, per series.

The second custom join the brief names alongside as-of. A naive
implementation is an inequality join (cross product + filter -- Spark
plans BroadcastNestedLoopJoin / CartesianProduct); the scale shape here
is the standard BUCKETED interval join:

    intervals -> explode into the time buckets they overlap
    points    -> bucket = floor(t / bucket_ms)
    equi-join on (series, bucket), then the exact lo <= t <= hi filter

Cost: |points| + sum(interval_len)/bucket_ms exploded rows, one shuffle
on (series, bucket) -- never quadratic. `bucket_ms` trades explode
factor against join fan-in; size it near the median interval length
(each interval then explodes into ~2 buckets). Long-tail intervals are
the skew hazard at 100TB: split the interval set at an explode-factor
cap and route the few giant intervals through a broadcast inequality
join, keeping the hot path equi-joined (same split trick as
operators/skew.py's hot-key path; not needed at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    series_cols: list[str],
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bucket_ms: int,
    how: str = "inner",
) -> DataFrame:
    """points x intervals where lo <= t <= hi within the same series.

    Returns all point columns + all interval columns. `how='inner'`
    drops unmatched points; 'left' keeps them with null interval cols."""
    pb = points.withColumn(
        "_b", F.floor(F.col(point_ts) / bucket_ms).cast("long")
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_ms).cast("long"),
                F.floor(F.col(hi_col) / bucket_ms).cast("long"),
            )
        ),
    )
    joined = pb.join(iv, on=[*series_cols, "_b"], how="inner").where(
        F.col(point_ts).between(F.col(lo_col), F.col(hi_col))
    )
    out_cols = [*points.columns, *[c for c in intervals.columns if c not in points.columns]]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    if how == "left":
        # unmatched points via anti-join on the matched point identity
        keys = [*series_cols, point_ts]
        unmatched = points.join(
            matched.select(*keys).distinct(), on=keys, how="left_anti"
        )
        for c in intervals.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(matched.dtypes)[c])
                )
        return matched.unionByName(unmatched.select(*out_cols))
    raise ValueError(f"how={how!r} not supported (inner|left)")
