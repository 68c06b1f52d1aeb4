"""As-of join: for each probe row, the most recent sample row
at-or-before the probe time within the same series.

The classic time-series join Spark lacks natively (the brief's named
example of a custom operator). Implemented as a COMPOSITION of
existing DataFrame ops -- no Pandas UDF, no range explosion:

    union(tagged probes, tagged samples)
      -> window per series ordered by (t, probe-flag, tiebreak)
      -> last(sample value, ignoreNulls) over unbounded-preceding
      -> keep probe rows

One shuffle (the window partitionBy), linear in |probes|+|samples|;
at 100TB both sides shuffle once on the series key and the per-series
scan is a single ordered pass -- the same cost shape as a sort-merge
join without the equality restriction. Samples sort BEFORE probes at
equal t (a sample exactly at the probe time matches), and a unique
tiebreak column makes the pick deterministic when sample times tie.

`tolerance_ms` bounds staleness like pandas.merge_asof: a match older
than the tolerance yields null. The DuckDB twin is the native
`ASOF LEFT JOIN` (the driver-gate oracle for `asof_join_1h`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import unix_ms

ASOF_VALUE_PREFIX = "asof_"


def asof_join(
    probes: DataFrame,
    samples: DataFrame,
    series_cols: list[str],
    probe_ts: str = "ts",
    sample_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tolerance_ms: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """probes + asof_<value> columns (null where no sample at-or-before
    the probe time, or staleness exceeds tolerance_ms).

    probe_ts/sample_ts may be timestamp columns or epoch-ms longs."""

    def ms(df: DataFrame, col: str):
        dt = dict(df.dtypes)[col]
        return F.col(col) if dt in ("bigint", "int") else unix_ms(F.col(col))

    probe_cols = probes.columns
    p = probes.withColumn("_t", ms(probes, probe_ts)).withColumn(
        "_is_probe", F.lit(1)
    )
    s = samples.select(
        *series_cols,
        ms(samples, sample_ts).alias("_t"),
        F.lit(0).alias("_is_probe"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        (ms(samples, sample_ts) if tiebreak_col is None
         else F.col(tiebreak_col).cast("long")).alias("_tb"),
    )
    for c in probe_cols:
        if c not in s.columns:
            s = s.withColumn(c, F.lit(None))
    for c in value_cols:
        p = p.withColumn(f"_v_{c}", F.lit(None).cast(dict(s.dtypes)[f"_v_{c}"]))
    p = p.withColumn("_tb", F.lit(None).cast("long"))

    u = s.unionByName(p.select(*s.columns))
    # samples (_is_probe=0) sort before probes at equal t; _tb makes the
    # winner among equal-t samples total
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("_t", "_is_probe", F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *u.columns,
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"{ASOF_VALUE_PREFIX}{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_is_probe") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_asof_t"),
    )
    out = filled.where(F.col("_is_probe") == 1)
    if tolerance_ms is not None:
        stale = F.col("_t") - F.col("_asof_t") > tolerance_ms
        for c in value_cols:
            out = out.withColumn(
                f"{ASOF_VALUE_PREFIX}{c}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{ASOF_VALUE_PREFIX}{c}")),
            )
        out = out.withColumn(
            "_asof_t", F.when(stale, F.lit(None)).otherwise(F.col("_asof_t"))
        )
    return out.select(
        *probe_cols,
        *[f"{ASOF_VALUE_PREFIX}{c}" for c in value_cols],
        F.col("_asof_t").alias("asof_ts_ms"),
    )
