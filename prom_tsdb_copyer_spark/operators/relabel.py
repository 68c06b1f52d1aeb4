"""Label append / relabel projection (SURVEY.md §2.2 F11).

The reference upserts appended labels into each series' label set before
appending samples (/root/reference/copyer.go:99-105; flag main.go:125),
with overwrite-on-conflict and no existence check (main.go:44 help text).
Because it happens before the append, it *changes series identity* --
two formerly distinct series that collide after relabeling merge.

Spark equivalent: ``withColumn(k, lit(v))`` per appended label, applied
BEFORE the rollup groupBy, so merged identities aggregate together
exactly as the reference's appender would interleave them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_label_pairs(pairs: list[str]) -> dict[str, str]:
    """CLI-style ``k=v`` pairs -> dict (last wins, like repeated flags)."""
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise ValueError(f"label append must be k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def label_append(df: DataFrame, labels: dict[str, str]) -> DataFrame:
    """Upsert constant labels as columns (overwrite semantics match
    ``withColumn``). New label names become new series-key columns."""
    for k, v in labels.items():
        df = df.withColumn(k, F.lit(v))
    return df
