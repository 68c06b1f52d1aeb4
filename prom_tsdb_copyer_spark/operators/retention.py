"""Retention expiry per tier (SURVEY.md §2.8 M4 analog).

The reference deletes source blocks after merge (compact.go:41-43); the
north rule generalizes this to per-tier retention: the 1m tier expires
sooner than 1h, which expires sooner than 1d. Realized as partition-level
deletes: tier tables are partitioned by UTC day (sources/tables.py), so
expiry drops whole partition directories -- an O(partitions) metadata
operation, never a rewrite (the Iceberg `expire_snapshots` /
partition-drop analog).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import DAY_MS, TIER_MS


@dataclass(frozen=True)
class RetentionPolicy:
    """Keep `keep_ms` of history per tier, measured back from `now_ms`
    (injected, never wall-clock -- determinism for tests and retries)."""

    keep_ms: dict[str, int]

    def cutoff_ms(self, tier: str, now_ms: int) -> int:
        # align the cutoff to the tier's own bucket grid so expiry never
        # splits a bucket
        tier_ms = TIER_MS[tier]
        return ((now_ms - self.keep_ms[tier]) // tier_ms) * tier_ms


def enforce_retention_df(tier_df: DataFrame, cutoff_ms: int) -> DataFrame:
    """Logical retention: rows at/after the cutoff survive."""
    return tier_df.where(F.col("bucket_ms") >= F.lit(cutoff_ms))


def expire_partitions(tier_path: str, cutoff_ms: int) -> list[str]:
    """Physical retention on a day-partitioned tier table: delete every
    `part_day=<d>` directory strictly before the cutoff day. Returns the
    deleted partition names (for the manifest/metrics)."""
    cutoff_day = cutoff_ms // DAY_MS
    deleted = []
    root = Path(tier_path)
    for p in sorted(root.glob("part_day=*")):
        day_str = p.name.split("=", 1)[1]
        import datetime as _dt

        day = _dt.date.fromisoformat(day_str)
        day_ord = (day - _dt.date(1970, 1, 1)).days
        if day_ord < cutoff_day:
            shutil.rmtree(p)
            deleted.append(p.name)
    return deleted
