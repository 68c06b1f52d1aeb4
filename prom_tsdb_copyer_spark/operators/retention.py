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


def enforce_retention_overrides(
    tier_df: DataFrame,
    base_cutoff_ms: int,
    overrides: list[tuple[list[str], int]],
    labels: dict | None = None,
    metric_name: str = "turns",
) -> DataFrame:
    """Per-label retention overrides on top of the tier policy: keep
    some series classes longer (or shorter) than the tier default --
    e.g. ``[(["role=error"], longer_cutoff)]``. Each override is
    (matcher strings, cutoff_ms); the FIRST matching rule wins, rows
    matching no rule use `base_cutoff_ms`. Matcher semantics are the
    ingest/select ones (matchers.py, null ≡ "").

    Two-layer contract, same as the base policy: this is the LOGICAL
    layer (and the rewrite predicate). Physically, day-partition drops
    (`expire_partitions`) may only use min(all cutoffs) -- partitions
    mix label values -- and rows between that floor and their rule's
    cutoff are removed by rewriting the affected partitions with this
    relation (Iceberg analog: a row-level DELETE / rewrite_data_files
    pass; the same maintenance slot as compact_neardup_index).

    Pure codegen: one nested CASE over matcher predicates, then a
    single comparison -- pushdown-eligible, no UDF, no shuffle."""
    from ..matchers import transcript_labels, matchers_predicate

    lbls = labels if labels is not None else transcript_labels(metric_name)
    eff = F.lit(int(base_cutoff_ms)).cast("long")
    # build the CASE inside-out so the FIRST listed rule is the
    # OUTERMOST when => checked first (first-match-wins)
    for ms, cut in reversed(overrides):
        eff = F.when(
            matchers_predicate(list(ms), lbls), F.lit(int(cut)).cast("long")
        ).otherwise(eff)
    return tier_df.where(F.col("bucket_ms") >= eff)


def min_cutoff_ms(
    base_cutoff_ms: int, overrides: list[tuple[list[str], int]]
) -> int:
    """The physical partition-drop floor: no partition at/after this
    may be dropped wholesale, because some rule retains rows in it."""
    return min([int(base_cutoff_ms), *[int(c) for _, c in overrides]])
