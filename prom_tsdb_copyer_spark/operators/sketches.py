"""Mergeable-sketch continuous aggregates: distinct counts that
RE-AGGREGATE exactly through the tier cascade.

`cnt`/`sum`/`min`/`max` reaggregate losslessly from a finer tier
(operators/rollup.py), but COUNT DISTINCT does not -- distinct sets
don't add. The classic continuous-aggregate answer (TimescaleDB's
hyperloglog rollups, Druid/Pinot sketch columns -- public designs) is
to store a MERGEABLE sketch per bucket and union sketches upward.
Spark ships Apache DataSketches HLL natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`, JVM-side aggregates), so the
whole path stays in built-ins: no UDF, map-side partial merges, one
shuffle per tier exactly like the numeric rollup.

The merge law -- union of the 1m sketches over an hour == the sketch
built directly from the hour's raw rows, estimate-identical -- is
what makes the cascade CORRECT, not just cheap; it is pinned in
tests/test_sketches.py, alongside the accuracy gate vs exact distinct
counts (HLL lgK=12 => ~1.6% relative standard error, far inside the
gate's bounds-check tolerance).

Reference scope note: the Go copyer has no sketch surface (568-LoC
block copier); this extends the engine's continuous-aggregate family
the same way the histogram/LTTB tiers do (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import TIER_MS, bucket_ms_col

#: Datasketches HLL lgConfigK: 2^12 registers, ~1.6% RSE -- the
#: TimescaleDB-ish default; raise for tighter estimates (memory per
#: sketch is 2^lgK bytes-ish, per (series, bucket) group)
DEFAULT_LGK = 12


def hll_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    distinct_col: str,
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Raw rows -> (series..., bucket_ms, sketch): one Datasketches HLL
    sketch of `distinct_col` per (series, bucket). Same single-shuffle
    shape as the numeric rollup: the sketch aggregate combines
    map-side, so each reducer receives one partial sketch per
    (group, partition), never the raw values."""
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        F.col(distinct_col).alias("__d"),
    )
    return prepared.groupBy(*series_cols, "bucket_ms").agg(
        F.hll_sketch_agg("__d", F.lit(lgk)).alias("sketch")
    )


def hll_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    coarser: str | int,
) -> DataFrame:
    """Finer sketch tier -> coarser: re-bucket and UNION the sketches
    (`hll_union_agg`) -- the merge that plain count-distinct cannot do.
    One shuffle moving |finer-tier| sketch rows, combined map-side;
    the raw table is never touched again (the continuous-aggregate
    property, same contract as rollup.reaggregate)."""
    coarser_ms = TIER_MS[coarser] if isinstance(coarser, str) else int(coarser)
    rebucket = (
        F.floor(F.col("bucket_ms") / F.lit(coarser_ms)) * F.lit(coarser_ms)
    ).alias("bucket_ms")
    return (
        tier_df.select(*series_cols, rebucket, "sketch")
        .groupBy(*series_cols, "bucket_ms")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def with_estimate(
    sketch_df: DataFrame, out_col: str = "n_distinct"
) -> DataFrame:
    """Materialize the estimate column (read-side projection; the
    sketch column stays available for further merging)."""
    return sketch_df.withColumn(
        out_col, F.hll_sketch_estimate("sketch")
    )


def hll_cascade(
    df: DataFrame,
    series_cols: list[str],
    distinct_col: str,
    tiers: tuple = ("1m", "1h", "1d"),
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
) -> dict[str, DataFrame]:
    """The sketch twin of the numeric tier cascade: the finest tier is
    built from raw ONCE; every coarser tier unions the next-finer
    tier's sketches. Returns {tier: sketch_df}."""
    out: dict[str, DataFrame] = {}
    finest = tiers[0]
    out[finest] = hll_tier(
        df, series_cols, finest, distinct_col, ts_col, lgk
    )
    for finer, coarser in zip(tiers, tiers[1:]):
        out[coarser] = hll_reaggregate(out[finer], series_cols, coarser)
    return out


# ---------------------------------------------------------------------------
# Count-min frequency tiers (Cormode & Muthukrishnan 2005)
#
# The second classic mergeable sketch a continuous-aggregate store
# carries (Druid/Pinot ship it next to HLL): per-bucket FREQUENCY
# estimation over an unbounded key domain in fixed space. Where HLL's
# merge law is estimate-identical, count-min's is LOSSLESS -- the
# sketch is depth x width BIGINT counters and merging is elementwise
# addition -- so the whole family (build, re-aggregate, estimate) is
# exact integer algebra: fully DuckDB-twinnable and hash-gateable,
# with the one-sided guarantee est >= true always.
#
# Spark-first shape: the sketch is not a binary blob but a RELATION
# (series..., bucket_ms, row, slot, cnt) -- at most depth*width cells
# per (series, bucket) group. Build is one explode(depth) + groupBy
# whose map-side partial combine absorbs the Zipf head (same argument
# as the LM token counts); re-aggregation is the numeric rollup's sum.
# The hash is the repo's shared oracle-parity hash60 (functions/
# hashing.py) salted by the row index; at 100TB it would swap for
# xxhash64 exactly as documented there.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_slot(
    key: Column, row: Column, width: int, hasher: str = "parity"
) -> Column:
    """Row-salted slot, % width, two laws:

    * ``parity``: hash60("<row>:<key>") -- md5-based, recomputable in
      DuckDB (`cms_slot_sql`), the gate/twin choice (twin tests pass it
      explicitly). Non-negative by construction so plain % == pmod in
      both engines.
    * ``fast`` (since r9 the DEFAULT of every public build/probe entry
      point -- VERDICT r8 #4: the md5 law measured ~40% extra build
      wall, and a 100TB caller who forgets the kwarg should get the
      production law): JVM ``xxhash64(row, key)`` (no md5), pmod'd
      non-negative -- the swap hashing.py has always documented. Same
      uniformity guarantees, NOT oracle-expressible; build and probe
      must agree on the law (both sides thread this parameter)."""
    if hasher == "fast":
        return F.pmod(
            F.xxhash64(row.cast("string"), key.cast("string")),
            F.lit(width),
        )
    if hasher != "parity":
        raise ValueError(f"hasher must be 'parity' or 'fast', got {hasher!r}")
    from ..functions.hashing import hash60

    return (
        hash60(F.concat(row.cast("string"), F.lit(":"), key.cast("string")))
        % F.lit(width)
    )


def cms_slot_sql(key_expr: str, row_expr: str, width: int) -> str:
    """The identical slot computation in DuckDB SQL."""
    from ..functions.hashing import hash60_sql

    h = hash60_sql(f"({row_expr})::VARCHAR || ':' || ({key_expr})::VARCHAR")
    return f"({h} % {width})"


def cms_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    key_col: str,
    ts_col: str = "ts",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    hasher: str = "fast",
) -> DataFrame:
    """Raw rows -> (series..., bucket_ms, row, slot, cnt): a count-min
    sketch per (series, bucket) stored relationally. Rows where
    `key_col` is null are skipped (a null key is 'no observation',
    matching count(col) semantics).

    Scale shape: explode(depth) multiplies the MAP side only -- the
    partial aggregation combines per-cell before the shuffle, so at
    most |groups| * depth * width rows move regardless of input size.
    One shuffle, exactly the numeric rollup's topology."""
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.where(F.col(key_col).isNotNull()).select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        F.col(key_col).cast("string").alias("__k"),
    )
    exploded = prepared.select(
        *series_cols,
        "bucket_ms",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        F.col("__k"),
    )
    return (
        exploded.select(
            *series_cols,
            "bucket_ms",
            F.col("row").cast("int").alias("row"),
            _cms_slot(F.col("__k"), F.col("row"), width, hasher)
            .cast("int")
            .alias("slot"),
        )
        .groupBy(*series_cols, "bucket_ms", "row", "slot")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    coarser: str | int,
) -> DataFrame:
    """Finer count-min tier -> coarser: re-bucket and ADD counters
    elementwise. Unlike HLL this merge is LOSSLESS -- the coarser
    sketch equals the one built directly from raw, cell for cell
    (pinned in tests) -- because each cell is a plain count over a
    disjoint row partition. Same one-shuffle shape as
    rollup.reaggregate; the raw table is never touched again."""
    coarser_ms = TIER_MS[coarser] if isinstance(coarser, str) else int(coarser)
    rebucket = (
        F.floor(F.col("bucket_ms") / F.lit(coarser_ms)) * F.lit(coarser_ms)
    ).alias("bucket_ms")
    return (
        tier_df.select(*series_cols, rebucket, "row", "slot", "cnt")
        .groupBy(*series_cols, "bucket_ms", "row", "slot")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch_df: DataFrame,
    group_cols: list[str],
    keys: list[str],
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    hasher: str = "fast",
) -> DataFrame:
    """Point-query the sketch: for each key in `keys` and each group in
    `sketch_df`, est = min over rows of the key's cell (missing cell
    == 0). Output (group_cols..., key, est) with the count-min
    guarantee est >= true count, est <= true + eps*N w.h.p.

    `keys` is a driver-side list (point queries are a small probe
    set by definition); it becomes a depth*|keys| literal frame that
    broadcasts, so the only distributed work is one left join from
    the group relation and a min-fold -- no shuffle of the sketch
    beyond its own grouping."""
    spark = sketch_df.sparkSession
    probes = spark.createDataFrame(
        [(k, r) for k in keys for r in range(depth)], "key string, row int"
    ).withColumn(
        "slot",
        _cms_slot(F.col("key"), F.col("row"), width, hasher).cast("int"),
    )
    groups = sketch_df.select(*group_cols).distinct()
    # groups derives from sketch_df (self-join lineage): alias both
    # sides so the join condition is unambiguous
    probe_cells = groups.join(F.broadcast(probes)).alias("p")
    s = sketch_df.alias("s")
    # group keys may be null (e.g. a null series label): the join must
    # be null-SAFE or null-keyed groups lose every cell and estimate 0,
    # breaking the est >= true guarantee
    cond = [
        F.col(f"p.{c}").eqNullSafe(F.col(f"s.{c}")) for c in group_cols
    ]
    cond += [
        F.col("p.row") == F.col("s.row"),
        F.col("p.slot") == F.col("s.slot"),
    ]
    joined = probe_cells.join(s, cond, "left").select(
        *[F.col(f"p.{c}") for c in group_cols],
        F.col("p.key"),
        F.coalesce(F.col("s.cnt"), F.lit(0)).alias("cnt"),
    )
    return joined.groupBy(*group_cols, "key").agg(
        F.min("cnt").cast("long").alias("est")
    )


def cms_cascade(
    df: DataFrame,
    series_cols: list[str],
    key_col: str,
    tiers: tuple = ("1m", "1h", "1d"),
    ts_col: str = "ts",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    hasher: str = "fast",
) -> dict[str, DataFrame]:
    """Count-min twin of `hll_cascade`: raw touched once by the finest
    tier, every coarser tier sums the finer tier's cells."""
    out: dict[str, DataFrame] = {}
    finest = tiers[0]
    out[finest] = cms_tier(
        df, series_cols, finest, key_col, ts_col, width, depth, hasher
    )
    for finer, coarser in zip(tiers, tiers[1:]):
        out[coarser] = cms_reaggregate(out[finer], series_cols, coarser)
    return out


# ---------------------------------------------------------------------------
# Bloom membership tiers (Bloom 1970)
#
# The third classic mergeable sketch of the continuous-aggregate
# family: per-bucket SET MEMBERSHIP over an unbounded key domain in
# fixed space ("did conversation X use tool Y during this hour?"
# without storing the hour's key set). Completes the trio the sketch
# stores ship together: HLL answers "how many distinct", count-min
# answers "how often", Bloom answers "was it there at all".
#
# Merge law: OR-ing two Bloom filters over disjoint (or ANY) row sets
# yields exactly the filter of the union -- and OR is idempotent, so
# the merge is not just lossless like count-min's addition but also
# replay-safe (merging the same finer bucket twice cannot corrupt the
# coarser cell, unlike a counter sum). Stored relationally the filter
# is the DISTINCT set of set-bit positions (series..., bucket_ms,
# bit), <= m rows per group; OR == distinct union of positions, so
# re-aggregation is a re-bucket + distinct -- one shuffle with
# map-side partial dedup, the numeric rollup's topology.
#
# Guarantee (pinned in tests): NO false negatives -- a key observed in
# the group always probes true; false positives bounded by the usual
# (1 - e^{-kn/m})^k. Bits use the shared oracle-parity hash60 salted
# by the hash index (the count-min discipline), so the whole chain --
# bits, merge, membership -- recomputes exactly in DuckDB.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1024
BLOOM_HASHES = 4


def bloom_bit_sql(key_expr: str, i_expr: str, m_bits: int) -> str:
    """The identical bit computation in DuckDB SQL (same salted slot
    law as count-min: hash60("<i>:<key>") % m)."""
    return cms_slot_sql(key_expr, i_expr, m_bits)


def bloom_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    key_col: str,
    ts_col: str = "ts",
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
    hasher: str = "fast",
) -> DataFrame:
    """Raw rows -> (series..., bucket_ms, bit): one Bloom filter per
    (series, bucket) stored as its distinct set-bit positions. Null
    keys are 'no observation' (the count-min convention).

    Scale shape: explode(k) multiplies the MAP side only; the distinct
    is a hash aggregate whose partial combine dedups before the
    shuffle, so at most |groups| * min(m, k*|group keys|) rows move
    regardless of input size. One shuffle, the rollup's topology."""
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.where(F.col(key_col).isNotNull()).select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        F.col(key_col).cast("string").alias("__k"),
    )
    return (
        prepared.select(
            *series_cols,
            "bucket_ms",
            F.explode(
                F.sequence(F.lit(0), F.lit(k_hashes - 1))
            ).alias("__i"),
            "__k",
        )
        .select(
            *series_cols,
            "bucket_ms",
            _cms_slot(F.col("__k"), F.col("__i"), m_bits, hasher)
            .cast("int")
            .alias("bit"),
        )
        .distinct()
    )


def bloom_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    coarser: str | int,
) -> DataFrame:
    """Finer Bloom tier -> coarser: re-bucket and OR the filters,
    which relationally is a distinct union of bit positions. LOSSLESS
    (coarser == built-directly-from-raw, cell for cell) AND IDEMPOTENT
    (replaying a finer bucket cannot corrupt the merge) -- both pinned
    in tests. Same one-shuffle shape as rollup.reaggregate; raw is
    never touched again."""
    coarser_ms = TIER_MS[coarser] if isinstance(coarser, str) else int(coarser)
    rebucket = (
        F.floor(F.col("bucket_ms") / F.lit(coarser_ms)) * F.lit(coarser_ms)
    ).alias("bucket_ms")
    return tier_df.select(*series_cols, rebucket, "bit").distinct()


def bloom_contains(
    sketch_df: DataFrame,
    group_cols: list[str],
    keys: list[str],
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
    hasher: str = "fast",
) -> DataFrame:
    """Membership-probe the sketch: for each key in `keys` and each
    group present in `sketch_df`, member := ALL of the key's k bit
    positions are set. Output (group_cols..., key, member) with the
    Bloom guarantee: member is never false for a key the group
    actually contained (no false negatives); a true may be a false
    positive with the standard bounded probability.

    `keys` is a driver-side probe list (point queries); its bit frame
    is pre-deduped per key (two of the k hashes may collide on one
    bit -- requiring k matches would then break the no-false-negative
    guarantee) and broadcast, so the only distributed work is one left
    join from the group relation and a bool_and fold."""
    spark = sketch_df.sparkSession
    probes = (
        spark.createDataFrame(
            [(key, i) for key in keys for i in range(k_hashes)],
            "key string, i int",
        )
        .select(
            "key",
            _cms_slot(F.col("key"), F.col("i"), m_bits, hasher)
            .cast("int")
            .alias("bit"),
        )
        .distinct()
    )
    groups = sketch_df.select(*group_cols).distinct()
    probe_cells = groups.join(F.broadcast(probes)).alias("p")
    s = sketch_df.alias("s")
    # group labels may be null (the cms_estimate discipline): null-safe
    # join or null-labeled groups lose every bit and probe false,
    # breaking the no-false-negative guarantee
    cond = [
        F.col(f"p.{c}").eqNullSafe(F.col(f"s.{c}")) for c in group_cols
    ]
    cond += [F.col("p.bit") == F.col("s.bit")]
    joined = probe_cells.join(s, cond, "left").select(
        *[F.col(f"p.{c}") for c in group_cols],
        F.col("p.key"),
        F.col("s.bit").isNotNull().alias("_hit"),
    )
    return joined.groupBy(*group_cols, "key").agg(
        F.bool_and("_hit").alias("member")
    )


def bloom_cascade(
    df: DataFrame,
    series_cols: list[str],
    key_col: str,
    tiers: tuple = ("1m", "1h", "1d"),
    ts_col: str = "ts",
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
    hasher: str = "fast",
) -> dict[str, DataFrame]:
    """Bloom twin of `hll_cascade`/`cms_cascade`: raw touched once by
    the finest tier, every coarser tier ORs the finer tier's bits."""
    out: dict[str, DataFrame] = {}
    finest = tiers[0]
    out[finest] = bloom_tier(
        df, series_cols, finest, key_col, ts_col, m_bits, k_hashes, hasher
    )
    for finer, coarser in zip(tiers, tiers[1:]):
        out[coarser] = bloom_reaggregate(out[finer], series_cols, coarser)
    return out


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches (Bar-Yossef et al. 2002; the
# Datasketches theta-sketch family's relational ancestor)
#
# The fourth mergeable sketch, carrying the one capability the other
# three cannot: SET OPERATIONS between buckets. HLL answers "how many
# distinct", but not "how much does hour A's conversation set overlap
# hour B's" -- KMV does, because the k smallest hashes of a set are a
# uniform sample of it: the union sketch is min-k of the concatenated
# sketches (EXACT merge, like Bloom's OR), and Jaccard is estimated by
# counting union-sample members present in both sides. Everything is
# selection algebra over BIGINT hashes (min-k, membership counts) --
# no accumulated floats -- so the whole family is DuckDB-twinnable
# and value-hash gateable.
#
# Relational layout: (series..., bucket_ms, h) with at most k rows per
# group, h ascending-unique within the group. Build = one distinct +
# one row_number window on the SAME keys (Catalyst reuses the
# distinct's hash partitioning -- no second exchange; plan-pinned).
# ---------------------------------------------------------------------------

KMV_K = 64
HASH60_SPACE = float(1 << 60)


def kmv_tier(
    df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    key_col: str,
    ts_col: str = "ts",
    k: int = KMV_K,
) -> DataFrame:
    """Raw rows -> (series..., bucket_ms, h): the k smallest distinct
    hash60(key) values per (series, bucket). Null keys skipped (the
    count-min convention). The window's skew posture is
    cap_per_group's: a hot group sorts-and-spills, and only <= k rows
    per group survive it."""
    from pyspark.sql import Window

    from ..functions.hashing import hash60

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    distinct_h = (
        df.where(F.col(key_col).isNotNull())
        .select(
            *series_cols,
            bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
            hash60(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy(*series_cols, "bucket_ms").orderBy(F.col("h"))
    return (
        distinct_h.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_reaggregate(
    tier_df: DataFrame,
    series_cols: list[str],
    coarser: str | int,
    k: int = KMV_K,
) -> DataFrame:
    """Finer KMV tier -> coarser: re-bucket, dedup (one hash may
    arrive from several finer buckets), keep the k smallest. EXACT:
    the coarser sketch equals the one built directly from raw (min-k
    over a union only needs each side's min-k; pinned in tests)."""
    coarser_ms = TIER_MS[coarser] if isinstance(coarser, str) else int(coarser)
    from pyspark.sql import Window

    rebucket = (
        F.floor(F.col("bucket_ms") / F.lit(coarser_ms)) * F.lit(coarser_ms)
    ).alias("bucket_ms")
    merged = tier_df.select(*series_cols, rebucket, "h").distinct()
    w = Window.partitionBy(*series_cols, "bucket_ms").orderBy(F.col("h"))
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(
    sketch_df: DataFrame,
    group_cols: list[str],
    k: int = KMV_K,
) -> DataFrame:
    """(group..., n_kept, kth_min, n_distinct_est): when a group kept
    fewer than k hashes its distinct count is EXACT (= n_kept); at k
    the estimator is (k-1) / (kth_min / 2^60). n_kept and kth_min are
    exact selections (gateable); the estimate is their quotient."""
    agg = sketch_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("kth_min"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_min") / F.lit(HASH60_SPACE))
    )
    return agg.withColumn("n_distinct_est", F.round(est, 3))


def kmv_jaccard_adjacent(
    sketch_df: DataFrame,
    series_cols: list[str],
    tier: str | int,
    k: int = KMV_K,
) -> DataFrame:
    """Per series, the estimated Jaccard similarity between each
    bucket's key set and the PREVIOUS bucket's -- window-over-window
    set churn ("how much did this hour's conversation set overlap last
    hour's"), the query HLL cannot answer. Output (series...,
    bucket_ms, prev_bucket_ms, n_union_sample, n_both, jaccard_est).

    Law: for sketches A (current) and B (previous), take the k
    smallest of A ∪ B (each side's sketch suffices -- min-k
    composes); J^ = |{h in that union sample: h in A AND h in B}| /
    |union sample|. Exact integer counts (gateable); one self-join on
    (series, bucket-tier_ms) moving <= k rows per group each way."""
    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    from pyspark.sql import Window

    cur = sketch_df.alias("cur")
    prev = sketch_df.select(
        *[F.col(c).alias(f"_p_{c}") for c in series_cols],
        (F.col("bucket_ms") + F.lit(tier_ms)).alias("_p_next"),
        F.col("h").alias("_p_h"),
        F.lit(True).alias("_in_prev"),
    ).alias("prev")
    cond = F.lit(True)
    for c in series_cols:
        cond = cond & F.col(f"cur.{c}").eqNullSafe(F.col(f"_p_{c}"))
    cond_pair = cond & (F.col("cur.bucket_ms") == F.col("_p_next"))
    # full outer per (pair, h): union of both sketches' hashes with
    # side-membership flags
    cur_side = sketch_df.select(
        *series_cols, "bucket_ms", "h", F.lit(True).alias("_in_cur")
    ).alias("cur")
    joined = cur_side.join(
        prev, cond_pair & (F.col("cur.h") == F.col("_p_h")), "full_outer"
    )
    # realign keys from whichever side is present; pairs only exist
    # where BOTH buckets exist, so restrict to hashes whose pair key
    # is resolvable on either side
    pair_cols = [
        F.coalesce(F.col(f"cur.{c}"), F.col(f"_p_{c}")).alias(c)
        for c in series_cols
    ]
    u = joined.select(
        *pair_cols,
        F.coalesce(F.col("cur.bucket_ms"), F.col("_p_next"))
        .alias("bucket_ms"),
        F.coalesce(F.col("cur.h"), F.col("_p_h")).alias("h"),
        F.coalesce(F.col("_in_cur"), F.lit(False)).alias("in_cur"),
        F.coalesce(F.col("_in_prev"), F.lit(False)).alias("in_prev"),
    )
    # keep only (series, bucket) pairs where both sides exist
    both_sides = (
        u.groupBy(*series_cols, "bucket_ms")
        .agg(
            F.max(F.col("in_cur").cast("int")).alias("_has_cur"),
            F.max(F.col("in_prev").cast("int")).alias("_has_prev"),
        )
        .where((F.col("_has_cur") == 1) & (F.col("_has_prev") == 1))
        .select(*series_cols, "bucket_ms")
    )
    # the semi-join must be NULL-safe (a name-list join's plain
    # equality silently drops every null-labeled series -- the
    # gapfill/cms lesson, re-learned here on a toy before it shipped)
    bs = both_sides
    for c in [*series_cols, "bucket_ms"]:
        bs = bs.withColumnRenamed(c, f"_b_{c}")
    semi_cond = F.lit(True)
    for c in [*series_cols, "bucket_ms"]:
        semi_cond = semi_cond & F.col(c).eqNullSafe(F.col(f"_b_{c}"))
    u = u.join(bs, on=semi_cond, how="leftsemi")
    w = Window.partitionBy(*series_cols, "bucket_ms").orderBy(F.col("h"))
    sample = u.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= k
    )
    return (
        sample.groupBy(*series_cols, "bucket_ms")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_sample"),
            F.sum(
                (F.col("in_cur") & F.col("in_prev")).cast("long")
            ).alias("n_both"),
        )
        .withColumn(
            "prev_bucket_ms",
            (F.col("bucket_ms") - F.lit(tier_ms)).cast("long"),
        )
        .withColumn(
            "jaccard_est",
            F.round(F.col("n_both") / F.col("n_union_sample"), 6),
        )
    )
