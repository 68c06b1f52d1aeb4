"""Physical-plan regression tests for the round-3 shuffle claims
(PLANS.md): these assert the PLAN, not the data, so a Catalyst or code
change that silently re-inserts an exchange fails fast.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

SERIES = ["conv_id", "role", "tool"]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _tiny(spark):
    return spark.createDataFrame(
        [("c", "user", None, "2024-01-01 00:00:00", 1.5)],
        "conv_id string, role string, tool string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_clustered_rollup_single_exchange(spark):
    """cluster=(lo, chunk, n): the chunk id joins the group keys and the
    input pre-partitions on it -- exactly ONE Exchange in the plan (the
    naive shape pays a second clustering exchange at the sink)."""
    from prom_tsdb_copyer_spark.operators.rollup import reaggregate, rollup

    t = rollup(_tiny(spark), SERIES, "value", "1m",
               cluster=(1704067200000, 3_600_000, 4))
    p = _plan(t)
    assert p.count("Exchange") == 1
    assert "hashpartitioning(_pid" in p

    base = rollup(_tiny(spark), SERIES, "value", "1m")
    r = reaggregate(base, SERIES, "1h", cluster=(1704067200000, 3_600_000, 4))
    # reagg itself adds exactly one exchange beyond its input's
    assert _plan(r).count("Exchange") == _plan(base).count("Exchange") + 1


def test_ivf_assignment_zero_exchange(spark):
    """assign_cells is a pure projection over literal centroids: NO
    Exchange between the scan and the cell column."""
    from prom_tsdb_copyer_spark.operators.similarity import assign_cells

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    p = _plan(assign_cells(emb, [[1.0, 0.0], [0.0, 1.0]]))
    assert "Exchange" not in p


def test_minhash_wide_signatures_single_shuffle(spark):
    """Wide signature aggregation: one Exchange for all 32 mins; band
    signatures add NO further exchange (projection + explode)."""
    from prom_tsdb_copyer_spark.operators.dedup import (
        band_signatures,
        minhash_signatures_wide,
    )

    sh = spark.createDataFrame([(1, 7), (1, 9), (2, 7)], "doc_id long, hm long")
    wide = minhash_signatures_wide(sh)
    assert _plan(wide).count("Exchange") == 1
    assert _plan(band_signatures(wide)).count("Exchange") == 1


def test_simhash_fingerprints_single_shuffle(spark):
    """Popcount-fold fingerprints: the 60 bit sums ride one groupBy
    exchange (the r2 shape exploded 60x rows first)."""
    from prom_tsdb_copyer_spark.operators.dedup import simhash_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    fp = simhash_fingerprints(docs)
    p = _plan(fp)
    # shingle distinct + fingerprint groupBy = 2 exchanges, no more
    assert p.count("Exchange") == 2
    assert "Expand" not in p and "explode(sequence" not in p


def test_pre_clustered_write_plan_has_no_repartition(spark, tmp_path):
    """write_tier(pre_clustered=True) must not add a clustering
    exchange on top of the clustered aggregation's single shuffle --
    verified end-to-end through a real tiny write (the physical plan of
    a write is only observable by running it; 1-row cost)."""
    from prom_tsdb_copyer_spark.operators.rollup import rollup
    from prom_tsdb_copyer_spark.sources.tables import write_tier

    t = rollup(_tiny(spark), SERIES, "value", "1m",
               cluster=(1704067200000, 3_600_000, 2))
    write_tier(t, str(tmp_path / "t"), pre_clustered=True)
    got = spark.read.parquet(str(tmp_path / "t"))
    assert got.count() == 1 and "part_day" in got.columns


def test_minhash_pipeline_single_aggregation(spark):
    """r4 shape: the full LSH pipeline hangs off ONE shingle-set
    aggregation — signatures/bands are projections over it, and the
    verification stage intersects set ARRAYS per candidate pair instead
    of re-shuffling |cands| x |shingles/doc| exploded rows (the r3
    shape paid the shingle aggregation twice plus a 30M-row
    intersection groupBy at sf0.1)."""
    from prom_tsdb_copyer_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgx"), (3, "zzzzzzzz")],
        "doc_id long, text string",
    )
    p = _plan(minhash_dedup_pairs(docs, threshold=0.1))
    # no per-pair shingle re-join: intersection happens on arrays
    assert "array_intersect" in p
    # the candidate groupBy (count-based intersection) is gone
    assert "count(1) AS inter" not in p and "partial_count" not in p
    # no join keyed on individual shingle hashes: verification joins on
    # doc ids only (the pre-AQE plan text duplicates the reused
    # shingle-set subtree per consumer, so subtree counts aren't
    # pinnable here; AQE reuses the identical shuffle at runtime)
    join_lines = [ln for ln in p.splitlines() if "Join" in ln]
    assert join_lines, "expected join operators in the plan"
    assert not any("hm#" in ln for ln in join_lines)


def test_minhash_persist_pins_set_relation(spark):
    """r5 recompute-audit guard: the LSH set relation must be served
    from the cache (InMemoryTableScan) in the executed plan -- HOF
    lambdas defeat ReusedExchange, so dropping the persist would
    silently re-evaluate the raw-text aggregation once per consumer."""
    from prom_tsdb_copyer_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i%7}_{j}" for j in range(20))) for i in range(40)],
        "doc_id long, text string",
    )
    out = minhash_dedup_pairs(docs, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every set-relation consumer reads the cache (the cached subtree's
    # own source scan is printed INSIDE the InMemoryRelation, so a raw
    # scan count would double-count it -- assert on the cache reads)
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_connected_components_fixed_iters_uses_cached_edges(spark):
    """Same guard for the iterative path: with the persist in place the
    per-round join reads edges from cache instead of re-evaluating the
    pairs pipeline each round."""
    from prom_tsdb_copyer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    out = connected_components(pairs, fixed_iters=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan


def test_pq_encode_zero_exchange_compact_plan(spark):
    """pq_encode is a pure projection DIRECTLY over the scan: NO
    Exchange anywhere. HOF expressions are CodegenFallback (the
    projection sits outside the scan's codegen span by design); the
    point of the HOF form is the COMPACT plan -- the flattened
    per-term fold at k*dsub=256 overflowed janino's 64KB method limit
    (compile ERROR + per-batch fallback) and ballooned the plan
    string; here the whole argmin renders in one Project line."""
    from prom_tsdb_copyer_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(64)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(emb, m=4, k=16, n_iter=1)
    p = _plan(pq_encode(emb, books))
    assert p.count("Exchange") == 0
    assert "Project" in p and "Scan" in p


def test_unigram_lm_total_is_broadcast_not_window(spark):
    """The corpus-total term joins as a one-row BroadcastExchange --
    never a global (empty-partition) window over the unbounded
    vocabulary relation."""
    from prom_tsdb_copyer_spark.operators.text import unigram_lm

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a d")], "doc_id long, text string"
    )
    p = _plan(unigram_lm(docs))
    assert "BroadcastExchange" in p
    assert "Window" not in p


def test_incremental_neardup_probe_is_equijoin(spark):
    """The batch probes the index by (band, sig) equi-join -- no
    cartesian/broadcast-nested-loop anywhere in the incremental plan."""
    from prom_tsdb_copyer_spark.operators.dedup import (
        incremental_neardup_pairs,
        neardup_index,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i} " * 30) for i in range(6)],
        "doc_id long, text string",
    )
    bands, sets = neardup_index(docs)
    new = spark.createDataFrame(
        [(100, "t1 " * 30)], "doc_id long, text string"
    )
    p = _plan(incremental_neardup_pairs(new, bands, sets, persist=False))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bigram_pairs_no_window_shuffle(spark):
    """Adjacency pairs come from the shifted-index projection -- the
    bigram plan has NO Window operator (a per-doc lag window would
    shuffle the corpus once just to form pairs)."""
    from prom_tsdb_copyer_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b c")], "doc_id long, text string"
    )
    p = _plan(bigram_logprob(docs))
    assert "Window" not in p


def test_broadcast_assignment_zero_exchange(spark):
    """The broadcast-kernel twin of test_ivf_assignment_zero_exchange
    (r7, VERDICT r6 #2): above LITERAL_CELL_LIMIT the auto path runs
    assign_cells as one mapInPandas over a broadcast matrix -- still NO
    Exchange between the scan and the cell column, and the plan carries
    the kernel node instead of a centroid literal per cell."""
    import numpy as np

    from prom_tsdb_copyer_spark.operators.similarity import (
        LITERAL_CELL_LIMIT,
        assign_cells,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = np.eye(2).tolist() * (LITERAL_CELL_LIMIT // 2 + 1)
    df = assign_cells(emb, cents)  # auto -> broadcast
    p = _plan(df)
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_dsir_scoring_broadcasts_ratio_map_no_window(spark):
    """dsir_weights' scoring join must be a broadcast hash join on the
    FIXED B-row ratio relation (legitimate: |rows| == n_buckets, a
    constant -- unlike the unbounded-vocab LM joins which must NOT
    broadcast), and the whole plan has no Window and no global Sort."""
    from prom_tsdb_copyer_spark.operators.text import dsir_weights

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(1, "a b d")], "doc_id long, text string"
    )
    p = _plan(dsir_weights(docs, tgt, n_buckets=64))
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_bloom_and_cms_tier_single_exchange_partial_combine(spark):
    """Sketch builds are the rollup's topology: exactly ONE Exchange,
    with a partial aggregate (count cells / distinct bits) BEFORE it --
    the map side absorbs the explode(depth|k) fan-out, so at most
    |groups|*cells rows move (PLANS.md, count-min/Bloom sections)."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        bloom_tier,
        cms_tier,
    )

    for build in (
        cms_tier(_tiny(spark), SERIES, "1h", "role"),
        bloom_tier(_tiny(spark), SERIES, "1h", "role"),
        cms_tier(_tiny(spark), SERIES, "1h", "role", hasher="fast"),
    ):
        p = _plan(build)
        assert p.count("Exchange") == 1
        # partial (map-side) aggregate precedes the exchange
        first_agg = p.index("HashAggregate")
        assert first_agg >= 0 and p.index("Exchange") > first_agg


def test_binop_is_equijoin_never_cartesian(spark):
    """vector_binop's match is a hash-partitioned equi-join: no
    CartesianProduct / BroadcastNestedLoop in any mode (the IEEE when
    branches are projections, not join conditions)."""
    from prom_tsdb_copyer_spark.operators.binop import vector_binop
    from prom_tsdb_copyer_spark.operators.rollup import (
        aggregate_by_labels,
        rollup,
    )

    t = rollup(_tiny(spark), SERIES, "value", "1h")
    sums = t.select(*SERIES, "bucket_ms", F.col("sum_val").alias("value"))
    cnts = t.select(*SERIES, "bucket_ms",
                    F.col("cnt").cast("double").alias("value"))
    totals = aggregate_by_labels(t, SERIES, by=["role"]).select(
        "role", "bucket_ms", F.col("sum_val").alias("value")
    )
    for out in (
        vector_binop(sums, cnts, "/", SERIES),
        vector_binop(sums, totals, "/", SERIES, on=["role"],
                     group="group_left"),
        vector_binop(sums, cnts, ">", SERIES, bool_mode=True),
    ):
        p = _plan(out)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p
        assert "Join" in p


def test_value_hist_tier_single_aggregation(spark):
    """The float-histogram tier is ONE aggregation over the raw scan
    (one Exchange); the conditional counts never explode rows."""
    from prom_tsdb_copyer_spark.operators.histogram import value_hist_tier

    p = _plan(value_hist_tier(_tiny(spark), SERIES, "1h", "value"))
    assert p.count("Exchange") == 1
    assert "Generate" not in p  # no explode anywhere


def test_retention_overrides_pure_filter(spark):
    """Per-label retention is a FILTER over the tier relation -- no
    join, no exchange, no UDF (a nested-CASE cutoff comparison)."""
    from prom_tsdb_copyer_spark.operators.retention import (
        enforce_retention_overrides,
    )
    from prom_tsdb_copyer_spark.operators.rollup import rollup

    t = rollup(_tiny(spark), SERIES, "value", "1h")
    base_exchanges = _plan(t).count("Exchange")
    p = _plan(enforce_retention_overrides(
        t, 0, [(["role=tool"], 1), (["tool=search"], 2)]
    ))
    assert p.count("Exchange") == base_exchanges  # filter adds none
    assert "Join" not in p and "BatchEvalPython" not in p


def test_bucketed_tier_joins_and_reaggs_without_exchange(
    spark, transcripts, tmp_path
):
    """Bucketed tier storage (sources/tables.py:write_bucketed_tier):
    (1) a vector_binop between two tiers bucketed on the same series
    keys runs with ZERO Exchange (the catalog bucket spec replaces the
    shuffle); (2) reaggregating the bucketed tier to 1d adds no
    exchange either; (3) values are identical to the plain-parquet
    path (bucketing is layout, not semantics)."""
    from prom_tsdb_copyer_spark.operators.binop import vector_binop
    from prom_tsdb_copyer_spark.operators.rollup import reaggregate, rollup
    from prom_tsdb_copyer_spark.sources.tables import (
        read_bucketed_tier,
        write_bucketed_tier,
    )

    t = rollup(transcripts, SERIES, "value", "1h")
    for name, sub in [("bt_sums", "sum_val"), ("bt_cnts", "cnt")]:
        write_bucketed_tier(
            t.select(*SERIES, "bucket_ms",
                     F.col(sub).cast("double").alias("value")),
            name, SERIES, n_buckets=8, path=str(tmp_path / name),
        )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sums = read_bucketed_tier(spark, "bt_sums")
        cnts = read_bucketed_tier(spark, "bt_cnts")
        # null_safe=False: the bucketed write ""-normalized the labels,
        # so plain equality is lossless AND matches the bucket hash
        joined = vector_binop(sums, cnts, "/", SERIES, null_safe=False)
        p = _plan(joined)
        assert "Exchange" not in p and p.count("Bucketed: true") == 2, p
        got = {
            tuple(r[c] for c in [*SERIES, "bucket_ms"]):
                round(r["value"], 9)
            for r in joined.collect()
        }
        plain = vector_binop(
            t.select(*SERIES, "bucket_ms",
                     F.col("sum_val").alias("value")),
            t.select(*SERIES, "bucket_ms",
                     F.col("cnt").cast("double").alias("value")),
            "/", SERIES,
        )
        want = {
            (c, r, tl or "", b): v
            for (c, r, tl, b), v in (
                (tuple(row[x] for x in [*SERIES, "bucket_ms"]),
                 round(row["value"], 9))
                for row in plain.collect()
            )
        }
        assert got == want and got

        # aggregation on exactly the bucket columns -> no exchange
        reagg = (
            read_bucketed_tier(spark, "bt_sums")
            .groupBy(*SERIES, "bucket_ms")
            .agg(F.sum("value").alias("s"))
        )
        p2 = _plan(reagg)
        assert "Exchange" not in p2 and "Bucketed: true" in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for name in ("bt_sums", "bt_cnts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
