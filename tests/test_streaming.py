"""Streaming continuous aggregate (SURVEY.md §2.9): the AvailableNow
file-stream 1m tier must equal the batch 1m tier on the same input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.streaming.incremental import (
    run_available_now,
    streaming_tier_1m,
)

SERIES = ["conv_id", "role", "tool"]
KEY = SERIES + ["bucket_ms"]


def test_streaming_matches_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    transcripts.write.parquet(src)

    out = str(tmp_path / "tier1m_stream")
    ckpt = str(tmp_path / "ckpt")
    tier = streaming_tier_1m(spark, src, transcripts.schema, SERIES)
    q = run_available_now(tier, out, ckpt)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .drop("part_day")
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    # append mode only emits CLOSED windows: window.end <= final watermark
    # (= max event time - delay); the still-open tail windows are withheld
    # by design and belong to the next incremental run
    from prom_tsdb_copyer_spark.operators.windows import MINUTE_MS, unix_ms

    max_ts_ms = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    watermark_ms = max_ts_ms - 10 * MINUTE_MS
    batch = rollup(transcripts, SERIES, "value", "1m")
    want = (
        batch.where(F.col("bucket_ms") + MINUTE_MS <= watermark_ms)
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    n_withheld = batch.count() - len(want)
    assert 0 <= n_withheld <= 50  # only the open tail is withheld
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )


def test_streaming_incremental_second_batch(spark, transcripts, tmp_path):
    """New files arriving later are aggregated on the next AvailableNow
    run without reprocessing old ones (checkpoint offsets)."""
    src = str(tmp_path / "src2")
    first = transcripts.where(F.col("conv_id") < "conv-00000025")
    # the second arrival must carry NEWER event times: data entirely
    # behind the watermark is dropped as late (by design -- late repair
    # goes through the batch recompute path). Shift it +5 days.
    second = transcripts.where(F.col("conv_id") >= "conv-00000025").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 5 DAYS")
    )
    first.write.mode("append").parquet(src)

    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    tier = streaming_tier_1m(spark, src, transcripts.schema, SERIES)
    run_available_now(tier, out, ckpt).awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    second.write.mode("append").parquet(src)
    tier2 = streaming_tier_1m(spark, src, transcripts.schema, SERIES)
    run_available_now(tier2, out, ckpt).awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1
    # every (series, bucket) appears exactly once across epochs (the two
    # conv_id halves are disjoint series)
    dupes = (
        spark.read.parquet(out)
        .groupBy(*KEY)
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_streaming_sessions_match_batch(spark, transcripts, tmp_path):
    """session_window streaming sessions == batch sessionize stats for
    sessions fully closed below the watermark."""
    from prom_tsdb_copyer_spark.operators.sessionize import session_stats
    from prom_tsdb_copyer_spark.operators.windows import MINUTE_MS, unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        run_available_now,
        streaming_sessions,
    )

    src = str(tmp_path / "sess_src")
    transcripts.write.parquet(src)
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    gap_ms = 3600 * 1000

    sess = streaming_sessions(spark, src, transcripts.schema, SERIES, gap="1 hour")
    run_available_now(sess, out, ckpt).awaitTermination(300)
    got = (
        spark.read.parquet(out)
        .drop("part_day")
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(SERIES + ["start_ms"])
        .reset_index(drop=True)
    )

    max_ts = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    watermark_ms = max_ts - 10 * MINUTE_MS
    batch = session_stats(transcripts, SERIES, gap_ms)
    want = (
        batch.where(F.col("end_ms") + gap_ms <= watermark_ms)
        .select(*SERIES, "start_ms", "end_ms", "n_events", "sum_mills")
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(SERIES + ["start_ms"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_epoch_write_idempotent(spark, transcripts, tmp_path):
    """foreachBatch is at-least-once: replaying the same epoch (marker
    present, marker deleted, or half-moved files) must never duplicate
    rows."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.streaming.incremental import (
        write_epoch_idempotent,
    )

    out = str(tmp_path / "tier")
    batch = (
        transcripts.limit(200)
        .withColumn("bucket_ms", F.unix_millis(F.col("ts").cast("timestamp")))
        .select("conv_id", "role", "bucket_ms", "value")
    )
    n = batch.count()
    write_epoch_idempotent(batch, out, 7)
    assert spark.read.parquet(out).count() == n
    # marker present -> no-op
    write_epoch_idempotent(batch, out, 7)
    assert spark.read.parquet(out).count() == n
    # marker lost (crash before commit) -> replay converges, no dupes
    (tmp_path / "tier" / "_epochs" / "epoch-7.json").unlink()
    write_epoch_idempotent(batch, out, 7)
    assert spark.read.parquet(out).count() == n
    # a second epoch appends
    write_epoch_idempotent(batch, out, 8)
    assert spark.read.parquet(out).count() == 2 * n


def test_streaming_hist_tier_matches_batch(spark, transcripts, tmp_path):
    """Streaming histogram 1m tier == batch hist_rollup on closed
    windows (the F12 path's streaming twin)."""
    from prom_tsdb_copyer_spark.operators.histogram import (
        DEFAULT_BOUNDS,
        hist_rollup,
        make_histogram,
    )
    from prom_tsdb_copyer_spark.operators.windows import MINUTE_MS, unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        streaming_hist_tier_1m,
    )

    src = str(tmp_path / "hsrc")
    transcripts.write.parquet(src)
    out = str(tmp_path / "htier")
    ckpt = str(tmp_path / "hckpt")
    tier = streaming_hist_tier_1m(spark, src, transcripts.schema, SERIES)
    q = run_available_now(tier, out, ckpt)
    q.awaitTermination(300)

    def canon(df):
        # raw float sums compared in exact milli-units (the gate's own
        # discipline): streaming vs batch summation order differs by ULP
        return {
            tuple(r[c] for c in KEY): (
                r["hist_count"], round(r["hist_sum"] * 1000),
                tuple(r["hist_buckets"]),
            )
            for r in df.collect()
        }

    got = canon(spark.read.parquet(out).drop("part_day"))
    max_ts_ms = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    watermark_ms = max_ts_ms - 10 * MINUTE_MS
    batch = hist_rollup(
        make_histogram(transcripts), SERIES, "1m", len(DEFAULT_BOUNDS) + 1
    ).where(F.col("bucket_ms") + MINUTE_MS <= watermark_ms)
    want = canon(batch)
    assert got == want and len(want) > 100


def test_stateful_counter_resets_across_batches(spark, transcripts, tmp_path):
    """applyInPandasWithState custom operator: per-series reset/change
    counts must equal the batch lag-based operator, INCLUDING the lag
    comparisons that straddle micro-batch boundaries (three time-split
    files, maxFilesPerTrigger=1 -> three batches, cross-batch state)."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.query import counter_resets
    from prom_tsdb_copyer_spark.operators.windows import unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        streaming_counter_resets,
    )

    lo, hi = (
        transcripts.agg(
            F.min(unix_ms(F.col("ts"))), F.max(unix_ms(F.col("ts")))
        ).first()
    )
    src = str(tmp_path / "cr_src")
    third = (hi - lo) // 3 + 1
    # three event-time-ordered arrivals (the operator's documented
    # append-log contract)
    for i in range(3):
        (
            transcripts.where(
                unix_ms(F.col("ts")).between(lo + i * third, lo + (i + 1) * third - 1)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    out = streaming_counter_resets(spark, src, transcripts.schema, SERIES)
    sink = str(tmp_path / "cr_out")

    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cr_ckpt"))
        .foreachBatch(
            lambda df, eid: df.write.mode("append").parquet(sink)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_df = spark.read.parquet(sink)
    # cumulative rows: the final state per series is the max-n_samples row
    from pyspark.sql import Window

    w = Window.partitionBy(*SERIES).orderBy(F.desc("n_samples"))
    final = (
        got_df.withColumn("_r", F.row_number().over(w))
        .where("_r = 1")
        .toPandas()
        .fillna({"tool": "<null>"})
    )
    got = {
        tuple(r[c] for c in SERIES): (r["n_samples"], r["n_resets"], r["n_changes"])
        for _, r in final.iterrows()
    }

    # batch oracle: the lag window is global per series, so summing the
    # per-window counts gives exact whole-series totals regardless of
    # where the (arbitrary-modulus) window boundaries fall
    whole = (
        counter_resets(transcripts, SERIES, window=2 * (hi - lo + 1))
        .groupBy(*SERIES)
        .agg(
            F.sum("n_samples").alias("n_samples"),
            F.sum("n_resets").alias("n_resets"),
            F.sum("n_changes").alias("n_changes"),
        )
    )
    want = {
        tuple((r[c] if r[c] is not None else "<null>") for c in SERIES): (
            r["n_samples"], r["n_resets"], r["n_changes"]
        )
        for r in whole.collect()
    }
    assert len(got) == len(want) > 50
    assert got == want


def test_streaming_dedup_exact_first_arrival_only(spark, tmp_path):
    """Duplicate texts arriving within the watermark horizon are
    suppressed to exactly ONE survivor per distinct text; which arrival
    survives is processing-order (any-representative semantics), so the
    invariant asserted is one-per-group with the survivor a member of
    its group."""
    import datetime as dt

    from prom_tsdb_copyer_spark.streaming.incremental import (
        run_available_now,
        streaming_dedup_exact,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    texts = ["alpha", "beta", "gamma", "alpha", "beta", "alpha", "delta"]
    for i, txt in enumerate(texts):
        rows.append((i, txt, t0 + dt.timedelta(seconds=30 * i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    q = run_available_now(
        streaming_dedup_exact(spark, src, docs.schema), out, ckpt
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    assert len(got) == 4  # one survivor per distinct text
    groups = {"alpha": {0, 3, 5}, "beta": {1, 4}, "gamma": {2}, "delta": {6}}
    survivors = {}
    for _, r in got.iterrows():
        for name, ids in groups.items():
            if r["doc_id"] in ids:
                assert name not in survivors, "two survivors in one group"
                survivors[name] = r["doc_id"]
    assert set(survivors) == set(groups)


def test_streaming_tier_cascade_matches_batch_1h(spark, transcripts, tmp_path):
    """The chained 1m -> 1h streaming cascade (two stateful operators,
    one query) must equal the batch 1h rollup on closed windows. An
    hour window closes when the watermark passes its END, so the
    emitted set follows the same closure law as the single-stage tier,
    at hour granularity."""
    from prom_tsdb_copyer_spark.operators.windows import HOUR_MS, unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        run_available_now,
        streaming_tier_cascade,
    )

    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    out = str(tmp_path / "tier1h_stream")
    ckpt = str(tmp_path / "ckpt_casc")
    tier = streaming_tier_cascade(spark, src, transcripts.schema, SERIES)
    q = run_available_now(tier, out, ckpt)
    assert q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .drop("part_day")
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    max_ts_ms = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    watermark_ms = max_ts_ms - 10 * 60_000
    batch = rollup(transcripts, SERIES, "value", "1h")
    want = (
        batch.where(F.col("bucket_ms") + HOUR_MS <= watermark_ms)
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    assert len(want) > 100
    n_withheld = batch.count() - len(want)
    assert 0 <= n_withheld <= 60  # only the open tail hours withheld
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_streaming_neardup_matches_batch_pipeline(spark, tmp_path):
    """Drain a planted-duplicate corpus through streaming_neardup in
    multiple micro-batches: the union of per-epoch pair emissions must
    equal minhash_dedup_pairs over the whole corpus EXACTLY (each pair
    surfaces once, in the epoch its second member arrives), and the
    accumulated index must cover every doc."""
    from prom_tsdb_copyer_spark.operators.dedup import minhash_dedup_pairs
    from prom_tsdb_copyer_spark.streaming.incremental import (
        streaming_neardup,
    )

    base = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 40}" for j in range(60)))
        for i in range(20)
    ]
    dups = [(100 + i, base[i][1]) for i in range(5)]
    near = [(200 + i, base[i][1].replace(f"w{(i * 7) % 40} ", "zzz ", 1))
            for i in range(5)]
    rows = base + dups + near
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    # multiple files => multiple micro-batches at maxFilesPerTrigger=1
    docs.repartition(6, "doc_id").write.parquet(src)

    idx = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_neardup(
        spark, src, "doc_id long, text string", idx, pairs_dir, ckpt,
        threshold=0.5, max_files_per_trigger=1,
    )
    assert q.awaitTermination(300)

    got = {
        (r["a"], r["b"]): (r["inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    want = {
        (r["a"], r["b"]): (r["inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert got == want and want  # nonempty and exactly equal
    # no pair emitted twice across epochs
    assert spark.read.parquet(pairs_dir).count() == len(got)
    # index covers the whole corpus once
    idx_ids = [r["doc_id"]
               for r in spark.read.parquet(idx + "/sets").collect()]
    assert sorted(idx_ids) == sorted(i for i, _ in rows)


def test_compact_neardup_index_invariance_and_retirement(spark, tmp_path):
    """Index lifecycle (VERDICT r6 #4): compaction rewrites the
    append-only bands/sets legs down to one file each, probe results
    are INVARIANT, epoch markers survive the swap (a replayed epoch
    stays a no-op), and a retired-ids pass expires a deleted doc from
    the index so later probes stop pairing against it."""
    from prom_tsdb_copyer_spark.operators.dedup import (
        incremental_neardup_pairs,
        neardup_index,
    )
    from prom_tsdb_copyer_spark.streaming.incremental import (
        compact_neardup_index,
        write_epoch_idempotent,
    )

    texts = {
        i: " ".join(f"w{(i * 7 + j * 3) % 40}" for j in range(60))
        for i in range(12)
    }
    idx = str(tmp_path / "index")
    # two ingest epochs, indexed exactly as streaming_neardup does
    for epoch, ids in ((0, range(0, 6)), (1, range(6, 12))):
        part = spark.createDataFrame(
            [(i, texts[i]) for i in ids], "doc_id long, text string"
        )
        bands, sets = neardup_index(part)
        write_epoch_idempotent(bands, idx + "/bands", epoch)
        write_epoch_idempotent(sets, idx + "/sets", epoch)

    batch = spark.createDataFrame(
        [(100 + i, texts[i]) for i in range(3)],  # dups of docs 0..2
        "doc_id long, text string",
    )

    def probe():
        pairs = incremental_neardup_pairs(
            batch,
            spark.read.parquet(idx + "/bands"),
            spark.read.parquet(idx + "/sets"),
            threshold=0.5,
            persist=False,
        )
        return {(r["a"], r["b"]) for r in pairs.collect()}

    from pathlib import Path

    before = probe()
    assert {(i, 100 + i) for i in range(3)} <= before
    files_before = len(list(Path(idx, "bands").rglob("*.parquet")))
    assert files_before >= 2  # two epochs of small files

    stats = compact_neardup_index(spark, idx)
    assert stats["bands"] == files_before
    assert len(list(Path(idx, "bands").rglob("*.parquet"))) == 1
    assert len(list(Path(idx, "sets").rglob("*.parquet"))) == 1
    assert probe() == before  # probe-invariant under compaction

    # markers survived: replaying a committed epoch is still a no-op
    n_rows = spark.read.parquet(idx + "/bands").count()
    replay = spark.createDataFrame(
        [(999, 0, "bogus")], "doc_id long, band int, sig string"
    )
    write_epoch_idempotent(replay, idx + "/bands", 0)
    assert spark.read.parquet(idx + "/bands").count() == n_rows

    # retirement: doc 0 deleted from the corpus -> its index rows go
    retired = spark.createDataFrame([(0,)], "doc_id long")
    compact_neardup_index(spark, idx, retired_ids=retired)
    assert 0 not in {
        r["doc_id"] for r in spark.read.parquet(idx + "/sets").collect()
    }
    after = probe()
    assert after == {p for p in before if 0 not in p}


def test_compact_neardup_index_fs_and_missing_leg_guards(spark, tmp_path):
    """ADVICE r7: compact_neardup_index's swap is pathlib/shutil, so a
    remote-FS index_dir must RAISE (a silent no-op would leave retired
    docs probe-able), and a missing leg is an error when retired_ids
    was given (the retirement could not be applied)."""
    import pytest

    from prom_tsdb_copyer_spark.streaming.incremental import (
        compact_neardup_index,
    )

    retired = spark.createDataFrame([(1,)], "doc_id long")
    for uri in ("hdfs://nn/idx", "s3a://bucket/idx"):
        with pytest.raises(NotImplementedError, match="local-FS only"):
            compact_neardup_index(spark, uri, retired_ids=retired)

    root = tmp_path / "idx"
    root.mkdir()
    (root / "bands").mkdir()  # sets leg absent
    spark.createDataFrame([(1, 0, "s")], "doc_id long, band int, sig string") \
        .write.mode("overwrite").parquet(str(root / "bands"))
    with pytest.raises(ValueError, match="missing"):
        compact_neardup_index(spark, str(root), retired_ids=retired)
    # without retirement, a missing leg is a legitimate skip
    assert "sets" not in compact_neardup_index(spark, str(root))
    # file:// scheme is local: accepted and resolved
    assert compact_neardup_index(spark, f"file://{root}") is not None


def test_streaming_sketch_tiers_match_batch(spark, transcripts, tmp_path):
    """Streaming HLL and count-min 1m tiers == the batch sketch tiers
    on closed windows: HLL estimate-identical after the same
    re-aggregation, count-min cell-for-cell (lossless). Also pins the
    state-boundedness claim structurally: the streaming plan's
    stateful aggregate runs over the PROJECTED cell/sketch rows, never
    the raw values."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        cms_tier,
        hll_tier,
        with_estimate,
    )
    from prom_tsdb_copyer_spark.operators.windows import MINUTE_MS, unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        streaming_cms_tier_1m,
        streaming_hll_tier_1m,
    )

    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    max_ts_ms = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    wm_ms = max_ts_ms - 10 * MINUTE_MS
    closed = F.col("bucket_ms") + MINUTE_MS <= wm_ms

    # HLL leg
    hll_stream = streaming_hll_tier_1m(
        spark, src, transcripts.schema, SERIES, "text"
    )
    out1, ck1 = str(tmp_path / "hll_out"), str(tmp_path / "hll_ck")
    run_available_now(hll_stream, out1, ck1).awaitTermination(300)
    got_est = {
        tuple(r[c] for c in [*SERIES, "bucket_ms"]): r["n_distinct"]
        for r in with_estimate(
            spark.read.parquet(out1).drop("part_day")
        ).collect()
    }
    want_est = {
        tuple(r[c] for c in [*SERIES, "bucket_ms"]): r["n_distinct"]
        for r in with_estimate(
            hll_tier(transcripts, SERIES, "1m", "text").where(closed)
        ).collect()
    }
    assert got_est == want_est and got_est

    # count-min leg (lossless: exact cell equality)
    cms_stream = streaming_cms_tier_1m(
        spark, src, transcripts.schema, SERIES, "role"
    )
    out2, ck2 = str(tmp_path / "cms_out"), str(tmp_path / "cms_ck")
    run_available_now(cms_stream, out2, ck2).awaitTermination(300)
    got_cells = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "row", "slot"]): r["cnt"]
        for r in spark.read.parquet(out2).drop("part_day").collect()
    }
    want_cells = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "row", "slot"]): r["cnt"]
        for r in cms_tier(transcripts, SERIES, "1m", "role")
        .where(closed)
        .collect()
    }
    assert got_cells == want_cells and got_cells


def test_streaming_bloom_tier_matches_batch(spark, transcripts, tmp_path):
    """Streaming Bloom 1m tier == the batch Bloom tier on closed
    windows, bit for bit -- and because the batch merge is idempotent
    OR, the streamed 1m bits re-aggregate upward into exactly the
    batch 1h filter (the union law crossing the streaming/batch
    boundary)."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        bloom_reaggregate,
        bloom_tier,
    )
    from prom_tsdb_copyer_spark.operators.windows import MINUTE_MS, unix_ms
    from prom_tsdb_copyer_spark.streaming.incremental import (
        streaming_bloom_tier_1m,
    )

    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    max_ts_ms = transcripts.agg(F.max(unix_ms(F.col("ts")))).first()[0]
    wm_ms = max_ts_ms - 10 * MINUTE_MS
    closed = F.col("bucket_ms") + MINUTE_MS <= wm_ms

    stream = streaming_bloom_tier_1m(
        spark, src, transcripts.schema, SERIES, "role"
    )
    out, ck = str(tmp_path / "bloom_out"), str(tmp_path / "bloom_ck")
    run_available_now(stream, out, ck).awaitTermination(300)
    streamed = spark.read.parquet(out).drop("part_day")
    got_bits = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in streamed.collect()
    }
    want_1m = bloom_tier(transcripts, SERIES, "1m", "role").where(closed)
    want_bits = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in want_1m.collect()
    }
    assert got_bits == want_bits and got_bits

    # cross-boundary union law: streamed 1m -> 1h == batch 1m -> 1h
    got_1h = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in bloom_reaggregate(streamed, SERIES, "1h").collect()
    }
    want_1h = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in bloom_reaggregate(want_1m, SERIES, "1h").collect()
    }
    assert got_1h == want_1h and got_1h
