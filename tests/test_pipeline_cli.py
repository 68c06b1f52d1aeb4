"""The operational pipeline driver (pipeline.py / pipeline_job.py):
stage chaining, report shape, and end-state invariants on a planted
corpus with PII, boilerplate, exact dupes, and a contaminated doc.
"""

from __future__ import annotations

import json

from prom_tsdb_copyer_spark.pipeline import build_parser, run_pipeline

BANNER = "SUBSCRIBE NOW"


def _corpus(spark, tmp_path):
    import random

    rnd = random.Random(5)
    rows = []
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(rnd.randrange(60, 120))]
        lines = [BANNER] + [
            " ".join(words[k:k + 12]) for k in range(0, len(words), 12)
        ] + [BANNER]
        rows.append((i, "\n".join(lines)))
    rows.append((100, rows[0][1]))       # exact duplicate of doc 0
    rows.append((101, "short doc"))      # fails gopher word count
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    # eval set sharing a 13-gram span with doc 1
    span = " ".join(f"w1_{j}" for j in range(2, 20))
    ev = str(tmp_path / "eval")
    spark.createDataFrame([(0, span)], "doc_id long, text string") \
        .write.parquet(ev)
    return src, ev


def test_pipeline_stages_and_report(spark, tmp_path):
    src, ev = _corpus(spark, tmp_path)
    out = str(tmp_path / "out")
    args = build_parser().parse_args([
        "--source", src, "--target", out,
        "--stages", "scrub,line-dedup,dedup,neardup,decontaminate,quality",
        "--eval-set", ev,
    ])
    report = run_pipeline(spark, args)
    assert report["docs_in"] == 42
    st = report["stages"]
    # monotone non-increasing doc counts through the drop stages
    chain = [st["dedup"], st["neardup"], st["decontaminate"], st["quality"]]
    assert all(a >= b for a, b in zip(chain, chain[1:]))
    assert st["dedup"] == 41            # the planted exact dupe dropped
    assert st["decontaminate"] <= st["neardup"] - 1  # doc 1 dropped
    assert st["quality"] <= st["decontaminate"]      # short doc dropped
    cleaned = spark.read.parquet(out)
    assert cleaned.count() == report["rows_out"] == st["quality"]
    # boilerplate really removed from the surviving text
    assert cleaned.where(cleaned.text.contains(BANNER)).count() == 0
    assert json.dumps(report)  # JSON-serializable


def test_pipeline_chunk_and_pack_output(spark, tmp_path):
    src, _ = _corpus(spark, tmp_path)
    out = str(tmp_path / "packed")
    args = build_parser().parse_args([
        "--source", src, "--target", out,
        "--stages", "line-dedup,dedup",
        "--chunk", "24:6", "--pack", "600",
    ])
    report = run_pipeline(spark, args)
    packed = spark.read.parquet(out)
    assert {"sample_id", "doc_id", "chunk_idx", "chunk_text",
            "shard", "shard_offset_tokens"} <= set(packed.columns)
    assert report["stages"]["pack"] == packed.count() > 40
    # shard fill invariant: every shard except the last stays under
    # budget + one max chunk
    from pyspark.sql import functions as F

    per = packed.groupBy("shard").agg(F.sum("chunk_len").alias("t")).collect()
    assert max(r["t"] for r in per) <= 600 + 24


def test_pipeline_stages_pinned_in_final_plan(spark, tmp_path):
    """VERDICT r5 #1: the final relation's executed plan must read the
    LAST stage's InMemoryRelation -- not re-execute the scrub/dedup
    lineage once per downstream action. Built via build_pipeline so the
    pre-write plan is inspectable; also checks the cache ledger holds
    exactly the final relation and that run_pipeline's report matches
    the unpinned r5 driver's semantics (counts are unchanged)."""
    from prom_tsdb_copyer_spark.pipeline import build_parser, build_pipeline

    src, ev = _corpus(spark, tmp_path)
    args = build_parser().parse_args([
        "--source", src, "--target", str(tmp_path / "o"),
        "--stages", "scrub,line-dedup,dedup,neardup,decontaminate,quality",
        "--eval-set", ev,
    ])
    out, report, caches = build_pipeline(spark, args)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the EXECUTION side of the plan is everything above the
    # InMemoryRelation node (the relation's description embeds the full
    # cached lineage for display -- that part is stored, not re-run):
    # it must be a cache scan with NONE of the upstream stage operators
    # (regexp scrub, line explode, LSH joins) below it
    executed_side = plan.split("InMemoryRelation", 1)[0]
    assert "InMemoryTableScan" in executed_side
    assert "regexp_replace" not in executed_side
    assert "Generate" not in executed_side  # no explode re-run
    assert len(caches) == 1 and caches[0] is out
    assert report["stages"]["quality"] == out.count()
    for c in caches:
        c.unpersist()


def test_sample_id_overflow_raises(spark):
    """ADVICE r5 #3: the (doc_id, chunk_idx) arithmetic encoding must
    fail loudly instead of silently colliding past the headroom."""
    import pytest
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.pipeline import encode_sample_id

    df = spark.createDataFrame(
        [(1, 3), (2, 5)], "doc_id long, chunk_idx long"
    )
    ok = df.select(
        encode_sample_id(F.col("doc_id"), F.col("chunk_idx"),
                         max_chunks=10).alias("sid")
    )
    assert sorted(r["sid"] for r in ok.collect()) == [13, 25]
    bad = df.select(
        encode_sample_id(F.col("doc_id"), F.col("chunk_idx"),
                         max_chunks=4).alias("sid")
    )
    with pytest.raises(Exception, match="sample_id encoding overflow"):
        bad.collect()
    # doc_id past the 64-bit headroom raises too
    big = spark.createDataFrame(
        [(int(9.3e12), 0)], "doc_id long, chunk_idx long"
    ).select(encode_sample_id(F.col("doc_id"), F.col("chunk_idx")).alias("s"))
    with pytest.raises(Exception, match="sample_id encoding overflow"):
        big.collect()


def test_pipeline_rejects_bad_args(spark, tmp_path):
    import pytest

    src, _ = _corpus(spark, tmp_path)
    args = build_parser().parse_args([
        "--source", src, "--target", str(tmp_path / "x"),
        "--stages", "decontaminate",
    ])
    with pytest.raises(SystemExit, match="eval-set"):
        run_pipeline(spark, args)
    args = build_parser().parse_args([
        "--source", src, "--target", str(tmp_path / "y"),
        "--stages", "dedup", "--pack", "100",
    ])
    with pytest.raises(SystemExit, match="chunk"):
        run_pipeline(spark, args)


def test_pipeline_span_scrub_and_lm_quality_stages(spark, tmp_path):
    """The two r6 opt-in stages: span-scrub cuts a phrase planted
    across several docs (without dropping the docs), lm-quality drops
    a symbol-soup doc whose every token is corpus-unique while prose
    docs survive."""
    import random

    rows = []
    phrase = " ".join(f"dup{j}" for j in range(12))
    for i in range(20):
        # prose property: tokens come from a SHARED vocabulary (high
        # unigram probability) but in a per-doc shuffled ORDER, so no
        # 8-gram repeats across docs outside the planted phrase
        toks = [f"common{j % 30}" for j in range(79)]
        random.Random(i).shuffle(toks)
        filler = " ".join(toks) + f" w{i}_tail"  # one rare marker
        # docs 0-4 carry the duplicated phrase
        rows.append((i, f"{phrase} {filler}" if i < 5 else filler))
    # soup: every token corpus-unique => minimum possible unigram score
    rows.append((200, " ".join(f"uniq{j}" for j in range(80))))
    src = str(tmp_path / "docs2")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    out = str(tmp_path / "out2")
    args = build_parser().parse_args([
        "--source", src, "--target", out,
        "--stages", "span-scrub,lm-quality",
        "--lm-min-mills", "-4500",
    ])
    report = run_pipeline(spark, args)
    assert report["docs_in"] == 21
    assert report["stages"]["span-scrub"] == 21   # scrub cuts, not drops
    assert report["stages"]["lm-quality"] == 20   # soup doc dropped
    cleaned = spark.read.parquet(out)
    ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert 200 not in ids and ids == set(range(20))
    # the duplicated phrase is gone from every survivor, filler intact
    assert cleaned.where(cleaned.text.contains("dup0")).count() == 0
    assert cleaned.where(cleaned.text.contains("w3_tail")).count() == 1


def test_build_pipeline_sweeps_caches_on_stage_failure(spark, tmp_path):
    """ADVICE r6: a throwing stage must not leave the surviving parent
    pin (or the mid-pin df) cached until driver GC. Force a failure
    AFTER the scrub stage has pinned (an eval set missing its text
    column breaks the decontaminate stage at analysis) and assert the
    session's cache manager is swept clean."""
    import pytest

    from prom_tsdb_copyer_spark.pipeline import build_pipeline

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "more text here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    evil = spark.createDataFrame([(1,)], "not_text long")
    ev = str(tmp_path / "ev")
    evil.write.parquet(ev)

    spark.catalog.clearCache()  # isolate the assertion
    args = build_parser().parse_args([
        "--source", src, "--target", str(tmp_path / "out"),
        "--stages", "scrub,decontaminate", "--eval-set", ev,
    ])
    with pytest.raises(Exception):
        build_pipeline(spark, args)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pipeline_cap_stage(spark, tmp_path):
    """The cap stage keeps at most --cap-max-docs per --cap-by group,
    ordered after dedup (the cap counts surviving docs), and the stage
    report records the post-cap count."""
    rows = [(i, f"s{i % 2}", "word " * 80 + f"tail {i}") for i in range(30)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(src)
    args = build_parser().parse_args([
        "--source", src, "--target", str(tmp_path / "out"),
        "--stages", "dedup,cap", "--cap-max-docs", "4",
    ])
    report = run_pipeline(spark, args)
    assert report["stages"]["cap"] == 8  # 2 sources x 4
    from pyspark.sql import functions as F

    out = spark.read.parquet(str(tmp_path / "out"))
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 4, "s1": 4}


def test_pipeline_select_stage(spark, tmp_path):
    """The select stage (DSIR importance resampling toward
    --select-target, VERDICT r7 #4) keeps ~--select-fraction of the
    corpus, prefers target-like docs in aggregate, runs LAST of the
    document-level stages, is deterministic for one seed, and demands
    its target path."""
    import pytest

    tgt_like = [(i, "the cat sat on the mat near the dog " + f"v{i}")
                for i in range(20)]
    junk = [(100 + i, f"zq{i} xv{i} qq{i} zz{i} kk{i} jj{i} " * 10)
            for i in range(20)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(tgt_like + junk, "doc_id long, text string") \
        .write.parquet(src)
    tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [(i, f"a dog and a cat lived on the mat t{i}") for i in range(20)],
        "doc_id long, text string",
    ).write.parquet(tgt)

    argv = [
        "--source", src, "--target", str(tmp_path / "out"),
        "--stages", "dedup,select", "--select-target", tgt,
        "--select-fraction", "0.5", "--select-buckets", "256",
        "--select-seed", "3",
    ]
    report = run_pipeline(spark, build_parser().parse_args(argv))
    n = report["stages"]["select"]
    assert 0 < n < 40 and report["rows_out"] == n
    out = spark.read.parquet(str(tmp_path / "out"))
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # importance sampling prefers the target-like half in aggregate
    assert len([i for i in kept if i < 100]) > len(kept) / 2
    # deterministic re-run: byte-identical keep set for one seed
    argv2 = argv[:]
    argv2[argv2.index("--target") + 1] = str(tmp_path / "out2")
    run_pipeline(spark, build_parser().parse_args(argv2))
    kept2 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out2"))
             .select("doc_id").collect()}
    assert kept == kept2

    with pytest.raises(SystemExit, match="select-target"):
        run_pipeline(spark, build_parser().parse_args([
            "--source", src, "--target", str(tmp_path / "out3"),
            "--stages", "select",
        ]))


def test_pipeline_lm_bucket_stage(spark, tmp_path):
    """The lm-bucket stage (CCNet perplexity split, r8) drops the tail
    bucket by default, keeps head-only when asked, scores the corpus
    that SURVIVES earlier stages, and validates its bucket names."""
    import pytest

    # natural-ish docs (head/middle material) + repetitive junk whose
    # tokens are rare under the self-trained LM (tail material)
    good = [(i, "the cat sat on the mat and the dog slept " * 3
             + f"v{i}") for i in range(12)]
    junk = [(50 + i, f"zq{i}x vw{i}q jj{i}k pp{i}m " * 8)
            for i in range(6)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(good + junk, "doc_id long, text string") \
        .write.parquet(src)

    argv = [
        "--source", src, "--target", str(tmp_path / "out"),
        "--stages", "lm-bucket",
    ]
    report = run_pipeline(spark, build_parser().parse_args(argv))
    n = report["stages"]["lm-bucket"]
    assert 0 < n < 18 and report["rows_out"] == n  # tail dropped

    argv_head = [
        "--source", src, "--target", str(tmp_path / "out_head"),
        "--stages", "lm-bucket", "--lm-keep-buckets", "head",
        "--lm-bucket-mode", "rank",
    ]
    rep_head = run_pipeline(spark, build_parser().parse_args(argv_head))
    assert 0 < rep_head["stages"]["lm-bucket"] <= n
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "out_head")).collect()}
    # rank-mode head = best floor(18/3) = 6 docs; junk can't be head
    assert len(kept) == 6 and all(i < 50 for i in kept)

    with pytest.raises(SystemExit, match="unknown perplexity buckets"):
        run_pipeline(spark, build_parser().parse_args([
            "--source", src, "--target", str(tmp_path / "out2"),
            "--stages", "lm-bucket", "--lm-keep-buckets", "best",
        ]))
