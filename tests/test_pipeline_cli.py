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
