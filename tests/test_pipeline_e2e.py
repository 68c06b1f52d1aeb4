"""End-to-end training-data pipeline composition: the cleaning /
filtering / chunking / packing operators must CHAIN (each stage's
output feeds the next with no adapters), and the end state must match
an independent sequential python pipeline on a planted corpus.

scrub_pii -> line_dedup -> gopher filter -> chunk_documents ->
token_counts -> pack_shards
"""

from __future__ import annotations

from pyspark.sql import functions as F

BANNER = "SUBSCRIBE TO OUR NEWSLETTER"


def _corpus():
    import random

    rnd = random.Random(7)
    docs = []
    for i in range(30):
        words = [f"w{i}_{j}" for j in range(rnd.randrange(60, 140))]
        body = []
        k = 0
        while k < len(words):
            step = rnd.randrange(8, 16)
            body.append(" ".join(words[k:k + step]))
            k += step
        lines = [BANNER, *body, BANNER]
        if i % 3 == 0:
            lines.insert(2, f"contact admin+{i}@site{i % 5}.example.org now")
        docs.append((i, "\n".join(lines)))
    return docs


def test_pipeline_chains_and_matches_python(spark):
    from prom_tsdb_copyer_spark.operators.packing import pack_shards
    from prom_tsdb_copyer_spark.operators.text import (
        PII_PATTERNS,
        chunk_documents,
        line_dedup,
        scrub_pii,
    )

    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    scrubbed = scrub_pii(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    deduped = line_dedup(scrubbed, min_df=2).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    chunks = chunk_documents(deduped, window_tokens=32, overlap=8)
    chunk_rows = chunks.select(
        (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("sample_id"),
        F.col("chunk_len").alias("n_tokens"),
    )
    packed = pack_shards(
        chunk_rows, budget_tokens=500, tokens_col="n_tokens",
        id_col="sample_id",
    )
    got = {
        r["sample_id"]: (r["shard"], r["shard_offset_tokens"])
        for r in packed.collect()
    }

    # ---- independent python pipeline
    import re

    py_samples = {}
    # boilerplate = lines repeated across >= 2 docs AFTER scrubbing
    from collections import Counter

    def scrub(t):
        for c, pat in PII_PATTERNS.items():
            t = re.sub(pat, f"<{c.upper()}>", t)
        return t

    scrubbed_py = {i: scrub(t) for i, t in rows}
    df_count = Counter()
    for t in scrubbed_py.values():
        for ln in set(ln.strip() for ln in t.split("\n")):
            df_count[ln] += 1
    boiler = {ln for ln, c in df_count.items() if c >= 2}
    assert BANNER in boiler

    for i, t in scrubbed_py.items():
        keep = "\n".join(
            ln for ln in t.split("\n") if ln.strip() not in boiler
        )
        toks = keep.split()
        idx = 0
        for start in range(0, max(len(toks), 1), 32 - 8):
            if start >= len(toks):
                break
            window = toks[start:start + 32]
            py_samples[i * 10_000 + idx] = len(window)
            idx += 1

    cum, want = 0, {}
    for sid in sorted(py_samples):
        want[sid] = (cum // 500, cum % 500)
        cum += py_samples[sid]
    assert got == want
    assert len(got) > 60
    assert max(s for s, _ in got.values()) >= 2  # multiple shards filled
