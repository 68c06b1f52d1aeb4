"""Corpus-cleaning pipeline driver: the training-data operators as one
operational spark-submit job (the LLM-pipeline counterpart of the
copy-tool CLI in cli.py).

Stages (each optional, order fixed -- the order the operators were
designed to compose in, tests/test_pipeline_e2e.py):

    scrub-pii -> line-dedup -> exact-dedup -> span-scrub ->
    near-dedup(minhash) -> decontaminate -> cap(per-source) ->
    quality-filter(gopher) -> lm-quality(unigram) ->
    lm-bucket(CCNet head/middle/tail) ->
    select(DSIR importance resampling) -> chunk -> pack

Input: a documents parquet (doc_id, text, ...); output: a cleaned
corpus parquet (or chunked training samples with shard assignments),
plus a one-line JSON stage report on stdout (docs in/out per stage) --
the auditable record a data pipeline run needs.

Run:

    spark-submit --py-files dist/pyfiles.zip pipeline_job.py \\
        --source docs.parquet --target out/ \\
        --stages scrub,line-dedup,dedup,neardup,quality \\
        [--eval-set eval.parquet] [--chunk 512:64] [--pack 1000000]
"""

from __future__ import annotations

import argparse
import json

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES = (
    "scrub", "line-dedup", "dedup", "span-scrub", "neardup",
    "decontaminate", "cap", "quality", "lm-quality", "lm-bucket",
    "select",
)

#: chunk_idx headroom in the arithmetic (doc_id, chunk_idx) ->
#: sample_id encoding; at 1e6 chunks/doc a document would be ~0.5 GB
#: of 512-token windows, far past any real corpus document
MAX_CHUNKS_PER_DOC = 1_000_000


def encode_sample_id(
    doc_id: F.Column,
    chunk_idx: F.Column,
    max_chunks: int = MAX_CHUNKS_PER_DOC,
) -> F.Column:
    """Injective (doc_id, chunk_idx) -> sample_id with an IN-PLAN
    overflow guard: `doc_id * max_chunks + chunk_idx` silently collides
    once chunk_idx >= max_chunks and overflows 64 bits for doc_id above
    ~9.2e12, which would corrupt pack_shards' id-ordered prefix sum
    with no error (ADVICE r5 #3) -- so out-of-range inputs raise at
    execution time instead. Pure codegen'd column algebra; the error
    branch never evaluates on valid rows."""
    max_doc = ((1 << 63) - 1) // max_chunks
    ok = (
        (chunk_idx >= 0)
        & (chunk_idx < max_chunks)
        & (doc_id >= 0)
        & (doc_id <= max_doc)
    )
    return F.when(
        ok, (doc_id * max_chunks + chunk_idx).cast("long")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "sample_id encoding overflow: (doc_id=%s, chunk_idx=%s)"
                " needs 0 <= chunk_idx < %s and 0 <= doc_id <= %s",
                doc_id,
                chunk_idx,
                F.lit(str(max_chunks)),
                F.lit(str(max_doc)),
            )
        )
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="corpus-pipeline",
        description="clean / dedup / chunk / pack a documents corpus",
    )
    p.add_argument("--source", required=True, help="documents parquet")
    p.add_argument("--target", required=True, help="output parquet dir")
    p.add_argument(
        "--stages", default="scrub,line-dedup,dedup,neardup,quality",
        help=f"comma list from {','.join(STAGES)} (order is fixed)",
    )
    p.add_argument("--eval-set", default=None,
                   help="eval documents parquet (decontaminate stage)")
    p.add_argument("--neardup-threshold", type=float, default=0.5)
    p.add_argument("--line-min-df", type=int, default=2)
    p.add_argument("--span-k", type=int, default=8,
                   help="word-k-gram width for the span-scrub stage")
    p.add_argument(
        "--cap-max-docs", type=int, default=1000, metavar="N",
        help="cap stage keeps at most N docs per --cap-by group",
    )
    p.add_argument("--cap-by", default="source",
                   help="grouping column for the cap stage")
    p.add_argument(
        "--cap-seed", type=int, default=None, metavar="SEED",
        help="seeded-hash pick for the cap stage (default: lowest ids)",
    )
    p.add_argument(
        "--lm-min-mills", type=int, default=-12000, metavar="MILLS",
        help="lm-quality keeps docs with mean token logprob >= this"
             " (milli-nats/token; corpus-self-trained unigram LM)",
    )
    p.add_argument(
        "--lm-keep-buckets", default="head,middle", metavar="B1,B2",
        help="lm-bucket keeps docs in these CCNet perplexity buckets"
             " (of head,middle,tail)",
    )
    p.add_argument(
        "--lm-bucket-mode", default="threshold",
        choices=("threshold", "rank"),
        help="lm-bucket split rule: approx-percentile thresholds (no"
             " global sort; the scale default) or the exact CCNet rank",
    )
    p.add_argument(
        "--select-target", default=None, metavar="PARQUET",
        help="target-corpus documents parquet (select stage: DSIR "
             "importance resampling toward this distribution)",
    )
    p.add_argument("--select-fraction", type=float, default=0.5,
                   help="fraction of the corpus the select stage keeps")
    p.add_argument("--select-buckets", type=int, default=8192,
                   help="hashed-ngram buckets for the DSIR models")
    p.add_argument("--select-seed", type=int, default=17,
                   help="Gumbel-noise seed for the select stage")
    p.add_argument("--chunk", default=None, metavar="W:O",
                   help="emit training windows (window:overlap tokens)")
    p.add_argument("--pack", type=int, default=None, metavar="BUDGET",
                   help="assign token-budget shards (requires --chunk)")
    p.add_argument("--thread", type=int, default=None, help="local[N] cores")
    return p


def build_pipeline(spark, args) -> tuple[DataFrame, dict, list]:
    """Assemble the staged pipeline WITHOUT writing. Returns
    (out_df, report, caches).

    Stage pinning (VERDICT r5 #1 -- the bpe_train discipline applied to
    the driver): each stage's output is persisted and materialized by
    its report count, then the PARENT stage's cache is dropped, so the
    per-stage counts and the final write each read ONE InMemoryRelation
    instead of re-executing every upstream stage's lineage per
    downstream action (the r5 driver was O(stages^2) passes over the
    source). Side relations the dedup operators pin internally
    (shingle sets, component labels) are collected via their
    `cache_registry` handles and dropped as soon as the consuming
    stage's count has materialized. `caches` holds whatever is still
    pinned (exactly the final relation); `run_pipeline` unpersists it
    after the write. A stage that THROWS sweeps every still-pinned
    relation before re-raising (ADVICE r6)."""
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = [s for s in stages if s not in STAGES]
    if unknown:
        raise SystemExit(f"unknown stages: {unknown} (choose from {STAGES})")
    if "decontaminate" in stages and not args.eval_set:
        raise SystemExit("--eval-set is required for the decontaminate stage")
    if "select" in stages and not args.select_target:
        raise SystemExit("--select-target is required for the select stage")
    if args.pack is not None and args.chunk is None:
        raise SystemExit("--pack requires --chunk")

    docs = spark.read.parquet(args.source)
    report: dict = {"docs_in": docs.count(), "stages": {}}
    caches: list[DataFrame] = []

    def pin(df: DataFrame, name: str | None = None) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = df.count()  # materializes THROUGH the parent's cache
        except Exception:
            df.unpersist()  # failed stage: don't leak the fresh pin
            raise
        if name is not None:
            report["stages"][name] = n
        while caches:  # now safe to drop the parent stage
            caches.pop().unpersist()
        caches.append(df)
        return df

    try:
        return _assemble_stages(
            spark, args, stages, docs, report, caches, pin
        )
    except Exception:
        # a throwing stage (or pack_shards) would otherwise leave the
        # surviving parent pin (and any operator-internal registries
        # already handed back) pinned until driver GC -- run_pipeline's
        # finally only covers the success path (ADVICE r6). Sweep and
        # re-raise; the finally-sweep discipline of
        # connected_components applied to the driver itself.
        for c in caches:
            c.unpersist()
        raise


def _assemble_stages(spark, args, stages, docs, report, caches, pin):
    from .operators.dedup import (
        decontaminate_apply,
        minhash_dedup_pairs,
        neardup_apply,
    )
    from .operators.text import (
        chunk_documents,
        gopher_quality_flags,
        line_dedup,
        scrub_pii,
    )

    if "scrub" in stages:
        docs = pin(
            scrub_pii(docs).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "scrub",
        )
    if "line-dedup" in stages:
        docs = pin(
            line_dedup(docs, min_df=args.line_min_df).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "line-dedup",
        )
    if "dedup" in stages:
        from .operators.dedup import dedup_exact

        # keep sets are survivors, i.e. nearly the whole corpus --
        # NEVER broadcast them (ADVICE r6: a forced broadcast here is a
        # driver/executor OOM at scale); the planner's shuffle hash
        # semi-join is the right shape, same as semdedup_apply /
        # dup_span_apply. Applies to the quality and lm-quality keep
        # sets below for the same reason.
        keep = dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
        docs = pin(docs.join(keep, "doc_id", "left_semi"), "dedup")
    if "span-scrub" in stages:
        from .operators.dedup import dup_span_scrub

        docs = pin(
            dup_span_scrub(docs, k=args.span_k).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "span-scrub",
        )
    if "neardup" in stages:
        side: list[DataFrame] = []
        try:
            pairs = minhash_dedup_pairs(
                docs, threshold=args.neardup_threshold,
                cache_registry=side,
            )
            docs = pin(
                neardup_apply(docs, pairs, cache_registry=side), "neardup"
            )
        finally:  # shingle sets + component labels, consumed by the pin
            for c in side:
                c.unpersist()
    if "decontaminate" in stages:
        evals = spark.read.parquet(args.eval_set)
        docs = pin(decontaminate_apply(docs, evals), "decontaminate")
    if "cap" in stages:
        from .operators.text import cap_per_group

        # per-domain/source hard limit (RefinedWeb-style). Ordered
        # after the dedup family so the cap counts SURVIVING docs
        # (capping before dedup would let duplicates consume a
        # group's budget), and before the per-doc quality filters,
        # which are order-free.
        docs = pin(
            cap_per_group(
                docs, args.cap_max_docs, by=args.cap_by,
                seed=args.cap_seed,
            ),
            "cap",
        )
    if "quality" in stages:
        flags = gopher_quality_flags(docs)
        ok = flags.where(
            F.col("ok_word_count") & F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio") & F.col("ok_alpha_words")
        ).select("doc_id")
        docs = pin(docs.join(ok, "doc_id", "left_semi"), "quality")
    if "lm-quality" in stages:
        from .operators.text import unigram_logprob

        scores = unigram_logprob(docs)
        # mean-per-token threshold in integer algebra (mills >= mean *
        # n_tokens); empty docs (n_tokens = 0) trivially pass -- the
        # length rules live in the gopher stage, not here
        ok = scores.where(
            F.col("logp_mills")
            >= F.lit(int(args.lm_min_mills)) * F.col("n_tokens")
        ).select("doc_id")
        docs = pin(
            docs.join(ok, "doc_id", "left_semi"), "lm-quality"
        )
    if "lm-bucket" in stages:
        from .operators.text import perplexity_buckets, unigram_logprob

        keep = [b.strip() for b in args.lm_keep_buckets.split(",")
                if b.strip()]
        bad = [b for b in keep if b not in ("head", "middle", "tail")]
        if bad:
            raise SystemExit(f"unknown perplexity buckets: {bad}")
        # scored on THIS stage's input (post lm-quality, if it ran):
        # CCNet buckets the corpus that survives the hard filters
        buckets = perplexity_buckets(
            unigram_logprob(docs), mode=args.lm_bucket_mode
        )
        ok = buckets.where(F.col("bucket").isin(keep)).select("doc_id")
        docs = pin(docs.join(ok, "doc_id", "left_semi"), "lm-bucket")
    if "select" in stages:
        from .operators.text import dsir_resample

        # DSIR importance resampling toward --select-target (Xie et
        # al. 2023), LAST of the document-level stages: selection
        # probabilities should reflect the corpus the model would
        # otherwise train on, i.e. after dedup/cap/quality have had
        # their say. The raw featurization inside is persisted through
        # its two consumers via the registry (ADVICE r7) and dropped
        # once the stage count has materialized the keep set.
        target = spark.read.parquet(args.select_target)
        side_sel: list[DataFrame] = []
        try:
            docs = pin(
                dsir_resample(
                    docs, target, fraction=args.select_fraction,
                    n_buckets=args.select_buckets, seed=args.select_seed,
                    cache_registry=side_sel,
                ),
                "select",
            )
        finally:
            for c in side_sel:
                c.unpersist()

    out = docs
    if args.chunk is not None:
        w, o = (int(x) for x in args.chunk.split(":"))
        chunks = chunk_documents(docs, w, o)
        if args.pack is not None:
            from .operators.packing import pack_shards

            # chunks feeds BOTH pack_shards and the rejoin: pin it so
            # the chunking (and everything above it) runs once
            chunks = pin(chunks.withColumn(
                "sample_id",
                encode_sample_id(F.col("doc_id"), F.col("chunk_idx")),
            ))
            shards = pack_shards(
                chunks.select("sample_id",
                              F.col("chunk_len").alias("n_tokens")),
                args.pack, tokens_col="n_tokens", id_col="sample_id",
            )
            out = pin(
                chunks.join(
                    shards.select("sample_id", "shard",
                                  "shard_offset_tokens"),
                    "sample_id",
                ),
                "pack",
            )
        else:
            out = pin(chunks, "chunk")
    return out, report, caches


def run_pipeline(spark, args) -> dict:
    out, report, caches = build_pipeline(spark, args)
    try:
        out.write.mode("overwrite").parquet(args.target)
        report["rows_out"] = spark.read.parquet(args.target).count()
    finally:
        for c in caches:
            c.unpersist()
    return report


def main(argv: list[str] | None = None) -> int:
    from .session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="corpus-pipeline", cores=args.thread)
    try:
        report = run_pipeline(spark, args)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0
