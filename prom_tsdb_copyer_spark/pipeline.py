"""Corpus-cleaning pipeline driver: the training-data operators as one
operational spark-submit job (the LLM-pipeline counterpart of the
copy-tool CLI in cli.py).

Stages (each optional, order fixed -- the order the operators were
designed to compose in, tests/test_pipeline_e2e.py):

    scrub-pii -> line-dedup -> exact-dedup -> near-dedup(minhash) ->
    decontaminate -> quality-filter(gopher) -> chunk -> pack

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES = (
    "scrub", "line-dedup", "dedup", "neardup", "decontaminate",
    "quality",
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
    p.add_argument("--chunk", default=None, metavar="W:O",
                   help="emit training windows (window:overlap tokens)")
    p.add_argument("--pack", type=int, default=None, metavar="BUDGET",
                   help="assign token-budget shards (requires --chunk)")
    p.add_argument("--thread", type=int, default=None, help="local[N] cores")
    return p


def run_pipeline(spark, args) -> dict:
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

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = [s for s in stages if s not in STAGES]
    if unknown:
        raise SystemExit(f"unknown stages: {unknown} (choose from {STAGES})")
    if "decontaminate" in stages and not args.eval_set:
        raise SystemExit("--eval-set is required for the decontaminate stage")
    if args.pack is not None and args.chunk is None:
        raise SystemExit("--pack requires --chunk")

    docs = spark.read.parquet(args.source)
    report: dict = {"docs_in": docs.count(), "stages": {}}

    def count_after(name: str, df: DataFrame) -> DataFrame:
        n = df.count()
        report["stages"][name] = n
        return df

    if "scrub" in stages:
        docs = count_after(
            "scrub",
            scrub_pii(docs).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
        )
    if "line-dedup" in stages:
        docs = count_after(
            "line-dedup",
            line_dedup(docs, min_df=args.line_min_df).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
        )
    if "dedup" in stages:
        from .operators.dedup import dedup_exact

        keep = dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
        docs = count_after(
            "dedup", docs.join(F.broadcast(keep), "doc_id", "left_semi")
        )
    if "neardup" in stages:
        pairs = minhash_dedup_pairs(docs, threshold=args.neardup_threshold)
        docs = count_after("neardup", neardup_apply(docs, pairs))
    if "decontaminate" in stages:
        evals = spark.read.parquet(args.eval_set)
        docs = count_after("decontaminate", decontaminate_apply(docs, evals))
    if "quality" in stages:
        flags = gopher_quality_flags(docs)
        ok = flags.where(
            F.col("ok_word_count") & F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio") & F.col("ok_alpha_words")
        ).select("doc_id")
        docs = count_after(
            "quality", docs.join(F.broadcast(ok), "doc_id", "left_semi")
        )

    out = docs
    if args.chunk is not None:
        w, o = (int(x) for x in args.chunk.split(":"))
        chunks = chunk_documents(docs, w, o)
        if args.pack is not None:
            from .operators.packing import pack_shards

            samples = chunks.select(
                (F.col("doc_id") * 1_000_000 + F.col("chunk_idx"))
                .alias("sample_id"),
                F.col("chunk_len").alias("n_tokens"),
            )
            shards = pack_shards(
                samples, args.pack, tokens_col="n_tokens",
                id_col="sample_id",
            )
            out = (
                chunks.withColumn(
                    "sample_id",
                    F.col("doc_id") * 1_000_000 + F.col("chunk_idx"),
                )
                .join(shards.select("sample_id", "shard",
                                    "shard_offset_tokens"), "sample_id")
            )
            report["stages"]["pack"] = out.count()
        else:
            out = chunks
            report["stages"]["chunk"] = out.count()

    out.write.mode("overwrite").parquet(args.target)
    report["rows_out"] = spark.read.parquet(args.target).count()
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
