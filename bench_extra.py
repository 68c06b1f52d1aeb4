"""Per-leg profiling harness for the r9 optimization round (guide §1).

NOT the driver contract -- bench.py stays frozen. This file isolates the
expensive bench keys into sub-legs (noop sinks where the point is the
computation, labeled jobs) so OPTIMIZATION_r09.md can cite where each
second goes. Usage:

    python bench_extra.py cascade|binop|bucketed|ivfpq|sketch|gorilla|all
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "48000"))
BENCH_INPUT = os.environ.get(
    "BENCH_INPUT", f"/tmp/bench_transcripts_c{BENCH_CONVS}_s42_f250k"
)
SERIES = ["conv_id", "role", "tool"]
REPS = int(os.environ.get("EXTRA_REPS", "2"))


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def best(label, fn, reps=REPS, results=None, spark=None):
    if spark is not None:
        spark.sparkContext.setJobDescription(label)
    runs = [timed(fn)[0] for _ in range(reps)]
    if spark is not None:
        spark.sparkContext.setJobDescription(None)
    r = round(min(runs), 3)
    print(f"    {label}: {r}  (runs: {[round(x, 2) for x in runs]})",
          flush=True)
    if results is not None:
        results[label] = r
    return r


def get_session():
    from prom_tsdb_copyer_spark.session import get_spark

    return get_spark(app_name="bench_extra", cores=CPUS,
                     shuffle_partitions=max(2 * CPUS, 8))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_cascade(spark, results):
    """Decompose rollup_cascade_write into its three tier legs."""
    from prom_tsdb_copyer_spark.operators.rollup import reaggregate, rollup
    from prom_tsdb_copyer_spark.plans.copy_job import (
        CopyJob, run_and_write_rollups,
    )
    from prom_tsdb_copyer_spark.sources.tables import time_extent, write_tier

    transcripts = spark.read.parquet(BENCH_INPUT)
    out_root = "/tmp/bx_tiers"
    hint = time_extent(transcripts, "ts")
    n_parts = max(2 * spark.sparkContext.defaultParallelism, 8)
    chunk = max((hint[1] - hint[0] + 1) // (8 * n_parts), 1)
    cl = (hint[0], chunk, n_parts)

    # full job (the frozen headline shape) for reference
    def full():
        shutil.rmtree(out_root, ignore_errors=True)
        run_and_write_rollups(spark, transcripts, CopyJob(), out_root,
                              collect_counts=False)

    full()  # warm
    best("cascade_full", full, results=results, spark=spark)

    # leg 1: 1m rollup (clustered) + write
    p1m = os.path.join(out_root, "tier=1m")
    t1m = rollup(transcripts, SERIES, "value", "1m", cluster=cl)

    def w1m():
        shutil.rmtree(p1m, ignore_errors=True)
        write_tier(t1m, p1m, range_hint=hint, pre_clustered=True,
                   sort_labels=SERIES)

    w1m()
    best("leg_1m_write", w1m, results=results, spark=spark)
    best("leg_1m_noop", lambda: noop(t1m), results=results, spark=spark)
    # same agg without the clustering repartition
    t1m_nc = rollup(transcripts, SERIES, "value", "1m")
    best("leg_1m_noop_uncl", lambda: noop(t1m_nc), results=results,
         spark=spark)

    # leg 2: read 1m -> 1h (clustered) + write
    p1h = os.path.join(out_root, "tier=1h")
    prev1m = spark.read.parquet(p1m).drop("part_day")
    t1h = reaggregate(prev1m, SERIES, "1h", cluster=cl)

    def w1h():
        shutil.rmtree(p1h, ignore_errors=True)
        write_tier(t1h, p1h, range_hint=hint, pre_clustered=True,
                   sort_labels=SERIES)

    w1h()
    best("leg_1h_write", w1h, results=results, spark=spark)
    best("leg_1h_noop", lambda: noop(t1h), results=results, spark=spark)

    # leg 3: read 1h -> 1d (classic 2-exchange) + write
    p1d = os.path.join(out_root, "tier=1d")
    prev1h = spark.read.parquet(p1h).drop("part_day")
    t1d = reaggregate(prev1h, SERIES, "1d")

    def w1d():
        shutil.rmtree(p1d, ignore_errors=True)
        write_tier(t1d, p1d, range_hint=hint, pre_clustered=False,
                   sort_labels=SERIES)

    w1d()
    best("leg_1d_write", w1d, results=results, spark=spark)

    # row counts for context
    for t in ("1m", "1h", "1d"):
        n = spark.read.parquet(os.path.join(out_root, f"tier={t}")).count()
        sz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(out_root, f"tier={t}"))
            for f in fs
        )
        nf = sum(
            1 for dp, _, fs in os.walk(os.path.join(out_root, f"tier={t}"))
            for f in fs if f.endswith(".parquet")
        )
        print(f"    tier {t}: rows={n} files={nf} bytes={sz}", flush=True)
        results[f"tier_{t}_rows"] = n
        results[f"tier_{t}_files"] = nf
        results[f"tier_{t}_bytes"] = sz


def profile_binop(spark, results):
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.binop import vector_binop
    from prom_tsdb_copyer_spark.operators.rollup import rollup

    transcripts = spark.read.parquet(BENCH_INPUT)
    t = rollup(transcripts, SERIES, "value", "1h")
    sums = t.select(*SERIES, "bucket_ms", F.col("sum_val").alias("value"))
    cnts = t.select(*SERIES, "bucket_ms",
                    F.col("cnt").cast("double").alias("value"))
    ratio = vector_binop(sums, cnts, "/", SERIES)
    best("binop_plain_count", lambda: ratio.count(), results=results,
         spark=spark)
    best("rollup_1h_noop", lambda: noop(t), results=results, spark=spark)
    plan = ratio._jdf.queryExecution().executedPlan().toString()
    print("    exchanges in plan:", plan.count("Exchange"),
          "reused:", plan.count("ReusedExchange"), flush=True)


def profile_bucketed(spark, results):
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.rollup import rollup
    from prom_tsdb_copyer_spark.sources.tables import write_bucketed_tier

    transcripts = spark.read.parquet(BENCH_INPUT)
    t = rollup(transcripts, SERIES, "value", "1h")
    sums = t.select(*SERIES, "bucket_ms", F.col("sum_val").alias("value"))

    def w():
        write_bucketed_tier(sums, "bx_bt_sums", SERIES, n_buckets=32,
                            path="/tmp/bx_bt_sums", mode="overwrite")

    best("bucketed_write_one_table", w, reps=REPS, results=results,
         spark=spark)
    loc = "/tmp/bx_bt_sums"
    nf = sum(1 for dp, _, fs in os.walk(loc) for f in fs
             if not f.startswith(("_", ".")))
    print(f"    bucketed table files: {nf}", flush=True)
    results["bucketed_files"] = nf
    spark.sql("DROP TABLE IF EXISTS bx_bt_sums")


def profile_ivfpq(spark, results):
    import numpy as _np

    import __spark_entry__ as entry
    from prom_tsdb_copyer_spark.operators.similarity import (
        ivfpq_index, ivfpq_topk, write_ivfpq_index,
    )
    from prom_tsdb_copyer_spark.sources.tables import load_table

    emb = load_table(entry._prep(spark), SF_DIR, "embeddings")
    rng1k = _np.random.default_rng(7)
    cents1k = rng1k.standard_normal((1024, 64)).tolist()
    books1k = rng1k.standard_normal((4, 16, 16)).tolist()
    index_dir = "/tmp/bx_ivfpq_index"

    def w():
        shutil.rmtree(index_dir, ignore_errors=True)
        write_ivfpq_index(emb, index_dir, cents1k, books1k)

    best("ivfpq_index_write_1k", w, results=results, spark=spark)

    def build():
        return ivfpq_index(emb, n_cells=8, m=4, k_codes=16)

    t, (cents, books) = timed(build)
    print(f"    ivfpq_build: {round(t, 3)}", flush=True)
    results["ivfpq_build"] = round(t, 3)

    def topk():
        qs = emb.where("vec_id < 10")
        return ivfpq_topk(
            emb, qs, k=3, n_cells=8, n_probe=2, m=4, k_codes=16,
            centroids=cents, codebooks=books,
        ).count()

    best("ivfpq_topk", topk, results=results, spark=spark)


def profile_ivfpq_phases(spark, results):
    """Decompose ivfpq_build (2000-row corpus!) into its phases to see
    whether the seconds are compute or per-action orchestration."""
    import __spark_entry__ as entry
    from prom_tsdb_copyer_spark.operators.similarity import (
        _as_double, _residual_rel, assign_cells, pq_train, train_centroids,
    )
    from prom_tsdb_copyer_spark.sources.tables import load_table

    emb = load_table(entry._prep(spark), SF_DIR, "embeddings")
    t0 = time.monotonic()
    cents = train_centroids(emb, 8)
    t1 = time.monotonic()
    assigned = assign_cells(_as_double(emb, "embedding"), cents,
                            "embedding").select("vec_id", "embedding", "cell")
    resid = _residual_rel(assigned, cents, "vec_id", "embedding", "auto")
    resid.count()
    t2 = time.monotonic()
    pq_train(resid, m=4, k=16, id_col="vec_id", vec_col="__r")
    t3 = time.monotonic()
    results["ivfpq_train_centroids"] = round(t1 - t0, 3)
    results["ivfpq_resid_count"] = round(t2 - t1, 3)
    results["ivfpq_pq_train"] = round(t3 - t2, 3)
    print(f"    train_centroids={t1-t0:.2f} resid={t2-t1:.2f} "
          f"pq_train={t3-t2:.2f}", flush=True)


def profile_sketch(spark, results):
    from prom_tsdb_copyer_spark.operators.sketches import bloom_tier, cms_tier

    transcripts = spark.read.parquet(BENCH_INPUT)
    for h in ("parity", "fast"):
        best(f"cms_1h_{h}",
             lambda h=h: cms_tier(transcripts, ["role", "tool"], "1h",
                                  "conv_id", hasher=h).count(),
             results=results, spark=spark)
        best(f"bloom_1h_{h}",
             lambda h=h: bloom_tier(transcripts, ["role", "tool"], "1h",
                                    "conv_id", hasher=h).count(),
             results=results, spark=spark)


def profile_minhash(spark, results):
    import __spark_entry__ as entry

    q = dict(entry.queries())
    q["neardup_components"] = entry.q_neardup_components
    for name in ("minhash_lsh_pairs", "neardup_components"):
        runs = [timed(lambda: q[name](spark, SF_DIR).count())[0]
                for _ in range(3)]
        print(f"    {name}: cold={runs[0]:.2f} warm_min={min(runs[1:]):.2f}",
              flush=True)
        results[f"{name}_cold"] = round(runs[0], 3)
        results[name] = round(min(runs[1:]), 3)


def profile_gorilla(spark, results):
    from prom_tsdb_copyer_spark.functions.gorilla import encode_tier_chunks

    transcripts = spark.read.parquet(BENCH_INPUT)
    enc = encode_tier_chunks(transcripts, SERIES, "1h")
    enc.count()  # warm
    best("gorilla_encode_1h", lambda: enc.count(), results=results,
         spark=spark)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session()
    results: dict = {"host": "bench_extra", "which": which}
    legs = {
        "cascade": profile_cascade,
        "binop": profile_binop,
        "bucketed": profile_bucketed,
        "ivfpq": profile_ivfpq,
        "ivfpq_phases": profile_ivfpq_phases,
        "sketch": profile_sketch,
        "minhash": profile_minhash,
        "gorilla": profile_gorilla,
    }
    todo = legs if which == "all" else {which: legs[which]}
    for name, fn in todo.items():
        print(f"== {name}", flush=True)
        fn(spark, results)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
