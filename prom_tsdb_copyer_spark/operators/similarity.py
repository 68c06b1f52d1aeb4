"""Similarity search over an embedding column (training-data pipeline).

Brute-force cosine top-k is the exactness baseline (and the oracle-
checkable one); the LSH-bucketed variant (random hyperplane signs) is
the scale path -- at 100TB the cross join is infeasible, so candidates
are restricted to same-bucket pairs and the brute-force kernel runs per
bucket. Both paths keep the arithmetic in Spark built-ins (`zip_with` +
`aggregate` fold in DOUBLE), no Python in the kernel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side fold."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    The corpus side is the big one; the query side is broadcast -- the
    join is a broadcast nested loop with the cosine fold inside codegen,
    followed by a per-query top-k window (rank on rounded sim with id
    tie-break for cross-engine determinism)."""
    from pyspark.sql import Window

    corpus = _as_double(embeddings, vec_col)
    qs = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_col(F.col("qvec"), F.col(vec_col)), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold (embedding near-dedup).

    All-pairs for oracle parity; at scale use `hyperplane_buckets` first
    and run this kernel within buckets only."""
    e = _as_double(embeddings, vec_col)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), round_to))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _bucket_expr(vec: Column, n_planes: int, dim: int, seed: int) -> Column:
    """Sign-bit bucket id for one deterministically-seeded plane set,
    packed into a long -- pure codegen (array literals + fold)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(vec, plane) >= 0, 1).otherwise(0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign bits packed into
    a long). Deterministic planes from a fixed seed, embedded as array
    literals so the whole computation stays in codegen -- the scale path
    that turns the quadratic cross join into a per-bucket kernel."""
    e = _as_double(embeddings, vec_col)
    return e.select(
        id_col, vec_col,
        _bucket_expr(F.col(vec_col), n_planes, dim, seed).alias("bucket"),
    )


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """k-means centroid training (Lloyd iterations) for IVF, entirely in
    DataFrame algebra: init = deterministic corpus sample (lowest ids),
    then per iteration (a) assign each vector to its max-cosine centroid
    via a broadcast of the n_cells x dim literal table + row_number
    argmax, (b) update each centroid to the element-wise mean of its
    members (posexplode -> groupBy(cell, pos).avg -> rebuild). Only the
    n_cells x dim centroid matrix is ever collected -- per iteration one
    shuffle over the corpus, the centroids travel as literals/broadcast.
    Cosine assignment == spherical k-means (scale of the mean doesn't
    change the argmax). Empty cells keep their previous centroid."""
    from pyspark.sql import Window

    corpus = _as_double(embeddings, vec_col)
    cents = [
        list(r[vec_col])
        for r in corpus.orderBy(id_col).limit(n_cells).collect()
    ]
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell"))
    for _ in range(n_iter):
        cent_lits = F.array(*[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
            )
            for i, c in enumerate(cents)
        ])
        assigned = (
            corpus.select(id_col, vec_col, F.explode(cent_lits).alias("g"))
            .select(
                id_col, vec_col, F.col("g.cell").alias("cell"),
                cosine_col(F.col(vec_col), F.col("g.cvec")).alias("csim"),
            )
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
        )
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .select("cell", F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"))
            .collect()
        )
        for r in means:
            cents[r["cell"]] = list(r["cvec"])
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str | list[list[float]] = "sample",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into cells, assign each
    vector to its best cell, then search each query only in its n_probe
    nearest cells. `centroids`: 'sample' (deterministic lowest-id corpus
    sample -- the cheap init), 'kmeans' (train_centroids Lloyd
    iterations -- the production choice; recall gate in pytest), or an
    explicit matrix. Turns the brute-force cross join into
    |queries| x (n_probe/n_cells) x |corpus| work; with n_probe ==
    n_cells the result is EXACTLY brute force regardless of centroids
    (cells partition the corpus), which is the contract oracle proof.

    Plan shape: centroids broadcast (tiny), cell assignment in codegen,
    equi-join on cell id -- the scan of each cell is the only data
    movement. This is the 100TB path; brute_force_topk is the oracle."""
    from pyspark.sql import Window

    corpus = _as_double(embeddings, vec_col)
    if centroids == "kmeans":
        centroids = train_centroids(
            embeddings, n_cells, id_col=id_col, vec_col=vec_col
        )
    if isinstance(centroids, str):  # 'sample': lowest n_cells ids
        cents = (
            corpus.orderBy(id_col).limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
        )
    else:
        cents = corpus.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            f"cell long, cvec array<double>",
        )
    # assign corpus vectors to their single best cell
    assign_w = Window.partitionBy(id_col).orderBy(
        F.desc("csim"), F.asc("cell")
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cosine_col(F.col(vec_col), F.col("cvec")), 6))
        .withColumn("crank", F.row_number().over(assign_w))
        .where(F.col("crank") == 1)
        .select(id_col, vec_col, "cell")
    )
    # each query probes its n_probe best cells
    qs = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (
        qs.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
        .withColumn("crank", F.row_number().over(probe_w))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    scored = (
        assigned.join(probes, on="cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def bucketed_neardup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int = 64,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-dup: hyperplane buckets -> within-bucket pairs -> cosine
    verify. `n_tables` OR-amplifies recall: each table hashes with an
    independent (deterministically seeded) plane set, candidates are the
    UNION of same-bucket pairs across tables, so a pair is missed only
    if every table splits it -- P(miss) = (1 - p_agree^n_planes)^n_tables.
    The join key is (table, bucket): one shuffle equi-join with an
    n_tables-x row explode, never a cross join; distinct-candidates
    before the cosine fold keeps the verify linear in candidates.
    Low-threshold full-recall configs are proven exactly equal to the
    all-pairs kernel by the shared oracle; production configs get a
    pytest recall bound."""
    e = _as_double(embeddings, vec_col)
    tables = F.array(*[
        F.struct(
            F.lit(t).alias("t"),
            _bucket_expr(F.col(vec_col), n_planes, dim, seed + 1000 * t).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    hashed = (
        e.select(id_col, vec_col, F.explode(tables).alias("g"))
        .select(id_col, vec_col, F.col("g.t").alias("t"), F.col("g.bucket").alias("bucket"))
    )
    a = hashed.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "t", "bucket")
    c = hashed.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "t", "bucket")
    cands = (
        a.join(c, on=["t", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb")
        .distinct()
    )
    return (
        cands.withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
