"""Similarity search: brute-force exactness vs numpy, ANN recall vs the
brute-force baseline, hyperplane bucketing determinism.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.similarity import (
    brute_force_topk,
    bucketed_neardup,
    hyperplane_buckets,
    neardup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark):
    """64-dim embeddings with planted near-dup clusters."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 64))
    rows = [(i, base[i].tolist()) for i in range(40)]
    # planted: 100+i = tiny perturbation of i (cosine ~ 0.999)
    for i in range(5):
        rows.append((100 + i, (base[i] + 0.01 * rng.standard_normal(64)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _np_cosine(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_brute_force_matches_numpy(spark, emb):
    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    got = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
    for r in got:
        expect = round(_np_cosine(vecs[r["query_id"]], vecs[r["neighbor_id"]]), 6)
        assert abs(r["cosine"] - expect) < 1e-9
    # per-query exact top-5 by numpy
    for q in range(3):
        sims = sorted(
            ((round(_np_cosine(vecs[q], v), 6), i) for i, v in vecs.items() if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        want = [i for _, i in sims]
        have = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == q]
        assert have == want


def test_neardup_finds_planted(spark, emb):
    pairs = {(r["a"], r["b"]) for r in neardup_pairs(emb, 0.99).collect()}
    assert {(i, 100 + i) for i in range(5)} <= pairs


def test_bucketed_recall_on_planted(spark, emb):
    """Near-identical vectors land in the same hyperplane bucket with
    overwhelming probability (angle ~ 0.5 deg, 8 planes)."""
    got = {(r["a"], r["b"]) for r in bucketed_neardup(emb, 0.99, n_planes=8).collect()}
    brute = {(r["a"], r["b"]) for r in neardup_pairs(emb, 0.99).collect()}
    assert len(got & brute) >= len(brute) - 1  # allow one boundary split


def test_buckets_deterministic(spark, emb):
    b1 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(emb, 8).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(emb, 8).collect()}
    assert b1 == b2


def test_multitable_bucketed_recall(spark, emb):
    """OR-amplification: at a moderate threshold (where single-table
    bucketing misses pairs) the multi-table union must reach full recall
    on this fixture, and its plan must stay an equi-join."""
    brute = {(r["a"], r["b"]) for r in neardup_pairs(emb, 0.5).collect()}
    multi = bucketed_neardup(emb, 0.5, n_planes=2, n_tables=16)
    got = {(r["a"], r["b"]) for r in multi.collect()}
    assert brute, "fixture must contain pairs at this threshold"
    assert brute <= got
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """8 well-separated gaussian clusters x 50 points: the regime IVF is
    for (k-means can recover the cells; a corpus-sample init usually
    can't)."""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 64)) * 4
    rows = []
    for i in range(400):
        c = i % 8
        rows.append((i, (centers[c] + 0.5 * rng.standard_normal(64)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(spark, emb_df, centroids, n_cells=8, n_probe=2, k=3):
    from prom_tsdb_copyer_spark.operators.similarity import ivf_topk

    qs = emb_df.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb_df, qs, k=k).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb_df, qs, k=k, n_cells=n_cells, n_probe=n_probe,
            centroids=centroids,
        ).collect()
    }
    return len(exact & got) / len(exact)


def test_kmeans_centroids_beat_sample(spark, clustered_emb):
    """Trained IVF recall gate (n_probe << n_cells): kmeans centroids
    must reach >= 0.9 recall@3 and must not be worse than the lowest-id
    corpus-sample init they replace."""
    r_sample = _recall(spark, clustered_emb, "sample")
    r_kmeans = _recall(spark, clustered_emb, "kmeans")
    assert r_kmeans >= 0.9, f"kmeans recall {r_kmeans}"
    assert r_kmeans >= r_sample, (r_kmeans, r_sample)


def test_full_probe_exact_any_centroids(spark, clustered_emb):
    """n_probe == n_cells is exact for ANY centroid choice (cells
    partition the corpus) -- the property the contract oracle leans on."""
    from prom_tsdb_copyer_spark.operators.similarity import ivf_topk

    qs = clustered_emb.where(F.col("vec_id") < 5)
    exact = {tuple(r) for r in brute_force_topk(clustered_emb, qs, k=3).collect()}
    for cent in ("sample", "kmeans"):
        got = {
            tuple(r)
            for r in ivf_topk(
                clustered_emb, qs, k=3, n_cells=8, n_probe=8, centroids=cent
            ).collect()
        }
        assert got == exact, cent


def test_int8_quantization_roundtrip_and_recall(spark, emb):
    embeddings = emb
    """Quantization error bounded by scale/2 per dim; quantized top-k
    recall@3 vs the exact float top-k stays high (the 8x-less-IO scan
    path must not change the neighbors much)."""
    from prom_tsdb_copyer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_quantized,
        dequantize,
        quantize_int8,
    )
    from pyspark.sql import functions as F

    q = quantize_int8(embeddings)
    # qvec values live in [-127, 127] and scale reproduces max|x|
    bad = q.where(
        F.array_max(F.transform("qvec", lambda x: F.abs(x))) > 127
    ).count()
    assert bad == 0
    rt = dequantize(q).join(
        embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("orig")),
        "vec_id",
    )
    err = rt.select(
        F.array_max(
            F.zip_with("embedding", "orig", lambda a, b: F.abs(a - b))
        ).alias("e"),
        F.col("scale"),
    )
    assert err.where(F.col("e") > F.col("scale") * 0.5 + 1e-12).count() == 0

    queries = embeddings.where(F.col("vec_id") < 20)
    exact = brute_force_topk(embeddings, queries, k=3)
    quant = brute_force_topk_quantized(embeddings, queries, k=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.9, recall


# ------------------------------------------- SemDeDup


def _np_semdedup(vecs: dict, cents: np.ndarray, threshold: float):
    """Pure-numpy SemDeDup reference: assign by max cosine (round 6,
    ties -> lowest cell), within-cell pairs >= threshold (round 6),
    transitive groups, keep argmin (cent_sim, id)."""
    ids = sorted(vecs)
    cell, csim = {}, {}
    for i in ids:
        sims = [round(_np_cosine(vecs[i], c), 6) for c in cents]
        best = max(sims)
        cell[i] = sims.index(best)
        csim[i] = best
    # union-find over within-cell similar pairs
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and cell[i] == cell[j]:
                if round(_np_cosine(vecs[i], vecs[j]), 6) >= threshold:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    keep = set()
    for members in groups.values():
        keep.add(min(members, key=lambda m: (csim[m], m)))
    return cell, keep


def test_semdedup_vs_numpy(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import (
        semdedup_apply,
        semdedup_flags,
        train_centroids,
    )

    cents = train_centroids(emb, n_cells=4, n_iter=2)
    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    want_cell, want_keep = _np_semdedup(vecs, np.array(cents), 0.99)

    reg: list = []
    flags = semdedup_flags(emb, cents, threshold=0.99, cache_registry=reg)
    rows = {r["vec_id"]: r for r in flags.collect()}
    assert set(rows) == set(vecs)
    got_keep = {i for i, r in rows.items() if r["keep"]}
    assert {i: r["cell"] for i, r in rows.items()} == want_cell
    assert got_keep == want_keep
    # exactly one representative per component
    comps = {}
    for i, r in rows.items():
        comps.setdefault(r["component"], []).append(r["keep"])
    assert all(sum(flags_) == 1 for flags_ in comps.values())
    # the planted near-dup pairs (i, 100+i) are never both kept
    for i in range(5):
        assert not (100 + i in got_keep and i in got_keep)

    kept_df = semdedup_apply(emb, cents, threshold=0.99)
    assert {r["vec_id"] for r in kept_df.select("vec_id").collect()} == want_keep
    for df in reg:
        df.unpersist()


# ------------------------------------------------ product quantization


def _np_pq_train(vecs_by_id, m, k, n_iter):
    """Pure-numpy twin of pq_train: lowest-id init, L2 argmin with
    lowest-code tie-break, per-cell mean update, empty cells frozen."""
    ids = sorted(vecs_by_id)
    X = np.array([vecs_by_id[i] for i in ids])
    dim = X.shape[1]
    dsub = dim // m
    books = [
        [list(vecs_by_id[i][j * dsub:(j + 1) * dsub]) for i in ids[:k]]
        for j in range(m)
    ]
    for _ in range(n_iter):
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            cb = np.array(books[j])
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes = d2.argmin(axis=1)  # argmin takes the first min
            for c in range(k):
                members = sub[codes == c]
                if len(members):
                    books[j][c] = members.mean(axis=0).tolist()
    return books


def test_pq_train_matches_numpy(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import pq_train

    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    m, k = 4, 4
    got = pq_train(emb, m=m, k=k, n_iter=2)
    want = _np_pq_train(vecs, m, k, 2)
    assert len(got) == m and all(len(b) == k for b in got)
    for j in range(m):
        np.testing.assert_allclose(
            np.array(got[j]), np.array(want[j]), rtol=1e-9, atol=1e-12
        )


def test_pq_encode_matches_numpy(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    m, k = 4, 8
    books = pq_train(emb, m=m, k=k, n_iter=2)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    dsub = 64 // m
    for i, v in vecs.items():
        want = []
        for j in range(m):
            cb = np.array(books[j])
            d2 = ((v[j * dsub:(j + 1) * dsub] - cb) ** 2).sum(axis=1)
            want.append(int(d2.argmin()))
        assert got[i] == want


def test_pq_topk_adc_matches_numpy_and_finds_planted(spark, emb):
    """ADC exactness vs a numpy recompute with the same codebooks, and
    recall: each planted near-identical pair quantizes to the same
    codes, so ADC distance 0 puts it at rank 1."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    m, k_codes = 4, 16
    books = pq_train(emb, m=m, k=k_codes, n_iter=3)
    queries = emb.where(F.col("vec_id") < 5)
    got = pq_topk(emb, queries, books, k=3).collect()
    # numpy ADC reference over the spark-encoded codes
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, books).collect()}
    dsub = 64 // m
    for q in range(5):
        dists = []
        for i in codes:
            if i == q:
                continue
            d = 0.0
            for j in range(m):
                cent = np.array(books[j][codes[i][j]])
                diff = vecs[q][j * dsub:(j + 1) * dsub] - cent
                d += float(diff @ diff)
            dists.append((round(d, 6), i))
        want = sorted(dists)[:3]
        have = [(r["adc_dist"], r["neighbor_id"])
                for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == q]
        assert have == want
        # planted twin 100+q shares all m codes, so its ADC distance is
        # exactly q's own reconstruction error -- the minimum any
        # same-coded point can score -- and it lands at rank 1
        assert codes[q] == codes[100 + q]
        recon = 0.0
        for j in range(m):
            diff = vecs[q][j * dsub:(j + 1) * dsub] - np.array(
                books[j][codes[q][j]]
            )
            recon += float(diff @ diff)
        assert have[0][1] == 100 + q
        assert abs(have[0][0] - recon) < 1e-6


def test_ivfpq_full_probe_matches_numpy_adc(spark, emb):
    """n_probe == n_cells: cells partition the corpus, so IVF-PQ
    equals exhaustive ADC over the same (cell, residual) quantization
    -- recomputed in numpy from the spark-trained cells/codes. With
    n_probe=2 the planted twin (same cell, same residual codes) still
    lands at rank 1."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.similarity import (
        _as_double,
        assign_cells,
        ivfpq_topk,
        pq_encode,
        pq_train,
        train_centroids,
    )

    pdf = emb.toPandas().set_index("vec_id")
    vecs = {i: np.array(v) for i, v in pdf["embedding"].items()}
    n_cells, m, k_codes = 4, 4, 8
    cents = train_centroids(emb, n_cells, n_iter=2)
    assigned = assign_cells(_as_double(emb, "embedding"), cents)
    cells = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    resid = assigned.select(
        "vec_id", "cell",
        F.zip_with(
            "embedding",
            F.element_at(
                F.array(*[
                    F.array(*[F.lit(float(x)) for x in c]) for c in cents
                ]),
                F.col("cell").cast("int") + 1,
            ),
            lambda a, b: a - b,
        ).alias("__r"),
    )
    books = pq_train(resid, m=m, k=k_codes, vec_col="__r")
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(resid, books, vec_col="__r").collect()}

    queries = emb.where(F.col("vec_id") < 5)
    got = ivfpq_topk(
        emb, queries, k=3, n_cells=n_cells, n_probe=n_cells, m=m,
        k_codes=k_codes, centroids=cents, codebooks=books,
    ).collect()
    dsub = 64 // m
    for q in range(5):
        dists = []
        for i, ci in cells.items():
            if i == q:
                continue
            qr = vecs[q] - np.array(cents[ci])  # query residual vs i's cell
            d = 0.0
            for j in range(m):
                cent = np.array(books[j][codes[i][j]])
                diff = qr[j * dsub:(j + 1) * dsub] - cent
                d += float(diff @ diff)
            dists.append((round(d, 6), i))
        want = sorted(dists)[:3]
        have = [(r["adc_dist"], r["neighbor_id"])
                for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == q]
        assert have == want
    # pruned probe: the twin shares cell AND residual codes => rank 1
    pruned = ivfpq_topk(
        emb, queries, k=1, n_cells=n_cells, n_probe=2, m=m,
        k_codes=k_codes, centroids=cents, codebooks=books,
    ).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in pruned}
    for q in range(5):
        assert cells[q] == cells[100 + q] and codes[q] == codes[100 + q]
        assert top1[q] == 100 + q


# ------------------------------- broadcast-kernel large-n_cells parity
# VERDICT r6 #2: above LITERAL_CELL_LIMIT the literal-centroid/codebook
# plans are replaced by broadcast numpy matrices consumed in one
# Arrow-batched mapInPandas kernel. These tests pin (a) exact parity of
# the two paths on every operator that switches, and (b) that the
# broadcast plan stays O(1) in n_cells at a paper-scale cell count.


def _cents_from(emb_df, n):
    return [
        list(r["embedding"])
        for r in emb_df.orderBy("vec_id").limit(n).collect()
    ]


def test_assign_and_top_cells_broadcast_parity(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import (
        assign_cells,
        top_cells,
    )

    cents = _cents_from(emb, 8)
    lit = {r["vec_id"]: r["cell"]
           for r in assign_cells(emb, cents, method="literal").collect()}
    bc = {r["vec_id"]: r["cell"]
          for r in assign_cells(emb, cents, method="broadcast").collect()}
    assert lit == bc
    qs = emb.select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"))
    t_lit = {(r["query_id"], r["cell"])
             for r in top_cells(qs, cents, 3, method="literal").collect()}
    t_bc = {(r["query_id"], r["cell"])
            for r in top_cells(qs, cents, 3, method="broadcast").collect()}
    assert t_lit == t_bc
    # the auto switch: small matrices stay literal, large go broadcast
    from prom_tsdb_copyer_spark.operators.similarity import (
        LITERAL_CELL_LIMIT,
        _resolve_method,
    )

    assert _resolve_method("auto", LITERAL_CELL_LIMIT) == "literal"
    assert _resolve_method("auto", LITERAL_CELL_LIMIT + 1) == "broadcast"
    with pytest.raises(ValueError, match="method"):
        _resolve_method("bogus", 1)


def test_pq_broadcast_parity(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    m, k = 4, 8
    books = pq_train(emb, m=m, k=k, n_iter=2, method="literal")
    books_bc = pq_train(emb, m=m, k=k, n_iter=2, method="broadcast")
    # same assignments every iteration => identical mean updates (up to
    # the two engines' summation-order ulp, absorbed by the tolerance)
    assert np.allclose(np.array(books), np.array(books_bc), atol=1e-9)

    enc_lit = {r["vec_id"]: list(r["codes"])
               for r in pq_encode(emb, books, method="literal").collect()}
    enc_bc = {r["vec_id"]: list(r["codes"])
              for r in pq_encode(emb, books, method="broadcast").collect()}
    assert enc_lit == enc_bc

    qs = emb.where(F.col("vec_id") < 5)
    rows_lit = {(r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
                for r in pq_topk(emb, qs, books, k=3,
                                 method="literal").collect()}
    rows_bc = {(r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
               for r in pq_topk(emb, qs, books, k=3,
                                method="broadcast").collect()}
    assert rows_lit == rows_bc


def test_ivfpq_broadcast_parity(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_topk,
    )

    cents, books = ivfpq_index(emb, n_cells=4, m=4, k_codes=8,
                               method="literal")
    qs = emb.where(F.col("vec_id") < 5)
    kw = dict(k=3, n_cells=4, n_probe=2, m=4, k_codes=8,
              centroids=cents, codebooks=books)
    rows_lit = {(r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
                for r in ivfpq_topk(emb, qs, method="literal",
                                    **kw).collect()}
    rows_bc = {(r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
               for r in ivfpq_topk(emb, qs, method="broadcast",
                                   **kw).collect()}
    assert rows_lit == rows_bc
    # and the index itself trains identically through the kernels
    cents_bc, books_bc = ivfpq_index(emb, n_cells=4, m=4, k_codes=8,
                                     method="broadcast")
    assert np.allclose(np.array(cents), np.array(cents_bc), atol=1e-9)
    assert np.allclose(np.array(books), np.array(books_bc), atol=1e-9)


def test_semdedup_broadcast_parity(spark, emb):
    from prom_tsdb_copyer_spark.operators.similarity import semdedup_flags

    cents = _cents_from(emb, 6)
    out = {}
    for meth in ("literal", "broadcast"):
        reg = []
        flags = semdedup_flags(emb, cents, threshold=0.99,
                               cache_registry=reg, method=meth)
        out[meth] = {
            r["vec_id"]: (r["cell"], r["component"], r["cent_sim"],
                          r["keep"])
            for r in flags.collect()
        }
        for c in reg:
            c.unpersist()
    assert out["literal"] == out["broadcast"]


def test_broadcast_assign_bounded_plan_at_4k_cells(spark):
    """The scale point itself: 4096 cells (the count where the literal
    plan would carry n_cells x dim = 131k float literals and BENCH.md
    measured plan analysis dominating execution) -- the auto path picks
    the broadcast kernel, the PLAN stays O(1) in n_cells (no centroid
    literals in it), and the result matches a direct numpy argmax."""
    rng = np.random.default_rng(3)
    dim = 32
    cents = rng.standard_normal((4096, dim)).tolist()
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from prom_tsdb_copyer_spark.operators.similarity import assign_cells

    out = assign_cells(df, cents)  # auto -> broadcast above the limit
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # a literal plan at this size is ~megabytes of float literals; the
    # broadcast plan mentions only the kernel
    assert len(plan) < 20_000, len(plan)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    C = np.asarray(cents)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for i, v in rows:
        vv = np.asarray(v)
        sims = np.round(Cn @ (vv / np.linalg.norm(vv)), 6)
        assert got[i] == int(sims.argmax()), i


def test_semdedup_flags_vs_duckdb(spark, emb):
    """Gate-ready oracle SQL for SemDeDup (VERDICT r6 "pytest-only
    without a twin" list; r8 rotation candidate): given a FIXED
    centroid matrix, the whole flags relation is SQL-expressible --
    argmax-cosine cell assignment (rounded to 6, ties to the lowest
    cell), within-cell pairs at the threshold, min-label propagation
    as nested join CTEs (the gated neardup_apply oracle's pattern),
    and the paper's keep rule (argmin (cent_sim, id) per component).
    DuckDB recomputes all of it independently."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.similarity import semdedup_flags

    cents = _cents_from(emb, 6)
    reg = []
    flags = semdedup_flags(emb, cents, threshold=0.99, cache_registry=reg)
    got = {
        r["vec_id"]: (r["cell"], r["component"],
                      round(r["cent_sim"], 6), r["keep"])
        for r in flags.collect()
    }
    for c in reg:
        c.unpersist()

    con = duckdb.connect()
    pdf = emb.toPandas()
    pdf["embedding"] = pdf["embedding"].map(list)
    con.register("emb", pdf)
    cent_rows = ", ".join(
        f"({i}, {[float(x) for x in c]}::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    cos = ("round(list_dot_product({a}, {b}) / "
           "(sqrt(list_dot_product({a}, {a})) * "
           "sqrt(list_dot_product({b}, {b}))), 6)")
    iters = 5  # >= fixture component diameter; pytest pins convergence
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM emb)",
        f"cents(cell, c) AS (SELECT * FROM (VALUES {cent_rows}))",
        f"""sims AS (
            SELECT e.vec_id, cents.cell,
                   {cos.format(a='e.v', b='cents.c')} AS csim
            FROM e, cents)""",
        """assigned AS (
            SELECT vec_id, cell, csim AS cent_sim FROM (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
              FROM sims) WHERE rn = 1)""",
        f"""pairs AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN e ea ON ea.vec_id = a.vec_id
            JOIN e eb ON eb.vec_id = b.vec_id
            WHERE {cos.format(a='ea.v', b='eb.v')} >= 0.99)""",
        """edges AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL SELECT b, a FROM pairs
            UNION ALL SELECT DISTINCT n, n FROM
              (SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs))""",
        "l0 AS (SELECT DISTINCT src AS n, src AS component FROM edges)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"l{i} AS (SELECT e.src AS n, min(l.component) AS component "
            f"FROM edges e JOIN l{i - 1} l ON l.n = e.dst GROUP BY 1)"
        )
    sql = "WITH " + ",\n".join(ctes) + f"""
        SELECT a.vec_id, a.cell,
               coalesce(l.component, a.vec_id) AS component,
               round(a.cent_sim, 6) AS cent_sim,
               row_number() OVER (
                 PARTITION BY coalesce(l.component, a.vec_id)
                 ORDER BY a.cent_sim, a.vec_id) = 1 AS keep
        FROM assigned a LEFT JOIN l{iters} l ON l.n = a.vec_id
    """
    want = {
        int(v): (int(cell), int(comp), round(float(cs), 6), bool(k))
        for v, cell, comp, cs, k in con.sql(sql).fetchall()
    }
    assert got == want
    assert any(not k for *_, k in want.values())  # dups actually flagged


def test_pq_topk_vs_duckdb(spark, emb):
    """Gate-ready oracle SQL for PQ/ADC (VERDICT r6 twin-gap list):
    given FIXED trained codebooks, encoding is an argmin-L2 per
    subspace over literal codebook rows and ADC is the sum of the
    code-selected subspace distances -- both SQL-expressible. DuckDB
    recomputes encode + ADC + the per-query rank window independently
    (list_distance^2 == the L2 fold; ties to the lowest code /
    neighbor id on both engines)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.similarity import (
        pq_topk,
        pq_train,
    )

    m, k = 4, 8
    books = pq_train(emb, m=m, k=k, n_iter=2)
    dsub = 64 // m
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in pq_topk(
            emb, emb.where(F.col("vec_id") < 5), books, k=3
        ).collect()
    }

    con = duckdb.connect()
    pdf = emb.toPandas()
    pdf["embedding"] = pdf["embedding"].map(list)
    con.register("emb", pdf)
    book_rows = ", ".join(
        f"({j}, {code}, {[float(x) for x in books[j][code]]}::DOUBLE[])"
        for j in range(m)
        for code in range(k)
    )
    # d2 of subspace j of vector v against codebook row c
    sub = lambda v, j: f"list_slice({v}, {j * dsub + 1}, {(j + 1) * dsub})"
    sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM emb),
        books(j, code, c) AS (SELECT * FROM (VALUES {book_rows})),
        d2 AS (
          SELECT e.vec_id, b.j, b.code,
                 list_distance(
                   list_slice(e.v, b.j * {dsub} + 1, (b.j + 1) * {dsub}),
                   b.c) ** 2 AS d2
          FROM e, books b),
        codes AS (
          SELECT vec_id, j, code, d2 FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, j ORDER BY d2, code) AS rn
            FROM d2) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round(sum(list_distance(
                   list_slice(q.qv, c.j * {dsub} + 1, (c.j + 1) * {dsub}),
                   b.c) ** 2), 6) AS adc_dist
          FROM q, codes c
          JOIN books b ON b.j = c.j AND b.code = c.code
          WHERE c.vec_id != q.query_id
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adc_dist,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY adc_dist, neighbor_id) AS rank
        FROM scored QUALIFY rank <= 3
    """
    want = {
        (int(qid), int(rank)): (int(nid), float(d))
        for qid, nid, d, rank in con.sql(sql).fetchall()
    }
    assert got == want


def test_pruned_probe_matches_inmemory_and_prunes_partitions(
    spark, emb, tmp_path
):
    """VERDICT r7 #5: the materialized cell-partitioned index read.
    (a) write_ivfpq_index lays the (id, codes, cell=...) directory
    tree; (b) ivfpq_topk_pruned over it returns EXACTLY the in-memory
    ivfpq_topk result for the same (centroids, codebooks, n_probe);
    (c) the probe scan's PartitionFilters prune to the probed cell
    dirs (the read_tier_auto part_day assertion pattern)."""
    import io
    from contextlib import redirect_stdout

    from prom_tsdb_copyer_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_pruned,
        pq_train,
        train_centroids,
        write_ivfpq_index,
    )

    cents = train_centroids(emb, n_cells=6, n_iter=2)
    books = pq_train(emb, m=4, k=8, n_iter=2)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb, path, cents, books)
    # one directory per non-empty cell
    dirs = sorted(p.name for p in (tmp_path / "ivfpq_index").iterdir()
                  if p.name.startswith("cell="))
    assert dirs and all(d.startswith("cell=") for d in dirs)

    qs = emb.where(F.col("vec_id") < 4)
    reg = []
    got = ivfpq_topk_pruned(
        spark, path, qs, cents, books, k=3, n_probe=2,
        cache_registry=reg,
    )
    want = ivfpq_topk(
        emb, qs, k=3, n_probe=2, centroids=cents, codebooks=books,
    )
    as_set = lambda df: {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in df.collect()
    }
    assert as_set(got) == as_set(want)

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1][:200], "cell-partition pruning not engaged"
    for c in reg:
        c.unpersist()


def test_broadcast_kernels_nan_and_invalid_input_laws(spark):
    """ADVICE r7, the unified invalid-input laws: (a) a NaN-ELEMENT
    centroid yields NaN cosine -> BOTH paths rank it -inf (never
    picked/probed), closing the Spark-NaN-greatest vs numpy-NaN-last
    divergence; (b) a zero-NORM centroid raises LOUDLY on both paths
    (ANSI DIVIDE_BY_ZERO on the literal fold, the kernels'
    _check_norms guard); (c) a null embedding makes the broadcast
    kernel raise with a filter hint instead of an opaque np.stack
    crash; (d) ragged dims raise naming the lengths."""
    import pytest

    from prom_tsdb_copyer_spark.operators.similarity import (
        assign_cells,
        top_cells,
    )

    nan = float("nan")
    cents = [[nan, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [(0, [2.0, 0.1, 0.0]), (1, [0.1, 3.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for meth in ("literal", "broadcast"):
        got = {r["vec_id"]: r["cell"]
               for r in assign_cells(df, cents, method=meth).collect()}
        assert got == {0: 1, 1: 2}, meth  # the NaN cell never wins
        probed = {
            (r["vec_id"], r["cell"])
            for r in top_cells(
                df.select("vec_id", F.col("embedding").alias("qvec")),
                cents, n_probe=2, method=meth,
            ).collect()
        }
        # the NaN cell ranks LAST under both engines: 2 probes pick
        # the two real centroids, never cell 0
        assert probed == {(0, 1), (0, 2), (1, 2), (1, 1)}, meth
    # a NaN-element QUERY vector: every cell ties at -inf, both paths
    # break toward cell 0 (argmax-first == max neg_cell)
    nq = spark.createDataFrame(
        [(9, [nan, 1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for meth in ("literal", "broadcast"):
        [r] = assign_cells(nq, cents, method=meth).collect()
        assert r["cell"] == 0, meth

    zero = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    with pytest.raises(Exception, match="zero-norm centroid"):
        assign_cells(df, zero, method="broadcast")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        assign_cells(df, zero, method="literal").collect()
    zvec = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    ok_cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    with pytest.raises(Exception, match="zero-norm embedding"):
        assign_cells(zvec, ok_cents, method="broadcast").collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        assign_cells(zvec, ok_cents, method="literal").collect()

    bad = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, None)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="null embedding"):
        assign_cells(bad, ok_cents, method="broadcast").collect()
    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged embedding"):
        assign_cells(ragged, ok_cents, method="broadcast").collect()


def test_round_half_up_matches_spark_round_on_boundaries(spark):
    """ADVICE r7: np.round is half-to-EVEN; Spark F.round is HALF_UP
    (ties away from zero). The kernels' _round_half_up must agree with
    F.round on EXACTLY representable .5 boundaries (scale 0: binary
    halves are exact, so the tie genuinely fires), both signs, and
    pass non-finite values through. np.round would return 0/2/2/-0/-2
    on the first five -- the divergence this helper closes."""
    import numpy as np

    from prom_tsdb_copyer_spark.operators.similarity import _round_half_up

    vals = [0.5, 1.5, 2.5, -0.5, -1.5]
    got = _round_half_up(np.array(vals), 0)
    spark_got = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 0).alias("r")).collect()
    ]
    assert list(got) == spark_got == [1.0, 2.0, 3.0, -1.0, -2.0]
    # half-to-even really differs here (2.5 -> 2), so the parity claim
    # is non-vacuous
    assert np.round(2.5) == 2.0
    nf = _round_half_up(np.array([np.inf, -np.inf, np.nan]), 6)
    assert nf[0] == np.inf and nf[1] == -np.inf and np.isnan(nf[2])


def test_ivfpq_full_probe_vs_duckdb(spark, emb):
    """Gate-ready oracle SQL for IVF-PQ (r9 rotation fuel, the
    twin-then-promote protocol): with FIXED centroids and codebooks,
    exhaustive probe (n_probe == n_cells) is fully SQL-expressible --
    argmax-cosine cell assignment (the semdedup oracle's law),
    elementwise residual against the assigned centroid, per-subspace
    argmin-L2 codes, and ADC where each (query, neighbor) pair scores
    the query's residual AGAINST THE NEIGHBOR'S CELL (full probe means
    every pair appears exactly once, keyed by the neighbor's cell).
    DuckDB recomputes all of it independently."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.similarity import ivfpq_topk

    rng = np.random.default_rng(11)
    n_cells, m, k_codes, dim = 6, 4, 8, 64
    dsub = dim // m
    cents = rng.standard_normal((n_cells, dim)).tolist()
    books = rng.standard_normal((m, k_codes, dsub)).tolist()

    qs = emb.where(F.col("vec_id") < 4)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in ivfpq_topk(
            emb, qs, k=3, n_probe=n_cells,
            centroids=cents, codebooks=books,
        ).collect()
    }

    con = duckdb.connect()
    pdf = emb.toPandas()
    pdf["embedding"] = pdf["embedding"].map(list)
    con.register("emb", pdf)
    cent_rows = ", ".join(
        f"({i}, {[float(x) for x in c]}::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    book_rows = ", ".join(
        f"({j}, {code}, {[float(x) for x in books[j][code]]}::DOUBLE[])"
        for j in range(m)
        for code in range(k_codes)
    )
    cos = ("round(list_dot_product({a}, {b}) / "
           "(sqrt(list_dot_product({a}, {a})) * "
           "sqrt(list_dot_product({b}, {b}))), 6)")
    resid = ("list_transform(generate_series(1, {dim}), "
             "i -> {v}[i] - {c}[i])")
    sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM emb),
        cents(cell, c) AS (SELECT * FROM (VALUES {cent_rows})),
        books(j, code, c) AS (SELECT * FROM (VALUES {book_rows})),
        sims AS (
          SELECT e.vec_id, cents.cell,
                 {cos.format(a='e.v', b='cents.c')} AS csim
          FROM e, cents),
        assigned AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
            FROM sims) WHERE rn = 1),
        resid AS (
          SELECT a.vec_id, a.cell,
                 {resid.format(dim=dim, v='e.v', c='ct.c')} AS r
          FROM assigned a JOIN e ON e.vec_id = a.vec_id
          JOIN cents ct ON ct.cell = a.cell),
        d2 AS (
          SELECT resid.vec_id, b.j, b.code,
                 list_distance(
                   list_slice(resid.r, b.j * {dsub} + 1,
                              (b.j + 1) * {dsub}), b.c) ** 2 AS d2
          FROM resid, books b),
        codes AS (
          SELECT vec_id, j, code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, j ORDER BY d2, code) AS rn
            FROM d2) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < 4),
        scored AS (
          SELECT q.query_id, cd.vec_id AS neighbor_id,
                 round(sum(list_distance(
                   list_slice(
                     {resid.format(dim=dim, v='q.qv', c='ct.c')},
                     cd.j * {dsub} + 1, (cd.j + 1) * {dsub}),
                   b.c) ** 2), 6) AS adc_dist
          FROM q
          JOIN resid nb ON nb.vec_id != q.query_id
          JOIN cents ct ON ct.cell = nb.cell
          JOIN codes cd ON cd.vec_id = nb.vec_id
          JOIN books b ON b.j = cd.j AND b.code = cd.code
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adc_dist,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY adc_dist, neighbor_id)::INTEGER AS rank
        FROM scored QUALIFY rank <= 3
    """
    want = {
        (int(qid), int(rank)): (int(nid), float(d))
        for qid, nid, d, rank in con.sql(sql).fetchall()
    }
    assert got == want and len(want) == 12  # 4 queries x top-3
