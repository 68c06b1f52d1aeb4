"""Multimodal numpy kernels (resize / frame-sample / video features) and
IVF ANN recall vs the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.multimodal import (
    docs_as_binary,
    extract_video_features,
    resize_nn,
    sample_frames,
)
from prom_tsdb_copyer_spark.operators.similarity import brute_force_topk, ivf_topk


def test_resize_nn_shapes_and_identity():
    frame = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert resize_nn(frame, 4, 4).shape == (4, 4, 3)
    assert resize_nn(frame, 16, 16).shape == (16, 16, 3)
    assert np.array_equal(resize_nn(frame, 8, 8), frame)
    # downsample picks source pixels (nearest neighbor, no blending)
    small = resize_nn(frame, 2, 2)
    assert all(v in frame for v in small.reshape(-1, 3)[:, 0])


def test_sample_frames_shape():
    frames = sample_frames(b"0123456789" * 40, 4)
    assert frames.shape == (4, 8, 8, 3)
    # single-byte payload still yields frames (degenerate guard)
    assert sample_frames(b"x", 4).shape == (4, 8, 8, 3)


def test_video_feature_kernel(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa" * 100), (1, "abcd" * 100)], "doc_id long, text string"
    )
    feats = {r["doc_id"]: r for r in
             extract_video_features(docs_as_binary(docs)).collect()}
    assert feats[0]["n_frames"] == 4
    assert feats[0]["motion"] == 0.0  # constant payload -> no motion
    assert feats[1]["thumb_mean"] > 0


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(9)
    # clustered corpus: 4 centers, 50 points each -> IVF cells align
    centers = rng.standard_normal((4, 64)) * 3
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, (centers[c] + rng.standard_normal(64) * 0.5).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=3)
    approx = ivf_topk(emb, queries, k=3, n_cells=8, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"IVF recall {recall} too low"
    # cosines for shared pairs are identical (same kernel)
    ec = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    ac = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in approx.collect()}
    for key in e & a:
        assert ec[key] == ac[key]
