"""Multimodal columns: opaque binary payloads + typed metadata
(training-data pipeline).

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extraction runs as Arrow-batched `mapInPandas` over those
columns. The actual codec libraries are not in this container, so the
decode kernel is STUBBED (deterministic fake or NotImplementedError),
but the Spark-side plumbing -- schema, batch iteration, partition-
preserving shape, metadata extraction from real header bytes -- is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: set True only in environments with PIL/ffmpeg available
REAL_DECODERS_AVAILABLE = False

META_SCHEMA = (
    "doc_id long, n_bytes long, magic int, fake_width int, fake_height int"
)


def docs_as_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payloads: utf-8 bytes of the text column as
    the opaque `payload` binary (what an image/audio blob column looks
    like to Spark -- the engine never interprets it outside the UDF)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: header-byte metadata without full decode.

    Real variant would sniff magic numbers (PNG/JPEG/WAV) and parse
    dimension fields; the deterministic stand-in reads byte 0 as `magic`
    and derives fake dimensions from the first two bytes -- the batch
    shape, arrow transfer, and schema contract are identical."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int64")
        first = payloads.map(lambda b: b[0] if len(b) else 0).astype("int32")
        second = payloads.map(lambda b: b[1] if len(b) > 1 else 0).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "magic": first,
                "fake_width": (first % 64 + 1).astype("int32"),
                "fake_height": (second % 64 + 1).astype("int32"),
            }
        )


def extract_metadata(binary_docs: DataFrame) -> DataFrame:
    """Binary payloads -> typed metadata rows (Arrow-batched)."""
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _extract_meta, schema=META_SCHEMA
    )


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would PIL-decode to HxWx3 uint8."""
    if not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg, not present in this container; "
            "deterministic fake available via fake_decode_image"
        )
    raise AssertionError("unreachable")


def fake_decode_image(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic fake decode: tile the payload bytes into an HxWx3
    array -- lets downstream feature-extract plumbing run for real."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = w * h * 3
    reps = need // max(len(buf), 1) + 1
    return np.tile(buf, reps)[:need].reshape(h, w, 3)


FEATURE_SCHEMA = "doc_id long, mean_r double, mean_g double, mean_b double"


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature kernel over fake-decoded frames (mean per channel) --
    the shape a real embedding/resize/frame-sample kernel would have."""
    for pdf in batches:
        feats = np.stack(
            [fake_decode_image(p).mean(axis=(0, 1)) for p in pdf["payload"]]
        ) if len(pdf) else np.zeros((0, 3))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "mean_r": feats[:, 0],
                "mean_g": feats[:, 1],
                "mean_b": feats[:, 2],
            }
        )


def extract_features(binary_docs: DataFrame) -> DataFrame:
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )
