"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

One row per conversation turn:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string?, ts timestamp[ms], value double)

Fully seeded (numpy Generator, fixed base date, no wall clock) so every
run -- including Spark task retries -- produces byte-identical inputs.
Zipf-skewed conversation lengths (a=1.3, clamp [1, 5000]) give a few hot
conversations, exercising the skew path; per-conversation strictly
increasing timestamps with 1 s - 30 min gaps exercise gap-fill.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

BASE_TS_MS = 1767225600000  # 2026-01-01T00:00:00Z
SCALES = {"tiny": 50, "small": 2000}


def gen_transcripts_pdf(
    n_convs: int = 50, seed: int = 42, with_text: bool = True,
    conv_prefix: str = "conv",
) -> pd.DataFrame:
    """`conv_prefix` namespaces the conversation ids so CHUNKED
    generation (tools/scale_leg.py: ten 22M-row chunks -> one 220M-row
    table that never fits in one pandas frame) yields disjoint series
    across chunks instead of accidentally fusing ten zipf draws into
    10x-hot conversations."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.zipf(1.3, n_convs), 1, 5000).astype(np.int64)
    total = int(lengths.sum())

    conv_ids = np.repeat(
        [f"{conv_prefix}-{i:08d}" for i in range(n_convs)], lengths
    )
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths])

    # roles: base alternation user/assistant; system only at turn 0 (p=.3);
    # tool follows an assistant turn with p=.2
    u = rng.random(total)
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    roles[(turn_idx == 0) & (u < 0.3)] = "system"
    prev_assistant = np.empty(total, dtype=bool)
    prev_assistant[0] = False
    prev_assistant[1:] = (roles[:-1] == "assistant") & (turn_idx[1:] > 0)
    tool_turn = prev_assistant & (rng.random(total) < 0.2)
    roles[tool_turn] = "tool"

    tool_names = np.array(["search", "exec", "browse", "db"], dtype=object)
    tools = np.full(total, None, dtype=object)
    tools[tool_turn] = tool_names[rng.integers(0, 4, int(tool_turn.sum()))]

    # timestamps: per-conv seeded start offset (0-72h) + gaps 1s-30min,
    # truncated to ms (the reference's int64-ms data model)
    start_off_ms = rng.integers(0, 72 * 3600 * 1000, n_convs)
    gaps_ms = rng.integers(1000, 30 * 60 * 1000, total)
    conv_first = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    gaps_ms[conv_first] = 0
    ts_ms = BASE_TS_MS + np.repeat(start_off_ms, lengths) + _segmented_cumsum(
        gaps_ms, lengths
    )

    if with_text:
        text_lens = rng.integers(10, 2001, total)
        texts = [
            _turn_text(c, int(t), int(n))
            for c, t, n in zip(conv_ids, turn_idx, text_lens)
        ]
    else:
        # bench mode: the rollup path never reads text (column pruning
        # drops it at the scan); keep a short deterministic stand-in so
        # the schema stays identical without 1KB/row generation cost
        rng.integers(10, 2001, total)  # keep the RNG stream aligned
        texts = np.full(total, "t", dtype=object)

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts_ms, unit="ms"),
            "value": turn_idx.astype(np.float64),
        }
    )


def _segmented_cumsum(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each conversation boundary (the first
    element of each segment is already zeroed by the caller)."""
    c = np.cumsum(x)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return c - np.repeat(c[starts] - x[starts], lengths)


def _turn_text(conv_id: str, turn_idx: int, length: int) -> str:
    h = hashlib.sha256(f"{conv_id}:{turn_idx}".encode()).hexdigest()
    reps = length // len(h) + 1
    return (h * reps)[:length]


def write_bench_parquet(
    path: str, n_convs: int, seed: int = 42, rows_per_file: int = 250_000,
    conv_prefix: str = "conv", file_prefix: str = "part",
) -> int:
    """rows_per_file sizes SCAN parallelism: these zstd files are far
    below spark.sql.files.maxPartitionBytes, so one file == one scan
    task; 2M-row files capped a 22M-row scan at 12 tasks and silently
    serialized 32-core runs."""
    return _write_bench_parquet(
        path, n_convs, seed, rows_per_file, conv_prefix, file_prefix
    )


def _write_bench_parquet(
    path: str, n_convs: int, seed: int, rows_per_file: int,
    conv_prefix: str = "conv", file_prefix: str = "part",
) -> int:
    """Generate a bench-scale transcripts table straight to parquet via
    pyarrow (no Spark, no text payload) -- cached input for scaling runs.
    Returns total rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = gen_transcripts_pdf(
        n_convs, seed, with_text=False, conv_prefix=conv_prefix
    )
    # Spark cannot read TIMESTAMP(NANOS) parquet -- coerce to micros
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    import os

    os.makedirs(path, exist_ok=True)
    n = len(pdf)
    for i, lo in enumerate(range(0, n, rows_per_file)):
        pq.write_table(
            table.slice(lo, rows_per_file),
            os.path.join(path, f"{file_prefix}-{i:04d}.parquet"),
            compression="zstd",
        )
    return n


def gen_transcripts_df(spark, n_convs: int = 50, seed: int = 42, with_text: bool = True):
    """Spark DataFrame via the Arrow path, ms-precision timestamps."""
    pdf = gen_transcripts_pdf(n_convs, seed, with_text)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)
