"""Shape-preserving per-series downsampling: LTTB.

Largest-Triangle-Three-Buckets (Steinarsson, 2013 -- public algorithm)
reduces each series to `n_out` points while preserving visual shape:
first/last points are kept, the time range is split into n_out-2
buckets, and each bucket keeps the point forming the largest triangle
with the previously selected point and the next bucket's centroid.

This complements the ALGEBRAIC tier downsampling (operators/rollup.py:
fixed calendar buckets, exact aggregates): tiers answer queries, LTTB
feeds dashboards/plots a fixed point budget per series regardless of
density. The selection is inherently sequential per series (each pick
depends on the previous pick), so this is the textbook `applyInPandas`
case -- vectorized numpy inside each group, one shuffle on the series
key, no per-row Python (guide: prefer built-ins; drop to grouped
pandas only when the semantics demand it, as here).

Scale shape: one hash shuffle on series labels; group size = points
per series (bounded by retention x rate); output is n_out rows per
series. Hot series are bounded the same way the Gorilla encode leg is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB selection over one (time-sorted) series."""
    n = len(t)
    if n_out >= n or n_out < 3:
        return np.arange(n) if n_out >= n else np.array([0, n - 1])
    # bucket boundaries over the interior points (exclude first/last)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0  # previously selected point
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (n if i == n_out - 3 else edges[i + 2])
        # centroid of the NEXT bucket (last bucket -> the final point)
        cx = t[nlo:nhi].mean() if nhi > nlo else t[-1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[-1]
        tb, vb = t[lo:hi], v[lo:hi]
        # doubled triangle area vs (a, candidate, centroid), vectorized
        area = np.abs(
            (t[a] - cx) * (vb - v[a]) - (t[a] - tb) * (cy - v[a])
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    out[-1] = n - 1
    return out


def lttb_downsample(
    df: DataFrame,
    series_cols: list[str],
    n_out: int,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-series LTTB to `n_out` points: (series..., ts_ms, value).

    Groups with <= n_out points pass through unchanged (minus ordering);
    first and last points are always kept (LTTB invariant)."""
    from .windows import unix_ms

    prepared = df.select(
        *series_cols,
        unix_ms(F.col(ts_col)).alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
    )
    schema = ", ".join(
        f"{name} {dtype}" for name, dtype in prepared.dtypes
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ms", kind="stable")
        idx = _lttb_indices(
            pdf["ts_ms"].to_numpy(dtype=np.float64),
            pdf["value"].to_numpy(dtype=np.float64),
            n_out,
        )
        return pdf.iloc[idx]

    return prepared.groupBy(*series_cols).applyInPandas(kernel, schema)
