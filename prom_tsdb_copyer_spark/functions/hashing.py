"""Shared deterministic hashing for dedup/similarity operators.

Everything here is chosen to be *oracle-expressible*: the same 60-bit
hash is computable in Spark (`conv(substr(md5(s),1,15),16,10)`) and
DuckDB (`('0x'||substr(md5(s),1,15))::bigint`), so every dedup operator
gets a real SQL oracle. At 100TB scale the md5 would be swapped for the
built-in `xxhash64` (seed-stable, ~10x faster, JVM-side) -- the
surrounding algebra (affine permutations mod M, banding) is unchanged;
md5 is the cross-engine-parity choice, not the performance ceiling.

MinHash permutations: h_i(x) = (a_i * (x mod M) + b_i) mod M with
M = 1073741789 (prime < 2^30), a_i < 2^31 -- products stay < 2^61, so
the arithmetic is overflow-free int64 in BOTH engines (DuckDB raises on
int64 overflow; Spark wraps silently -- staying under 2^63 keeps them
identical).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

M = 1073741789  # prime < 2^30
NUM_HASHES = 32
LSH_BANDS = 8
LSH_ROWS = NUM_HASHES // LSH_BANDS
SHINGLE_LEN = 5

_rng = np.random.default_rng(7)
MINHASH_A: list[int] = [int(x) for x in _rng.integers(1, M, NUM_HASHES)]
MINHASH_B: list[int] = [int(x) for x in _rng.integers(0, M, NUM_HASHES)]


def hash60(col: Column) -> Column:
    """60-bit non-negative hash of a string column via md5 (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def shingle_col(text: Column) -> Column:
    """Array of character SHINGLE_LEN-grams (whole text if shorter)."""
    n = F.greatest(F.length(text) - (SHINGLE_LEN - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(text, i, SHINGLE_LEN)
    )


def shingles_sql(text_expr: str) -> str:
    """DuckDB: unnest-ready list of character shingles for `text_expr`."""
    n = f"greatest(length({text_expr}) - {SHINGLE_LEN - 1}, 1)"
    return (
        f"list_transform(generate_series(1, {n}), "
        f"i -> substr({text_expr}, i, {SHINGLE_LEN}))"
    )


def affine_col(hm: Column, i: Column) -> Column:
    """(a_i * hm + b_i) mod M with table-lookup coefficients (JVM-side)."""
    a = F.element_at(F.array(*[F.lit(x) for x in MINHASH_A]), i + 1)
    b = F.element_at(F.array(*[F.lit(x) for x in MINHASH_B]), i + 1)
    return (a * hm + b) % M


def affine_sql(hm_expr: str, i_expr: str) -> str:
    a = "[" + ",".join(str(x) for x in MINHASH_A) + "]"
    b = "[" + ",".join(str(x) for x in MINHASH_B) + "]"
    return f"(({a}[{i_expr} + 1] * {hm_expr}) + {b}[{i_expr} + 1]) % {M}"
