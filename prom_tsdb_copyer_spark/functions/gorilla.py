"""Gorilla-style chunk codec: delta-of-delta timestamps + XOR floats.

Replaces the chunk machinery the reference exercises through the
Prometheus library (append at /root/reference/copyer.go:116, decode
iteration at copyer.go:89,108-135); algorithm per Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database" (VLDB 2015)
§4.1. Byte-parity with Go chunkenc is a non-goal (the reference's own
parity bar is point values, SURVEY.md §2.8); this module defines a
*canonical self-golden* encoding, pinned by golden-byte tests.

Canonical chunk layout (little-endian header, MSB-first bitstreams):

    u32  count
    u32  ts_bits        -- bit length of the timestamp stream
    i64  first_ts_ms
    u64  first_val_bits
    [ts bitstream][value bitstream]   (concatenated, byte-padded at end)
    u32  crc32 of everything above

Timestamp stream (samples 1..n-1): delta-of-delta with prev_delta
starting at 0, bucketed control codes
    '0'                      dod == 0
    '10'    + 7  bits        dod in [-63, 64]       (stored dod+63)
    '110'   + 9  bits        dod in [-255, 256]     (stored dod+255)
    '1110'  + 12 bits        dod in [-2047, 2048]   (stored dod+2047)
    '11110' + 32 bits        |dod| < 2^31           (stored dod+2^31-1)
    '11111' + 64 bits        anything else          (two's complement)

Value stream (samples 1..n-1): XOR with previous value
    '0'                                  xor == 0
    '1' + 6b leading + 6b (mlen-1) + mlen meaningful bits
(always re-emitting the bit window rather than Gorilla's reuse-previous
optimization -- a deliberate, documented simplification that makes the
encoder fully vectorizable: all field widths derive from per-sample data
with no sequential control dependence.)

Vectorization strategy ("no per-row Python"): encode loops over BIT
POSITIONS (<= 64 numpy ops per field class), never over samples; the
bitstream is assembled with np.packbits. Decode walks the stream through
a Python-bigint bit reader -- sequential by nature (field widths are
data-dependent), used on the verify path; each step is O(1) after one
int.from_bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_HEADER = struct.Struct("<IIqQ")

# (lo, hi, prefix_bits, prefix_val, payload_bits); lo/hi inclusive dod range
_DOD_CLASSES = (
    (-63, 64, 2, 0b10, 7),
    (-255, 256, 3, 0b110, 9),
    (-2047, 2048, 4, 0b1110, 12),
    (-(2**31) + 1, 2**31, 5, 0b11110, 32),
)
_DOD_WIDE = (5, 0b11111, 64)


def _or_runs(words: np.ndarray, idx_sorted: np.ndarray, vals: np.ndarray) -> None:
    """words[idx] |= vals with idx sorted ascending: contiguous runs of
    equal idx are OR-reduced with reduceat (vectorized), then scattered
    to unique positions -- avoids the slow ufunc.at path."""
    if not len(idx_sorted):
        return
    starts = np.flatnonzero(np.diff(idx_sorted, prepend=idx_sorted[0] - 1))
    red = np.bitwise_or.reduceat(vals, starts)
    words[idx_sorted[starts]] |= red


def _pack_fields(field_vals: np.ndarray, field_nbits: np.ndarray) -> bytes:
    """Pack variable-width MSB-first fields into a byte string.

    Word-level assembler: each field contributes to at most two adjacent
    64-bit words; contributions are computed vectorized and OR-merged
    per word via sorted-run reduceat -- O(n_fields) word ops instead of
    O(total_bits) bit ops ('vectorize across samples', SURVEY.md §7.4).
    """
    nbits = field_nbits.astype(np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    keep = nbits > 0
    nbits_k = nbits[keep]
    vals = field_vals[keep].astype(np.uint64, copy=False)
    ends = np.cumsum(nbits)[keep]
    offs = ends - nbits_k
    n_words = (total + 63) // 64
    words = np.zeros(n_words, dtype=np.uint64)

    word_idx = (offs >> 6).astype(np.int64)
    bit_in = (offs & 63).astype(np.int64)
    take = np.minimum(nbits_k, 64 - bit_in)  # bits landing in first word
    rem = nbits_k - take  # bits spilling into the next word
    u = np.uint64
    take_mask = np.where(take >= 64, ~u(0), (u(1) << take.astype(np.uint64)) - u(1))
    hi = ((vals >> rem.astype(np.uint64)) & take_mask) << (
        (64 - bit_in - take).astype(np.uint64)
    )
    _or_runs(words, word_idx, hi)
    cross = rem > 0
    if cross.any():
        rem_c = rem[cross].astype(np.uint64)
        lo = (vals[cross] & ((u(1) << rem_c) - u(1))) << (u(64) - rem_c)
        _or_runs(words, word_idx[cross] + 1, lo)
    return words.astype(">u8").tobytes()[: (total + 7) // 8]


def _ts_fields(ts_ms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-sample (control, payload) field pairs for samples 1..n-1."""
    deltas = np.diff(ts_ms)
    dod = np.diff(deltas, prepend=np.int64(0))  # prev_delta starts at 0
    n = len(dod)
    ctrl_val = np.zeros(n, dtype=np.uint64)
    ctrl_bits = np.ones(n, dtype=np.int64)  # '0' for dod==0
    pay_val = np.zeros(n, dtype=np.uint64)
    pay_bits = np.zeros(n, dtype=np.int64)
    remaining = dod != 0
    for lo, hi, pbits, pval, wbits in _DOD_CLASSES:
        m = remaining & (dod >= lo) & (dod <= hi)
        ctrl_val[m], ctrl_bits[m] = pval, pbits
        pay_val[m] = (dod[m] - lo).astype(np.uint64)
        pay_bits[m] = wbits
        remaining &= ~m
    if remaining.any():
        pbits, pval, wbits = _DOD_WIDE
        ctrl_val[remaining], ctrl_bits[remaining] = pval, pbits
        pay_val[remaining] = dod[remaining].astype(np.uint64)  # two's complement
        pay_bits[remaining] = wbits
    vals = np.stack([ctrl_val, pay_val], axis=1).ravel()
    nbits = np.stack([ctrl_bits, pay_bits], axis=1).ravel()
    return vals, nbits


def _val_fields(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-sample (header, mantissa) field pairs for samples 1..n-1."""
    bits64 = values.view(np.uint64)
    xor = bits64[1:] ^ bits64[:-1]
    n = len(xor)
    nz = xor != 0
    lz = np.zeros(n, dtype=np.int64)
    tz = np.zeros(n, dtype=np.int64)
    x = xor[nz]
    # leading zeros of a uint64, vectorized: 63 - floor(log2) via bit length
    lz[nz] = 64 - _bit_length(x)
    tz[nz] = _trailing_zeros(x)
    mlen = np.where(nz, 64 - lz - tz, 0)
    # header: '0' (1 bit) or '1'+lz(6)+mlen-1(6) = 13 bits
    hdr_val = np.where(
        nz,
        (np.uint64(1) << np.uint64(12))
        | (lz.astype(np.uint64) << np.uint64(6))
        | (mlen - 1).clip(0).astype(np.uint64),
        np.uint64(0),
    ).astype(np.uint64)
    hdr_bits = np.where(nz, 13, 1).astype(np.int64)
    man_val = np.zeros(n, dtype=np.uint64)
    man_val[nz] = xor[nz] >> tz[nz].astype(np.uint64)
    man_bits = np.where(nz, mlen, 0).astype(np.int64)
    vals = np.stack([hdr_val, man_val], axis=1).ravel()
    nbits = np.stack([hdr_bits, man_bits], axis=1).ravel()
    return vals, nbits


def _bit_length(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        out[m] += shift
        v[m] >>= np.uint64(shift)
    return out + 1


def _trailing_zeros(x: np.ndarray) -> np.ndarray:
    lsb = x & (~x + np.uint64(1))  # isolate lowest set bit
    return _bit_length(lsb) - 1


def encode_chunk(ts_ms: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one series-bucket's samples (ts ascending) into a chunk."""
    ts_ms = np.asarray(ts_ms, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    if len(ts_ms) == 0:
        raise ValueError("empty chunk")
    if len(ts_ms) != len(values):
        raise ValueError("ts/values length mismatch")
    if len(ts_ms) > 1 and (np.diff(ts_ms) < 0).any():
        raise ValueError("timestamps must be ascending")
    first_val_bits = values[:1].view(np.uint64)[0]
    if len(ts_ms) == 1:
        payload = b""
        n_ts_bits = 0
    else:
        tv, tb = _ts_fields(ts_ms)
        vv, vb = _val_fields(values)
        payload = _pack_fields(
            np.concatenate([tv, vv]), np.concatenate([tb, vb])
        )
        n_ts_bits = int(tb.sum())
    head = _HEADER.pack(len(ts_ms), n_ts_bits, int(ts_ms[0]), int(first_val_bits))
    body = head + payload
    return body + struct.pack("<I", zlib.crc32(body))


class _BitReader:
    """MSB-first reader over the payload, backed by one Python bigint."""

    __slots__ = ("val", "nbits", "pos")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "big")
        self.nbits = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("chunk truncated")
        self.pos = p + n
        return (self.val >> (self.nbits - p - n)) & ((1 << n) - 1)


def decode_chunk(chunk: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_chunk -> (ts_ms int64, values float64)."""
    if len(chunk) < _HEADER.size + 4:
        raise ValueError("chunk too short")
    body, (crc,) = chunk[:-4], struct.unpack("<I", chunk[-4:])
    if zlib.crc32(body) != crc:
        raise ValueError("chunk checksum mismatch")
    count, ts_bits, first_ts, first_val_bits = _HEADER.unpack(body[: _HEADER.size])
    ts = np.empty(count, dtype=np.int64)
    vals_u = np.empty(count, dtype=np.uint64)
    ts[0] = first_ts
    vals_u[0] = first_val_bits
    r = _BitReader(body[_HEADER.size :])
    # timestamp stream
    delta = 0
    t = first_ts
    for i in range(1, count):
        ones = 0
        while ones < 5 and r.read(1) == 1:
            ones += 1
        if ones == 0:
            dod = 0
        elif ones <= 4:
            lo, _hi, _pb, _pv, wbits = _DOD_CLASSES[ones - 1]
            dod = r.read(wbits) + lo
        else:  # '11111' + 64-bit two's complement
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        t += delta
        ts[i] = t
    if r.pos != ts_bits:
        raise ValueError("timestamp stream length mismatch")
    # value stream
    prev = int(first_val_bits)
    for i in range(1, count):
        if r.read(1) == 0:
            vals_u[i] = prev
        else:
            lz = r.read(6)
            mlen = r.read(6) + 1
            mant = r.read(mlen)
            tz = 64 - lz - mlen
            prev ^= mant << tz
            vals_u[i] = prev
    return ts, vals_u.view(np.float64)


# ------------------------------------------------------- batched decoder


def _gather64(payload: np.ndarray, stride: int, bit_off: np.ndarray,
              rows: np.ndarray) -> np.ndarray:
    """For each row r in `rows`, the 64 bits starting at bit_off[r] of
    payload row r (payload is a C x stride uint8 matrix, padded so any
    in-range read of 16 bytes is safe). Vectorized: two big-endian u64
    gathers + shift-combine."""
    byte0 = (bit_off[rows] >> 3).astype(np.int64)
    r = (bit_off[rows] & 7).astype(np.uint64)
    base = rows * stride + byte0
    flat = payload.reshape(-1)
    # gather 16 bytes as two big-endian uint64s
    idx = base[:, None] + np.arange(16)
    b = flat[idx]
    h = b[:, :8].astype(np.uint64)
    l = b[:, 8:].astype(np.uint64)
    shifts = np.arange(56, -8, -8, dtype=np.uint64)
    hi = (h << shifts).sum(axis=1, dtype=np.uint64)
    lo = (l << shifts).sum(axis=1, dtype=np.uint64)
    out = np.where(r == 0, hi, (hi << r) | (lo >> (np.uint64(64) - r)))
    return out.astype(np.uint64)


def decode_chunks_batched(chunks: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode many chunks at once -> (ts_ms, values, chunk_row_index).

    Transposed vectorization: iterate the per-chunk SAMPLE INDEX (bounded
    by the bucket's max samples), with every step vectorized across all
    chunks still active -- the decode twin of encode_chunks_batched.
    CRCs are validated per chunk (cheap C calls)."""
    C = len(chunks)
    if C == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.int64))
    heads = np.frombuffer(b"".join(c[: _HEADER.size] for c in chunks), dtype=np.uint8)
    heads = heads.reshape(C, _HEADER.size)
    counts = heads[:, 0:4].copy().view("<u4").reshape(C).astype(np.int64)
    ts_bits = heads[:, 4:8].copy().view("<u4").reshape(C).astype(np.int64)
    first_ts = heads[:, 8:16].copy().view("<i8").reshape(C)
    first_vb = heads[:, 16:24].copy().view("<u8").reshape(C)
    for c in chunks:
        body, (crc,) = c[:-4], struct.unpack("<I", c[-4:])
        if zlib.crc32(body) != crc:
            raise ValueError("chunk checksum mismatch")

    stride = max(len(c) - _HEADER.size - 4 for c in chunks) + 16
    payload = np.zeros((C, stride), dtype=np.uint8)
    for i, c in enumerate(chunks):
        body = c[_HEADER.size : -4]
        payload[i, : len(body)] = np.frombuffer(body, dtype=np.uint8)

    max_n = int(counts.max())
    ts_out = np.zeros((C, max_n), dtype=np.int64)
    val_out = np.zeros((C, max_n), dtype=np.uint64)
    ts_out[:, 0] = first_ts
    val_out[:, 0] = first_vb

    u = np.uint64
    # ---- timestamp stream
    off = np.zeros(C, dtype=np.int64)
    delta = np.zeros(C, dtype=np.int64)
    t = first_ts.copy()
    for i in range(1, max_n):
        rows = np.flatnonzero(counts > i)
        w = _gather64(payload, stride, off, rows)
        # count leading ones (max 5) of the control prefix
        ones = np.zeros(len(rows), dtype=np.int64)
        still = np.ones(len(rows), dtype=bool)
        for k in range(5):
            bit = ((w >> u(63 - k)) & u(1)) == 1
            take = still & bit
            ones += take
            still &= bit
        ctrl_bits = np.where(ones == 5, 5, ones + 1)
        dod = np.zeros(len(rows), dtype=np.int64)
        nz = ones > 0
        pay_w = np.zeros(len(rows), dtype=np.int64)
        lo_add = np.zeros(len(rows), dtype=np.int64)
        for cls_i, (lo_v, _hi, _pb, _pv, wbits) in enumerate(_DOD_CLASSES):
            m_ = ones == cls_i + 1
            pay_w[m_] = wbits
            lo_add[m_] = lo_v
        wide = ones == 5
        pay_w[wide] = 64
        off[rows] += ctrl_bits
        has_pay = pay_w > 0
        pr = rows[has_pay]
        if len(pr):
            pw = _gather64(payload, stride, off, pr)
            width = pay_w[has_pay].astype(np.uint64)
            raw = pw >> (u(64) - width)
            signed = raw.astype(np.int64) + lo_add[has_pay]
            # 64-bit wide class: raw IS the two's-complement dod
            wide_sel = wide[has_pay]
            signed[wide_sel] = raw[wide_sel].astype(np.int64)
            dod[has_pay] = signed
            off[pr] += pay_w[has_pay]
        delta[rows] += dod
        t[rows] += delta[rows]
        ts_out[rows, i] = t[rows]
    if not np.array_equal(off[counts > 1], ts_bits[counts > 1]):
        raise ValueError("timestamp stream length mismatch")

    # ---- value stream
    off = ts_bits.copy()
    prev = first_vb.copy()
    for i in range(1, max_n):
        rows = np.flatnonzero(counts > i)
        w = _gather64(payload, stride, off, rows)
        ctrl = (w >> u(63)) == 1
        off[rows] += 1
        pr = rows[ctrl]
        if len(pr):
            # 6b leading zeros + 6b (mlen-1) follow the control bit
            hdr = (w[ctrl] << u(1))
            lz = (hdr >> u(58)).astype(np.int64)
            mlen = ((hdr >> u(52)) & u(63)).astype(np.int64) + 1
            off[pr] += 12
            mw = _gather64(payload, stride, off, pr)
            mant = mw >> (u(64) - mlen.astype(np.uint64))
            tz = (64 - lz - mlen).astype(np.uint64)
            prev[pr] ^= mant << tz
            off[pr] += mlen
        val_out[rows, i] = prev[rows]

    mask = np.arange(max_n) < counts[:, None]
    row_idx = np.repeat(np.arange(C, dtype=np.int64), counts)
    return ts_out[mask], val_out[mask].view(np.float64), row_idx


# ------------------------------------------------------- batched encoder


def encode_chunks_batched(
    ts_ms: np.ndarray, values: np.ndarray, group_ids: np.ndarray
) -> list[bytes]:
    """Encode MANY chunks in one vectorized pass.

    `group_ids` must be 0..G-1, non-decreasing, with ts ascending within
    each group (the caller sorts). Produces byte-identical chunks to
    :func:`encode_chunk` (golden-tested) but amortizes every numpy op
    across the whole batch: the per-group Python work is one buffer
    slice + one crc32, ~3 µs -- two orders of magnitude faster than
    per-group encode for the small groups a 1m/1h bucket produces.
    """
    n = len(ts_ms)
    if n == 0:
        return []
    ts_ms = np.asarray(ts_ms, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    group_ids = np.asarray(group_ids, dtype=np.int64)
    n_groups = int(group_ids[-1]) + 1
    first_mask = np.empty(n, dtype=bool)
    first_mask[0] = True
    np.not_equal(group_ids[1:], group_ids[:-1], out=first_mask[1:])
    firsts = np.flatnonzero(first_mask)
    counts = np.diff(np.append(firsts, n))

    m = ~first_mask  # samples that encode into the streams
    # --- timestamp dod over the flat arrays, segment-aware
    delta = np.zeros(n, dtype=np.int64)
    delta[1:] = ts_ms[1:] - ts_ms[:-1]
    delta[first_mask] = 0
    if (delta < 0).any():
        raise ValueError("timestamps must be ascending within groups")
    prev_delta = np.zeros(n, dtype=np.int64)
    prev_delta[1:] = delta[:-1]
    # second sample of each group: prev_delta = 0 (stream restart)
    second = np.zeros(n, dtype=bool)
    second[1:] = first_mask[:-1]
    prev_delta[second] = 0
    dod = delta - prev_delta

    ctrl_val = np.zeros(n, dtype=np.uint64)
    ctrl_bits = np.where(m, 1, 0).astype(np.int64)
    pay_val = np.zeros(n, dtype=np.uint64)
    pay_bits = np.zeros(n, dtype=np.int64)
    remaining = m & (dod != 0)
    for lo, hi, pbits, pval, wbits in _DOD_CLASSES:
        sel = remaining & (dod >= lo) & (dod <= hi)
        ctrl_val[sel], ctrl_bits[sel] = pval, pbits
        pay_val[sel] = (dod[sel] - lo).astype(np.uint64)
        pay_bits[sel] = wbits
        remaining &= ~sel
    if remaining.any():
        pbits, pval, wbits = _DOD_WIDE
        ctrl_val[remaining], ctrl_bits[remaining] = pval, pbits
        pay_val[remaining] = dod[remaining].astype(np.uint64)
        pay_bits[remaining] = wbits

    # --- value xor, segment-aware
    bits64 = values.view(np.uint64)
    xor = np.zeros(n, dtype=np.uint64)
    xor[1:] = bits64[1:] ^ bits64[:-1]
    xor[first_mask] = 0
    nz = m & (xor != 0)
    lz = np.zeros(n, dtype=np.int64)
    tz = np.zeros(n, dtype=np.int64)
    if nz.any():
        lz[nz] = 64 - _bit_length(xor[nz])
        tz[nz] = _trailing_zeros(xor[nz])
    mlen = np.where(nz, 64 - lz - tz, 0)
    hdr_val = np.where(
        nz,
        (np.uint64(1) << np.uint64(12))
        | (lz.astype(np.uint64) << np.uint64(6))
        | (mlen - 1).clip(0).astype(np.uint64),
        np.uint64(0),
    ).astype(np.uint64)
    hdr_bits = np.where(m, np.where(nz, 13, 1), 0).astype(np.int64)
    man_val = np.zeros(n, dtype=np.uint64)
    man_val[nz] = xor[nz] >> tz[nz].astype(np.uint64)
    man_bits = np.where(nz, mlen, 0).astype(np.int64)

    # --- per-group stream bit lengths (before padding)
    ts_bits_g = np.bincount(group_ids, weights=ctrl_bits + pay_bits,
                            minlength=n_groups).astype(np.int64)
    val_bits_g = np.bincount(group_ids, weights=hdr_bits + man_bits,
                             minlength=n_groups).astype(np.int64)
    total_g = ts_bits_g + val_bits_g
    pad_g = (8 - (total_g % 8)) % 8

    # --- global field ordering: per group [ts fields][val fields][pad],
    # placed analytically (no sort): samples are contiguous per group, so
    # each sample's field slots follow from its rank within the group
    n_fields = 4 * n + n_groups
    group_starts = firsts  # sample index of each group's first row
    base = np.concatenate([[0], np.cumsum(4 * counts + 1)[:-1]])  # field base/group
    rank = np.arange(n) - np.repeat(group_starts, counts)  # in-group sample rank
    gbase = np.repeat(base, counts)
    gcnt = np.repeat(counts, counts)
    ts_slot = gbase + 2 * rank  # ctrl at +0, pay at +1
    val_slot = gbase + 2 * gcnt + 2 * rank  # hdr at +0, man at +1
    pad_slot = base + 4 * counts

    f_vals = np.empty(n_fields, dtype=np.uint64)
    f_bits = np.empty(n_fields, dtype=np.int64)
    f_vals[ts_slot], f_bits[ts_slot] = ctrl_val, ctrl_bits
    f_vals[ts_slot + 1], f_bits[ts_slot + 1] = pay_val, pay_bits
    f_vals[val_slot], f_bits[val_slot] = hdr_val, hdr_bits
    f_vals[val_slot + 1], f_bits[val_slot + 1] = man_val, man_bits
    f_vals[pad_slot], f_bits[pad_slot] = 0, pad_g

    payload = _pack_fields(f_vals, f_bits)

    # --- slice per group + headers + crc (cheap Python per group)
    bytes_g = ((total_g + pad_g) // 8).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(bytes_g)[:-1]])
    first_ts = ts_ms[firsts]
    first_vb = bits64[firsts]
    out: list[bytes] = []
    pack = _HEADER.pack
    crc = zlib.crc32
    for g in range(n_groups):
        body = pack(
            int(counts[g]), int(ts_bits_g[g]), int(first_ts[g]), int(first_vb[g])
        ) + payload[offsets[g] : offsets[g] + bytes_g[g]]
        out.append(body + struct.pack("<I", crc(body)))
    return out


# ------------------------------------------------------------- Spark layer

CHUNK_SCHEMA_SUFFIX = (
    "bucket_ms long, cnt long, t_min_ms long, t_max_ms long, chunk binary"
)


def make_encode_udf(series_cols: list[str]):
    """Grouped-map fn for applyInPandas over (series..., bucket_ms):
    one output row per group carrying the Gorilla chunk + header stats
    (the writer.Appender/Commit analog, copyer.go:106-150)."""
    import pandas as pd

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ms", kind="stable")
        ts = pdf["ts_ms"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        chunk = encode_chunk(ts, vals)
        out = {c: [pdf[c].iloc[0]] for c in series_cols}
        out.update(
            bucket_ms=[pdf["bucket_ms"].iloc[0]],
            cnt=[len(ts)],
            t_min_ms=[int(ts[0])],
            t_max_ms=[int(ts[-1])],
            chunk=[chunk],
        )
        return pd.DataFrame(out)

    return encode


def make_decode_udf(series_cols: list[str]):
    """mapInPandas fn exploding chunk rows back into (series, ts_ms,
    value) points (the chunkenc.Iterator analog, copyer.go:108-135).
    Uses the transposed batch decoder: one vectorized pass per Arrow
    batch, series columns replicated via np.repeat."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ts, vals, row_idx = decode_chunks_batched(list(pdf["chunk"]))
            out = {
                c: pdf[c].to_numpy()[row_idx] for c in series_cols
            }
            out["ts_ms"] = ts
            out["value"] = vals
            yield pd.DataFrame(out)

    return decode


def _group_change_mask(pdf, key_cols: list[str]) -> np.ndarray:
    """Null-safe group-boundary detection over sorted rows."""
    import pandas as pd

    n = len(pdf)
    change = np.zeros(n, dtype=bool)
    if n == 0:
        return change
    change[0] = True
    for c in key_cols:
        col = pdf[c].to_numpy()
        neq = col[1:] != col[:-1]
        both_na = pd.isna(col[1:]) & pd.isna(col[:-1])
        change[1:] |= np.asarray(neq & ~both_na, dtype=bool)
    return change


def make_batched_encode_udf(series_cols: list[str]):
    """mapInPandas kernel over rows pre-clustered by repartition(keys) and
    sorted by (keys, ts_ms): encodes every complete group in the batch
    via encode_chunks_batched, carrying the trailing (possibly
    incomplete) group into the next batch. Groups never span partitions
    (hash clustering), so the final carry per partition is complete."""
    import pandas as pd

    key_cols = [*series_cols, "bucket_ms"]

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        change = _group_change_mask(pdf, key_cols)
        codes = np.cumsum(change) - 1
        ts = pdf["ts_ms"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        chunks = encode_chunks_batched(ts, vals, codes)
        firsts = np.flatnonzero(change)
        counts = np.diff(np.append(firsts, len(pdf)))
        head = pdf.iloc[firsts]
        out = {c: head[c].to_numpy() for c in series_cols}
        out["bucket_ms"] = head["bucket_ms"].to_numpy(np.int64)
        out["cnt"] = counts.astype(np.int64)
        out["t_min_ms"] = ts[firsts]
        out["t_max_ms"] = ts[firsts + counts - 1]
        out["chunk"] = chunks
        return pd.DataFrame(out)

    def encode(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            change = _group_change_mask(pdf, key_cols)
            codes = np.cumsum(change) - 1
            last_start = int(np.flatnonzero(change)[-1])
            carry = pdf.iloc[last_start:]
            done = pdf.iloc[:last_start]
            if len(done):
                yield _emit(done)
        if carry is not None and len(carry):
            yield _emit(carry)

    return encode


def encode_tier_chunks(
    df, series_cols: list[str], tier, value_col="value", ts_col="ts",
    num_partitions: int | None = None,
):
    """Raw samples -> chunked tier table: per (series, bucket) one row
    with the compressed chunk.

    Physical plan: hash repartition on (series, bucket) -- groups
    co-located, the groupBy-free analog of the copy shuffle -- then
    sortWithinPartitions to cluster + time-order groups, then ONE
    mapInPandas pass that batch-encodes every group (two orders of
    magnitude less per-group Python than applyInPandas at 1m/1h bucket
    sizes). The bucket in the key bounds group size (skew note,
    operators/skew.py)."""
    from pyspark.sql import functions as F

    from ..operators.windows import TIER_MS, bucket_ms_col, unix_ms

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        unix_ms(F.col(ts_col)).alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
    )
    keys = [*series_cols, "bucket_ms"]
    if num_partitions:
        prepared = prepared.repartition(num_partitions, *keys)
    else:
        prepared = prepared.repartition(*keys)
    prepared = prepared.sortWithinPartitions(*keys, "ts_ms")
    series_schema = ", ".join(
        f"{c} {t}" for c, t in prepared.select(*series_cols).dtypes
    )
    out_schema = f"{series_schema}, {CHUNK_SCHEMA_SUFFIX}"
    # mapInPandas KEPT over a mapInArrow rewrite (r9, guide §1): the
    # arrow-native wrapper (pyarrow.compute boundary mask, take-gathered
    # labels, no pandas object strings) was built, parity-tested, and
    # interleaved-A/B'd at 22M rows -- a wash (arrow min 9.13 s vs
    # pandas min 8.60 s over 4 alternating reps each): what the arrow
    # path saves on object-string conversion it repays in per-batch
    # concat_tables/take/binary-array construction. Reverted to the
    # known shape; the kernel itself is shared either way.
    return prepared.mapInPandas(make_batched_encode_udf(series_cols), schema=out_schema)


def encode_tier_chunks_grouped(
    df, series_cols: list[str], tier, value_col="value", ts_col="ts"
):
    """Reference implementation: one applyInPandas call per (series,
    bucket) group -- simple, but pays ~1 ms of Python per group; kept for
    equivalence testing against the batched path."""
    from pyspark.sql import functions as F

    from ..operators.windows import TIER_MS, bucket_ms_col, unix_ms

    tier_ms = TIER_MS[tier] if isinstance(tier, str) else int(tier)
    prepared = df.select(
        *series_cols,
        bucket_ms_col(F.col(ts_col), tier_ms).alias("bucket_ms"),
        unix_ms(F.col(ts_col)).alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
    )
    series_schema = ", ".join(
        f"{c} {t}" for c, t in prepared.select(*series_cols).dtypes
    )
    out_schema = f"{series_schema}, {CHUNK_SCHEMA_SUFFIX}"
    return prepared.groupBy(*series_cols, "bucket_ms").applyInPandas(
        make_encode_udf(series_cols), schema=out_schema
    )


def decode_tier_chunks(chunk_df, series_cols: list[str]):
    """Chunked tier table -> points (verify path)."""
    series_schema = ", ".join(
        f"{c} {t}" for c, t in chunk_df.select(*series_cols).dtypes
    )
    return chunk_df.select(*series_cols, "chunk").mapInPandas(
        make_decode_udf(series_cols), schema=f"{series_schema}, ts_ms long, value double"
    )
