"""Multimodal columns: opaque binary payloads + typed metadata
(training-data pipeline).

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extraction runs as Arrow-batched `mapInPandas` over those
columns. REAL with no codec library: PNG/JPEG header dimensions
(vectorized byte sniffing + SOF walk), uncompressed 24-bpp BMP decode/
encode (struct + numpy reshape), PCM 16-bit WAV parse + audio features
(duration/RMS/zero-crossing). Only compressed-bitstream decode (PNG
zlib, JPEG DCT, video codecs) is stubbed -- those genuinely need
libraries absent from this container -- with a deterministic fake so
downstream plumbing (schema, batch iteration, partition shape) stays
testable end-to-end.
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


#: fixed-width header prefix materialized as one numpy matrix per batch
HEADER_BYTES = 32


def _header_matrix(payloads: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(n_bytes[i64], head[u8 N x HEADER_BYTES]): the whole batch's header
    prefixes as ONE contiguous numpy matrix -- every downstream sniff is
    then a vectorized column operation, no per-row python in the math.
    (The zero-padded join is a C-speed bytes concat; rows shorter than
    HEADER_BYTES read as zero bytes.)"""
    pl = payloads.to_numpy()
    n = len(pl)
    n_bytes = np.fromiter((len(b) for b in pl), dtype=np.int64, count=n)
    if n == 0:
        return n_bytes, np.zeros((0, HEADER_BYTES), np.uint8)
    joined = b"".join(bytes(b[:HEADER_BYTES]).ljust(HEADER_BYTES, b"\0") for b in pl)
    return n_bytes, np.frombuffer(joined, dtype=np.uint8).reshape(n, HEADER_BYTES)


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: header-byte metadata without full decode.

    Deterministic stand-in semantics (oracle-pinned): byte 0 as `magic`,
    fake dimensions from the first two bytes -- computed over the
    vectorized header matrix (np column ops, no per-row lambdas); real
    PNG/JPEG dimension parsing lives in _extract_image_meta."""
    for pdf in batches:
        n_bytes, head = _header_matrix(pdf["payload"])
        first = head[:, 0].astype("int32")
        second = head[:, 1].astype("int32")
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


# ------------------------------------------------- real header parsing

IMAGE_META_SCHEMA = "doc_id long, n_bytes long, format string, width int, height int"

_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)


def _be32(head: np.ndarray, off: int) -> np.ndarray:
    """Vectorized big-endian uint32 read at a fixed header offset."""
    return (
        (head[:, off].astype(np.int64) << 24)
        | (head[:, off + 1].astype(np.int64) << 16)
        | (head[:, off + 2].astype(np.int64) << 8)
        | head[:, off + 3].astype(np.int64)
    )


def _jpeg_dims(b: bytes) -> tuple[int, int]:
    """SOF-marker walk (variable segment offsets -> inherently per-item;
    pure struct reads, no codec library): width/height from the first
    SOF0..SOF15 frame header. Returns (0, 0) if none found/truncated."""
    i, n = 2, len(b)
    while i + 9 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        # standard marker scan: runs of 0xFF are FILL bytes before the
        # marker code -- skip them, else a fill byte would be read as a
        # marker with a bogus segment length and the walk could jump
        # past the real SOF (ADVICE r2)
        while i + 9 <= n and b[i + 1] == 0xFF:
            i += 1
        if i + 9 > n:
            break
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        seg_len = (b[i + 2] << 8) | b[i + 3]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = (b[i + 5] << 8) | b[i + 6]
            w = (b[i + 7] << 8) | b[i + 8]
            return w, h
        i += 2 + seg_len
    return 0, 0


def _extract_image_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL header metadata: PNG dimensions fully vectorized (fixed IHDR
    offsets: width @16, height @20, big-endian), JPEG via the SOF walk
    on just the rows whose magic says JPEG, everything else 'unknown'
    with 0x0 dims. No decode -- pure byte reads."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes, head = _header_matrix(payloads)
        n = len(pdf)
        fmt = np.full(n, "unknown", dtype=object)
        width = np.zeros(n, dtype=np.int64)
        height = np.zeros(n, dtype=np.int64)

        is_png = (n_bytes >= 24) & np.all(head[:, :8] == _PNG_SIG, axis=1)
        fmt[is_png] = "png"
        width[is_png] = _be32(head, 16)[is_png]
        height[is_png] = _be32(head, 20)[is_png]

        is_jpeg = (
            (n_bytes >= 3)
            & (head[:, 0] == 0xFF) & (head[:, 1] == 0xD8) & (head[:, 2] == 0xFF)
            & ~is_png
        )
        fmt[is_jpeg] = "jpeg"
        if is_jpeg.any():
            pl = payloads.to_numpy()
            for i in np.flatnonzero(is_jpeg):
                width[i], height[i] = _jpeg_dims(bytes(pl[i]))

        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "format": fmt,
                "width": width.astype("int32"),
                "height": height.astype("int32"),
            }
        )


def extract_image_metadata(binary_docs: DataFrame) -> DataFrame:
    """Real PNG/JPEG header dims (no codec libs, byte reads only)."""
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _extract_image_meta, schema=IMAGE_META_SCHEMA
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bpp BMP -> HxWx3 uint8 (RGB).

    Pure struct reads + numpy reshape, no codec library: pixel offset
    u32@10, width i32@18, height i32@22, bpp u16@28; rows bottom-up,
    4-byte padded, BGR order."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bpp BMP (got bpp={bpp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """Inverse of decode_bmp (test fixture + real writer): HxWx3 uint8
    RGB -> uncompressed 24-bpp bottom-up BMP bytes."""
    import struct

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    REAL for uncompressed BMP (decode_bmp, pure numpy/struct).
    Compressed formats (PNG zlib, JPEG DCT) need codec libraries that
    are not in this container -> NotImplementedError; their header
    metadata still parses for real via extract_image_metadata, and the
    deterministic fake_decode_image keeps downstream plumbing testable."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "compressed-image decode requires PIL/libjpeg, not present in "
            "this container; BMP decodes for real, deterministic fake "
            "available via fake_decode_image"
        )
    raise AssertionError("unreachable")


def fake_decode_image(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic fake decode: tile the payload bytes into an HxWx3
    array -- lets downstream feature-extract plumbing run for real."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = w * h * 3
    reps = need // max(len(buf), 1) + 1
    return np.tile(buf, reps)[:need].reshape(h, w, 3)


def resize_nn(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize -- REAL numpy kernel (no codec libs
    needed), the shape a bilinear/letterbox preprocessor would have."""
    h, w = frame.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return frame[ys][:, xs]


def sample_frames(payload: bytes, n_frames: int, w: int = 8, h: int = 8) -> np.ndarray:
    """Frame sampling for a fake 'video' payload: split the byte stream
    into n_frames equal spans and fake-decode each -- the uniform-stride
    frame sampler's plumbing (n_frames x H x W x 3)."""
    span = max(len(payload) // n_frames, 1)
    return np.stack(
        [
            fake_decode_image(payload[i * span : (i + 1) * span] or payload, w, h)
            for i in range(n_frames)
        ]
    )


# ------------------------------------------------------ audio (WAV PCM)


def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL parser for PCM 16-bit WAV -> (sample_rate, n_channels,
    samples int16 [frames x channels]). Pure struct reads + frombuffer
    (RIFF chunk walk; no audio library)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate = channels = bits = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, i + 8
            )
        elif cid == b"data":
            if bits != 16:
                raise NotImplementedError(f"only 16-bit PCM (got {bits})")
            raw = np.frombuffer(payload, dtype="<i2", count=clen // 2, offset=i + 8)
            return rate, channels, raw.reshape(-1, channels)
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("WAV data chunk not found")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of parse_wav (test fixture + real writer)."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_s double, rms double, zero_cross_rate double"
)


def _extract_audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio features from PCM bytes: duration, RMS level, zero
    crossing rate (a cheap voicing/noise proxy) -- numpy over the
    decoded int16 frames, per item (variable-length payloads)."""
    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "sample_rate", "n_channels", "n_frames",
            "duration_s", "rms", "zero_cross_rate",
        )}
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, ch, frames = parse_wav(bytes(payload))
            mono = frames.astype(np.float64).mean(axis=1)
            zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
                if len(mono) > 1 else 0.0
            rows["doc_id"].append(int(did))
            rows["sample_rate"].append(rate)
            rows["n_channels"].append(ch)
            rows["n_frames"].append(len(frames))
            rows["duration_s"].append(round(len(frames) / rate, 6))
            rows["rms"].append(round(float(np.sqrt(np.mean(mono**2))), 4))
            rows["zero_cross_rate"].append(round(zc, 6))
        yield pd.DataFrame(rows)


def extract_audio_features(binary_docs: DataFrame) -> DataFrame:
    """WAV payloads -> typed audio features (Arrow-batched, REAL parse)."""
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _extract_audio_features, schema=AUDIO_FEATURE_SCHEMA
    )


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


VIDEO_FEATURE_SCHEMA = (
    "doc_id long, n_frames int, thumb_mean double, motion double"
)


def _extract_video_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video-shaped kernel: sample 4 frames, resize each to 4x4, emit a
    thumbnail mean + frame-to-frame motion proxy (mean abs diff)."""
    for pdf in batches:
        rows = {"doc_id": [], "n_frames": [], "thumb_mean": [], "motion": []}
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = sample_frames(payload, 4)
            thumbs = np.stack([resize_nn(f, 4, 4) for f in frames]).astype(np.float64)
            rows["doc_id"].append(int(did))
            rows["n_frames"].append(len(frames))
            rows["thumb_mean"].append(float(thumbs.mean()))
            rows["motion"].append(float(np.abs(np.diff(thumbs, axis=0)).mean()))
        yield pd.DataFrame(rows)


def extract_video_features(binary_docs: DataFrame) -> DataFrame:
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _extract_video_features, schema=VIDEO_FEATURE_SCHEMA
    )


# ------------------------------------------------- perceptual image hash


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash (aHash, the classic perceptual-hash family):
    grayscale the frame, resize to 8x8, threshold each cell against the
    mean -- bit i set iff cell i is brighter than average. Visually
    similar images differ in few bits, so hamming distance <= r is the
    near-dup criterion. REAL numpy kernel; only the compressed-bitstream
    decode upstream is faked/stubbed in this sandbox."""
    gray = img.astype(np.float64).mean(axis=2)
    small = resize_nn(gray[..., None], 8, 8)[..., 0]
    bits = (small > small.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


IMAGE_HASH_SCHEMA = "doc_id long, fp long"


def _image_ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, fps = [], []
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = fake_decode_image(payload, 16, 16)
            # int64 view: Spark LongType; sign bit carries bit 63
            fps.append(np.uint64(ahash64(img)).astype(np.int64))
            ids.append(int(did))
        yield pd.DataFrame({"doc_id": ids, "fp": fps})


def image_ahash(binary_docs: DataFrame) -> DataFrame:
    """(doc_id, fp): 64-bit perceptual hash per image payload."""
    return binary_docs.select("doc_id", "payload").mapInPandas(
        _image_ahash, schema=IMAGE_HASH_SCHEMA
    )


def image_neardup_pairs(
    binary_docs: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Image near-dup pairs: perceptual hash -> EXACT pigeonhole
    segment-block join (reuses operators/dedup.py:simhash_pairs_blocked
    -- the same 100TB-safe shape: candidates equal on one of
    max_hamming+1 hash segments, bit_count verify on candidates only,
    never a cross join)."""
    from .dedup import simhash_pairs_blocked

    return simhash_pairs_blocked(image_ahash(binary_docs),
                                 max_hamming=max_hamming)
