"""Image codec + perceptual hashing for the image+caption table.

The reference stores cover-image paths and enrichment metadata
(reference: 001_initial_schema.sql:84-85, README.md:136-137); the north
rule upgrades this to real binary image columns with decode, pHash
recomputation, and PSNR validation inside vectorized pandas UDFs
(BASELINE.json:15).

Container note: PIL/OpenCV are NOT available in this sandbox, so both
codecs are REAL and self-contained (pure numpy + stdlib):

- ``png``  — stdlib zlib + struct, numpy row filters. Encodes 8-bit RGB
  with per-row filter 0; decodes any 8-bit RGB/RGBA/gray PNG with
  filters 0-4. Lossless → exact pixel equality oracle.
- ``jpeg`` — a real baseline JFIF codec (``jpeg.py``): 8x8 block DCT,
  Annex-K quantization, standard Huffman tables, zigzag RLE, 0xFF byte
  stuffing — output decodes in any stock viewer. This retires the
  round-1/2 "FJPG" stand-in; the lossy path (decode → PSNR≥40 dB,
  BASELINE.json:15) now sees real DCT artifacts. ``decode_image``
  sniffs the signature so FJPG blobs from pre-round-3 tables still
  decode (legacy back-compat only — nothing encodes FJPG anymore).

Everything operates on ``numpy`` arrays; the Spark entry points are the
pandas UDFs in ``operators/fetch.py`` built on these.

pHash: classic 64-bit DCT hash — resize to 32x32 grayscale (area
average), 2-D DCT-II, take the top-left 8x8 block minus DC, threshold at
the median. Matches across lossless re-encodes; Hamming-close under the
fake-lossy quantization.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_SIG = b"FJPG"
_FJPG_QSTEP = 4  # quantization step: noise std ~1.15 → PSNR ~47 dB


# ---------------------------------------------------------------------------
# PNG (real codec)
# ---------------------------------------------------------------------------
def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 → PNG bytes (filter 0, 8-bit RGB)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters 0-4. Row-sequential by necessity (spec), but
    vectorized within each row where the filter allows."""
    rows = raw.reshape(h, 1 + stride)
    if not rows[:, 0].any():  # all filter 0 (our encoder) → single slice
        return rows[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = cur.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((cur + prev) & 0xFF).astype(np.uint8)
        else:  # Sub / Average / Paeth need left neighbor → per-pixel scan
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                elif ftype == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                line[x] = (cur[x] + pred) & 0xFF
            out[y] = line.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → HxWx3 uint8 (gray/RGBA normalized to RGB)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    px = _unfilter(raw.copy(), h, stride, channels).reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 2:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif channels == 4:
        px = px[:, :, :3]
    return px


# ---------------------------------------------------------------------------
# FJPG (legacy round-1/2 stand-in — decode-only back-compat; superseded by
# the real baseline JPEG codec in jpeg.py)
# ---------------------------------------------------------------------------
def encode_fjpg(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // _FJPG_QSTEP).astype(np.uint8)
    return (
        _FJPG_SIG
        + struct.pack(">IIB", w, h, _FJPG_QSTEP)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_fjpg(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_SIG:
        raise ValueError("not an FJPG")
    w, h, qstep = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    # dequantize to bin centers (adds qstep/2), clip to byte range
    px = np.clip(q.astype(np.int32) * qstep + qstep // 2, 0, 255)
    return px.astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------
def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from whakoom_webscrapper_spark import jpeg

        return jpeg.encode_jpeg(pixels)
    raise NotImplementedError(f"no codec for fmt={fmt!r} in this container")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == _FJPG_SIG:  # legacy pre-round-3 tables
            return decode_fjpg(data)
        from whakoom_webscrapper_spark import jpeg

        return jpeg.decode_jpeg(data)
    raise NotImplementedError(f"no codec for fmt={fmt!r} in this container")


# ---------------------------------------------------------------------------
# pHash + PSNR
# ---------------------------------------------------------------------------
def _area_resize_32(gray: np.ndarray) -> np.ndarray:
    """Area-average resize to 32x32 (nearest-block; deterministic).
    Fully vectorized: block sums gathered from the 2-D prefix sum with
    outer fancy-indexing — no per-block Python loop (the loop form cost
    ~2 ms/image and dominated validation CPU)."""
    h, w = gray.shape
    ys = (np.arange(33) * h // 32).clip(0, h)
    xs = (np.arange(33) * w // 32).clip(0, w)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    ps = np.zeros((h + 1, w + 1), dtype=np.float64)
    ps[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    s = (
        ps[np.ix_(y1, x1)]
        - ps[np.ix_(y0, x1)]
        - ps[np.ix_(y1, x0)]
        + ps[np.ix_(y0, x0)]
    )
    area = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    return s / area


def thumb_dims(w: int, h: int, max_dim: int = 64) -> tuple[int, int]:
    """Thumbnail dimensions: shrink so max(w,h)==max_dim preserving
    aspect (integer floor division), never upscale, never collapse a
    side below 1 px. Pure integer math — the DuckDB oracle replays this
    exact formula in SQL (queries.images_thumbnail_profile), so the
    engine's decode→resize path is checked against independent
    arithmetic, not against itself."""
    if max(w, h) <= max_dim:
        return w, h
    if w >= h:
        return max_dim, max(1, (h * max_dim) // w)
    return max(1, (w * max_dim) // h), max_dim


def area_resize(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Area-average resize HxWxC uint8 → thxtwxC uint8. Generalizes
    ``_area_resize_32`` to arbitrary targets: 2-D prefix sums + outer
    fancy-indexing, no per-block Python loop. Downscale is a true box
    filter; upscale degrades to nearest-block duplication via the
    min-1-px window clip (same convention as the pHash resizer)."""
    h, w, c = pixels.shape
    if tw < 1 or th < 1:
        raise ValueError(f"bad target {tw}x{th}")
    ys = (np.arange(th + 1) * h // th).clip(0, h)
    xs = (np.arange(tw + 1) * w // tw).clip(0, w)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    ps = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    ps[1:, 1:] = pixels.astype(np.float64).cumsum(0).cumsum(1)
    s = (
        ps[np.ix_(y1, x1)]
        - ps[np.ix_(y0, x1)]
        - ps[np.ix_(y1, x0)]
        + ps[np.ix_(y0, x0)]
    )
    area = np.outer(y1 - y0, x1 - x0).astype(np.float64)[:, :, None]
    return np.clip(np.rint(s / area), 0, 255).astype(np.uint8)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n).reshape(-1, 1)
        i = np.arange(n).reshape(1, -1)
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an HxWx3 uint8 image (signed int64,
    matching the ``phash:int64`` column in BASELINE.json:15)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _area_resize_32(gray)
    m = _dct_matrix()
    freq = m @ small @ m.T
    block = freq[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term for the threshold
    bits = (block > med).astype(np.uint64)
    bits[0] = 0  # DC bit fixed → hash depends on structure, not brightness
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    val = np.bitwise_or.reduce(bits * weights)
    return int(val.astype(np.int64))  # reinterpret as signed for int64 col


# ---------------------------------------------------------------------------
# Feature extraction: deterministic random-features image embedding.
# The multimodal pipeline's feature-extract stage: 8x8 grayscale patches →
# fixed seeded projection → tanh → second mixing layer → mean-pool →
# L2-normalized 64-d vector ("random kitchen sinks" style feature map —
# a fixed-weight stand-in for a learned encoder; the container has no
# torch/PIL, and the Spark-side plumbing — schema, batching, UDF shape —
# is identical to what a real CLIP-style encoder would use).
# ---------------------------------------------------------------------------
_FEAT_SEED = 1234
_FEAT_W1 = None
_FEAT_W2 = None


def _feat_weights() -> tuple[np.ndarray, np.ndarray]:
    global _FEAT_W1, _FEAT_W2
    if _FEAT_W1 is None:
        rng = np.random.default_rng(_FEAT_SEED)
        # float32: the tanh-mixing GEMM chain is the second-largest per-page
        # cost after JPEG decode; halving the element size halves its memory
        # traffic (scaling headroom on a shared bus) at no observable cost —
        # the embedding column is float32 anyway
        _FEAT_W1 = (rng.standard_normal((64, 64)) / 8.0).astype(np.float32)
        _FEAT_W2 = (rng.standard_normal((64, 64)) / 8.0).astype(np.float32)
    return _FEAT_W1, _FEAT_W2


def features64(pixels: np.ndarray, mix_iters: int = 6) -> np.ndarray:
    """64-d image embedding from 8x8 patches (stride 4) through a fixed
    random projection + ``mix_iters`` tanh mixing layers. ``mix_iters``
    tunes compute per image; deterministic for given pixels."""
    w1, w2 = _feat_weights()
    gray = pixels.astype(np.float32) @ np.array(
        [0.299, 0.587, 0.114], dtype=np.float32
    )
    gray = (gray - np.float32(128.0)) / np.float32(128.0)
    h, w = gray.shape
    ph = max((h - 8) // 4 + 1, 1)
    pw = max((w - 8) // 4 + 1, 1)
    # gather 8x8 patches at stride 4 via strided view → (n_patches, 64)
    s0, s1 = gray.strides
    patches = np.lib.stride_tricks.as_strided(
        gray, shape=(ph, pw, 8, 8), strides=(4 * s0, 4 * s1, s0, s1)
    ).reshape(ph * pw, 64)
    f = np.tanh(patches @ w1)
    for _ in range(mix_iters):
        f = np.tanh(f @ w2 + f)
    v = f.mean(axis=0)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
