"""Real baseline JPEG (JFIF) codec — pure numpy + stdlib, no PIL/libjpeg.

Retires the round-1/2 "FJPG" quantize+zlib stand-in (VERDICT r2 item 4):
the lossy path of the image+caption table (reference cover-image
touchpoint: 001_initial_schema.sql:84-85; north-rule per-row invariant
"PSNR≥40dB for lossy", BASELINE.json:15) now sees REAL DCT artifacts —
8x8 block DCT, Annex-K quantization tables scaled to quality 95, zigzag
run-length coding, and the standard baseline Huffman tables, wrapped in
real JFIF markers (SOI/APP0/DQT/SOF0/DHT/SOS/EOI with 0xFF byte
stuffing). Output decodes in any stock JPEG viewer.

Scope (encoder): baseline sequential, 8-bit, YCbCr 4:4:4 (no chroma
subsampling — keeps the PSNR headroom the ≥40 dB gate needs even on
noise-heavy synthetic images), standard Huffman tables, no restart
markers. Scope (decoder): baseline sequential, 8-bit, 1- or 3-component,
1x1 sampling (4:4:4 / grayscale), any DQT/DHT layout, restart markers
honored if present.

Performance notes (this is the honest slow path, like any codec, but the
loops are bounded to where the format forces them):
- DCT/IDCT, quantization, zigzag, color transforms: fully vectorized
  over all blocks of an image at once (one matmul pair per image side).
- Huffman DECODE: table-lookup — a 2^16 flat LUT maps the next 16 bits
  to (symbol, code length), so the per-symbol loop is O(1) Python list
  indexing (the bit window for every offset is precomputed vectorized).
- Huffman ENCODE: symbols and magnitude bits are gathered per block
  (loop over nonzero coefficients only), then bit-packed in one
  vectorized pass (ragged arange + packbits).
"""

from __future__ import annotations

import struct

import numpy as np

QUALITY = 98  # IJG scaling; q98 keeps PSNR >40 dB even on noise-heavy images

# Annex K, Table K.1 / K.2 — the standard quantization tables
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# zigzag order: _ZIGZAG[i] = natural (row-major) index of the i-th zigzag coef
def _zigzag_order() -> np.ndarray:
    # within diagonal s=r+c: odd s runs top-right -> bottom-left (ascending
    # row), even s the reverse (ascending column) — ITU T.81 Figure 5;
    # first entries must be 0, 1, 8, 16, 9, 2, ...
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K standard Huffman tables: (bits[1..16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical code construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, list[int]] = {}


def _huff_decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Flat 2^16 LUT: next-16-bits -> (symbol << 8) | code_length.
    0 marks an invalid prefix (no code is length 0). Cached by table
    content — the standard tables build once per process, not per image."""
    key = (tuple(bits), tuple(vals))
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = [0] * (1 << 16)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            base = code << (16 - length)
            packed = (sym << 8) | length
            for idx in range(base, base + (1 << (16 - length))):
                lut[idx] = packed
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = lut
    return lut


_FLUT_CACHE: dict[tuple, list[int]] = {}

# fused-LUT entry layout (0 = not coverable in 16 bits -> slow path):
#   bits 0-4   total bits consumed (code + magnitude)
#   bits 5-8   zero-run length (AC only)
#   bits 9-21  value + 4096 (DC diff or AC coefficient; 0 only for DC s=0)
#   bit  29    ZRL (AC)
#   bit  30    EOB (AC)
_F_ZRL = 1 << 29
_F_EOB = 1 << 30


def _huff_fused_lut(bits: list[int], vals: list[int], is_ac: bool) -> list[int]:
    """Flat 2^16 LUT resolving code AND magnitude in one window read
    (the classic libjpeg-turbo fast path): next-16-bits -> packed
    (total_bits, run, extended value) whenever code length + magnitude
    size fit the window, 0 otherwise (decoder falls back to the two-step
    symbol LUT). Vectorized build, cached by table content."""
    key = (tuple(bits), tuple(vals), is_ac)
    cached = _FLUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int64)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            base = code << (16 - length)
            span = 1 << (16 - length)
            if is_ac and sym == 0x00:
                lut[base : base + span] = _F_EOB | length
            elif is_ac and sym == 0xF0:
                lut[base : base + span] = _F_ZRL | length
            else:
                run, size = (sym >> 4, sym & 15) if is_ac else (0, sym)
                if length + size <= 16:
                    if size == 0:  # DC diff of 0
                        lut[base : base + span] = (4096 << 9) | length
                    else:
                        suffix = np.arange(span, dtype=np.int64)
                        mag = suffix >> (16 - length - size)
                        val = np.where(
                            mag >= (1 << (size - 1)), mag, mag - (1 << size) + 1
                        )
                        lut[base : base + span] = (
                            ((val + 4096) << 9) | (run << 5) | (length + size)
                        )
                # else: leave 0 -> slow path
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    _FLUT_CACHE[key] = out
    return out


_ENC_DC = (_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))


def _codes_as_arrays(tab: dict[int, tuple[int, int]], n: int):
    code = np.zeros(n, dtype=np.int64)
    ln = np.zeros(n, dtype=np.int64)
    for sym, (c, l) in tab.items():
        code[sym], ln[sym] = c, l
    return code, ln


# numpy views of the encoder tables for the vectorized symbol stream
_DC_CODE, _DC_LEN = zip(*(_codes_as_arrays(t, 12) for t in _ENC_DC))
_AC_CODE, _AC_LEN = zip(*(_codes_as_arrays(t, 256) for t in _ENC_AC))

_DCT8 = None


def _dct8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8).reshape(-1, 1)
        i = np.arange(8).reshape(1, -1)
        m = np.sqrt(2.0 / 8) * np.cos(np.pi * (2 * i + 1) * k / 16.0)
        m[0] /= np.sqrt(2.0)
        _DCT8 = m
    return _DCT8


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2] + 128.0
    cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    # float32 throughout: the decode side's arithmetic fits comfortably in
    # 24-bit mantissas (coefficients ≤ 2^15), and halving the element size
    # halves the memory traffic of the widest per-image temporaries —
    # measured directly as scaling headroom when many workers share one bus
    y = ycc[..., 0].astype(np.float32, copy=False)
    cb = ycc[..., 1].astype(np.float32, copy=False) - np.float32(128.0)
    cr = ycc[..., 2].astype(np.float32, copy=False) - np.float32(128.0)
    r = y + np.float32(1.402) * cr
    g = y - np.float32(0.344136) * cb - np.float32(0.714136) * cr
    b = y + np.float32(1.772) * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and split into
    (n_blocks, 8, 8) in raster order."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    by, bx = hh // 8, ww // 8
    blocks = chan.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _unblockify(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return full[:h, :w]


# ---------------------------------------------------------------------------
# Bit packing (encoder side) — vectorized ragged concatenation
# ---------------------------------------------------------------------------
def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    if len(lens) == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    return np.arange(ends[-1]) - np.repeat(ends - lens, lens)


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate each vals[i]'s low lens[i] bits (MSB first) into a
    byte-aligned stream, 1-padded, with JPEG 0xFF byte stuffing."""
    vals = vals.astype(np.int64)
    lens = lens.astype(np.int64)
    keep = lens > 0
    vals, lens = vals[keep], lens[keep]
    total = int(lens.sum())
    pad = (-total) % 8
    bits = np.ones(total + pad, dtype=np.uint8)  # spec: pad with 1s
    if total:
        local = _ragged_arange(lens)
        shift = np.repeat(lens, lens) - 1 - local
        bits[:total] = (np.repeat(vals, lens) >> shift) & 1
    by = np.packbits(bits)
    # byte stuffing: 0xFF -> 0xFF 0x00
    ff = by == 0xFF
    if ff.any():
        out = np.zeros(len(by) + int(ff.sum()), dtype=np.uint8)
        pos = np.arange(len(by)) + np.cumsum(ff) - ff  # insert AFTER each FF
        out[pos] = by
        return out.tobytes()
    return by.tobytes()


def _magnitude(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """JPEG magnitude coding: category (bit size) and the size low bits."""
    size = np.zeros(v.shape, dtype=np.int64)
    nz = v != 0
    size[nz] = np.floor(np.log2(np.abs(v[nz]))).astype(np.int64) + 1
    bits = np.where(v >= 0, v, v + (1 << size) - 1)
    return size, bits


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def _entropy_encode(comp_zz: list[np.ndarray], n_blocks: int) -> bytes:
    """Vectorized baseline entropy coding of 4:4:4 zigzag coefficients.

    Every (code, nbits) element of the final bitstream is materialized as
    flat numpy arrays with a (block, component, seq) sort key, then
    ordered with one lexsort — MCU interleave (Y,Cb,Cr per block), ZRL
    runs before their symbol, EOB last — and packed in one pass. No
    per-coefficient Python loop: the only loops are over the 3
    components. seq layout: DC code=0, DC mag=1; an AC entry at zigzag
    position k emits its ZRLs/symbol/magnitude at k*8+1..k*8+5 (nzrl ≤ 3
    since k ≤ 63, so slots never collide across coefficients); EOB=64*8.
    """
    blocks_l, comps_l, seqs_l, vals_l, lens_l = [], [], [], [], []

    def emit(block, comp, seq, val, ln):
        blocks_l.append(block)
        comps_l.append(np.full(len(block), comp, dtype=np.int64))
        seqs_l.append(seq)
        vals_l.append(val)
        lens_l.append(ln)

    blk_idx = np.arange(n_blocks, dtype=np.int64)
    for ci in range(3):
        t = 0 if ci == 0 else 1
        zz = comp_zz[ci]
        # DC differential
        diff = np.diff(zz[:, 0], prepend=np.int64(0))
        size, magbits = _magnitude(diff)
        emit(blk_idx, ci, np.zeros(n_blocks, np.int64), _DC_CODE[t][size], _DC_LEN[t][size])
        emit(blk_idx, ci, np.ones(n_blocks, np.int64), magbits, size)
        # AC run-length
        nzb, nzk0 = np.nonzero(zz[:, 1:])
        k = nzk0.astype(np.int64) + 1
        v = zz[nzb, k]
        first = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            first[1:] = nzb[1:] != nzb[:-1]
        prevk = np.where(first, 0, np.concatenate(([0], k[:-1])))
        run = k - prevk - 1
        nzrl = run >> 4
        rem = run & 15
        asize, amag = _magnitude(v)
        sym = (rem << 4) | asize
        counts = nzrl + 2
        rep = np.repeat(np.arange(len(k), dtype=np.int64), counts)
        pos = _ragged_arange(counts)
        rel = pos - nzrl[rep]  # -nzrl..-1 = ZRLs, 0 = symbol, 1 = magnitude
        evals = np.where(
            rel < 0,
            _AC_CODE[t][0xF0],
            np.where(rel == 0, _AC_CODE[t][sym][rep], amag[rep]),
        )
        elens = np.where(
            rel < 0,
            _AC_LEN[t][0xF0],
            np.where(rel == 0, _AC_LEN[t][sym][rep], asize[rep]),
        )
        emit(nzb[rep].astype(np.int64), ci, k[rep] * 8 + rel + 4, evals, elens)
        # EOB for blocks whose last nonzero isn't coefficient 63
        lastk = np.zeros(n_blocks, dtype=np.int64)
        lastk[nzb] = k  # row-major nonzero order → last write per block wins
        eob = np.nonzero(lastk != 63)[0].astype(np.int64)
        emit(
            eob, ci, np.full(len(eob), 64 * 8, np.int64),
            np.full(len(eob), _AC_CODE[t][0x00], np.int64),
            np.full(len(eob), _AC_LEN[t][0x00], np.int64),
        )

    blocks = np.concatenate(blocks_l)
    comps = np.concatenate(comps_l)
    seqs = np.concatenate(seqs_l)
    vals = np.concatenate(vals_l)
    lens = np.concatenate(lens_l)
    order = np.lexsort((seqs, comps, blocks))
    return _pack_bits(vals[order], lens[order])


def encode_jpeg(pixels: np.ndarray, quality: int = QUALITY) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (YCbCr 4:4:4)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8")
    qt = (_scaled_qtable(_QT_LUMA, quality), _scaled_qtable(_QT_CHROMA, quality))
    ycc = _rgb_to_ycbcr(pixels)
    d = _dct8()

    comp_zz = []
    for ci in range(3):
        blocks, by, bx = _blockify(ycc[..., ci] - 128.0)
        freq = np.einsum("ij,njk,lk->nil", d, blocks, d)
        q = qt[0 if ci == 0 else 1].reshape(8, 8)
        coefs = np.round(freq / q).astype(np.int64).reshape(-1, 64)
        comp_zz.append(coefs[:, _ZIGZAG])
    n_blocks = comp_zz[0].shape[0]

    entropy = _entropy_encode(comp_zz, n_blocks)

    # ---- markers ----
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qt):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in q[_ZIGZAG]
        )
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])  # 1x1 sampling
    for tclass, tid, bits, hvals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(hvals), (tclass << 4) | tid
        ) + bytes(bits) + bytes(hvals)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])  # (dc<<4)|ac table
    out += b"\x00\x3F\x00"  # spectral 0..63, approx 0
    out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
_IDCT_KQ_CACHE: dict[bytes, np.ndarray] = {}


def _idct_kq(q: np.ndarray) -> np.ndarray:
    """(64,64) float32 matrix mapping a raw (quantized) coefficient block
    in row-major natural order straight to spatial samples:
    spatial_flat = coeff_flat @ KQ. Built in float64 (kron(Dᵀ,Dᵀ) with
    the dequantization q folded in as input-side scaling), cast once.
    Cached by quant-table content — one entry per table seen."""
    key = q.tobytes()
    kq = _IDCT_KQ_CACHE.get(key)
    if kq is None:
        d = _dct8()  # float64 orthonormal DCT-II matrix
        m = np.kron(d.T, d.T)  # spatial_flat = m @ freq_flat
        kq = (m * q.astype(np.float64)[None, :]).T.astype(np.float32)
        kq = np.ascontiguousarray(kq)
        _IDCT_KQ_CACHE[key] = kq
    return kq


def _extend(mag: int, size: int) -> int:
    return mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB. Supports 8-bit baseline,
    1 or 3 components, 1x1 sampling, restart markers.

    Malformed input always surfaces as ``ValueError``: truncated or
    corrupt streams would otherwise leak ``IndexError``/``struct.error``
    from the marker parse or entropy loop (e.g. entropy data cut
    mid-block indexing past the buffer), which callers catching
    ValueError for bad blobs would miss (ADVICE r3)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream: {e!r}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list[int]] = {}
    ac_luts: dict[int, list[int]] = {}
    dc_fast: dict[int, list[int]] = {}
    ac_fast: dict[int, list[int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    scan_comps: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zz.astype(np.int32)
                qtables[tq] = nat
                bpos += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("only 1x1 sampling (4:4:4/gray) supported")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                tclass, tid = body[bpos] >> 4, body[bpos] & 15
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                hvals = list(body[bpos + 17 : bpos + 17 + nv])
                lut = _huff_decode_lut(bits, hvals)
                (dc_luts if tclass == 0 else ac_luts)[tid] = lut
                (dc_fast if tclass == 0 else ac_fast)[tid] = _huff_fused_lut(
                    bits, hvals, is_ac=(tclass == 1)
                )
                bpos += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tabs >> 4, "ac": tabs & 15}
                )
            pos += seglen
            break
        pos += seglen
    if not scan_comps or h == 0:
        raise ValueError("missing SOF/SOS")

    # ---- gather entropy bytes (unstuff FF00; stop at a real marker) ----
    # vectorized: locate every 0xFF, classify its follower, cut at the
    # first real marker, drop stuffed zeros, record RST bit boundaries
    tail = np.frombuffer(data, dtype=np.uint8)[pos:]
    ff = np.nonzero(tail[:-1] == 0xFF)[0]
    follower = tail[ff + 1]
    real = ff[(follower != 0x00) & ~((follower >= 0xD0) & (follower <= 0xD7))]
    end = int(real[0]) if len(real) else len(tail)
    seg = tail[:end]
    ffseg = ff[ff < end]
    fol = tail[ffseg + 1]
    drop = np.concatenate(
        [ffseg[fol == 0x00] + 1,  # the stuffed 0x00 after a literal 0xFF
         ffseg[(fol >= 0xD0) & (fol <= 0xD7)],  # RST marker bytes (both)
         ffseg[(fol >= 0xD0) & (fol <= 0xD7)] + 1]
    )
    rst_pos = np.sort(ffseg[(fol >= 0xD0) & (fol <= 0xD7)])
    if len(drop):
        keep = np.ones(end, dtype=bool)
        keep[drop] = False
        # bit offset of each RST in the UNSTUFFED stream
        kept_before = np.cumsum(keep) - keep.astype(np.int64)
        restarts = [int(kept_before[p]) * 8 for p in rst_pos]
        seg = seg[keep]
    else:
        restarts = []
    # 16-bit window at any bit offset, computed on the fly from 3 bytes —
    # no precomputed window array (profiling showed the O(bits) window
    # materialization dominating small-image decode)
    buf = seg.tobytes() + b"\x00\x00\x00"

    by, bx = (h + 7) // 8, (w + 7) // 8
    n_blocks = by * bx
    ncomp = len(scan_comps)
    luts_dc = [dc_luts[c["dc"]] for c in scan_comps]
    luts_ac = [ac_luts[c["ac"]] for c in scan_comps]
    fast_dc = [dc_fast[c["dc"]] for c in scan_comps]
    fast_ac = [ac_fast[c["ac"]] for c in scan_comps]

    # decoded coefficients accumulate as (flat natural position, value)
    # Python lists, bulk-scattered after the loop. The loop is the format-
    # forced serial part, so it is tuned hard: bound .append methods, a
    # Python-list zigzag (numpy scalar indexing costs ~100 ns/lookup),
    # one flat index per coefficient instead of (row, col) pairs.
    out_pos = [[] for _ in range(ncomp)]
    out_vals = [[] for _ in range(ncomp)]
    pos_app = [p.append for p in out_pos]
    val_app = [v.append for v in out_vals]
    zz = _ZIGZAG.tolist()

    bp = 0  # bit position
    preds = [0] * ncomp
    mcu = 0
    while mcu < n_blocks:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # skip to the recorded restart boundary ≥ current position
            nxt = min((r for r in restarts if r >= bp), default=None)
            if nxt is not None:
                bp = nxt
            preds = [0] * ncomp
        base = mcu << 6
        for ci in range(ncomp):
            pappend = pos_app[ci]
            vappend = val_app[ci]
            i = bp >> 3
            win = (((buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2])
                   >> (8 - (bp & 7))) & 0xFFFF
            e = fast_dc[ci][win]
            if e:  # code + magnitude resolved by one window read
                bp += e & 31
                preds[ci] += (e >> 9) - 4096
            else:  # code wider than 16-size bits, or invalid prefix
                packed = luts_dc[ci][win]
                if packed == 0:
                    raise ValueError("bad Huffman prefix (DC)")
                s = packed >> 8
                bp += packed & 0xFF
                if s:
                    i = bp >> 3
                    win = (((buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2])
                           >> (8 - (bp & 7))) & 0xFFFF
                    bp += s
                    mag = win >> (16 - s)
                    preds[ci] += (
                        mag if mag >= (1 << (s - 1)) else mag - (1 << s) + 1
                    )
            pappend(base)
            vappend(preds[ci])
            k = 1
            flut = fast_ac[ci]
            lut = luts_ac[ci]
            while k < 64:
                i = bp >> 3
                win = (((buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2])
                       >> (8 - (bp & 7))) & 0xFFFF
                e = flut[win]
                if e:
                    bp += e & 31
                    if e >= _F_ZRL:
                        if e & _F_EOB:
                            break  # EOB
                        k += 16  # ZRL
                        continue
                    k += (e >> 5) & 15
                    if k < 64:
                        pappend(base + zz[k])
                        vappend((e >> 9) - 4096)
                    k += 1
                    continue
                packed = lut[win]
                if packed == 0:
                    raise ValueError("bad Huffman prefix (AC)")
                sym = packed >> 8
                bp += packed & 0xFF
                if sym == 0:
                    break  # EOB
                size = sym & 15
                if size == 0:
                    if sym != 0xF0:
                        raise ValueError(f"bad AC symbol {sym:#x}")
                    k += 16
                    continue
                k += sym >> 4
                i = bp >> 3
                win = (((buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2])
                       >> (8 - (bp & 7))) & 0xFFFF
                bp += size
                if k < 64:
                    mag = win >> (16 - size)
                    pappend(base + zz[k])
                    vappend(
                        mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
                    )
                k += 1
        mcu += 1

    # ---- dequantize + IDCT: ONE flat float32 GEMM per component ----
    # vec(Dᵀ·F·D) = kron(Dᵀ,Dᵀ)·vec(F) (row-major), so the whole 2-D IDCT
    # is a single (n_blocks,64)@(64,64) matmul — and the dequantization
    # folds into that matrix (column scaling), so the scattered raw
    # coefficients go straight to pixels: no dequant pass, no transposes,
    # no ascontiguousarray copies between half-transforms. 4× the MACs of
    # the separable form but one BLAS call at its favorite shape and ~⅓
    # the memory traffic; float32 is exact enough for the PSNR≥40 gate
    # (coefficient magnitudes ≤ 2^15 vs a 24-bit mantissa).
    planes = []
    for ci, sc in enumerate(scan_comps):
        kq = _idct_kq(qtables[sc["tq"]])
        nat = np.zeros(n_blocks * 64, dtype=np.float32)
        nat[np.array(out_pos[ci], dtype=np.int64)] = out_vals[ci]
        spatial = (nat.reshape(-1, 64) @ kq + np.float32(128.0)).reshape(
            -1, 8, 8
        )
        planes.append(_unblockify(spatial, by, bx, h, w))
    if ncomp == 1:
        gray = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
