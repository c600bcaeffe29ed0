"""Thumbnail + video frame-sample multimodal operators.

Pixel-level gates the SQL oracle can't express: box-filter correctness
of the resize, thumbnail codec round-trip, FVID partial decode equals
full decode, sequential-reference equivalence of the distributed frame
sampler, and the loud real-format guard."""

from __future__ import annotations

import numpy as np
import pytest

from whakoom_webscrapper_spark import imaging as I
from whakoom_webscrapper_spark import video as V
from whakoom_webscrapper_spark.operators import multimodal as M


# ---------------------------------------------------------------------------
# imaging.area_resize / thumb_dims (pure numpy)
# ---------------------------------------------------------------------------
def test_thumb_dims_contract():
    assert I.thumb_dims(160, 96, 64) == (64, 38)  # floor(96*64/160)
    assert I.thumb_dims(96, 160, 64) == (38, 64)
    assert I.thumb_dims(64, 64, 64) == (64, 64)  # at the cap: untouched
    assert I.thumb_dims(32, 48, 64) == (32, 48)  # never upscale
    assert I.thumb_dims(4096, 2, 64) == (64, 1)  # extreme aspect floors at 1


def test_area_resize_matches_naive_box_filter():
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(96, 160, 3), dtype=np.uint8)
    tw, th = 64, 38
    got = I.area_resize(px, tw, th)
    # naive reference: same window lattice, direct mean per block
    ys = (np.arange(th + 1) * 96 // th).clip(0, 96)
    xs = (np.arange(tw + 1) * 160 // tw).clip(0, 160)
    ref = np.zeros((th, tw, 3), dtype=np.uint8)
    for y in range(th):
        y0, y1 = ys[y], max(ys[y + 1], ys[y] + 1)
        for x in range(tw):
            x0, x1 = xs[x], max(xs[x + 1], xs[x] + 1)
            ref[y, x] = np.rint(
                px[y0:y1, x0:x1].astype(np.float64).mean(axis=(0, 1))
            ).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_area_resize_integer_downscale_preserves_mean():
    # exact 2x downscale of a constant-block image is lossless
    px = np.kron(
        np.arange(24, dtype=np.uint8).reshape(4, 6)[..., None] * 10,
        np.ones((2, 2, 3), dtype=np.uint8),
    ).astype(np.uint8)
    out = I.area_resize(px, 6, 4)
    assert np.array_equal(out, px[::2, ::2])


def test_area_resize_rejects_bad_target():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        I.area_resize(px, 0, 4)


# ---------------------------------------------------------------------------
# FVID codec (pure python)
# ---------------------------------------------------------------------------
def test_fvid_roundtrip_and_partial_decode():
    frames = [V.frame_pixels(7, f) for f in range(V.n_frames_of(7))]
    blob = V.encode_fvid(frames, V.fps_of(7))
    w, h, n, fps, offsets = V.fvid_header(blob)
    assert (w, h) == V.video_dims_of(7)
    assert n == len(frames) and fps == V.fps_of(7)
    assert offsets[-1] == len(blob)  # index table accounts for every byte
    for idx in (0, 3, n - 1):  # partial decode == original frame
        assert np.array_equal(V.decode_frame(blob, idx), frames[idx])


def test_fvid_rejects_malformed_input():
    with pytest.raises(ValueError):
        V.fvid_header(b"MP4\x00" + b"\x00" * 64)
    blob = V.encode_fvid([np.zeros((4, 4, 3), dtype=np.uint8)], 10)
    with pytest.raises(IndexError):
        V.decode_frame(blob, 5)


def test_real_format_guard_is_loud():
    with pytest.raises(NotImplementedError, match="no 'mp4' decoder"):
        V.decode_frame(b"\x00" * 32, 0, fmt="mp4")


def test_frames_temporally_coherent():
    # consecutive frames of one video are near (panned scene), frames of
    # different videos are far — the property a sampler should rely on
    a0, a1 = V.frame_pixels(3, 0), V.frame_pixels(3, 1)
    b0 = V.frame_pixels(4, 0)
    d_intra = np.abs(a0.astype(int) - a1.astype(int)).mean()
    assert d_intra < 30
    assert I.phash64(a0) != I.phash64(b0)


# ---------------------------------------------------------------------------
# Spark operators (distributed == sequential reference)
# ---------------------------------------------------------------------------
def test_thumbnail_operator_matches_sequential(spark):
    from whakoom_webscrapper_spark import images_corpus as IC

    img = IC.read(spark).limit(40)
    rows = {r["image_id"]: r for r in M.thumbnail(img).collect()}
    src = {r["image_id"]: r for r in img.collect()}
    assert rows.keys() == src.keys()
    for img_id, r in rows.items():
        s = src[img_id]
        px = I.decode_image(bytes(s["bytes"]), s["fmt"])
        tw, th = I.thumb_dims(s["w"], s["h"], M.THUMB_MAX_DIM)
        expect = px if (tw, th) == (s["w"], s["h"]) else I.area_resize(px, tw, th)
        assert (r["thumb_w"], r["thumb_h"]) == (tw, th)
        got = I.decode_png(bytes(r["thumb_bytes"]))
        assert np.array_equal(got, expect)  # PNG thumb is lossless
        assert r["thumb_phash"] == I.phash64(expect)


def test_sample_frames_matches_sequential(spark):
    vids = V.read(spark).limit(25)
    got = M.sample_frames(vids, every_k=4).collect()
    by_vid: dict[str, list] = {}
    for r in got:
        by_vid.setdefault(r["video_id"], []).append(r)
    src = {r["video_id"]: r for r in vids.collect()}
    assert by_vid.keys() == src.keys()
    for vid, frames in by_vid.items():
        s = src[vid]
        want_idx = list(range(0, s["n_frames"], 4))
        assert sorted(r["frame_idx"] for r in frames) == want_idx
        for r in frames:
            px = V.decode_frame(bytes(s["bytes"]), r["frame_idx"])
            assert (r["frame_w"], r["frame_h"]) == (s["w"], s["h"])
            assert r["ts_ms"] == r["frame_idx"] * 1000 // s["fps"]
            assert r["frame_phash"] == I.phash64(px)


def test_sample_frames_rejects_bad_stride(spark):
    with pytest.raises(ValueError):
        M.sample_frames(V.read(spark), every_k=0)
