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
# WAV codec + signal ops (pure python)
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    from whakoom_webscrapper_spark import audio as A

    mono = A.clip_samples(5)
    blob = A.encode_wav(mono, A.rate_of(5))
    got, rate = A.decode_wav(blob)
    assert rate == A.rate_of(5) and got.shape == (len(mono), 1)
    assert np.array_equal(got[:, 0], mono)
    stereo = np.stack([mono, (-mono.astype(np.int32)).clip(-32768, 32767).astype(np.int16)], axis=1)
    got2, _ = A.decode_wav(A.encode_wav(stereo, 16000))
    assert np.array_equal(got2, stereo)


def test_wav_rejects_malformed_and_real_formats():
    from whakoom_webscrapper_spark import audio as A

    with pytest.raises(ValueError):
        A.decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="no 'mp3' decoder"):
        A.decode_audio(b"\x00" * 32, fmt="mp3")


def test_resample_box_halves_and_antialiases():
    from whakoom_webscrapper_spark import audio as A

    s = np.arange(0, 2000, dtype=np.int16)
    out = A.resample_box(s, 2)
    assert len(out) == 1000
    # mean of consecutive pairs: (0+1)/2=0.5→round→0 (banker's), (2+3)/2=2.5→2
    assert np.array_equal(out[:3], np.rint(s[:6].reshape(3, 2).mean(axis=1)).astype(np.int16))
    assert np.array_equal(A.resample_box(s, 1), s)
    with pytest.raises(ValueError):
        A.resample_box(s, 0)


def test_window_features_reference():
    from whakoom_webscrapper_spark import audio as A

    s = A.clip_samples(9)
    rate = A.rate_of(9)
    rms, zcr = A.window_features(s, rate, win_ms=50)
    win = rate * 50 // 1000
    assert len(rms) == len(s) // win == len(zcr)
    w0 = s[:win].astype(np.float64)
    assert rms[0] == pytest.approx(np.sqrt((w0 * w0).mean()))
    signs = np.signbit(w0)
    assert zcr[0] == pytest.approx((signs[1:] != signs[:-1]).mean())
    # a pure tone's ZCR tracks 2*f0/rate — sanity that the feature means something
    f0 = 110.0 * (1 + 9 % 17)
    assert abs(zcr.mean() - 2 * f0 / rate) < 0.25


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


def test_audio_profile_matches_sequential(spark):
    from whakoom_webscrapper_spark import audio as A

    clips = A.read(spark).limit(30)
    rows = {r["audio_id"]: r for r in M.audio_profile(clips).collect()}
    src = {r["audio_id"]: r for r in clips.collect()}
    assert rows.keys() == src.keys()
    for aud_id, r in rows.items():
        s = src[aud_id]
        samples, rate = A.decode_wav(bytes(s["bytes"]))
        assert (r["sample_rate"], r["n_samples"]) == (rate, len(samples))
        assert r["duration_ms"] == len(samples) * 1000 // rate
        assert r["resampled_n"] == len(samples) // 2
        rms, zcr = A.window_features(samples, rate, win_ms=50)
        assert r["n_windows"] == len(rms)
        assert r["rms_mean"] == pytest.approx(float(rms.mean()))
        assert r["zcr_mean"] == pytest.approx(float(zcr.mean()))


def test_audio_profile_rejects_bad_factor(spark):
    from whakoom_webscrapper_spark import audio as A

    with pytest.raises(ValueError):
        M.audio_profile(A.read(spark), resample_factor=0)
