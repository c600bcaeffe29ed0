"""jobs/multimodal.py CLI end-to-end: each mode reads parquet, writes
parquet, and prints a stats line consistent with independent arithmetic
over the corpus metadata."""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import run_job


def test_thumbnail_job(spark, tmp_path, capsys):
    from jobs import multimodal as J
    from whakoom_webscrapper_spark import images_corpus as IC
    from whakoom_webscrapper_spark import imaging as I

    src = IC.materialize()
    out = str(tmp_path / "thumbs")
    stats = run_job(J, ["--input", src, "--out", out, "--mode", "thumbnail"], capsys)
    pdf = spark.read.parquet(out).toPandas()
    assert stats["rows_in"] == stats["rows_out"] == len(pdf)
    assert stats["shrunk"] == int((pdf[["w", "h"]].max(axis=1) > 64).sum())
    assert stats["thumb_bytes_total"] == int(pdf["thumb_bytes"].map(len).sum())
    # every thumbnail on disk decodes and has the claimed geometry
    r = pdf.iloc[0]
    px = I.decode_png(bytes(r["thumb_bytes"]))
    assert px.shape == (r["thumb_h"], r["thumb_w"], 3)


def test_frames_job(spark, tmp_path, capsys):
    from jobs import multimodal as J
    from whakoom_webscrapper_spark import video as V

    src = V.materialize()
    out = str(tmp_path / "frames")
    stats = run_job(
        J, ["--input", src, "--out", out, "--mode", "frames", "--every-k", "5"],
        capsys,
    )
    expect = sum(math.ceil(V.n_frames_of(i) / 5) for i in range(V.VIDEOS_N))
    assert stats["rows_out"] == expect
    assert stats["videos"] == V.VIDEOS_N
    pdf = spark.read.parquet(out).toPandas()
    assert len(pdf) == expect
    assert set(pdf["frame_idx"] % 5) == {0}


def test_audio_job(spark, tmp_path, capsys):
    from jobs import multimodal as J
    from whakoom_webscrapper_spark import audio as A

    src = A.materialize()
    out = str(tmp_path / "audio_prof")
    stats = run_job(J, ["--input", src, "--out", out, "--mode", "audio"], capsys)
    assert stats["rows_in"] == stats["rows_out"] == A.CLIPS_N
    expect_windows = sum(
        A.n_samples_of(i) // (A.rate_of(i) * 50 // 1000) for i in range(A.CLIPS_N)
    )
    assert stats["windows_total"] == expect_windows
    pdf = spark.read.parquet(out).toPandas()
    assert np.all(pdf["resampled_n"] == pdf["n_samples"] // 2)
