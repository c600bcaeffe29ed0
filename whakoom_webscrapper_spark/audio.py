"""Real WAV (RIFF PCM16) codec + deterministic audio-clip corpus.

Completes the directive's multimodal triple (image / audio / video) as
first-class binary-column operations. Unlike video (no ffmpeg in this
container → deterministic FVID stand-in), audio needs no stand-in at
all: RIFF/WAVE PCM16 is a real format a stock player decodes, and it is
fully implementable in numpy + struct — same policy as the real JPEG
codec in jpeg.py. Compressed formats (mp3/ogg/flac) hit an explicit
``NotImplementedError`` in ``decode_audio``.

The reference has no audio surface (its media handling stops at a
cover-image path, reference: 001_initial_schema.sql:84-85); this module
follows images_corpus.py / video.py exactly: the corpus is a pure
function of GLOBAL_SEED, pyarrow-written with an atomic publish, so the
DuckDB oracle reads the identical parquet and independently replays the
duration/resample arithmetic.

Clip content: a per-clip fundamental tone + one overtone + seeded
noise, amplitude-enveloped — deterministic, band-limited, and busy
enough that windowed RMS / zero-crossing features are non-trivial.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile

import numpy as np
import pandas as pd

from whakoom_webscrapper_spark import datagen as D

CLIPS_N = 400
_VERSION = 1

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_DIR = os.path.join(_REPO, "spark-warehouse", f"audio_corpus_v{_VERSION}")
CORPUS_PARQUET = os.path.join(CORPUS_DIR, "corpus.parquet")


# ---------------------------------------------------------------------------
# WAV codec (real format: RIFF/WAVE, PCM16 mono/stereo little-endian)
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 samples (n,) mono or (n, ch) → WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (int16 samples (n, ch), sample_rate). Walks
    the RIFF chunk list (fmt may be followed by LIST/fact chunks in
    the wild) and validates PCM16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, bits, pcm = 12, None, None, None, None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            pcm, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if pcm != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (got fmt={pcm}, bits={bits})")
    return samples.reshape(-1, ch), rate


def decode_audio(data: bytes, fmt: str = "wav") -> tuple[np.ndarray, int]:
    if fmt != "wav":
        raise NotImplementedError(
            f"no {fmt!r} decoder in this container (no libsndfile/ffmpeg); "
            "WAV PCM16 is the real, fully-supported path"
        )
    return decode_wav(data)


# ---------------------------------------------------------------------------
# Signal ops (numpy; the Spark entry points live in operators/multimodal.py)
# ---------------------------------------------------------------------------
def resample_box(samples: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor decimation with a box (mean) anti-alias filter —
    the audio analog of imaging.area_resize. Output length is
    ``len // factor`` (the tail partial window is dropped, matching the
    integer arithmetic the SQL oracle replays)."""
    if factor < 1:
        raise ValueError(f"factor must be >=1, got {factor}")
    if factor == 1:
        return samples.copy()
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    n = (len(mono) // factor) * factor
    out = mono[:n].reshape(-1, factor).mean(axis=1)
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


def window_features(samples: np.ndarray, rate: int, win_ms: int = 50):
    """Per-window RMS + zero-crossing rate over non-overlapping windows
    (the audio feature-extract stage). Returns (rms, zcr) float arrays
    of length n_samples // win_len; the tail partial window is dropped
    (same convention as resample_box)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    win = max(1, rate * win_ms // 1000)
    n = (len(mono) // win) * win
    if n == 0:
        return np.zeros(0), np.zeros(0)
    w = mono[:n].reshape(-1, win)
    rms = np.sqrt((w * w).mean(axis=1))
    signs = np.signbit(w)
    zcr = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
    return rms, zcr


# ---------------------------------------------------------------------------
# Deterministic corpus
# ---------------------------------------------------------------------------
def audio_id_of(i: int) -> str:
    return f"aud{i:08d}"


def rate_of(i: int) -> int:
    return (8000, 16000, 22050)[i % 3]


def n_samples_of(i: int) -> int:
    # 0.4–1.6 s of audio depending on rate
    return rate_of(i) * (2 + i % 7) // 5


def clip_samples(i: int) -> np.ndarray:
    """Mono int16 clip: fundamental + overtone + seeded noise, with an
    attack/decay envelope. Pure function of (GLOBAL_SEED, i)."""
    n, rate = n_samples_of(i), rate_of(i)
    rng = np.random.default_rng(D.GLOBAL_SEED * 4_100_011 + i)
    t = np.arange(n, dtype=np.float64) / rate
    f0 = 110.0 * (1 + i % 17)
    tone = np.sin(2 * np.pi * f0 * t) + 0.4 * np.sin(2 * np.pi * 2.5 * f0 * t)
    noise = rng.normal(0.0, 0.05, size=n)
    env = np.minimum(1.0, t * 20.0) * np.exp(-t * 1.5)
    sig = (tone + noise) * env * 12000.0
    return np.clip(np.rint(sig), -32768, 32767).astype(np.int16)


def corpus_pdf(n: int = CLIPS_N) -> pd.DataFrame:
    rows = []
    for i in range(n):
        s = clip_samples(i)
        rate = rate_of(i)
        rows.append(
            {
                "audio_id": audio_id_of(i),
                "bytes": encode_wav(s, rate),
                "sample_rate": rate,
                "n_samples": len(s),
                "channels": 1,
                "fmt": "wav",
                "caption": f"clip {audio_id_of(i)} tone {110 * (1 + i % 17)}hz",
            }
        )
    return pd.DataFrame(rows)


def materialize(n: int = CLIPS_N) -> str:
    """Write the corpus parquet if absent; atomic publish; returns path."""
    if os.path.exists(CORPUS_PARQUET):
        return CORPUS_PARQUET
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = corpus_pdf(n)
    schema = pa.schema(
        [
            ("audio_id", pa.string()),
            ("bytes", pa.binary()),
            ("sample_rate", pa.int32()),
            ("n_samples", pa.int32()),
            ("channels", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(CORPUS_DIR), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="audio_corpus_tmp_", dir=os.path.dirname(CORPUS_DIR))
    try:
        pq.write_table(table, os.path.join(tmp, "corpus.parquet"))
        try:
            os.replace(tmp, CORPUS_DIR)  # atomic on one filesystem
        except OSError:
            if not os.path.exists(CORPUS_PARQUET):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return CORPUS_PARQUET


def read(spark):
    """The corpus as a DataFrame (materializing on first use)."""
    return spark.read.parquet(materialize())
