"""Materialized image+caption corpus — the engine's input table, as a
standalone catalog table.

BASELINE.json's input hint names the exact table the crawl maintains:
``(image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64)``. The crawl builds and appends to that
table epoch by epoch (plans/frontier.py); this module materializes the
same shape ONCE, deterministically, as a small standalone parquet so
corpus-level image operators (pHash near-dup pairs, format rollups)
can be oracle-paired: DuckDB reads the identical file via
``read_parquet`` and runs the brute-force reference over it.

Contents (pure functions of the fixed GLOBAL_SEED — no RNG state, no
timestamps, reproducible byte-for-byte across processes):

- ``CORPUS_N`` base images: exactly ``datagen.gen_images_batch`` rows
  (same pixels, same PNG/JPEG encoder, same stored pHash).
- one planted near-duplicate "twin" per ``TWIN_EVERY``-th base image:
  the base pixels plus small uniform pixel noise, re-encoded, with
  the pHash recomputed from the perturbed pixels. The noise amplitude
  is adaptively lowered per twin (4 → 3 → … → 0) until the twin's
  pHash sits within ``TWIN_MAX_HAMMING`` bits of its base, so every
  planted pair is recoverable at the query threshold by construction
  while almost all twins keep a nonzero distance (the interesting
  case). At amplitude 4 only ~1% of twins need a retry.

Non-twin pairs sit far away: measured minimum pairwise distance
between distinct base images is 12 bits (median 30) at n=500, so a
hamming-6 threshold selects exactly the planted pairs plus nothing —
but none of the correctness machinery ASSUMES that; the DuckDB oracle
is the brute-force quadratic join, so accidental near-pairs would
appear identically on both sides.

Written once under spark-warehouse/ (gitignored) via pyarrow — no
SparkSession needed, so the oracle side can trigger materialization
even when it runs first — with a build-in-temp-dir + atomic
``os.replace`` publish so a crashed or concurrent builder never
exposes a half-written file (same discipline as operators/upsert.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd

from whakoom_webscrapper_spark import datagen as D
from whakoom_webscrapper_spark import imaging as I

CORPUS_N = 2000
TWIN_EVERY = 5
TWIN_MAX_HAMMING = 6
_VERSION = 1

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_DIR = os.path.join(_REPO, "spark-warehouse", f"images_corpus_v{_VERSION}")
CORPUS_PARQUET = os.path.join(CORPUS_DIR, "corpus.parquet")


def twin_id_of(i: int) -> str:
    return D.image_id_of(i) + "-dup"


def twin_pixels(i: int) -> np.ndarray:
    """Perturbed copy of base image ``i`` whose pHash is guaranteed
    within TWIN_MAX_HAMMING bits of the base (deterministic amplitude
    back-off; amplitude 0 = identical pixels = distance 0 worst case)."""
    base = D.pixels_of(i)
    base16 = base.astype(np.int16)
    h0 = I.phash64(base)
    for amp in range(4, -1, -1):
        if amp == 0:
            return base
        rng = np.random.default_rng(D.GLOBAL_SEED * 999_983 + i)
        tw = np.clip(
            base16 + rng.integers(-amp, amp + 1, size=base.shape), 0, 255
        ).astype(np.uint8)
        ham = bin((h0 ^ I.phash64(tw)) & ((1 << 64) - 1)).count("1")
        if ham <= TWIN_MAX_HAMMING:
            return tw
    return base  # unreachable; keeps type-checkers honest


def corpus_pdf(n: int = CORPUS_N) -> pd.DataFrame:
    """The full corpus as one pandas frame: n base rows (bit-identical
    to datagen.gen_images_batch) + n//TWIN_EVERY twin rows."""
    base = D.gen_images_batch(np.arange(n))
    twins = []
    for i in range(0, n, TWIN_EVERY):
        px = twin_pixels(i)
        fmt = D.fmt_of(i)
        twins.append(
            {
                "image_id": twin_id_of(i),
                "bytes": I.encode_image(px, fmt),
                "w": px.shape[1],
                "h": px.shape[0],
                "fmt": fmt,
                "caption": D.caption_of(i),  # twins share the caption too
                "phash": I.phash64(px),
            }
        )
    return pd.concat([base, pd.DataFrame(twins)], ignore_index=True)


def materialize(n: int = CORPUS_N) -> str:
    """Write the corpus parquet if absent; atomic publish; returns path."""
    if os.path.exists(CORPUS_PARQUET):
        return CORPUS_PARQUET
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = corpus_pdf(n)
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(CORPUS_DIR), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="images_corpus_tmp_", dir=os.path.dirname(CORPUS_DIR))
    try:
        pq.write_table(table, os.path.join(tmp, "corpus.parquet"))
        try:
            os.replace(tmp, CORPUS_DIR)  # atomic on one filesystem
        except OSError:
            # a concurrent builder published first — ours is redundant
            if not os.path.exists(CORPUS_PARQUET):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return CORPUS_PARQUET


def read(spark):
    """The corpus as a DataFrame (materializing on first use)."""
    return spark.read.parquet(materialize())
