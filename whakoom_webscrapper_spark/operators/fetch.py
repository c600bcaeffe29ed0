"""Fetch + extract micro-batch: the engine's S2/S3 analog.

In the reference, fetching is network I/O driven by the Scrapy engine
with parse callbacks (reference: spiders/lists.py:19-55) and Selenium
pagination (spiders/publications.py:72-93). In this sandbox, "fetch" is
a lookup into the synthetic world (task directive — no network): the
admitted frontier joins ``linkgraph`` by url (the page payload + its
out-links) and ``images`` by image_id (the binary payload).

The Python-side work — image decode, pHash recomputation, PSNR vs the
regenerable reference pixels, caption equality — runs as ONE
``mapInPandas`` pass over Arrow batches (BASELINE.json:15 "no per-row
Python" refers to row-at-a-time UDFs; inside the vectorized batch the
codec loop is per-image by necessity, as any codec is).

Deterministic failure injection (reference retry semantics:
pipelines.py:88-122, 3 attempts, exponential backoff) is a pure function
of the page id — ``datagen.fail_attempts_of`` — evaluated as a built-in
column expression so the retry path needs no Python at all.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whakoom_webscrapper_spark import datagen, imaging

PSNR_LOSSY_MIN_DB = 40.0

PHASH_LOSSY_MAX_HAMMING = 8
FEATURE_MIX_ITERS = 6

VALIDATION_COLUMNS = [
    T.StructField("phash_recomputed", T.LongType(), True),
    T.StructField("phash_hamming", T.IntegerType(), True),
    T.StructField("phash_match", T.BooleanType(), True),
    T.StructField("psnr_db", T.DoubleType(), True),
    T.StructField("pixel_ok", T.BooleanType(), True),
    T.StructField("caption_match", T.BooleanType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
    T.StructField("decode_ms", T.DoubleType(), True),
]


def page_id(url_col):
    """Extract the numeric page id from a synthetic URL (P2 analog —
    reference: spiders/lists.py:47 ``href.rsplit("_", 1)[-1]``).
    try_cast: a URL outside the /page/N shape yields NULL (the empty
    regexp match would THROW under Spark 4's default ANSI mode)."""
    return F.regexp_extract(url_col, r"/page/(\d+)$", 1).try_cast("long")


def fail_attempts_expr(id_col):
    """Column form of datagen.fail_attempts_of (kept in lockstep)."""
    return (
        F.when(id_col % 97 == 0, F.lit(3))
        .when(id_col % 37 == 0, F.lit(1))
        .otherwise(F.lit(0))
    )


def validate_images(fetched: DataFrame, featurize: bool = True) -> DataFrame:
    """Decode each image, recompute pHash, check PSNR vs the regenerated
    reference pixels and caption equality; optionally extract the 64-d
    image embedding (imaging.features64 — the feature-extract stage of
    the training-data pipeline). Input needs columns
    (page_id, bytes, fmt, phash, caption); output appends
    VALIDATION_COLUMNS and DROPS ``bytes``: the binary payload is
    consumed here — returning it through Arrow would move the whole
    multi-GB image column Python→JVM a second time per epoch just for a
    downstream .drop (measured ~6 GB/epoch at bench scale; column
    pruning cannot reach inside a mapInPandas)."""
    out_schema = T.StructType(
        [f for f in fetched.schema.fields if f.name != "bytes"]
        + VALIDATION_COLUMNS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.perf_counter()
            rec, hams, match, psnrs, pix_ok, cap_ok = [], [], [], [], [], []
            embs = []
            for pid, data, fmt, stored_ph, caption in zip(
                pdf["page_id"], pdf["bytes"], pdf["fmt"], pdf["phash"], pdf["caption"]
            ):
                try:
                    px = imaging.decode_image(bytes(data), fmt)
                    ph = imaging.phash64(px)
                    ref = datagen.pixels_of(int(pid))
                    p = imaging.psnr(px, ref)
                    ham = bin((ph ^ int(stored_ph)) & ((1 << 64) - 1)).count("1")
                    rec.append(ph)
                    hams.append(ham)
                    # lossless must reproduce the stored pHash exactly; a
                    # lossy re-encode may flip a few low-energy bits
                    match.append(
                        ham == 0 if fmt == "png" else ham <= PHASH_LOSSY_MAX_HAMMING
                    )
                    psnrs.append(p if p != float("inf") else 99.0)
                    pix_ok.append(
                        bool((px == ref).all())
                        if fmt == "png"
                        else p >= PSNR_LOSSY_MIN_DB
                    )
                    cap_ok.append(caption == datagen.caption_of(int(pid)))
                    embs.append(
                        imaging.features64(px, FEATURE_MIX_ITERS)
                        if featurize
                        else None
                    )
                except Exception:
                    rec.append(None)
                    hams.append(None)
                    match.append(False)
                    psnrs.append(0.0)
                    pix_ok.append(False)
                    cap_ok.append(False)
                    embs.append(None)
            ms = (time.perf_counter() - t0) * 1000.0 / max(len(pdf), 1)
            out = pdf.drop(columns=["bytes"])
            out["phash_recomputed"] = pd.array(rec, dtype="Int64")
            out["phash_hamming"] = pd.array(hams, dtype="Int32")
            out["phash_match"] = match
            out["psnr_db"] = psnrs
            out["pixel_ok"] = pix_ok
            out["caption_match"] = cap_ok
            out["embedding"] = embs
            out["decode_ms"] = ms
            yield out

    return fetched.mapInPandas(run, out_schema)
