"""whakoom_webscrapper_spark — a from-scratch PySpark-native crawl-analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``rsconsuegra/whakoom-webscrapper`` (a sequential Scrapy + SQLite crawler,
surveyed in ``SURVEY.md``) as an idiomatic Spark DataFrame application:

- ``session``    — tuned SparkSession factory (AQE, Arrow, adaptive skew join)
- ``catalog``    — table loading + named-view registry (reference: sqlmanager.py:36-67)
- ``functions``  — URL canonicalization/hashing, text analysis, vector math
- ``operators``  — dedup family (exact/MinHash-LSH/SimHash/ngram/embedding),
                   similarity search (brute-force / multi-probe LSH / IVF),
                   sharded-Bloom seen-set, politeness token bucket with
                   carry-over, HTML selector extraction (extract)
- ``sources``    — bucketed linkgraph/images tables (beyond-broadcast join)
- ``migrations`` — versioned state migrations as Spark rewrite jobs
- ``plans``      — the crawl frontier: epoch loop, checkpoint/resume, lineage
- ``streaming``  — Structured Streaming skins (windowed event aggregation)
- ``datagen``    — deterministic synthetic world (images+captions, link graph)
- ``imaging``    — pure-Python PNG codec, fake-JPEG stub, DCT pHash, PSNR

Everything here is DataFrame-first: no custom Catalyst rules, no RDD hot
paths; Python only inside Arrow-vectorized pandas UDFs.
"""

__version__ = "0.3.0"


def _tune_malloc() -> None:
    """Raise glibc's mmap threshold so large numpy/Arrow buffers are
    served from reused arena memory instead of fresh mmaps.

    Measured on this host: first-touch page faults cost ~250 µs/page, so
    every >128 KB allocation (glibc's default mmap threshold) pays
    ~60 ms/MB — ``np.ones(5 MB)`` took 320 ms while filling an existing
    buffer took 0.4 ms. With the threshold at 256 MB, freed arena pages
    are reused and the same allocation is ~0.7 ms. This runs at package
    import, which covers the driver AND every forked pandas-UDF worker
    (they import this package when deserializing the UDFs). No-op where
    mallopt is unavailable (non-glibc)."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 256 * 1024 * 1024)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 * 1024 * 1024)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()
