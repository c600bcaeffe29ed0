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

__version__ = "0.2.0"
