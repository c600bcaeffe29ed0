"""Corpus curation entry point: the quality pass of a training-data
pipeline, staged the way production corpora run it.

Chains the operators/quality.py + functions/text.py curation family over
any parquet table of documents, in the canonical order — cheap row-local
filters first, the one windowed stage last:

    1. quality filter      drop docs scoring below --min-quality
                           (length band + punct/digit noise + stopwords)
    2. repetition filter   drop docs breaching the Gopher repetition
                           rules (--max-top2gram / --max-dup5gram)
    3. PII scrub           rewrite the text column (--pii-scrub)
    4. stratified sample   per-language md5-bucket rebalancing
                           (--lang-rates en=0.05,es=0.25 [--default-rate])
    5. per-source cap      at most --cap-per-source rows per --source-col
    6. split assignment    append deterministic (bucket, split) columns
                           (--holdout-buckets of 256)

Every stage is optional (omit the flag, skip the stage); stats report
rows surviving each enabled stage. All membership decisions are pure
md5 functions of the id — repartition/recrawl/cluster-size invariant —
so re-running the job on a grown corpus keeps every previous decision.
100 TB shape: stages 1-4 and 6 are map-only scans (repetition stats are
computed per row from the gram arrays — zero shuffles); stage 5 is the
salted two-stage top-cap (operators/quality.py:cap_per_source): stage-1
ranks within (source, salt) so a mega-source spreads over n_salts
tasks, stage-2 re-ranks the <= cap x n_salts survivors — AQE does NOT
skew-split window exchanges (joins only), so the salting is what bounds
the mega-host. No collect anywhere.

    python jobs/curate.py --input /root/testdata/sf0.01/documents.parquet \
        --id-col doc_id --min-quality 0.5 --max-dup5gram 0.3 --pii-scrub \
        --lang-rates en=0.05,es=0.25,und=1.0 --holdout-buckets 13 \
        --out /tmp/docs_curated

Single writer, offline, like every state mutation in this engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.functions import text as T
from whakoom_webscrapper_spark.operators import quality as Q
from whakoom_webscrapper_spark.session import get_spark


def parse_rates(spec: str) -> dict[str, float]:
    rates = {}
    for part in spec.split(","):
        lang, _, rate = part.partition("=")
        if not lang or not rate:
            raise ValueError(
                f"--lang-rates entry {part!r} must be lang=rate (e.g. en=0.05)"
            )
        rates[lang.strip()] = float(rate)
    return rates


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet table to curate")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--min-quality", type=float, default=None,
        help="drop docs with quality_score below this (0..1); null text "
        "scores 0 and is dropped whenever this stage is enabled",
    )
    ap.add_argument(
        "--max-top2gram", type=float, default=None,
        help="Gopher rule: drop docs whose most frequent word bigram "
        "exceeds this fraction of all bigrams",
    )
    ap.add_argument(
        "--max-dup5gram", type=float, default=None,
        help="Gopher rule: drop docs whose duplicated-5-gram fraction "
        "exceeds this",
    )
    ap.add_argument(
        "--pii-scrub", action="store_true",
        help="rewrite the text column with emails/IPs/phones replaced",
    )
    ap.add_argument(
        "--lang-rates", default=None,
        help="per-language keep rates 'en=0.05,es=0.25'; languages not "
        "listed keep --default-rate. Adds (lang, sample_bucket) columns",
    )
    ap.add_argument("--default-rate", type=float, default=0.0)
    ap.add_argument("--cap-per-source", type=int, default=None)
    ap.add_argument("--source-col", default="source")
    ap.add_argument(
        "--holdout-buckets", type=int, default=None,
        help="append (bucket, split) columns: the lowest N of 256 md5 "
        "buckets become 'holdout', the rest 'train'",
    )
    ap.add_argument("--out", help="curated parquet path (omit for stats only)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="whakoom_curate", master=args.master)
    df = spark.read.parquet(args.input)
    stages: dict[str, int] = {"rows_in": df.count()}
    text = F.col(args.text_col)

    if args.min_quality is not None:
        # coalesce: null text scores null, which must DROP (a doc with no
        # text is the lowest-quality doc there is), not slip the filter
        df = df.filter(
            F.coalesce(T.quality_score(text), F.lit(0.0)) >= args.min_quality
        ).localCheckpoint(eager=True)
        stages["after_quality"] = df.count()

    if args.max_top2gram is not None or args.max_dup5gram is not None:
        rep = Q.repetition_stats(df, text_col=args.text_col, id_col=args.id_col)
        keep = rep
        if args.max_top2gram is not None:
            keep = keep.filter(F.col("top_2gram_frac") <= args.max_top2gram)
        if args.max_dup5gram is not None:
            keep = keep.filter(F.col("dup_5gram_frac") <= args.max_dup5gram)
        df = df.join(
            keep.select(args.id_col), args.id_col, "leftsemi"
        ).localCheckpoint(eager=True)
        stages["after_repetition"] = df.count()

    if args.pii_scrub:
        df = df.withColumn(args.text_col, Q.pii_scrub(text))

    if args.lang_rates is not None:
        rates = parse_rates(args.lang_rates)
        df = Q.stratified_sample(
            df.withColumn("lang", T.lang_id(text)),
            rates,
            strata_col="lang",
            id_col=args.id_col,
            default_rate=args.default_rate,
        ).localCheckpoint(eager=True)
        stages["after_sample"] = df.count()

    if args.cap_per_source is not None:
        df = Q.cap_per_source(
            df,
            cap=args.cap_per_source,
            source_col=args.source_col,
            order=[F.length(text).desc()],
            id_col=args.id_col,
        ).localCheckpoint(eager=True)
        stages["after_cap"] = df.count()

    if args.holdout_buckets is not None:
        df = Q.assign_split(
            df, id_col=args.id_col, holdout_buckets=args.holdout_buckets
        )

    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        rows_out = spark.read.parquet(args.out).count()
    else:
        rows_out = df.count()
    stages["rows_out"] = rows_out
    stages["dropped"] = stages["rows_in"] - rows_out
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
