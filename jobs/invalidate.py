"""Re-crawl invalidation entry point — revoke URLs from the seen set of
an existing crawl state so that ``jobs/crawl.py --resume`` fetches them
again. The operational companion to ``plans/frontier.invalidate_urls``
(the reference has no analog: Scrapy's dupefilter cannot drop entries —
re-crawling means a full restart with ``dont_filter``).

    python jobs/invalidate.py --out /tmp/run1 --urls recrawl.txt
    python jobs/crawl.py --out /tmp/run1 --resume ...

``--urls`` is a text file of one URL per line (``-`` = stdin); or pass
``--urls-parquet`` for a parquet table with a ``url`` column (bulk
invalidations stay distributed end-to-end). Run OFFLINE — between
crawls, single writer, like every state mutation. The next resume
rebuilds its in-memory filter from the effective seen set, so no
filter handling is needed here.

``--ann-index <dir>`` additionally tombstones the revoked pages'
vectors in a persisted ANN index (jobs/ann.py) in the same pass — the
page ids are derived from the URLs exactly as the crawl derived them,
so a re-crawled page's stale embedding stops serving the moment the
invalidation commits, without an index rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whakoom_webscrapper_spark.plans import frontier as FP
from whakoom_webscrapper_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="crawl state directory")
    ap.add_argument("--urls", help="text file of URLs, one per line (- = stdin)")
    ap.add_argument("--urls-parquet",
                    help="parquet table with a `url` column (bulk path)")
    ap.add_argument("--ann-index",
                    help="persisted ANN index dir (jobs/ann.py) to "
                         "tombstone the revoked pages' vectors in")
    ap.add_argument("--ann-id-col", default="page_id",
                    help="id column the index was built on")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if bool(args.urls) == bool(args.urls_parquet):
        ap.error("pass exactly one of --urls / --urls-parquet")

    spark = get_spark(app_name="whakoom_invalidate", master=args.master)
    cfg = FP.CrawlConfig(state_dir=args.out, world_dir="")
    if args.urls_parquet:
        urls_df = spark.read.parquet(args.urls_parquet).select("url")
    else:
        fh = sys.stdin if args.urls == "-" else open(args.urls)
        urls = [ln.strip() for ln in fh if ln.strip()]
        if fh is not sys.stdin:
            fh.close()
        urls_df = spark.createDataFrame([(u,) for u in urls], ["url"])

    result = FP.invalidate_urls(spark, cfg, urls_df)
    if args.ann_index:
        import ann  # sibling job module (same dir)
        from pyspark.sql import functions as F

        from whakoom_webscrapper_spark.operators.fetch import page_id

        ids = urls_df.select(page_id(F.col("url")).alias(args.ann_id_col))
        result["ann"] = ann.write_tombstones(
            spark, args.ann_index, ids, args.ann_id_col
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
