"""Multimodal processing entry point: thumbnail / frame-sample / audio
profile over any parquet table of binary media columns.

The operational face of operators/multimodal.py, shaped like the other
jobs (dedup.py, ann.py): read parquet, run ONE column-pruned
mapInPandas pass, write parquet, print one JSON stats line. The
reference crawler stores a cover-image path and moves on (reference:
001_initial_schema.sql:84-85); this is the pipeline stage a
training-data corpus runs instead — derive the compact per-asset
artifact (thumbnail / sampled-frame features / audio profile) once,
downstream consumers never touch the raw bytes again.

    # thumbnails of an image+caption table (e.g. a crawl's output)
    python jobs/multimodal.py --mode thumbnail \
        --input spark-warehouse/images_corpus_v1 --out /tmp/thumbs

    # every-4th-frame pHash rows from a video table
    python jobs/multimodal.py --mode frames --every-k 4 \
        --input spark-warehouse/videos_corpus_v1 --out /tmp/frames

    # audio decode/resample/feature profile
    python jobs/multimodal.py --mode audio --resample-factor 2 \
        --input spark-warehouse/audio_corpus_v1 --out /tmp/audio_prof

Single writer, offline, stateless per row — epoch appends can re-run it
on just the new partition (the same incremental property jobs/ann.py
exploits for PQ encoding).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import multimodal as M
from whakoom_webscrapper_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet table of media rows")
    ap.add_argument("--mode", required=True, choices=["thumbnail", "frames", "audio"])
    ap.add_argument("--max-dim", type=int, default=M.THUMB_MAX_DIM)
    ap.add_argument("--every-k", type=int, default=4)
    ap.add_argument("--resample-factor", type=int, default=2)
    ap.add_argument("--win-ms", type=int, default=50)
    ap.add_argument("--out", help="output parquet path (omit for stats only)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="whakoom_multimodal", master=args.master)
    df = spark.read.parquet(args.input)
    rows_in = df.count()

    if args.mode == "thumbnail":
        out = M.thumbnail(df, max_dim=args.max_dim)
        extra_agg = [
            F.sum(F.length("thumb_bytes")).alias("thumb_bytes_total"),
            F.sum(
                (F.col("thumb_w") < F.col("w")).cast("long")
            ).alias("shrunk"),
        ]
    elif args.mode == "frames":
        out = M.sample_frames(df, every_k=args.every_k)
        extra_agg = [F.count_distinct("video_id").alias("videos")]
    else:
        out = M.audio_profile(
            df, resample_factor=args.resample_factor, win_ms=args.win_ms
        )
        extra_agg = [
            F.sum("n_windows").alias("windows_total"),
            F.round(F.avg("rms_mean"), 3).alias("avg_rms"),
        ]

    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)  # stats from what was committed
    agg = out.agg(F.count(F.lit(1)).alias("rows_out"), *extra_agg).collect()[0]
    stats = {"mode": args.mode, "rows_in": rows_in}
    stats.update({k: (int(v) if v is not None and not isinstance(v, float) else v)
                  for k, v in agg.asDict().items()})
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
