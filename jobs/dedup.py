"""Corpus dedup entry point: pairs → clusters → canonical survivors.

Runs the full near-duplicate pipeline over any parquet table — pair
generation (exact / MinHash-LSH / SimHash / pHash-hamming), transitive
closure into dup clusters (operators/components.py large-star/small-star),
canonical-survivor selection (latest-wins, or best by ``--prefer col``)
— and writes the surviving rows as parquet, printing one JSON line of
stats. The reference crawler has no corpus-level dedup at all (its
DUPEFILTER is per-URL); this is the training-data-pipeline surface the
task directive asks for, as an operational job.

    # text near-dup over the documents table, keep best-quality doc
    python jobs/dedup.py --input /root/testdata/sf0.01/documents.parquet \
        --id-col doc_id --method minhash --text-col text --out /tmp/docs_dedup

    # perceptual image dedup over a crawl's pages table
    python jobs/dedup.py --input /tmp/run1/state/pages \
        --id-col url --method phash --hash-col phash --max-hamming 6 \
        --out /tmp/pages_dedup

Single writer, offline, like every state mutation in this engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import components as C
from whakoom_webscrapper_spark.operators import dedup as D
from whakoom_webscrapper_spark.session import get_spark


def build_pairs(df, args):
    if args.method == "exact":
        # Null text would hash to the seed for every such row (Spark's
        # xxhash64 skips null inputs), merging all null-text docs into one
        # giant bogus cluster; and at 10^10 rows 64-bit collisions make
        # occasional false hash-merges expected. So: drop nulls up front and
        # keep the raw-text equality in the join — the hash is only a
        # shuffle-key prefilter, never the correctness criterion.
        h = df.filter(F.col(args.text_col).isNotNull()).select(
            F.col(args.id_col).alias("_id"),
            F.xxhash64(args.text_col).alias("_h"),
            F.col(args.text_col).alias("_t"),
        )
        a, b = h.alias("a"), h.alias("b")
        return (
            a.join(
                b,
                (F.col("a._h") == F.col("b._h"))
                & (F.col("a._t") == F.col("b._t"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
    if args.method == "minhash":
        cand = D.lsh_candidate_pairs_fast(
            df, text_col=args.text_col, id_col=args.id_col
        ).select("id_a", "id_b")
        if args.verify_tau is not None:
            # candidate -> verify: exact shingle Jaccard disposes before
            # closure, so a single lucky band agreement cannot transitively
            # merge dissimilar docs. Cost ∝ candidate set, not corpus.
            cand = D.verify_pairs_jaccard(
                df, cand, text_col=args.text_col, id_col=args.id_col,
                tau=args.verify_tau,
            ).select("id_a", "id_b")
        return cand
    if args.method == "simhash":
        if args.max_hamming > 3:
            # simhash_dup_pairs with n_bands=4 only guarantees recall for
            # radius <= 3; silently shrinking the requested radius would
            # understate the operating point (hamming_dup_pairs raises in
            # the analogous situation — same no-silent-degradation contract).
            raise ValueError(
                f"--max-hamming {args.max_hamming} exceeds 3, the largest "
                "radius the simhash band structure (4 bands) guarantees "
                "recall for; use --method phash/hamming banding for wider "
                "radii or lower --max-hamming"
            )
        sims = D.simhash(df, text_col=args.text_col, id_col=args.id_col)
        return D.simhash_dup_pairs(
            sims, id_col=args.id_col, max_hamming=args.max_hamming
        ).select("id_a", "id_b")
    if args.method == "phash":
        return D.hamming_dup_pairs(
            df,
            id_col=args.id_col,
            hash_col=args.hash_col,
            max_hamming=args.max_hamming,
        ).select("id_a", "id_b")
    raise ValueError(args.method)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet table to dedup")
    ap.add_argument("--id-col", required=True)
    ap.add_argument(
        "--method", required=True,
        choices=["exact", "minhash", "simhash", "phash", "passage"],
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--hash-col", default="phash", help="int64 hash col (phash)")
    ap.add_argument("--max-hamming", type=int, default=6)
    ap.add_argument("--span-k", type=int, default=10,
                    help="passage method: tokens per removal chunk")
    ap.add_argument(
        "--prefer",
        default=None,
        help="column ranking survivors (max wins; id breaks ties); "
        "default: highest id",
    )
    ap.add_argument("--out", help="survivor parquet path (omit for stats only)")
    ap.add_argument(
        "--against",
        default=None,
        help="INCREMENTAL mode: existing deduped corpus parquet; batch rows "
        "duplicating a corpus row are dropped (corpus always wins), then "
        "the remaining batch is deduped within itself. exact/minhash only.",
    )
    ap.add_argument(
        "--against-bands",
        default=None,
        help="minhash incremental: persisted LSH band-key sidecar parquet "
        "(id, band_id, band_hash) for the corpus — skips recomputing corpus "
        "signatures, making the epoch O(batch) instead of O(corpus)",
    )
    ap.add_argument(
        "--emit-bands",
        default=None,
        help="minhash: write the SURVIVORS' band keys to this parquet so the "
        "next epoch can run --against-bands on (old sidecar UNION this one)",
    )
    ap.add_argument(
        "--verify-tau",
        type=float,
        default=None,
        help="minhash: re-verify LSH candidate pairs by exact shingle "
        "Jaccard >= TAU before clustering (banding proposes, exact "
        "Jaccard disposes); off by default. Applies to within-batch "
        "pairs; --against corpus matching stays band-level (the "
        "--against-bands sidecar carries no text to verify against)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.verify_tau is not None and args.method != "minhash":
        raise ValueError(
            "--verify-tau applies to --method minhash only (exact needs no "
            "verification; simhash/phash are hamming-radius methods)"
        )

    spark = get_spark(app_name="whakoom_dedup", master=args.master)
    df = spark.read.parquet(args.input)
    rows_in = df.count()
    if args.method == "passage":
        # Sub-document surgery, not row selection: every row survives,
        # repeated SPAN_K-token chunks are cut from all but their
        # globally-first occurrence and the text column is rewritten.
        # Null-text rows pass through unchanged (passage_dedup emits no
        # row for them — the left join + coalesce restores the original).
        ded = D.passage_dedup(
            df, text_col=args.text_col, id_col=args.id_col,
            span_k=args.span_k,
        )
        agg = ded.agg(
            F.sum("n_chunks").alias("t"), F.sum("n_kept").alias("k")
        ).collect()[0]
        out = (
            df.join(
                ded.select(args.id_col, "dedup_text"), args.id_col, "left"
            )
            .withColumn(
                args.text_col,
                F.coalesce(F.col("dedup_text"), F.col(args.text_col)),
            )
            .drop("dedup_text")
        )
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            rows_out = spark.read.parquet(args.out).count()
        else:
            rows_out = out.count()
        print(json.dumps({
            "rows_in": rows_in,
            "rows_out": rows_out,
            "chunks_total": int(agg["t"] or 0),
            "chunks_removed": int((agg["t"] or 0) - (agg["k"] or 0)),
            "method": "passage",
            "span_k": args.span_k,
        }))
        return
    vs_corpus_dropped = None
    if args.against:
        if args.method not in ("exact", "minhash"):
            raise ValueError(
                f"--against supports exact/minhash, not {args.method}"
            )
        if args.method == "exact":
            # corpus-wins: drop batch rows whose text exactly matches any
            # corpus row. Hash is the shuffle-key prefilter; raw-text
            # equality is the criterion (same contract as build_pairs).
            key = lambda frame: frame.filter(  # noqa: E731
                F.col(args.text_col).isNotNull()
            ).select(
                F.col(args.id_col).alias("_id"),
                F.xxhash64(args.text_col).alias("_h"),
                F.col(args.text_col).alias("_t"),
            )
            matched = (
                key(df)
                .join(
                    key(spark.read.parquet(args.against)).select("_h", "_t"),
                    ["_h", "_t"],
                    "leftsemi",
                )
                .select(F.col("_id").alias(args.id_col))
                .distinct()
            )
        else:
            batch_bands = D.lsh_band_keys(
                df, text_col=args.text_col, id_col=args.id_col
            ).localCheckpoint(eager=True)
            if args.against_bands:
                corpus_bands = spark.read.parquet(args.against_bands)
            else:
                corpus_bands = D.lsh_band_keys(
                    spark.read.parquet(args.against),
                    text_col=args.text_col,
                    id_col=args.id_col,
                )
            matched = (
                D.lsh_cross_pairs(batch_bands, corpus_bands, id_col=args.id_col)
                .select(F.col("batch_id").alias(args.id_col))
                .distinct()
            )
        fresh = df.join(matched, args.id_col, "leftanti").localCheckpoint(
            eager=True
        )
        n_fresh = fresh.count()
        vs_corpus_dropped = rows_in - n_fresh
        df = fresh
    pairs = build_pairs(df, args).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    cc = C.connected_components(pairs, src="id_a", dst="id_b")
    n_clusters = cc.select("component").distinct().count()
    n_clustered = cc.count()
    survivors = C.dedup_canonical(
        df, pairs, args.id_col, src="id_a", dst="id_b",
        prefer=args.prefer, components=cc,
    )
    if args.out:
        survivors.write.mode("overwrite").parquet(args.out)
        rows_out = spark.read.parquet(args.out).count()
        survivors = spark.read.parquet(args.out)
    else:
        rows_out = survivors.count()
    if args.emit_bands:
        if args.method != "minhash":
            raise ValueError("--emit-bands requires --method minhash")
        D.lsh_band_keys(
            survivors, text_col=args.text_col, id_col=args.id_col
        ).write.mode("overwrite").parquet(args.emit_bands)
    stats = {
        "rows_in": rows_in,
        "dup_pairs": n_pairs,
        "clustered_rows": n_clustered,
        "clusters": n_clusters,
        "rows_out": rows_out,
        "dropped": rows_in - rows_out,
        "method": args.method,
    }
    if args.verify_tau is not None:
        stats["verify_tau"] = args.verify_tau
    if vs_corpus_dropped is not None:
        stats["vs_corpus_dropped"] = vs_corpus_dropped
        stats["incremental"] = True
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
