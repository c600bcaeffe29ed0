"""ANN index job: build a persisted IVFADC index, then serve top-k.

The 10^10-vector workflow has two phases with different cadences: the
INDEX is built once per corpus version (IVF centroids + residual PQ
codebooks trained on a bounded deterministic sample; every vector's
home cell + 8-byte residual codes materialized as stored columns), and
QUERY batches reuse it — routing + ADC + exact re-rank touch raw floats
only for the per-query shortlist. This job materializes that split:

    # build: codebooks -> <out>/codebooks.npz, coded corpus -> <out>/coded
    python jobs/ann.py build --input embeddings.parquet --out /tmp/annix \
        --n-centroids 256

    # query: top-k for a parquet of (query_id, embedding)
    python jobs/ann.py query --index /tmp/annix --queries q.parquet \
        --k 10 --nprobe 8 --out /tmp/hits

Appending a crawl epoch = ivf_pq_encode(new rows) appended to <out>/coded
(encoding is stateless per row — tests/test_similarity.py pins that the
union is bit-exact with a full re-encode). Single writer, offline, like
every state mutation in this engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from whakoom_webscrapper_spark.operators import similarity as S  # noqa: E402
from whakoom_webscrapper_spark.session import get_spark  # noqa: E402


def build(args) -> None:
    spark = get_spark(app_name="ann_build", master=args.master)
    # failed decodes leave null embeddings in a crawl's pages table;
    # they carry no vector to index
    corpus = spark.read.parquet(args.input).where(
        F.col(args.vec_col).isNotNull()
    )
    t0 = time.monotonic()
    sample = S._sample_matrix(corpus, 50_000, args.id_col, args.vec_col)
    # infer dim from the data unless pinned; a wrong --dim must error
    # loudly in train_pq, never silently quantize a prefix
    dim = args.dim if args.dim else sample.shape[1]
    cents = S.train_centroids(
        corpus, n_centroids=args.n_centroids, dim=dim, sample=sample
    )
    books = S.train_pq(
        corpus, m=args.m, n_codes=args.n_codes, dim=dim,
        sample=sample, centroids=cents,
    )
    os.makedirs(args.out, exist_ok=True)
    # rebuilding into an existing index dir: invalidate the old commit
    # record FIRST, so a crash while overwriting coded can never leave
    # stale codebooks next to new codes
    npz = os.path.join(args.out, "codebooks.npz")
    if os.path.exists(npz):
        os.remove(npz)
    coded = S.ivf_pq_encode(corpus, cents, books, args.id_col, args.vec_col)
    coded.write.mode("overwrite").parquet(os.path.join(args.out, "coded"))
    n = spark.read.parquet(os.path.join(args.out, "coded")).count()
    # codebooks.npz is the COMMIT RECORD, written last via tmp+rename:
    # a crash mid-build leaves a coded dir but no npz, and query()
    # refuses an index without one — same marker-last discipline as the
    # crawl's epoch commits
    tmp = os.path.join(args.out, f".codebooks.{os.getpid()}.tmp.npz")
    np.savez(tmp, centroids=cents, codebooks=books)
    os.replace(tmp, npz)
    code_bits = max(1, (args.n_codes - 1).bit_length())
    print(json.dumps({
        "rows_indexed": n,
        "index_build_s": round(time.monotonic() - t0, 3),
        "n_centroids": args.n_centroids,
        "dim": dim,
        "pq": {"m": args.m, "n_codes": args.n_codes},
        "bytes_per_vector_codes": args.m * ((code_bits + 7) // 8),
        "index_dir": args.out,
    }))


def query(args) -> None:
    spark = get_spark(app_name="ann_query", master=args.master)
    npz = os.path.join(args.index, "codebooks.npz")
    if not os.path.exists(npz):
        raise SystemExit(
            f"{args.index} has no codebooks.npz — the index build did not "
            "commit (npz is written last); re-run jobs/ann.py build"
        )
    ix = np.load(npz)
    coded = spark.read.parquet(os.path.join(args.index, "coded"))
    queries = spark.read.parquet(args.queries)
    t0 = time.monotonic()
    hits = S.ivf_pq_topk(
        coded.select(args.id_col, args.vec_col),  # re-rank side
        queries,
        k=args.k,
        nprobe=args.nprobe,
        shortlist=args.shortlist,
        id_col=args.id_col,
        vec_col=args.vec_col,
        centroids=ix["centroids"],
        residual_codebooks=ix["codebooks"],
        coded=coded,
    )
    if args.out:
        hits.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = hits.count()
    print(json.dumps({
        "hits": n,
        "k": args.k,
        "nprobe": args.nprobe,
        "shortlist": args.shortlist,
        "wall_s": round(time.monotonic() - t0, 3),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True, help="index directory")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--dim", type=int, default=None,
                   help="embedding width; default: inferred from the data")
    b.add_argument("--n-centroids", type=int, default=256)
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--n-codes", type=int, default=256)
    b.add_argument("--master", default=None)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True, help="build's --out dir")
    q.add_argument("--queries", required=True,
                   help="parquet of (query_id, <vec-col>)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=8)
    q.add_argument("--shortlist", type=int, default=256)
    q.add_argument("--id-col", default="vec_id")
    q.add_argument("--vec-col", default="embedding")
    q.add_argument("--out", default=None)
    q.add_argument("--master", default=None)
    args = ap.parse_args()
    build(args) if args.cmd == "build" else query(args)


if __name__ == "__main__":
    main()
