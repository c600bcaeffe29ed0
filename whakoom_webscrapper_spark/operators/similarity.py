"""Approximate-nearest-neighbor search over embedding columns.

Strategies over ``array<float>`` embeddings:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, one pass over the corpus, JVM-side higher-order-function math
  (functions/vectors.py), TakeOrderedAndProject for the top-k. The
  correctness baseline; O(n·q·d).
- ``lsh_topk`` — random-hyperplane LSH buckets both sides; candidates
  are corpus rows sharing a bucket with the query under any of
  ``n_tables`` independent hash tables. ``probe_radius`` adds
  MULTI-PROBE: the query side also probes every bucket within Hamming
  distance r of its own — near-miss sign flips are the dominant recall
  loss, so probing adjacent buckets buys far more recall per candidate
  than adding tables (each extra table re-scans ~1/2^bits of the corpus;
  a radius-1 probe re-uses the same table at ~n_bits× lower cost).
- ``ivf_topk`` — IVF coarse quantizer: spherical k-means centroids
  (trained on a bounded sample, deterministic seed), corpus partitioned
  into cells by nearest centroid, queries probe their ``nprobe`` nearest
  cells. At 100 TB this is the standard shape: the cell assignment is
  one vectorized pass, the index is reusable, and the probe fraction is
  ~nprobe/n_centroids of the corpus per query.
- ``pq_topk`` — product quantization (Jégou et al., TPAMI 2011): 8
  one-byte codes per vector (32× under raw float32×64), ADC LUT scoring,
  exact re-rank of a small shortlist. Compression path: makes each
  scored vector ~free.
- ``ivf_pq_topk`` — IVFADC, the composition 10^10-vector deployments
  actually run: IVF decides which vectors to touch, PQ (over residuals
  against the home-cell centroid, so the code range resolves
  within-cluster structure) what each costs, exact re-rank only on the
  shortlist.

Shuffle shape (all strategies): candidates come from an equi-join on
(table, bucket) or (cell), never a cross join; exact cosine runs only
on candidates.

Recall honesty note: the driver's ``embeddings`` testdata is near-
uniform random in 64-d (measured: median neighbor cos ≈ 0.0, top-10
neighbor cos ≈ 0.3-0.4, no planted near-dup structure at sf0.1). On
uniform random vectors NO sublinear index reaches recall 0.9@10 while
probing ≤5% — the top-10 of a uniform corpus is not locally structured
(curse of dimensionality). The recall gates therefore run on a
deterministic CLUSTERED corpus (datagen.gen_clustered_embeddings — the
shape of real embedding corpora), where ivf/multi-probe meet
recall ≥0.9@10 at ≤5% probe fraction; on the uniform testdata the test
asserts multi-probe strictly beats plain LSH at equal probe budget.

The hyperplanes/centroids are seeded driver-side constants (folded into
the plan / broadcast) — every executor derives identical buckets with
no side channel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whakoom_webscrapper_spark.functions import vectors as V

DEFAULT_SEED = 7


def _planes(dim: int, n_bits: int, table: int, seed: int = DEFAULT_SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed * 10_007 + table)
    return rng.standard_normal((n_bits, dim)).tolist()


def _dcast(col):
    return F.transform(col, lambda x: x.cast("double"))


def _per_query_topk(
    scored: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
    n_salts: int | None = None,
) -> DataFrame:
    """Scale-safe per-query top-k over (query_id, id, cos_sim) rows.

    A single window partitioned by query_id collapses to ONE partition
    whenever the query batch is small — and when the query id is a
    literal, Catalyst constant-folds the partition key away entirely, so
    WindowExec shuffles EVERY candidate row to one task (the observed
    "No Partition Defined" warning; at 10^9 candidates that is the OOM
    shape). Salted two-stage ranking instead, mirroring the politeness
    scheduler's skew treatment (operators/politeness.py:118-128):
    stage 1 ranks within (query_id, salt) — n_queries x n_salts
    partitions, keeps k rows each; stage 2 merges the surviving
    n_salts*k rows per query as a HASH AGGREGATE (sorted-array slice),
    which combines partially map-side and never warns — no second
    window at all. Every global top-k row ranks <= k inside its own
    salt group, so the prune is lossless; no single task ever holds
    more than max(candidates/n_salts, n_salts*k) rows."""
    if n_salts is None:
        n_salts = scored.sparkSession.sparkContext.defaultParallelism
    w1 = Window.partitionBy(
        query_id_col, (F.abs(F.xxhash64(F.col(id_col))) % n_salts).alias("_salt")
    ).orderBy(F.desc("cos_sim"), F.asc(id_col))
    pruned = (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    # ascending struct sort on (-cos_sim, id) == (cos_sim DESC, id ASC);
    # double negation is a sign-bit flip, so -(-x) round-trips exactly
    top = pruned.groupBy(query_id_col).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cos_sim")).alias("_neg"),
                        F.col(id_col).alias("_id"),
                    )
                )
            ),
            1,
            k,
        ).alias("_top")
    )
    return top.select(
        query_id_col, F.posexplode("_top").alias("_pos", "_t")
    ).select(
        query_id_col,
        F.col("_t._id").alias(id_col),
        (-F.col("_t._neg")).alias("cos_sim"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be broadcastable
    (query batches are small by construction; at scale, chunk them)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    cos = V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
    scored = corpus.crossJoin(q).withColumn("cos_sim", cos)
    return _per_query_topk(scored, k, id_col, query_id_col)


def _hamming_ball(radius: int, n_bits: int) -> list[int]:
    """XOR masks of every bucket within Hamming distance ``radius``
    (radius ≤ 2 supported — beyond that add tables instead)."""
    if radius > 2:
        raise ValueError(
            f"probe_radius={radius} unsupported (max 2); raise n_tables "
            "instead — silently probing a smaller ball would understate "
            "the requested recall operating point"
        )
    masks = [0]
    if radius >= 1:
        masks += [1 << j for j in range(n_bits)]
    if radius >= 2:
        masks += [
            (1 << j) | (1 << l)
            for j in range(n_bits)
            for l in range(j + 1, n_bits)
        ]
    return masks


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 6,
    probe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Candidate (query, corpus) pairs sharing an LSH bucket under any
    table, with the query side multi-probed to ``probe_radius``. Exposed
    separately so tests can assert the probe fraction directly."""

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        out = []
        for t in range(n_tables):
            planes = _planes(dim, n_bits, t, seed)
            out.append(
                df.select(
                    F.col(idc),
                    F.col(vec_col),
                    F.lit(t).alias("_table"),
                    V.lsh_bucket(_dcast(F.col(vec_col)), planes).alias("_bucket"),
                )
            )
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    c_b = with_buckets(corpus, id_col)
    q_b = with_buckets(queries, query_id_col).withColumnRenamed(vec_col, "_qvec")
    if probe_radius > 0:
        # multi-probe: expand ONLY the (small) query side — each mask is a
        # constant XOR of the exact bucket, JVM-side, no re-hash
        masks = _hamming_ball(probe_radius, n_bits)
        q_b = q_b.withColumn(
            "_bucket",
            F.explode(
                F.array(*[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    cand = (
        c_b.join(F.broadcast(q_b), ["_table", "_bucket"])
        .select(id_col, vec_col, query_id_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    return cand


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 6,
    probe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """LSH-bucketed approximate top-k: equi-join on (table, bucket), exact
    cosine on candidates only. Recall grows with n_tables and
    probe_radius; n_bits trades bucket size vs collision rate."""
    cand = lsh_candidates(
        corpus, queries, dim, n_bits, n_tables, probe_radius,
        id_col, vec_col, query_id_col, seed,
    )
    cos = V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
    return _per_query_topk(
        cand.withColumn("cos_sim", cos), k, id_col, query_id_col
    )


def cosine_dup_pairs(
    e: DataFrame,
    tau: float = 0.3,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_buckets: int = 4,
    chunk_cells: int = 4_000_000,
) -> DataFrame:
    """All within-label vector pairs with cosine >= ``tau`` —
    (vec_a, vec_b, cos_raw) with vec_a < vec_b — computed blockwise in
    numpy with BIT-IDENTICAL arithmetic to the Catalyst HOF form
    ``dot(x,y)/(norm(x)*norm(y))``.

    Why (round 6, guide §4.2): the join-then-HOF plan evaluates an
    interpreted ~200-node lambda expression per candidate pair — 20M
    evaluations at sf1.0 dominated the query (~10 s quiet) — and because
    the optimizer pushes the ``cos >= tau`` filter into the join
    condition, the math cannot reach whole-stage codegen at all.
    Shipping each label group's VECTORS once (n rows, not n² pairs)
    across Arrow and doing the pair math as 64 vectorized
    multiply-accumulate passes is ~5x faster and moves megabytes instead
    of the join's gigabytes.

    Bit-identity argument (the oracle hashes these doubles after
    round(..,5), so "close" is not enough):
    - float32 → float64 element casts are exact (same as ``_dcast``);
    - the accumulator starts at 0.0 and adds ``x_i*y_i`` one dimension
      at a time (``acc += X1[:,k]*X2[:,k]``) — numpy multiply and add
      are separate IEEE-rounded ops (no FMA), in the same left-to-right
      order as ``F.aggregate``'s fold, so every partial is bit-equal;
    - norms use the same per-dimension fold then ``sqrt``;
    - ``dot/(nx*ny)`` and the ``>= tau`` comparison run on bit-equal
      doubles, so the surviving pair set and every emitted double are
      identical; rounding stays Spark-side.

    Scale shape: rows are hash-bucketed ``B = n_buckets`` ways and each
    row is exploded into the ``B`` (bucket, bucket) block-tasks it
    participates in, so one (label, bi, bj) task holds only its two
    buckets' rows — parallelism is n_labels x C(B+1,2) tasks and no
    single task ever materializes a whole label (the applyInPandas
    analog of the banded self-joins used everywhere else in the dedup
    family). Inside a task the pair matrix is built in row-chunks of at
    most ``chunk_cells`` cells to bound worker memory."""
    import numpy as np
    import pandas as pd

    B = int(n_buckets)
    if B < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    rows = e.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    bucket = F.pmod(F.xxhash64(F.col("_id")), F.lit(B)).cast("int")
    tasks = rows.withColumn("_b", bucket).select(
        "_id",
        "_lbl",
        "_v",
        "_b",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.lit(B - 1)),
                    lambda o: F.struct(
                        F.least(F.col("_b"), o).alias("ti"),
                        F.greatest(F.col("_b"), o).alias("tj"),
                    ),
                )
            )
        ).alias("_t"),
    ).select(
        "_id", "_lbl", "_v", "_b",
        F.col("_t.ti").alias("_ti"), F.col("_t.tj").alias("_tj"),
    )

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType(), False),
            T.StructField("vec_b", T.LongType(), False),
            T.StructField("cos_raw", T.DoubleType(), True),
        ]
    )

    def _fold_dot(X1: "np.ndarray", X2: "np.ndarray") -> "np.ndarray":
        """Sequential per-dimension fold — acc starts 0.0 like the HOF."""
        acc = np.zeros((X1.shape[0], X2.shape[0]))
        for k in range(X1.shape[1]):
            acc += X1[:, k][:, None] * X2[None, :, k]
        return acc

    def _fold_norm(X: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(X.shape[0])
        for k in range(X.shape[1]):
            acc += X[:, k] * X[:, k]
        return np.sqrt(acc)

    def gen(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        _lbl, ti, tj = key
        left = pdf[pdf["_b"] == ti]
        right = pdf[pdf["_b"] == tj]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"),
                 "vec_b": pd.Series([], dtype="int64"),
                 "cos_raw": pd.Series([], dtype="float64")}
            )
        Xi = np.stack(left["_v"].to_numpy()).astype(np.float64)
        Xj = np.stack(right["_v"].to_numpy()).astype(np.float64)
        idi = left["_id"].to_numpy(dtype=np.int64)
        idj = right["_id"].to_numpy(dtype=np.int64)
        ni_norm, nj_norm = _fold_norm(Xi), _fold_norm(Xj)
        chunk = max(1, chunk_cells // max(1, len(idj)))
        outs_a, outs_b, outs_c = [], [], []
        for s in range(0, len(idi), chunk):
            ce = slice(s, s + chunk)
            cos = _fold_dot(Xi[ce], Xj) / (
                ni_norm[ce][:, None] * nj_norm[None, :]
            )
            ia = idi[ce][:, None]
            jb = idj[None, :]
            # each unordered pair lives in exactly one (ti, tj) task;
            # within it, keep one orientation by id (ti==tj holds both)
            mask = (cos >= tau) & (ia != jb)
            if ti == tj:
                mask &= ia < jb
            ii, jj = np.nonzero(mask)
            a = idi[ce][ii]
            b = idj[jj]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi)
            outs_c.append(cos[ii, jj])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(outs_a) if outs_a else np.array([], dtype=np.int64),
                "vec_b": np.concatenate(outs_b) if outs_b else np.array([], dtype=np.int64),
                "cos_raw": np.concatenate(outs_c) if outs_c else np.array([], dtype=np.float64),
            }
        )

    return tasks.groupBy("_lbl", "_ti", "_tj").applyInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------
def _sample_matrix(
    corpus: DataFrame,
    sample_limit: int,
    id_col: str,
    vec_col: str,
) -> np.ndarray:
    """Bounded DETERMINISTIC training sample as L2-normalized rows:
    ordered by id, capped at ``sample_limit`` (TakeOrderedAndProject —
    a per-partition top-k merge, never a full sort). One collection
    serves every trainer that needs it."""
    pdf = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_limit)
        .toPandas()
    )
    if len(pdf) == 0:
        raise ValueError(
            "cannot train a quantizer on an empty corpus (no rows in "
            f"{vec_col})"
        )
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 32,
    dim: int = 64,
    iters: int = 10,
    sample_limit: int = 50_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = DEFAULT_SEED,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Spherical k-means on a bounded, DETERMINISTIC sample (ordered by
    id, capped at ``sample_limit`` — at 100 TB training on a sample is
    standard IVF practice; the assignment pass below is what streams the
    full corpus). Lloyd iterations are driver-side numpy over ≤50k×d
    floats (~12 MB): cheaper and more predictable than iterating Spark
    jobs, and the result is a plan constant. Pass ``sample`` (normalized
    rows from ``_sample_matrix``) to share one collection across
    trainers, as ivf_pq_topk does."""
    Xn = (
        sample
        if sample is not None
        else _sample_matrix(corpus, sample_limit, id_col, vec_col)
    )
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(len(Xn), min(n_centroids, len(Xn)), replace=False)].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                v = Xn[m].mean(axis=0)
                C[c] = v / (np.linalg.norm(v) + 1e-12)
    return C


def _cell_udf(centroids: np.ndarray, nprobe: int):
    """Vectorized nearest-cell assignment (Arrow-batched numpy matmul —
    the centroid matrix is a closure constant, serialized once per task)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        sims = Xn @ centroids.T
        if nprobe == 1:
            top = np.argmax(sims, axis=1)[:, None]
        else:
            p = min(nprobe, sims.shape[1])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return cells


def ivf_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 32,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Candidate (query, corpus) pairs sharing a probed IVF cell.
    Exposed separately so tests can assert the probe fraction."""
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids, dim, vec_col=vec_col, id_col=id_col, seed=seed
        )
    assign = _cell_udf(centroids, 1)
    probe = _cell_udf(centroids, nprobe)
    c_cells = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(assign(F.col(vec_col))).alias("_cell"),
    )
    q_cells = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            F.explode(probe(F.col(vec_col))).alias("_cell"),
        )
    )
    return c_cells.join(q_cells, "_cell").dropDuplicates([query_id_col, id_col])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
    centroids: np.ndarray | None = None,
    topk_salts: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``nprobe`` nearest cells; exact cosine
    runs on cell members only. Probe fraction ≈ nprobe/n_centroids.
    Pass ``centroids`` to reuse a trained index across query batches.
    ``topk_salts`` overrides the salt count of the two-stage per-query
    ranking (default: defaultParallelism; 1 reproduces the old
    single-partition ranking shape — A/B knob, tools/ivf_topk_ab.py)."""
    cand = ivf_candidates(
        corpus, queries, n_centroids, nprobe, dim,
        id_col, vec_col, query_id_col, seed, centroids,
    )
    cos = V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
    return _per_query_topk(
        cand.withColumn("cos_sim", cos), k, id_col, query_id_col,
        n_salts=topk_salts,
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) — the memory-compression ANN path
# ---------------------------------------------------------------------------
# IVF/LSH cut how many vectors a query TOUCHES; PQ cuts how many bytes
# each touched vector COSTS. Splitting d dims into m subspaces with
# n_codes centroids each stores a vector as m small codes (m=8,
# n_codes=256 → 8 one-byte codes vs 256 bytes for float32×64: 32×), and
# a query scores a
# candidate with m table lookups instead of a d-dim dot product
# (asymmetric distance computation, Jégou et al., TPAMI 2011). At 100 TB
# the codes for 10^10 vectors fit in ~80 GB — scannable from executor
# memory — where the raw vectors (2.5 TB) are not; the standard shape is
# IVF routing + PQ scoring + exact re-rank of a short shortlist, and
# pq_topk composes the last two stages the same way.


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    dim: int = 64,
    iters: int = 10,
    sample_limit: int = 50_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = DEFAULT_SEED,
    sample: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace Euclidean k-means codebooks, shape (m, n_codes,
    dim//m), trained on the same bounded deterministic sample protocol
    as train_centroids (pass ``sample`` to share one collection).
    Vectors are L2-normalized first so summed per-subspace inner
    products approximate cosine.

    With ``centroids``, codebooks are trained on RESIDUALS (xn − its
    nearest centroid) — classic IVFADC (Jégou et al. §IV). Raw-vector
    PQ wastes its code range re-describing coarse cluster structure:
    in a corpus of tight clusters every member of a cluster lands on
    near-identical codes, ADC scores tie, and the shortlist becomes an
    arbitrary subset (measured: recall@10 collapses to ~0.36 at 500
    vectors/cluster). Residuals re-center every cell at the origin so
    the full code range resolves WITHIN-cluster structure — the
    distinctions that actually rank neighbors."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    Xn = (
        sample
        if sample is not None
        else _sample_matrix(corpus, sample_limit, id_col, vec_col)
    )
    if Xn.shape[1] != dim:
        raise ValueError(
            f"dim={dim} but {vec_col} vectors are {Xn.shape[1]}-wide — "
            "a silent slice would quantize only the first dim components"
        )
    if centroids is not None:
        Xn = Xn - centroids[np.argmax(Xn @ centroids.T, axis=1)]
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub))
    for mi in range(m):
        S = Xn[:, mi * sub : (mi + 1) * sub]
        C = S[rng.choice(len(S), min(n_codes, len(S)), replace=False)].copy()
        for _ in range(iters):
            # argmin ||s-c||² == argmax(c·s − ||c||²/2): one GEMM, not an
            # (n × n_codes × sub) broadcast tensor
            a = np.argmax(
                S @ C.T - 0.5 * (C**2).sum(axis=1)[None, :], axis=1
            )
            sums = np.zeros_like(C)
            np.add.at(sums, a, S)
            cnt = np.bincount(a, minlength=len(C))
            nz = cnt > 0
            C[nz] = sums[nz] / cnt[nz, None]
        books[mi, : len(C)] = C
        if len(C) < n_codes:  # degenerate tiny sample: pad with copies
            books[mi, len(C):] = C[0]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "_pq",
) -> DataFrame:
    """One Arrow-batched pass assigning each (normalized) subvector its
    nearest codebook entry; output keeps the raw vector so a downstream
    re-rank needs no second corpus join."""
    m, n_codes, sub = codebooks.shape
    # ||x-c||^2 argmin == argmax(c·x - ||c||²/2); precompute the halves
    cb = codebooks.astype(np.float64)
    half = 0.5 * (cb**2).sum(axis=2)  # (m, n_codes)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        codes = np.empty((len(X), m), dtype=np.int32)
        for mi in range(m):
            S = Xn[:, mi * sub : (mi + 1) * sub]
            codes[:, mi] = np.argmax(S @ cb[mi].T - half[mi][None, :], axis=1)
        return pd.Series([row.tolist() for row in codes])

    return corpus.select(
        F.col(id_col), F.col(vec_col), encode(F.col(vec_col)).alias(code_col)
    )


def ivf_pq_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow-batched pass producing BOTH the IVF home cell and the
    PQ codes of the residual (xn − centroid[cell]) — the index build of
    classic IVFADC, fused so the corpus is normalized once. Output:
    (id, vec, _cell int, _pq array<int>)."""
    m, n_codes, sub = codebooks.shape
    cents = centroids.astype(np.float64)
    cb = codebooks.astype(np.float64)
    half = 0.5 * (cb**2).sum(axis=2)  # (m, n_codes)
    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(schema)
    def enc(vecs: pd.Series) -> pd.DataFrame:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "codes": pd.Series([], dtype=object)})
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        cells = np.argmax(Xn @ cents.T, axis=1)
        R = Xn - cents[cells]
        codes = np.empty((len(X), m), dtype=np.int32)
        for mi in range(m):
            Smat = R[:, mi * sub : (mi + 1) * sub]
            codes[:, mi] = np.argmax(
                Smat @ cb[mi].T - half[mi][None, :], axis=1
            )
        return pd.DataFrame(
            {
                "cell": cells.astype(np.int32),
                "codes": [row.tolist() for row in codes],
            }
        )

    e = corpus.select(id_col, vec_col, enc(F.col(vec_col)).alias("_e"))
    return e.select(
        id_col,
        vec_col,
        F.col("_e.cell").alias("_cell"),
        F.col("_e.codes").alias("_pq"),
    )


def _query_luts(qrows, codebooks: np.ndarray, vec_col: str) -> np.ndarray:
    """Per-query ADC lookup tables: luts[q, mi, c] = codebooks[mi, c] ·
    (normalized query's mi-th subvector). Summing m lookups reproduces
    the inner product against the quantized corpus vector exactly."""
    m, n_codes, sub = codebooks.shape
    luts = np.empty((len(qrows), m, n_codes))
    for qi, row in enumerate(qrows):
        qv = np.asarray(row[vec_col], dtype=np.float64)
        qn = qv / (np.linalg.norm(qv) + 1e-12)
        for mi in range(m):
            luts[qi, mi] = codebooks[mi] @ qn[mi * sub : (mi + 1) * sub]
    return luts


def _adc_udf(luts: np.ndarray, m: int):
    """Arrow-batched ADC scorer: fancy-index m lookups per row from the
    (Q × m × n_codes) LUT closure and sum them."""

    @F.pandas_udf(T.DoubleType())
    def adc(codes: pd.Series, qidx: pd.Series) -> pd.Series:
        C = np.asarray(codes.tolist(), dtype=np.int64)
        if len(C) == 0:
            return pd.Series([], dtype=float)
        qi = qidx.to_numpy(dtype=np.int64)
        vals = luts[qi[:, None], np.arange(m)[None, :], C]
        return pd.Series(vals.sum(axis=1))

    return adc


def _exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Re-rank a (query_id, id) shortlist with exact cosine on the raw
    vectors — the only stage that touches uncompressed embeddings."""
    qvecs = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    )
    exact = (
        short.join(corpus.select(id_col, vec_col), id_col)
        .join(qvecs, query_id_col)
        .withColumn(
            "cos_sim", V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
        )
    )
    return _per_query_topk(exact, k, id_col, query_id_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 256,
    shortlist: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
    codebooks: np.ndarray | None = None,
    rerank: bool = True,
    coded: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: score every corpus row against each query with m
    lookups into a per-query (m × n_codes) table of subspace inner
    products, shortlist per query, then re-rank the shortlist with exact
    cosine on the raw vectors. ``queries`` must be driver-collectable
    (same small-batch contract as the other strategies' broadcast side);
    the LUT stack is a (Q, m, n_codes) closure constant. Pass
    ``codebooks`` to reuse a trained index across query batches, and
    ``coded`` (a persisted ``pq_encode`` output for the SAME codebooks)
    to skip re-encoding — in production the codes are a stored index
    column, built once per corpus version, not per query batch."""
    if coded is not None and codebooks is None:
        # A coded frame is only meaningful relative to the codebooks that
        # produced it; retraining fresh codebooks here would build query
        # LUTs scored against codes from a potentially older corpus and
        # silently mis-rank. Enforce the documented 'same codebooks'
        # contract instead of trusting the caller's convention.
        raise ValueError(
            "pq_topk: `coded` was provided without `codebooks` — pass the "
            "codebooks that encoded it (jobs/ann.py persists both together)"
        )
    if codebooks is None:
        codebooks = train_pq(
            corpus, m, n_codes, dim, vec_col=vec_col, id_col=id_col, seed=seed
        )
    m, n_codes, sub = codebooks.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        # empty query batch: exact-path plan on zero queries gives the
        # right (empty) result with identical column types
        return brute_force_topk(
            corpus, queries, k, id_col, vec_col, query_id_col
        )
    adc = _adc_udf(_query_luts(qrows, codebooks, vec_col), m)

    spark = corpus.sparkSession
    qmap_schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[query_id_col].dataType),
            T.StructField("_qidx", T.IntegerType()),
        ]
    )
    qmap = F.broadcast(
        spark.createDataFrame(
            [(row[query_id_col], qi) for qi, row in enumerate(qrows)],
            qmap_schema,
        )
    )
    if coded is None:
        coded = pq_encode(corpus, codebooks, id_col, vec_col)
    scored = (
        coded.crossJoin(qmap)
        .withColumn("cos_sim", adc(F.col("_pq"), F.col("_qidx")))
        .select(id_col, vec_col, query_id_col, "cos_sim")
    )
    if not rerank:
        return _per_query_topk(scored, k, id_col, query_id_col)
    short = _per_query_topk(scored, shortlist, id_col, query_id_col).select(
        query_id_col, id_col
    )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    shortlist: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
    centroids: np.ndarray | None = None,
    residual_codebooks: np.ndarray | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """IVFADC — the full 10^10-vector composition: IVF routing decides
    WHICH vectors a query touches (~nprobe/n_centroids of the corpus),
    PQ decides what each touched vector COSTS (m byte-code lookups from
    memory-resident codes, no raw-vector IO), and the exact re-rank
    touches raw embeddings only for the per-query shortlist.

    PQ codes quantize RESIDUALS against the home-cell centroid (see
    train_pq): the ADC estimate of qn·xn decomposes as qn·centroid[cell]
    (a driver-side scalar carried on the broadcast (query, probed-cell)
    map) plus the LUT sum over the residual codes. One fused scan
    assigns cell + residual codes together (ivf_pq_encode); candidates
    come from an equi-join on the cell id — a corpus row joins a query
    at most once (one home cell per row), so no dedup shuffle. Pass
    ``centroids``/``residual_codebooks`` to reuse a trained index across
    query batches (both are plan constants; the parameter name is the
    contract — codebooks MUST be residual-trained against these same
    centroids, ``train_pq(..., centroids=centroids)``; raw-trained
    codebooks would silently mis-score), and ``coded`` (a persisted
    ``ivf_pq_encode`` output for the same centroids+codebooks) to skip
    re-encoding — in production the cell and codes are stored index
    columns, built once per corpus version, not per query batch."""
    codebooks = residual_codebooks
    if coded is not None and (centroids is None or codebooks is None):
        # Same contract as pq_topk: persisted codes are only meaningful
        # relative to the centroids+codebooks that produced them —
        # retraining here would silently mis-score the stored codes.
        raise ValueError(
            "ivf_pq_topk: `coded` was provided without `centroids` and "
            "`residual_codebooks` — pass the index that encoded it "
            "(jobs/ann.py persists all three together)"
        )
    if centroids is None or codebooks is None:
        # one sample collection trains both quantizers
        sample = _sample_matrix(corpus, 50_000, id_col, vec_col)
        if centroids is None:
            centroids = train_centroids(
                corpus, n_centroids, dim, vec_col=vec_col, id_col=id_col,
                seed=seed, sample=sample,
            )
        if codebooks is None:
            codebooks = train_pq(
                corpus, m, n_codes, dim, vec_col=vec_col, id_col=id_col,
                seed=seed, sample=sample, centroids=centroids,
            )
    m, n_codes, _sub = codebooks.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        return brute_force_topk(
            corpus, queries, k, id_col, vec_col, query_id_col
        )
    adc = _adc_udf(_query_luts(qrows, codebooks, vec_col), m)

    # probe cells for the (small) query batch driver-side — the same
    # math _cell_udf runs, on Q×d floats
    Q = np.asarray(
        [np.asarray(r[vec_col], dtype=np.float64) for r in qrows]
    )
    Qn = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-12)
    sims = Qn @ centroids.T
    p = min(nprobe, sims.shape[1])
    probed = np.argpartition(-sims, p - 1, axis=1)[:, :p]

    spark = corpus.sparkSession
    qmap_schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[query_id_col].dataType),
            T.StructField("_qidx", T.IntegerType()),
            T.StructField("_cell", T.IntegerType()),
            T.StructField("_qc", T.DoubleType()),  # qn · centroid[cell]
        ]
    )
    qmap = F.broadcast(
        spark.createDataFrame(
            [
                (row[query_id_col], qi, int(c), float(sims[qi, c]))
                for qi, row in enumerate(qrows)
                for c in probed[qi]
            ],
            qmap_schema,
        )
    )
    if coded is None:
        coded = ivf_pq_encode(corpus, centroids, codebooks, id_col, vec_col)
    scored = (
        coded.join(qmap, "_cell")
        .withColumn(
            "cos_sim", F.col("_qc") + adc(F.col("_pq"), F.col("_qidx"))
        )
        .select(id_col, vec_col, query_id_col, "cos_sim")
    )
    short = _per_query_topk(scored, shortlist, id_col, query_id_col).select(
        query_id_col, id_col
    )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )
