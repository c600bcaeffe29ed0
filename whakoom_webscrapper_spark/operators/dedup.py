"""Dedup operator library — the dedup family as composable DataFrame ops.

The reference's dedup surface is a per-run Python set + DB UNIQUE keys
(reference: pipelines.py:32-34, 001_initial_schema.sql:4,19) — exact,
single-machine. A training-data pipeline at 100 TB needs the full
ladder, each one here a pure DataFrame transform:

  exact_dedup        hash-groupBy, deterministic keeper     (exact)
  window_dedup       row_number()=1 per key                 (exact, keeps row)
  minhash signatures + LSH band join                        (near-dup, Jaccard)
  simhash            32-bit sign-of-sums + banded hamming   (near-dup, cosine-ish)
  hamming_dup_pairs  combination-block banding over any     (near-dup, perceptual —
                     64-bit hash column (pHash images)       images via stored phash)
  ngram Jaccard      shingle blocking + exact Jaccard       (near-dup, exact sim)
  token_span_rows    k-token span hashes at a stride        (exact-substring /
                     → repeated-passage stats + removal      passage-level dedup)
  embedding cosine   see operators/similarity.py            (semantic)

All hashing is portable md5-arithmetic when an oracle needs to reproduce
it (queries.py) and xxhash64 otherwise (3-5x faster, same plan shape) —
controlled by ``portable_hash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.catalog import with_min_parallelism
from whakoom_webscrapper_spark.functions import text as T

SIMHASH_BITS = 32


def portable_hash(col: Column) -> Column:
    """60-bit hash reproducible in DuckDB (md5-hex arithmetic)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def fast_hash(col: Column) -> Column:
    """Production hash: xxhash64 (JVM intrinsic, not oracle-reproducible)."""
    return F.xxhash64(col)


def window_dedup(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep exactly one row per key, deterministically (J1/J2 —
    the MERGE-on-read fallback for UNIQUE constraints)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup by normalized-text hash; keeps min id."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.withColumn("_fp", fast_hash(norm))
        .transform(lambda d: window_dedup(d, ["_fp"], [F.asc(id_col)]))
        .drop("_fp")
    )


MINHASH_PRIME = (1 << 31) - 1  # Mersenne: a*h+b stays < 2^62 (ANSI-safe)


def _affine_params(n_perms: int) -> tuple[list[int], list[int]]:
    """Deterministic per-permutation affine constants (a_i, b_i) for
    minhash permutations h_i(x) = (a_i * h(x) + b_i) mod P — fixed LCG
    stream, no RNG state, reproducible everywhere."""
    a, b = [], []
    x = 0x9E3779B97F4A7C15
    for _ in range(n_perms):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a.append(1 + x % (MINHASH_PRIME - 1))
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b.append(x % MINHASH_PRIME)
    return a, b


def _minhash_wide(sh: DataFrame, id_col: str, n_perms: int) -> DataFrame:
    """(id, _mh0.._mhN-1): every permutation's min in ONE hash-aggregate
    over (id, shingle) rows — each distinct shingle hashed once
    (xxhash64), permutations as affine transforms in pure int math."""
    P = MINHASH_PRIME
    a, b = _affine_params(n_perms)
    hashed = sh.select(
        id_col, F.pmod(F.xxhash64(F.col("_sh")), F.lit(P)).alias("_h")
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.lit(a[p]) * F.col("_h") + F.lit(b[p]), F.lit(P))
            ).alias(f"_mh{p}")
            for p in range(n_perms)
        ]
    )


def _shingle_rows(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int
) -> DataFrame:
    """(id, _sh) shingle rows, execution-optimized for min-aggregation.

    Emits the exact same shingle STRINGS as
    ``functions.text.word_shingles`` (lowercase, trim, whitespace-run
    tokenization, space-joined k-grams) but with two plan-level cuts,
    measured ~1.4× on the sf0.1 documents table:

    - ONE regex pass: tokenize with ``split(text, '\\s+')`` directly
      instead of materializing a whitespace-normalized copy of the full
      text (``regexp_replace``) and splitting that.
    - NO ``array_distinct``: a min-aggregate absorbs duplicate shingles,
      so deduplicating them first only burns string comparisons.

    Only valid upstream of an idempotent aggregate (min) — anything that
    COUNTS shingles must keep the distinct.

    Rides ``with_min_parallelism``: the shingle HOF is the most
    expression-dense stage in the engine and must never be serialized by
    a low-row-group-count input layout (no-op on well-split inputs).

    The token array is MATERIALIZED as a projected column before the
    shingle HOF consumes it (round 6): inlining the split at every
    ``slice``/``size`` site re-tokenized the document once per array
    element — O(n²) regex work per doc."""
    df = with_min_parallelism(df)
    w = df.select(
        F.col(id_col), T.word_tokens(F.col(text_col)).alias("_w")
    )
    return w.select(
        F.col(id_col),
        F.explode(T.shingles_of_tokens(F.col("_w"), shingle_k)).alias("_sh"),
    )


def token_span_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 10,
    stride: int = 1,
    pos_col: str = "_pos",
    span_col: str = "_span",
) -> DataFrame:
    """(id, pos, span) k-token span rows at the given stride — the unit
    of exact-substring (passage-level) dedup, the rung of the dedup
    ladder between whole-document exact dedup and shingle near-dup:
    cross-document repeated PASSAGES inside otherwise-distinct documents
    (the Lee-et-al-style exact-substring pass every production LLM
    corpus runs). The reference has no analog — its dedup unit is a URL
    (reference: pipelines.py:32-34).

    Tokenization matches ``_shingle_rows`` exactly (lowercase, trim,
    whitespace-run split); positions are 1-based, ``1, 1+stride, …`` up
    to the last full-span start ``n - span_k + 1``. Documents shorter
    than ``span_k`` tokens yield ONE whole-document span at pos 1, so
    every non-null document is represented. Null text yields no rows.

    - ``stride == 1`` (every position): detection — ANY repeated run of
      ``span_k`` tokens is caught wherever the copies sit. This is the
      guaranteed mode; the row fan-out (n_tokens - span_k + 1 per doc)
      is LESS than the 3-gram shingle path already pays (n_tokens - 2).
    - ``stride > 1`` (sampled positions): only copies whose start
      offsets are congruent mod ``stride`` share an identical span, so
      this is a cheaper PROBABILISTIC detector, not a guarantee — use it
      only when a miss is acceptable.
    - ``stride == span_k`` (disjoint chunks): removal — kept chunks
      concatenate back into a dedup'd document with no double-counted
      tokens.

    At 10^10 docs everything downstream is a groupBy/join on the span
    hash — uniform keys, no all-pairs."""
    if stride < 1 or span_k < 1:
        raise ValueError(f"span_k={span_k} and stride={stride} must be >= 1")
    df = with_min_parallelism(df)
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    w = df.select(F.col(id_col), words.alias("_w"))
    pos = w.select(
        F.col(id_col),
        F.col("_w"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_w") - F.lit(span_k - 1), F.lit(1)),
                F.lit(stride),
            )
        ).alias(pos_col),
    )
    return pos.select(
        F.col(id_col),
        F.col(pos_col),
        F.array_join(
            F.slice(F.col("_w"), F.col(pos_col), span_k), " "
        ).alias(span_col),
    )


def token_span_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 10,
    stride: int = 1,
    pos_col: str = "_pos",
    hash_col: str = "sh",
) -> DataFrame:
    """(id, pos, span-hash) rows — :func:`token_span_rows` for consumers
    that only need span EQUALITY (dup statistics), hashing the k-token
    slice directly with ``xxhash64`` over the array instead of
    materializing the joined span string first (round 6: skips building
    ~70 bytes of string per span — 160 MB/pass at sf1.0 — before
    hashing). Tokens contain no spaces, so array equality ⟺ joined-string
    equality and the grouping is identical; the hash VALUES differ from
    ``md5(span)``/``xxhash64(span)``, which no caller observes. Null
    text yields a NULL hash (xxhash64 of a null input is a seed
    constant, so the null-preserving guard is explicit) — matching
    ``token_span_rows``'s null-span rows that downstream equi-joins
    drop."""
    if stride < 1 or span_k < 1:
        raise ValueError(f"span_k={span_k} and stride={stride} must be >= 1")
    df = with_min_parallelism(df)
    w = df.select(
        F.col(id_col), T.word_tokens(F.col(text_col)).alias("_w")
    )
    pos = w.select(
        F.col(id_col),
        F.col("_w"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_w") - F.lit(span_k - 1), F.lit(1)),
                F.lit(stride),
            )
        ).alias(pos_col),
    )
    return pos.select(
        F.col(id_col),
        F.col(pos_col),
        F.when(
            F.col("_w").isNotNull(),
            F.xxhash64(F.slice(F.col("_w"), F.col(pos_col), span_k)),
        ).alias(hash_col),
    )


def passage_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 10,
) -> DataFrame:
    """The REMOVAL variant of exact-substring dedup: disjoint
    ``span_k``-token chunks (stride == span_k, so kept chunks concatenate
    with no double-counted tokens); for every repeated chunk hash only
    the globally-first occurrence (min (id, pos)) survives, and each
    document is reconstructed from its kept chunks in position order.
    Returns (id, n_chunks, n_kept, dedup_text); null-text rows yield no
    row (callers that must preserve them re-join, as jobs/dedup.py does).

    Survivor selection is a groupBy-min + join on the chunk hash — no
    rank window, so one pathologically common passage cannot hot-spot a
    single partition (the shape dedup_canonical uses for clusters).
    Chunk hashes are xxhash64 (round 6): the hash is internal — only
    chunk EQUALITY matters and the oracle replays first-occurrence
    semantics on the span strings — so 8-byte int keys replace 32-char
    md5 hex in both the groupBy and the join-back exchange."""
    # NULL-preserving hash: xxhash64(NULL) yields the seed constant (md5
    # yields NULL), and the null-text contract here relies on null span
    # keys falling out of the equi-joins.
    chunks = token_span_rows(
        df, text_col, id_col, span_k=span_k, stride=span_k
    ).withColumn(
        "sh",
        F.when(F.col("_span").isNotNull(), F.xxhash64("_span")),
    )
    first = chunks.groupBy("sh").agg(
        F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_f")
    )
    marked = chunks.join(first, "sh").withColumn(
        "kept",
        (F.col(id_col) == F.col(f"_f.{id_col}"))
        & (F.col("_pos") == F.col("_f._pos")),
    )
    kept_chunk = F.when(
        F.col("kept"), F.struct(F.col("_pos"), F.col("_span"))
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_chunk)),
                lambda s: s["_span"],
            ),
            " ",
        ).alias("dedup_text"),
    )


def lsh_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perms: int = 8,
    shingle_k: int = 3,
    band_rows: int = 2,
) -> DataFrame:
    """(id, band_id, band_hash) LSH band keys for every document — the
    joinable (and persistable) half of :func:`lsh_candidate_pairs_fast`.

    Persisted as a parquet sidecar, this is what makes dedup INCREMENTAL:
    a new crawl epoch computes band keys for its own rows only and
    equi-joins them against the corpus sidecar (see
    :func:`lsh_cross_pairs` and ``jobs/dedup.py --against``), so per-epoch
    cost is O(batch), not O(corpus). Keys joined across runs must share
    (n_perms, shingle_k, band_rows) — the affine permutation constants are
    fixed (``_affine_params``), so equal parameters mean equal keys.
    """
    sh = _shingle_rows(df, text_col, id_col, shingle_k)
    wide = _minhash_wide(sh, id_col, n_perms)
    n_bands = (n_perms + band_rows - 1) // band_rows
    return wide.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).cast("long").alias("band_id"),
                        F.xxhash64(
                            *[
                                F.col(f"_mh{p}")
                                for p in range(
                                    band * band_rows,
                                    min((band + 1) * band_rows, n_perms),
                                )
                            ]
                        ).alias("band_hash"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select(id_col, F.col("_b.band_id").alias("band_id"),
             F.col("_b.band_hash").alias("band_hash"))


def lsh_cross_pairs(
    batch_bands: DataFrame, corpus_bands: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate near-dup pairs BETWEEN two corpora from their band keys:
    (batch_id, corpus_id) for every batch row sharing ≥1 LSH band with a
    corpus row. Banded equi-join on (band_id, band_hash) — same shuffle
    shape as the self-join path, but the batch side is epoch-sized."""
    a = batch_bands.alias("a")
    b = corpus_bands.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .select(
            F.col(f"a.{id_col}").alias("batch_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )


def lsh_candidate_pairs_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perms: int = 8,
    shingle_k: int = 3,
    band_rows: int = 2,
) -> DataFrame:
    """Deployable MinHash-LSH candidate pairs, end-to-end from text.

    Unlike the portable path (minhash_signatures → lsh_candidate_pairs,
    kept bit-reproducible for the DuckDB oracle), this never explodes the
    signature to (id, perm) rows or re-aggregates them into a band: bands
    come straight off the wide per-doc aggregate, and each band's key is
    ONE int64 — ``xxhash64`` over that band's minhash columns — instead
    of a comma-joined string (VERDICT r3: the string band_sig + its
    collect_list aggregate dominated once signatures got cheap). Shuffle
    rows are (id, band_id, int64); the self-join compares 8-byte keys.
    The shingle stage itself is the measured r4 bottleneck (the band
    join's second subtree is exchange-reused at runtime), so it rides
    ``_shingle_rows`` — one regex pass, no array_distinct.

    At 10^10 docs the self-join is a banded equi-join on (band_id,
    band_hash) — bucket-sized groups, no all-pairs anywhere.
    """
    bands = lsh_band_keys(
        df,
        text_col=text_col,
        id_col=id_col,
        n_perms=n_perms,
        shingle_k=shingle_k,
        band_rows=band_rows,
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def hamming_block_keys(
    hash_col: Column, *, bits: int, n_blocks: int, combo: int
) -> list[tuple[int, Column]]:
    """The (combo_id, key) bucket keys for combination-block Hamming
    banding of one hash value: split the ``bits``-bit hash into
    ``n_blocks`` equal blocks, and for every ``combo``-subset of blocks
    concatenate those block values into one integer key. Pigeonhole: a
    pair differing in at most ``max_hamming`` bits has at least
    ``n_blocks - max_hamming`` completely clean blocks, so whenever
    ``n_blocks - max_hamming >= combo`` the pair shares at least one
    identical combo key — exact recall, no probabilistic miss."""
    import itertools

    if bits % n_blocks:
        raise ValueError(f"bits={bits} not divisible by n_blocks={n_blocks}")
    width = bits // n_blocks
    mask = (1 << width) - 1
    blocks = [
        F.shiftrightunsigned(hash_col, b * width).bitwiseAND(mask)
        for b in range(n_blocks)
    ]
    keys = []
    for combo_id, subset in enumerate(itertools.combinations(range(n_blocks), combo)):
        key = None
        for b in subset:
            key = blocks[b] if key is None else F.shiftleft(key, width) + blocks[b]
        keys.append((combo_id, key))
    return keys


def hamming_dup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
    n_blocks: int = 8,
    combo: int = 2,
    bits: int = 64,
) -> DataFrame:
    """Near-duplicate pairs over any ``bits``-bit hash column (the image
    analog of ``simhash_dup_pairs``: perceptual dedup on the crawl's
    stored ``phash:int64``) by COMBINATION-BLOCK banding, then exact
    ``bit_count(xor)`` filtering. Returns (id_a, id_b, hamming).

    Why not plain pigeonhole banding: exact recall at radius r needs
    r+1 blocks, and 64 bits / 7 blocks leaves ~9-bit block values —
    512 distinct join keys. At 10^10 rows that is ~2·10^7 rows per
    bucket and a quadratic within-bucket blow-up; the band join itself
    becomes the skew bottleneck. Joining instead on every
    ``combo``-subset of blocks (Manku et al.'s permuted-table idea /
    multi-index hashing, both public) widens the key to
    ``combo · 64/n_blocks`` bits at the cost of C(n_blocks, combo)
    rows per input row, while keeping the same exact-recall guarantee
    (>= combo clean blocks whenever n_blocks - max_hamming >= combo).

    Defaults (r=6, m=8, c=2): 28 rows/input, 16-bit keys over 28 combo
    partitions ≈ 1.8M buckets. At 10^10 images pick c=3 with r<=5
    (C(8,3)=56 combos, 24-bit keys ≈ 9·10^8 buckets) — the parameters
    trade row multiplication against bucket cardinality explicitly;
    both are plain equi-joins Catalyst shuffles on the combo key, with
    AQE skew-split handling any residual hot bucket.
    """
    if n_blocks - max_hamming < combo:
        raise ValueError(
            f"no exact-recall guarantee: n_blocks({n_blocks}) - "
            f"max_hamming({max_hamming}) < combo({combo})"
        )
    keys = hamming_block_keys(
        F.col(hash_col), bits=bits, n_blocks=n_blocks, combo=combo
    )
    banded = (
        with_min_parallelism(df.select(id_col, hash_col))
        .select(
            id_col,
            hash_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(cid).cast("int").alias("combo_id"),
                            key.alias("key"),
                        )
                        for cid, key in keys
                    ]
                )
            ).alias("_ck"),
        )
        .select(
            id_col,
            hash_col,
            F.col("_ck.combo_id").alias("combo_id"),
            F.col("_ck.key").alias("key"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}")))
    return (
        a.join(
            b,
            (F.col("a.combo_id") == F.col("b.combo_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perms: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, perm, minhash) rows.

    Production path (portable=False): each distinct shingle is hashed
    ONCE (xxhash64, JVM intrinsic), the N permutation values are affine
    transforms ``(a_i·h + b_i) mod P`` in pure int arithmetic, and all N
    mins ride ONE hash-aggregate over the un-exploded shingle rows —
    no per-perm row multiplication, no per-perm string concat (the 8×
    string traffic was the measured bottleneck, VERDICT r2). The wide
    aggregate then unpivots to the (id, perm, minhash) shape.

    Portable path (portable=True): per-(perm, shingle) md5 string hash,
    kept bit-reproducible for the DuckDB oracle twin
    (queries.py:minhash_signatures)."""
    if portable:
        # Wide one-pass aggregate over tokenize-once distinct shingle
        # rows (round 6) — hash inputs byte-identical to the old
        # exploded form (md5 of 'perm:shingle', perm as decimal string),
        # then a cheap n_docs x n_perms unpivot to the row shape.
        sh = T.distinct_shingle_rows(
            with_min_parallelism(df), text_col, id_col, shingle_k,
            out_col="_sh",
        )
        wide = sh.groupBy(id_col).agg(
            *[
                F.min(
                    portable_hash(F.concat(F.lit(f"{p}:"), F.col("_sh")))
                ).alias(f"_mh{p}")
                for p in range(n_perms)
            ]
        )
        pm = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("perm"),
                        F.col(f"_mh{p}").alias("minhash"),
                    )
                    for p in range(n_perms)
                ]
            )
        ).alias("_pm")
        return wide.select(id_col, pm).select(
            id_col,
            F.col("_pm.perm").alias("perm"),
            F.col("_pm.minhash").alias("minhash"),
        )
    wide = _minhash_wide(
        _shingle_rows(df, text_col, id_col, shingle_k), id_col, n_perms
    )
    pm = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).cast("long").alias("perm"),
                    F.col(f"_mh{p}").alias("minhash"),
                )
                for p in range(n_perms)
            ]
        )
    ).alias("_pm")
    return wide.select(id_col, pm).select(
        id_col, F.col("_pm.perm").alias("perm"), F.col("_pm.minhash").alias("minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", band_rows: int = 2
) -> DataFrame:
    """Band the signature rows, join docs sharing any identical band."""
    bands = (
        signatures.withColumn("band_id", (F.col("perm") / band_rows).cast("long"))
        .groupBy(id_col, "band_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def verify_pairs_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Re-verify LSH candidate pairs by EXACT shingle Jaccard >= tau.

    Banding proposes, exact similarity disposes: with few bands, two
    documents agreeing on one band can sit well below the target
    similarity, and clustering unverified candidates transitively merges
    such false positives into giant mixed clusters. Production pipelines
    therefore verify before closure. Shapes: documents are first
    SEMI-JOINED down to the ids the candidate list names (round 6 —
    verify cost is proportional to the candidate set, so shingling and
    size-counting the full corpus was pure waste; the semi-join is a
    keyed equi-join AQE turns into a broadcast when the id list is
    small), then the per-doc DISTINCT shingle frame (the count-based
    Jaccard needs the distinct, unlike the min-aggregate signature path)
    is joined twice against the candidate list by (doc id, shingle
    equality) — per-pair fan-out bounded by doc length, never all-pairs.
    Columns in/out: (id_a, id_b) -> (id_a, id_b, jaccard).
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0,1], got {tau}")
    # The candidate list is consumed three times (the id semi-join below
    # plus both verify joins); when it arrives as an unmaterialized LSH
    # pipeline each consumer would re-derive it beyond what runtime
    # exchange reuse covers. A LAZY localCheckpoint materializes the
    # O(candidate) pair rows once inside the first action — bounded by
    # the near-dup count by construction, and recomputed per invocation
    # (no cross-run state).
    pairs = pairs.localCheckpoint(eager=False)
    cand_ids = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    ).distinct()
    # Per-doc shingle SETS as arrays of 8-byte xxhash64 values, one row
    # per candidate doc (round 6): the old shape exploded candidate docs
    # into (doc, shingle) rows and paid two multi-million-row keyed
    # joins; folding each doc's distinct shingles into a hashed array
    # first makes both joins id-keyed over |candidate docs| rows, and
    # the per-pair overlap is ``size(array_intersect(...))`` — the exact
    # same distinct-shingle intersection count (set semantics, arrays
    # are duplicate-free by construction). The string→int hashing is
    # applied after array_distinct, so counts are unchanged absent a
    # 64-bit collision within one document's shingle set (~1e-12
    # corpus-wide). Array size is bounded by doc length and the frame by
    # the candidate set — the whole verify is candidate-proportional.
    # The per-doc hashed shingle SET is built map-only (round-6 second
    # pass): ``transform(array_distinct(...), xxhash64)`` produces the
    # exact array the old explode → groupBy-collect_list shape
    # re-assembled, without the explode, the ObjectHashAggregate, or its
    # exchange — the array never leaves the row. A null-text doc now
    # carries a null set instead of being absent, which downstream is
    # identical: its pairs' jaccard is null and the tau filter drops
    # them either way. Consumed twice (sa and sb), so a lazy checkpoint
    # still materializes the O(candidate docs) arrays once; together
    # with the pairs checkpoint this cut the end-to-end verified query
    # 5.1 s → 3.8 s at the 50k-doc scale stand-in.
    w = df.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), T.word_tokens(F.col(text_col)).alias("_w")
    )
    arr = F.transform(
        F.array_distinct(T.shingles_of_tokens(F.col("_w"), shingle_k)),
        lambda s: F.xxhash64(s),
    )
    # _set is projected FIRST and _n derived from the column in a second
    # select: HOF lambdas fall back to interpreted projection where a
    # twice-referenced `arr` is evaluated twice per row (no codegen
    # subexpression elimination) — measured 4.26 → 3.82 s end-to-end at
    # the 50k-doc stand-in. The double reference to _set below also
    # keeps CollapseProject from inlining it back.
    sets = (
        w.select(F.col(id_col), arr.alias("_set"))
        .select(F.col(id_col), F.col("_set"), F.size("_set").alias("_n"))
        .localCheckpoint(eager=False)
    )
    sa, sb = sets.alias("sa"), sets.alias("sb")
    shared = F.size(F.array_intersect(F.col("sa._set"), F.col("sb._set")))
    jac = shared.cast("double") / (
        F.col("sa._n") + F.col("sb._n") - shared
    )
    return (
        pairs.join(sa, F.col(f"sa.{id_col}") == F.col("id_a"))
        .join(sb, F.col(f"sb.{id_col}") == F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= tau)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """32-bit SimHash per document: per word-occurrence hash, each bit
    votes ±1, sign of the vote sum sets the bit. Flat plan: explode words,
    one hash-aggregate with 32 conditional sums (no bit-row explosion).
    """
    h32 = portable_hash32 if portable else (lambda c: F.abs(F.xxhash64(c)) % (1 << 32))
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    df = with_min_parallelism(df)
    words = df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("_w")
    ).withColumn("_h", h32(F.col("_w")))
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"_b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.alias("simhash"))


def simhash_dup_pairs(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-dup pairs by banded hamming: split the 32-bit hash into
    ``n_bands`` bytes; any pair within ``max_hamming <= n_bands - 1`` bit
    flips shares at least one identical band (pigeonhole), so the band
    equi-join finds all of them without a cartesian product; exact
    hamming (bit_count of xor) then filters."""
    width = SIMHASH_BITS // n_bands
    banded = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND((1 << width) - 1)
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
