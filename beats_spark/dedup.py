"""Deduplication operators for large-scale training-data pipelines.

Five flavors, all DataFrame-native:

- exact: hash-groupBy on normalized text (one shuffle on the hash key);
- MinHash + LSH: char-shingles → K minhashes → B bands → band-bucket
  self-join → exact Jaccard verify. Shingling/minhashing run entirely in
  JVM whole-stage codegen (transform/aggregate over arrays — no Python);
- SimHash: 64-bit signature via Arrow-vectorized numpy (bit-parallel),
  near-dup = Hamming distance ≤ t within LSH-style chunk buckets;
- n-gram Jaccard: exact pairwise verify used standalone on small candidate
  sets (blocking by length bucket);
- embedding cosine: see beats_spark.similarity (near-dup = cos ≥ τ).

Scale shape: every stage is a map or a shuffle on a dedup key; candidate
generation never does an unblocked cross join. At 100 TB, band hashing
bounds the self-join to per-bucket groups; a salt cap (`max_bucket`) guards
degenerate buckets (all-identical spam shingles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scale import truncate_lineage


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per normalized-text hash.

    One shuffle keyed on the 256-bit hash; Spark's hash aggregate does
    map-side partials so duplicate-heavy data shrinks before the exchange.
    """
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    return (
        df.withColumn("_dedup_key", h)
        .groupBy("_dedup_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


# -- char shingles + minhash (all JVM expressions) ---------------------------


def shingles_expr(norm_col: str, k: int = 5) -> Column:
    """Distinct char k-shingles over a PRE-NORMALIZED text column, as
    array<string>. SQL expr because substr needs a dynamic start position;
    takes a materialized column (not an expression) so Catalyst doesn't
    re-evaluate normalization once per array element."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({norm_col}) - {k - 1}, 1)),"
        f" i -> substr({norm_col}, i, {k})))"
    )


_MERSENNE_31 = 2147483647  # 2^31 - 1


def _affine_params(i: int) -> tuple[int, int]:
    """Deterministic pseudo-random 31-bit (a, b) for hash family member i
    (a odd and non-zero, the classic universal-hashing requirement)."""
    import hashlib

    d = hashlib.sha256(f"minhash-{i}".encode()).digest()
    a = (int.from_bytes(d[:4], "big") % (_MERSENNE_31 - 1)) | 1
    b = int.from_bytes(d[4:8], "big") % _MERSENNE_31
    return a, b


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """K independent minhashes via universal hashing, computed in a SINGLE
    fold over the shingles: per shingle one xxhash64 (bound to a lambda
    variable, so it is evaluated once — K separate transform expressions
    would each re-evaluate it), then the K family members are cheap 31-bit
    affine transforms min((h·a_i + b_i) mod (2^31-1)) merged into the
    running minima with zip_with/least. h, a, b < 2^31 keeps every product
    below 2^62, so ANSI mode can't overflow. Pure Column expressions →
    whole-stage codegen; K×|shingles| multiply-adds + |shingles| hashes.

    (History note: the one-hash-per-seed formulation must NOT use a
    two-parameter lambda (`lambda s, i=i`) with F.transform — that is the
    (element, index) form and silently binds `i` to the array INDEX,
    collapsing all K hash functions into one and gutting LSH recall.)
    """
    m = F.lit(_MERSENNE_31)
    consts = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in (_affine_params(i) for i in range(num_hashes))
    ])
    init = F.expr(
        f"transform(sequence(1, {num_hashes}), x -> cast({_MERSENNE_31} as bigint))"
    )
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.element_at(
            F.transform(
                F.array(F.pmod(F.xxhash64(s), m)),
                lambda h: F.zip_with(
                    acc,
                    consts,
                    lambda mn, ab: F.least(
                        mn, F.pmod(h * ab["a"] + ab["b"], m)
                    ),
                ),
            ),
            1,
        ),
    )


def minhash_signature_from_hashes(hash_col: Column, num_hashes: int = 64) -> Column:
    """Signature from a MATERIALIZED array of pre-modded shingle hashes:
    K array_min passes of pure multiply-add — no per-shingle accumulator
    allocation, no re-hash. Only valid when `hash_col` is a real column
    (e.g. behind a localCheckpoint); as a live expression Catalyst's
    projection collapse would inline the hashing into all K branches."""
    m = F.lit(_MERSENNE_31)

    def _affine(i: int):
        a, b = _affine_params(i)
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), m)

    return F.array(*[
        F.array_min(F.transform(hash_col, _affine(i)))
        for i in range(num_hashes)
    ])


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (assumed distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    return (inter / (F.size(a) + F.size(b) - inter)).cast("double")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    max_bucket: int = 1000,
    reliable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    shingle → per-shingle hash → EXPLODE → K codegen'd min() aggregates
    (one hash aggregate computes the whole signature; map-side partials
    shrink the shuffle to |docs|×K) → band hashes as plain columns →
    explode(bands) → self-join per (band, band_hash) bucket → candidates
    as bare id pairs → exact-Jaccard verify joining the shingle arrays
    back BY ID (arrays never travel through the candidate join).

    Why explode+aggregate instead of array transforms: Spark higher-order
    functions are interpreted per element, never whole-stage-codegen'd —
    K×|shingles| interpreted lambda evaluations dominated the profile
    (measured 7s vs <1s for the aggregate shape on 1M shingles × 64).
    """
    rows_per_band = num_hashes // bands
    # one 64-bit hash per shingle; the string shingles are never carried
    # further — banding AND the exact verify both run on the longs (verify
    # exact up to 64-bit hash collisions: P ≈ |sh|²/2⁶⁴ per pair). The
    # frame is materialized once for the signature agg + verify joins.
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            normalize_text(F.col(text_col)).alias("_norm"),
        )
        .withColumn("_sh", shingles_expr("_norm", shingle_k))
        .select("_id", F.expr("transform(_sh, s -> xxhash64(s))").alias("_hv"))
    )
    # lineage cut: `base` feeds the signature agg AND both verify joins —
    # without it the shingle scan re-runs 3×. eager=False defers the
    # materializing job to the first action (constructing the pairs frame
    # must not itself run computation); reliable=True survives executor
    # loss on a real cluster (see scale.truncate_lineage).
    base = truncate_lineage(base, reliable=reliable, eager=False)
    hashed = base.select(
        "_id",
        F.explode(
            F.expr(f"transform(_hv, h -> pmod(h, {_MERSENNE_31}))")
        ).alias("_h"),
    )
    m = F.lit(_MERSENNE_31)
    mins = []
    for i in range(num_hashes):
        a, b = _affine_params(i)
        mins.append(
            F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), m)).alias(f"_m{i}")
        )
    sig = hashed.groupBy("_id").agg(*mins)
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"_m{b * rows_per_band + r}")
                              for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.bhash")

    # degenerate-bucket guard: cap bucket size (spam shingles / empty docs)
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bhash").orderBy("_id")
    banded = banded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    )

    left = banded.select("band", "bhash", F.col("_id").alias("id_a"))
    right = banded.select("band", "bhash", F.col("_id").alias("id_b"))
    cand = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(F.col("_id").alias("id_a"), F.col("_hv").alias("hv_a"))
    gb = base.select(F.col("_id").alias("id_b"), F.col("_hv").alias("hv_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard", jaccard(F.col("hv_a"), F.col("hv_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **kw
) -> DataFrame:
    """Docs to DROP: connected to a lower-id near-duplicate. (Single-link
    union is approximated by 'keep a doc iff it has no lower-id neighbor' —
    one extra join instead of an iterative connected-components pass; for
    true transitivity use `minhash_dedup_cc`.)"""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def minhash_dedup_cc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **kw
) -> DataFrame:
    """True transitive dedup: keep exactly one doc (the min id) per
    connected component of the near-dup graph. Chains a~b~c where
    jaccard(a,c) < threshold still collapse to one survivor — the
    single-link semantics `minhash_dedup` only approximates.

    Pairs come from the banded LSH join; components from the O(log n)
    alternating-star pass in beats_spark.graph (all shuffles keyed on doc
    id, no driver-side graph state)."""
    from beats_spark.graph import connected_components

    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    comp = connected_components(pairs, reliable=kw.get("reliable", False))
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT token-set Jaccard similarity join via prefix filtering
    (AllPairs/PPJoin family, Bayardo et al. WWW'07) — provably no missed
    pairs, unlike the minhash-banded candidate generation.

    Key fact: sort each doc's token set by ascending global frequency and
    keep only the first |g| - ceil(t·|g|) + 1 tokens (the "prefix"); any
    two sets with jaccard ≥ t MUST share a prefix token. Candidate
    generation is then a plain equi-join on the inverted index of prefix
    tokens — and because prefixes are each doc's globally RAREST tokens,
    posting lists stay short exactly where a naive token join explodes.
    A length filter (t·|A| ≤ |B|) prunes candidates before the exact
    verify.

    Shuffles: one token-frequency groupBy, one re-agg per doc, one
    equi-join on prefix token, one dedup. No cross join, no driver state.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("_g"),
    )
    return _prefix_filter_pairs(base, threshold)


def _rarest_first(base: DataFrame) -> DataFrame:
    """Re-sort each (_id, _g: array<string>) set rarest-token-first using
    (global count, token) as the key — the AllPairs prefix ordering. No
    global row_number window (which would single-partition the sort at
    scale); shared by the symmetric Jaccard join and the asymmetric
    containment join so the ranking can never drift between them."""
    exploded = base.select("_id", F.explode("_g").alias("g"))
    freq = exploded.groupBy("g").agg(F.count("*").alias("cnt"))
    return (
        exploded.join(freq, "g")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cnt"), F.col("g")))
            ).alias("_sorted")
        )
        .select("_id", F.expr("transform(_sorted, x -> x.g)").alias("_g"))
    )


def _prefix_filter_pairs(base: DataFrame, threshold: float) -> DataFrame:
    """AllPairs/PPJoin core over a prepared (_id, _g: array<string>) frame:
    exact Jaccard pairs (id_a < id_b, jaccard ≥ threshold) with
    inter_size/union_size. See prefix_filter_jaccard_pairs for the
    algorithm; factored out so n-gram (and any other set representation)
    reuses the same exact candidate engine.

    base feeds FOUR consumers (the inverted-index explode twice — token
    frequency and the per-doc re-sort join — plus both exact-verify
    array joins). A truncate_lineage(base) cut was A/B-tested here
    (fresh-JVM sf0.1, r5 second session): 5.58→6.13 s — the
    materialization job does NOT repay itself at this path's documented
    1k-doc oracle caps, where set construction is cheap; containment_pairs
    (uncapped corpus slice, same shape) keeps the cut because its A/B
    said 3.58→2.03 s. Re-cut if the caps are lifted."""
    ranked = _rarest_first(base)
    prefixed = ranked.withColumn(
        "_prefix",
        F.expr(
            f"slice(_g, 1, size(_g) - cast(ceil({threshold} * size(_g)) as int) + 1)"
        ),
    )
    inv = prefixed.select(
        "_id", F.size("_g").alias("_len"), F.explode("_prefix").alias("g")
    )
    a = inv.select("g", F.col("_id").alias("id_a"), F.col("_len").alias("len_a"))
    b = inv.select("g", F.col("_id").alias("id_b"), F.col("_len").alias("len_b"))
    cand = (
        a.join(b, "g")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("len_b") * threshold <= F.col("len_a"))
            & (F.col("len_a") * threshold <= F.col("len_b"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(F.col("_id").alias("id_a"), F.col("_g").alias("g_a"))
    gb = base.select(F.col("_id").alias("id_b"), F.col("_g").alias("g_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter_size", inter)
        .withColumn(
            "union_size",
            F.size("g_a") + F.size("g_b") - F.col("inter_size"),
        )
        # integer cross-multiply ≥ test: exact, no float rounding to
        # diverge from an independent engine's arithmetic
        .where(F.col("inter_size") >= F.lit(threshold) * F.col("union_size"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter_size") / F.col("union_size"), 6),
        )
        .select("id_a", "id_b", "inter_size", "union_size", "jaccard")
    )


# -- simhash (vectorized numpy over Arrow batches) ---------------------------


def _md5_token_hashes(flat: np.ndarray) -> np.ndarray:
    """64-bit token hash = first 8 bytes of md5(token), big-endian.

    md5 exists in Spark, DuckDB, and hashlib with identical output, so the
    WHOLE simhash pipeline is reproducible in the SQL oracle (the previous
    pd.util.hash_array siphash was engine-private). Python md5 runs once
    per UNIQUE token in the Arrow batch (np.unique inverse-mapping), not
    per occurrence — vocabulary ≪ token count."""
    uniq, inv = np.unique(flat, return_inverse=True)
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return vals[inv]


def simhash_series(texts: pd.Series) -> pd.Series:
    """64-bit simhash per text: sign of per-bit sum of token-hash bits.

    Batch-vectorized: all tokens of the Arrow batch are flattened into one
    array, md5-hashed per unique token (`_md5_token_hashes`), expanded to a
    bit matrix, and segment-summed per document — per-UNIQUE-token Python
    only, all per-occurrence work in numpy."""
    tok_lists = texts.map(
        lambda t: str(t).lower().split() if t is not None else []
    )
    lengths = tok_lists.map(len).to_numpy()
    n_docs = len(texts)
    sig = np.zeros(n_docs, dtype=np.int64)
    if lengths.sum() == 0:
        return pd.Series(sig, index=texts.index)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    hashes = _md5_token_hashes(flat)  # (N,) uint64, deterministic
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)  # (N, 64)
    doc_ids = np.repeat(np.arange(n_docs), lengths)
    sums = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(sums, doc_ids, bits)
    votes = sums * 2 - lengths[:, None]
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    packed = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
    return pd.Series(packed.astype(np.int64), index=texts.index)


def simhash(df: DataFrame, text_col: str = "text", target: str = "simhash") -> DataFrame:
    @F.pandas_udf(T.LongType())
    def _udf(s: pd.Series) -> pd.Series:
        return simhash_series(s)

    return df.withColumn(target, _udf(F.col(text_col)))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash: block on 4 × 16-bit chunks (any pair within
    Hamming ≤ 3 of a 64-bit signature shares at least one exact 16-bit chunk
    — pigeonhole), verify Hamming exactly via bit_count(xor)."""
    sh = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    chunks = sh.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("_c"),
    ).select("_id", "simhash", "_c.chunk", "_c.cval")
    a = chunks.select("chunk", "cval", F.col("_id").alias("id_a"),
                      F.col("simhash").alias("sh_a"))
    b = chunks.select("chunk", "cval", F.col("_id").alias("id_b"),
                      F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    max_bucket: int = 1000,
    exact: bool = False,
    reliable: bool = False,
) -> DataFrame:
    """Word-n-gram Jaccard pairs (id_a < id_b, jaccard ≥ threshold), exact
    verify in both modes; `exact` selects the candidate generator:

    - exact=False (default, the scale path): MinHash-band equi-join on
      (band, bhash). A length-bucket range join is quadratic within buckets
      (measured: 8+ minutes at 5k docs); banding keeps candidate generation
      a plain equi-join at any scale. With 8 bands of 2 hashes a true pair
      at J≥0.5 is missed with probability (1-J²)⁸ ≤ 1.0%.
    - exact=True: prefix-filter inverted index on each doc's globally
      rarest grams (AllPairs, Bayardo WWW'07) — provably no missed pairs,
      so the result is brute-force oracle-able in an independent engine.

    Candidates travel as BARE id pairs in both modes; gram arrays are
    joined back BY ID only for the exact-Jaccard verify (mirroring
    minhash_lsh_pairs), so array payloads never ride the band join or the
    dropDuplicates exchange. Signatures come from the explode + K
    codegen'd min() aggregate shape (higher-order array lambdas are
    interpreted per element — the measured-slow path)."""
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(_toks, i, {n}))))"
    )
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
        )
        .withColumn("_g", grams)
        .drop("_toks")
    )
    # gram arrays feed candidate generation AND both verify joins; cut the
    # lineage so tokenization runs once. eager=False: constructing the
    # pairs frame triggers no job. reliable=True for cluster durability.
    base = truncate_lineage(base, reliable=reliable, eager=False)
    verify_jaccard = F.round(
        F.col("inter_size") / F.col("union_size"), 6
    ).alias("jaccard")
    if exact:
        return _prefix_filter_pairs(base, threshold).select(
            "id_a", "id_b", "jaccard"
        )
    hashed = base.select(
        "_id",
        F.explode(
            F.expr(f"transform(_g, s -> pmod(xxhash64(s), {_MERSENNE_31}))")
        ).alias("_h"),
    )
    m = F.lit(_MERSENNE_31)
    mins = []
    for i in range(num_hashes):
        a_, b_ = _affine_params(i)
        mins.append(
            F.min(F.pmod(F.col("_h") * F.lit(a_) + F.lit(b_), m)).alias(f"_m{i}")
        )
    sig = hashed.groupBy("_id").agg(*mins)
    rows_per_band = num_hashes // bands
    banded = sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col(f"_m{b * rows_per_band + r}")
                                 for r in range(rows_per_band)]).alias("bhash"),
                )
                for b in range(bands)
            ])
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.bhash")
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bhash").orderBy("_id")
    banded = banded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    )
    a = banded.select("band", "bhash", F.col("_id").alias("id_a"))
    b = banded.select("band", "bhash", F.col("_id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(F.col("_id").alias("id_a"), F.col("_g").alias("g_a"))
    gb = base.select(F.col("_id").alias("id_b"), F.col("_g").alias("g_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter_size", inter)
        .withColumn(
            "union_size", F.size("g_a") + F.size("g_b") - F.col("inter_size")
        )
        .where(F.col("inter_size") >= F.lit(threshold) * F.col("union_size"))
        .select("id_a", "id_b", verify_jaccard)
    )


def decontaminate(
    df: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    probe_text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    target: str = "contaminated",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    at least one word n-gram (default 13, the GPT-3/PaLM convention) with
    the probe (benchmark/eval) corpus.

    Scale shape: the corpus side explodes to DISTINCT (id, xxhash64(gram))
    pairs — 8 bytes per gram, never the gram strings; the probe side is a
    distinct hash set, typically millions of rows at most (benchmarks are
    small), so the membership test is a BROADCAST left-semi join: the 100 TB
    side is never shuffled. Tokenization is lower+whitespace; documents
    shorter than n tokens contribute their full token run as a single gram
    (both sides build grams identically, so the contract is symmetric).

    Reference parity note: no analogue in mjwolf/beats (training-data
    mandate); the n-gram overlap rule follows Brown et al. 2020 (GPT-3,
    appendix C) / Chowdhery et al. 2022 (PaLM, §6.1).
    """
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
        f" i -> xxhash64(concat_ws(' ', slice(_toks, i, {n})))))"
    )

    def _hashed(frame: DataFrame, col: str, with_id: bool) -> DataFrame:
        toks = frame.where(F.col(col).isNotNull()).select(
            *([F.col(id_col).alias("_id")] if with_id else []),
            F.split(F.trim(F.lower(F.col(col))), r"\s+").alias("_toks"),
        )
        return toks.select(
            *([F.col("_id")] if with_id else []),
            F.explode(grams).alias("_h"),
        )

    doc_h = _hashed(df, text_col, True)
    probe_h = _hashed(probe, probe_text_col, False).distinct()
    hits = (
        doc_h.join(F.broadcast(probe_h), "_h", "left_semi")
        .select("_id")
        .distinct()
        .withColumn(target, F.lit(True))
        .withColumnRenamed("_id", id_col)
    )
    return df.join(hits, id_col, "left").withColumn(
        target, F.coalesce(F.col(target), F.lit(False))
    )


# sentence tokenizer shared by span_dedup and its DuckDB oracle: runs up to
# and including trailing terminal punctuation, plus a possible unterminated
# tail — the two alternatives partition EVERY character of the text (no
# content can be lost), and the syntax is expressible identically in Java
# regex and RE2 (no lookaround)
SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+"
_SPAN_SEP = "\x1f"


def sentences_expr(text_col: str) -> Column:
    """Trimmed, non-empty sentences of a document (deterministic regex
    tokenization — the oracle-compatible stand-in for a linguistic
    sentence splitter)."""
    raw = F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), F.lit(0))
    return F.filter(F.transform(raw, lambda s: F.trim(s)),
                    lambda s: s != "")


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_sents: int = 3,
) -> DataFrame:
    """C4 three-sentence-span global dedup (Raffel et al. 2020 §2.2: "we
    discarded all but one of any three-sentence span occurring more than
    once in the data set"). For every `span_sents`-sentence window that
    occurs more than once corpus-wide, only the first occurrence (min
    (doc_id, span_idx)) keeps its sentences; every other occurrence has its
    covered sentences removed. Emits ``n_sentences``, ``n_removed`` and
    ``deduped`` (kept sentences re-joined with single spaces — whitespace
    is normalized, content is not).

    Scale shape — the 100 TB property is that TEXT NEVER SHUFFLES:
      1. span hashes are built map-side from the sentence array (one
         xxhash64 per window — the 1-hash-per-element regime where an
         in-array fold/transform beats explode, per doc_fingerprint's A/B);
      2. the global first-occurrence resolution shuffles bare
         (hash, doc_id, span_idx) triples — 24 bytes per span;
      3. removed sentence indexes aggregate back to one short array per
         AFFECTED doc and join the original frame BY ID — broadcast while
         the affected-doc set fits (it's orders smaller than the corpus;
         stats/AQE pick this automatically, the plan gate in test_plans
         pins it at test scale), degrading to one by-id hash join — the
         only exchange text can ever ride, and none of the span-resolution
         shuffles;
      4. the rebuild is an in-array filter against that index set.
    Duplicate-span equality is on xxhash64 of the joined window, so a 64-bit
    collision could remove a non-duplicate span (same accepted odds as
    decontaminate); the oracle dedups on the span STRINGS and would catch
    one as a hash mismatch.
    """
    k = span_sents
    sents = sentences_expr(text_col)
    base = df.withColumn("_sents", sents).withColumn(
        "n_sentences", F.size("_sents")
    )
    span_hashes = F.when(
        F.col("n_sentences") >= k,
        F.transform(
            F.sequence(F.lit(1), F.col("n_sentences") - (k - 1)),
            lambda i: F.xxhash64(
                F.concat_ws(
                    _SPAN_SEP,
                    *[F.element_at(F.col("_sents"), i + off) for off in range(k)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    occ = base.select(
        F.col(id_col).alias("_id"), F.posexplode(span_hashes).alias("_pos0", "_h")
    ).select("_id", (F.col("_pos0") + 1).alias("_span_idx"), "_h")

    per_hash = occ.groupBy("_h").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("_id", "_span_idx")).alias("_owner"),
    )
    dups = (
        occ.join(per_hash.where(F.col("_cnt") > 1), "_h")
        .where(
            (F.col("_id") != F.col("_owner._id"))
            | (F.col("_span_idx") != F.col("_owner._span_idx"))
        )
        .select("_id", "_span_idx")
    )
    removed = (
        dups.select(
            "_id",
            F.explode(
                F.sequence(F.col("_span_idx"), F.col("_span_idx") + (k - 1))
            ).alias("_ridx"),
        )
        .groupBy("_id")
        .agg(F.array_sort(F.collect_set("_ridx")).alias("_removed"))
    )

    out = base.join(
        removed.withColumnRenamed("_id", id_col), id_col, "left"
    )
    kept = F.filter(
        F.col("_sents"),
        lambda s, i: ~F.coalesce(
            F.array_contains(F.col("_removed"), i + 1), F.lit(False)
        ),
    )
    return (
        out.withColumn("n_removed", F.coalesce(F.size("_removed"), F.lit(0)))
        .withColumn("deduped", F.array_join(kept, " "))
        .drop("_sents", "_removed")
    )


def span_dedup_oracle(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id", span_sents: int = 3,
                      where: str = "TRUE") -> str:
    """DuckDB twin of span_dedup, deduping on span STRINGS (no hashing) —
    an independent algorithm: window row_number for first-occurrence
    instead of min-struct aggregation."""
    k = span_sents
    sents = (
        f"list_filter(list_transform(regexp_extract_all({text_col},"
        f" '{SENTENCE_RE}'), s -> trim(s)), s -> s != '')"
    )
    span = " || chr(31) || ".join(f"sents[i+{off}]" for off in range(k))
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {sents} AS sents
  FROM {table} WHERE {text_col} IS NOT NULL AND ({where})
),
occ AS (
  SELECT _id, i AS span_idx, {span} AS span
  FROM base, unnest(range(1, greatest(len(sents) - {k - 1}, 0) + 1)) AS t(i)
),
marked AS (
  SELECT _id, span_idx,
         row_number() OVER (PARTITION BY span ORDER BY _id, span_idx) AS rn,
         count(*) OVER (PARTITION BY span) AS cnt
  FROM occ
),
removed AS (
  SELECT _id, list_sort(list_distinct(list(span_idx + off.o))) AS ridx
  FROM marked, (SELECT unnest(range(0, {k})) AS o) off
  WHERE cnt > 1 AND rn > 1
  GROUP BY _id
),
joined AS (
  SELECT b._id, b.sents, coalesce(r.ridx, []) AS ridx
  FROM base b LEFT JOIN removed r USING (_id)
)
SELECT _id AS {id_col}, len(sents) AS n_sentences,
       len(ridx) AS n_removed,
       coalesce(array_to_string(
         list_filter(list_transform(range(1, len(sents) + 1),
                     i -> CASE WHEN NOT list_contains(ridx, i)
                               THEN sents[i] END),
                     x -> x IS NOT NULL), ' '), '') AS deduped
FROM joined
"""


def exact_substr_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """ExactSubstr dedup at token granularity (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" §4.1: remove
    every duplicated substring of >= N tokens, keeping one occurrence).
    span_dedup's token-level twin: any `window`-token span occurring more
    than once corpus-wide keeps only its first occurrence (min (doc_id,
    pos)); every other occurrence has its covered token positions removed.
    Tokens are the module-wide whitespace tokenizer (trim+lower), so
    duplicates that straddle sentence boundaries — invisible to the
    sentence-window C4 pass — are caught. Emits ``n_tokens``,
    ``n_removed`` and ``deduped`` (kept tokens re-joined with spaces).

    Scale shape is identical to span_dedup (the 100 TB property is that
    TEXT NEVER SHUFFLES): window hashes fold map-side from the token array
    (one xxhash64 per position), the global first-occurrence resolution
    shuffles bare (hash, id, pos) triples, removed positions aggregate to
    one short array per AFFECTED doc and join back BY ID, and the rebuild
    is an in-array filter. Reference analogue: the suffix-array ExactSubstr
    tool is a separate Rust binary in the paper's repo; here the same
    semantics ride the engine's own shuffle machinery. 64-bit window-hash
    collisions could remove a non-duplicate span (same accepted odds as
    span_dedup/decontaminate); the oracle dedups on the window STRINGS and
    would surface one as a hash mismatch.
    """
    k = window
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.withColumn("_toks", toks).withColumn(
        "n_tokens", F.size("_toks")
    )
    win_hashes = F.when(
        F.col("n_tokens") >= k,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - (k - 1)),
            lambda i: F.xxhash64(
                F.concat_ws(
                    _SPAN_SEP,
                    *[F.element_at(F.col("_toks"), i + off) for off in range(k)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    occ = base.select(
        F.col(id_col).alias("_id"), F.posexplode(win_hashes).alias("_pos0", "_h")
    ).select("_id", (F.col("_pos0") + 1).alias("_pos"), "_h")

    per_hash = occ.groupBy("_h").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("_id", "_pos")).alias("_owner"),
    )
    dups = (
        occ.join(per_hash.where(F.col("_cnt") > 1), "_h")
        .where(
            (F.col("_id") != F.col("_owner._id"))
            | (F.col("_pos") != F.col("_owner._pos"))
        )
        .select("_id", "_pos")
    )
    removed = (
        dups.select(
            "_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + (k - 1))
            ).alias("_ridx"),
        )
        .groupBy("_id")
        .agg(F.array_sort(F.collect_set("_ridx")).alias("_removed"))
    )

    out = base.join(
        removed.withColumnRenamed("_id", id_col), id_col, "left"
    )
    kept = F.filter(
        F.col("_toks"),
        lambda s, i: ~F.coalesce(
            F.array_contains(F.col("_removed"), i + 1), F.lit(False)
        ),
    )
    return (
        out.withColumn("n_removed", F.coalesce(F.size("_removed"), F.lit(0)))
        .withColumn("deduped", F.array_join(kept, " "))
        .drop("_toks", "_removed")
    )


def exact_substr_dedup_oracle(table: str = "documents",
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              window: int = 50) -> str:
    """DuckDB twin of exact_substr_dedup, deduping on token-window STRINGS
    (no hashing) — an independent algorithm: window row_number for
    first-occurrence instead of min-struct aggregation."""
    k = window
    toks = f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"
    span = " || chr(31) || ".join(f"toks[i+{off}]" for off in range(k))
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {toks} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
),
occ AS (
  SELECT _id, i AS pos, {span} AS win
  FROM base, unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS t(i)
),
marked AS (
  SELECT _id, pos,
         row_number() OVER (PARTITION BY win ORDER BY _id, pos) AS rn,
         count(*) OVER (PARTITION BY win) AS cnt
  FROM occ
),
removed AS (
  SELECT _id, list_sort(list_distinct(list(pos + off.o))) AS ridx
  FROM marked, (SELECT unnest(range(0, {k})) AS o) off
  WHERE cnt > 1 AND rn > 1
  GROUP BY _id
),
joined AS (
  SELECT b._id, b.toks, coalesce(r.ridx, []) AS ridx
  FROM base b LEFT JOIN removed r USING (_id)
)
SELECT _id AS {id_col}, len(toks) AS n_tokens,
       len(ridx) AS n_removed,
       coalesce(array_to_string(
         list_filter(list_transform(range(1, len(toks) + 1),
                     i -> CASE WHEN NOT list_contains(ridx, i)
                               THEN toks[i] END),
                     x -> x IS NOT NULL), ' '), '') AS deduped
FROM joined
"""


# -- Bloom-filter decontamination ----------------------------------------------
#
# `decontaminate` broadcasts the probe's DISTINCT n-gram hash set — exact, and
# fine while benchmarks are small. At 100 TB the probe side can itself be huge
# (decontaminating against another full corpus, or thousands of benchmarks):
# the scale path compresses the probe set into a Bloom bitmap of fixed size
# (m bits, k hash functions), broadcast as ONE row, membership tested map-only
# per document. False positives exist by construction (over-flagging only —
# the safe direction for decontamination) and are DETERMINISTIC: both engines
# derive the same k positions from md5, so the oracle reproduces them exactly.
#
# Positions use Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m) from two
# 32-bit md5 halves; the bitmap is stored as m/32 int32 words so every shift
# stays within BIGINT range in both engines.

_BLOOM_WORD = 32


def _bloom_grams_expr(n: int) -> "F.Column":
    """Distinct word n-grams over a pre-split `_toks` array — ONE shared
    expression for bloom_build and bloom_decontaminate: build/test gram
    parity is the correctness invariant of the whole Bloom path (a drift
    between the two would silently under-flag)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(_toks, i, {n}))))"
    )


def bloom_positions_exprs(gram: str, m_bits: int, k_hashes: int) -> list[str]:
    """SQL expressions (Spark dialect) for the k bit positions of `gram`."""
    h1 = f"CAST(conv(substr(md5({gram}), 1, 8), 16, 10) AS BIGINT)"
    h2 = f"CAST(conv(substr(md5({gram}), 9, 8), 16, 10) AS BIGINT)"
    return [f"(({h1} + {i} * {h2}) % {m_bits})" for i in range(k_hashes)]


def bloom_build(
    probe: DataFrame,
    text_col: str = "text",
    n: int = 13,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> list[int]:
    """Dense m/32-word Bloom bitmap of the probe corpus's word n-grams.

    The aggregation is fully distributed (explode positions → per-word
    bit_or with map-side partials); only the FINISHED bitmap — m/32 ints,
    a few KB, independent of probe size — ever reaches the driver, the
    same bounded-driver-state class as the CC convergence fingerprint."""
    if m_bits % _BLOOM_WORD:
        raise ValueError(f"m_bits must be a multiple of {_BLOOM_WORD}")
    grams = _bloom_grams_expr(n)
    pos_exprs = bloom_positions_exprs("_g", m_bits, k_hashes)
    words = (
        probe.where(F.col(text_col).isNotNull())
        .select(F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"))
        .select(F.explode(grams).alias("_g"))
        .select(F.explode(F.array(
            *[F.expr(e).cast("long") for e in pos_exprs]
        )).alias("_pos"))
        .select(
            (F.col("_pos") / _BLOOM_WORD).cast("int").alias("_w"),
            (F.col("_pos") % _BLOOM_WORD).cast("int").alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), _b)"))
             .alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // _BLOOM_WORD)
    for r in words:
        bitmap[r["_w"]] = int(r["_bits"])
    return bitmap


def bloom_decontaminate(
    df: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    probe_text_col: str = "text",
    n: int = 13,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    target: str = "contaminated",
) -> DataFrame:
    """Bloom-filter twin of `decontaminate`: flags every training document
    one of whose word n-grams tests positive against the probe corpus's
    Bloom bitmap. Over-flags (never under-flags) relative to the exact
    semi-join, deterministically — size m_bits for the probe's distinct
    gram count to keep the false-positive rate acceptable
    (k=4, m/n_grams=16 → ~0.2%).

    Scale shape: the bitmap rides to executors as a one-row broadcast
    nested-loop join (a few KB regardless of probe size); the membership
    test is an `exists` over the per-document gram array — map-only, no
    explode, no shuffle of the 100 TB side, text never leaves the scan.

    Reference parity note: no analogue in mjwolf/beats (training-data
    mandate); rule follows Brown et al. 2020 app. C with the Bloom
    compression used by large-corpus dedup tooling (e.g. Dolma).
    """
    bitmap = bloom_build(probe, probe_text_col, n, m_bits, k_hashes)
    spark = df.sparkSession
    bm = spark.createDataFrame([(bitmap,)], "_bloom array<bigint>")
    grams = _bloom_grams_expr(n)
    checks = " AND ".join(
        f"(shiftright(element_at(_bloom, CAST({p} div {_BLOOM_WORD} AS INT) + 1),"
        f" CAST({p} % {_BLOOM_WORD} AS INT)) & 1) = 1"
        for p in bloom_positions_exprs("g", m_bits, k_hashes)
    )
    hit = F.expr(f"exists(_grams, g -> {checks})")
    out = (
        df.withColumn(
            "_toks",
            F.when(F.col(text_col).isNotNull(),
                   F.split(F.trim(F.lower(F.col(text_col))), r"\s+")),
        )
        .withColumn("_grams", F.when(F.col("_toks").isNotNull(), grams))
        .join(F.broadcast(bm))
        .withColumn(target, F.coalesce(hit, F.lit(False)))
        .drop("_toks", "_grams", "_bloom")
    )
    return out


def bloom_decontaminate_sql(
    table: str = "documents",
    probe_where: str = "doc_id % 7 = 0",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> str:
    """DuckDB twin: rebuilds the identical bitmap (same md5 double-hash
    positions, same 32-bit words) and re-tests every document, false
    positives included."""
    h1 = "('0x' || substr(md5(g), 1, 8))::BIGINT"
    h2 = "('0x' || substr(md5(g), 9, 8))::BIGINT"
    poss = ", ".join(
        f"(({h1} + {i} * {h2}) % {m_bits}) AS p{i}" for i in range(k_hashes)
    )
    unp = ", ".join(f"p{i}" for i in range(k_hashes))
    return f"""
WITH toks AS (
  SELECT {id_col} AS _id, regexp_split_to_array(trim(lower({text_col})), '\\s+') AS t
  FROM {table} WHERE {text_col} IS NOT NULL
),
grams AS (
  SELECT _id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 1) + 1),
           i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS g
  FROM toks
),
probe_pos AS (
  SELECT unnest([{unp}]) AS pos
  FROM (SELECT {poss} FROM (SELECT DISTINCT g FROM grams
                            WHERE _id IN (SELECT {id_col} FROM {table}
                                          WHERE {probe_where})) s) q
),
bloom AS (
  SELECT pos // {_BLOOM_WORD} AS w,
         bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INT)) AS bits
  FROM probe_pos GROUP BY 1
),
gram_pos AS (
  SELECT _id, g, unnest([{unp}]) AS pos
  FROM (SELECT _id, g, {poss} FROM grams) q
),
gram_hit AS (
  SELECT gp._id, gp.g,
         bool_and(coalesce((b.bits >> CAST(gp.pos % {_BLOOM_WORD} AS INT))
                           & 1, 0) = 1) AS hit
  FROM gram_pos gp LEFT JOIN bloom b ON gp.pos // {_BLOOM_WORD} = b.w
  GROUP BY 1, 2
),
flags AS (
  SELECT t._id, coalesce(h.hit, FALSE) AS contaminated
  FROM toks t LEFT JOIN (SELECT _id, bool_or(hit) AS hit
                         FROM gram_hit GROUP BY 1) h USING (_id)
)
SELECT _id AS {id_col}, contaminated FROM flags
""".strip()


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram_n: int = 3,
) -> DataFrame:
    """EXACT directed containment join over word n-gram sets: every
    ordered pair (a, b) with |grams(a) ∩ grams(b)| / |grams(a)| >=
    threshold — "a is mostly contained in b". n-grams (default 3) rather
    than unigrams because token SETS saturate on a small shared
    vocabulary (unigram containment flagged 58% of all ordered pairs on
    the test corpus; 3-gram containment flags exactly the planted
    near-dups) — word order has to agree, not just word choice. The asymmetric complement to the Jaccard join:
    Jaccard misses a short quote embedded in a long document (the union
    dwarfs the intersection), while containment is exactly the
    quote/subset/boilerplate-inclusion detector (Broder 1997's
    containment coefficient).

    Prefix filtering adapts to the asymmetric threshold (Bayardo et al.
    WWW'07 §3.2): only the PROBE side (a) can be pruned — if
    C(a→b) >= t then at most |a| - ceil(t·|a|) tokens of a can miss b, so
    a's rarest |a| - ceil(t·|a|) + 1 tokens must contain a witness in b.
    The container side (b) posts its full token set; the join key is a's
    prefix tokens, which are its globally RAREST — so the full posting
    lists are probed only at their short, rare entries. A size filter
    (|b| >= t·|a|) prunes before the exact array-intersect verify, which
    joins token arrays back BY ID — arrays never ride the candidate
    exchange.

    Shuffles: one token-frequency groupBy, one per-doc re-agg, one
    equi-join on prefix token, one candidate dedup, two by-id verify
    joins. No cross join, no driver state.

    Reference parity note: no analogue in mjwolf/beats (training-data
    mandate).
    """
    k = ngram_n
    # guarded: Spark's sequence(1, 0) would COUNT DOWN ([1, 0]) — docs
    # shorter than n tokens must yield an empty gram set, as in the oracle
    grams = F.expr(
        f"CASE WHEN size(_tk) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size(_tk) - {k - 1}),"
        f" i -> concat_ws(' ', slice(_tk, i, {k})))) "
        f"ELSE array() END"
    )
    base = truncate_lineage(
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_tk"),
        )
        .select("_id", grams.alias("_g"))
        .where(F.size("_g") > 0)
    )
    # lineage cut: base feeds the _rarest_first inverted index and both
    # exact-verify array joins — same rationale as _prefix_filter_pairs
    ranked = _rarest_first(base)
    prefixed = ranked.withColumn(
        "_prefix",
        F.expr(
            f"slice(_g, 1, size(_g) - cast(ceil({threshold} * size(_g)) as int) + 1)"
        ),
    )
    probe = prefixed.select(
        F.col("_id").alias("id_a"), F.size("_g").alias("size_a"),
        F.explode("_prefix").alias("g"),
    )
    container = ranked.select(
        F.col("_id").alias("id_b"), F.size("_g").alias("len_b"),
        F.explode("_g").alias("g"),
    )
    cand = (
        probe.join(container, "g")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("len_b") >= F.lit(threshold) * F.col("size_a"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(F.col("_id").alias("id_a"), F.col("_g").alias("g_a"))
    gb = base.select(F.col("_id").alias("id_b"), F.col("_g").alias("g_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter_size", inter)
        .withColumn("size_a", F.size("g_a"))
        .where(F.col("inter_size") >= F.lit(threshold) * F.col("size_a"))
        .withColumn(
            "containment",
            F.round(F.col("inter_size") / F.col("size_a"), 6),
        )
        .select("id_a", "id_b", "inter_size", "size_a", "containment")
    )


def containment_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram_n: int = 3,
) -> str:
    """DuckDB oracle: brute-force all-ordered-pairs containment — an
    INDEPENDENT algorithm (no prefix filter), so it also proves the
    filter misses nothing. Quadratic: cap the table slice."""
    k = ngram_n
    return f"""
WITH toks AS (
  SELECT {id_col} AS _id,
         regexp_split_to_array(trim(lower({text_col})), '\\s+') AS tk
  FROM {table} WHERE {text_col} IS NOT NULL
),
sets AS (
  SELECT _id, list_distinct(list_transform(
           range(1, greatest(len(tk) - {k - 1}, 0) + 1),
           i -> array_to_string(tk[i:i+{k - 1}], ' '))) AS g
  FROM toks
),
pairs AS (
  SELECT a._id AS id_a, b._id AS id_b,
         len(list_intersect(a.g, b.g)) AS inter_size,
         len(a.g) AS size_a
  FROM sets a JOIN sets b ON a._id != b._id
  WHERE len(a.g) > 0
)
SELECT id_a, id_b, inter_size, size_a,
       round(CAST(inter_size AS DOUBLE) / size_a, 6) AS containment
FROM pairs WHERE inter_size >= {threshold} * size_a
""".strip()


def hash_embedding_series(texts: pd.Series, dim: int = 64) -> pd.Series:
    """Model-free deterministic document embedding by feature hashing
    (Weinberger et al. 2009's hashing trick with ±1 signs): component j =
    Σ_tokens (+1 if bit j of md5(token) else -1) — exactly the simhash
    vote vector BEFORE sign compression, kept dense so it can feed the
    ANN/SemDeDup stack when no learned model is available. Same
    batch-vectorized kernel as simhash_series (md5 once per UNIQUE token,
    numpy segment sums); dim ≤ 64 uses the token hash's bits directly."""
    assert dim <= 64
    tok_lists = texts.map(
        lambda t: str(t).lower().split() if t is not None else []
    )
    lengths = tok_lists.map(len).to_numpy()
    n_docs = len(texts)
    if lengths.sum() == 0:
        return pd.Series([[0] * dim] * n_docs, index=texts.index)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    hashes = _md5_token_hashes(flat)
    bits = ((hashes[:, None] >> np.arange(dim, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)  # (N, dim)
    doc_ids = np.repeat(np.arange(n_docs), lengths)
    sums = np.zeros((n_docs, dim), dtype=np.int64)
    np.add.at(sums, doc_ids, bits)
    votes = sums * 2 - lengths[:, None]
    return pd.Series(list(votes), index=texts.index)


def hash_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    target: str = "hash_emb",
) -> DataFrame:
    """Attach the feature-hashing embedding as array<long>. Map-only Arrow
    kernel — the output vectors plug directly into similarity.cosine_topk /
    lsh_topk / semdedup (cast to float as needed), giving the full ANN and
    semantic-dedup stack a deterministic, model-free input column.

    Reference parity note: no analogue in mjwolf/beats (training-data
    mandate)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(s: pd.Series) -> pd.Series:
        return hash_embedding_series(s, dim)

    return df.withColumn(target, _udf(F.col(text_col)))
