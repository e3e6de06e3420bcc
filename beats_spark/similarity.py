"""Approximate-nearest-neighbor search over an embedding column.

Three tiers:
- brute-force cosine top-k (the correctness baseline): broadcast the query
  set, dot products in JVM via zip_with/aggregate in DOUBLE (bitwise-
  deterministic left-to-right sum — the DuckDB oracle reproduces it), rank
  with a per-query window;
- LSH (random hyperplanes): signature via a broadcast plane matrix inside a
  vectorized pandas UDF (one numpy matmul per Arrow batch), bucket join on
  signature, verify within bucket — the 100 TB path (no cross join);
- IVF: deterministic centroid sample, assign-to-nearest, probe top-P cells.

All variants return (query_id, neighbor_id, score, rank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beats_spark.scale import truncate_lineage


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: queries broadcast against the vector table.

    Scale: |queries| must be broadcast-small (the usual ANN-serving shape);
    the big side streams through one pass, ranked by a window partitioned on
    query_id — shuffle size = |queries| × |vectors| candidate rows reduced
    map-side by nothing, so for large query sets use lsh_topk instead.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vvec"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            _dot(F.col("_qvec"), F.col("_vvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def allpairs_cosine_stats(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine statistics via blocked GEMM.

    Expression-tree dot products cost ~7s/M pairs; one numpy matmul per
    block-pair does the same work at BLAS speed. Each vector is replicated
    to the n_blocks block-pair groups it participates in (explode), every
    group computes its pair stats with a single (nb_a × dim) @ (dim × nb_b)
    product inside applyInPandas, and a final tiny agg combines the
    B(B+1)/2 partials. Scales out: groups are independent tasks; replication
    factor = n_blocks (choose ~sqrt(cluster parallelism)).

    Returns one row: (n_pairs, near_dups, max_cos).
    """
    v = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_e")
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks)).cast("int"))

    # explode each vector into every block-pair group it belongs to
    pair_keys = F.array(*[
        F.struct(
            F.least(F.col("_blk"), F.lit(b)).alias("b1"),
            F.greatest(F.col("_blk"), F.lit(b)).alias("b2"),
        )
        for b in range(n_blocks)
    ])
    exploded = v.select(
        "_id", "_e", "_blk", F.explode(F.array_distinct(pair_keys)).alias("_p")
    ).select("_id", "_e", "_blk", "_p.b1", "_p.b2")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        b1, b2 = int(pdf["b1"].iloc[0]), int(pdf["b2"].iloc[0])
        left = pdf[pdf["_blk"] == b1]
        mat_l = np.stack(left["_e"].values).astype(np.float64)
        ids_l = left["_id"].values
        norm_l = np.linalg.norm(mat_l, axis=1)
        if b1 == b2:
            g = (mat_l @ mat_l.T) / np.outer(norm_l, norm_l)
            iu = np.triu_indices(len(ids_l), k=1)
            cos = g[iu]
        else:
            right = pdf[pdf["_blk"] == b2]
            mat_r = np.stack(right["_e"].values).astype(np.float64)
            norm_r = np.linalg.norm(mat_r, axis=1)
            cos = ((mat_l @ mat_r.T) / np.outer(norm_l, norm_r)).ravel()
        return pd.DataFrame({
            "n_pairs": [int(cos.size)],
            "near_dups": [int((cos >= threshold).sum())],
            "max_cos": [float(cos.max()) if cos.size else -1.0],
        })

    partials = exploded.groupBy("b1", "b2").applyInPandas(
        stats, "n_pairs long, near_dups long, max_cos double"
    )
    return partials.agg(
        F.sum("n_pairs").alias("n_pairs"),
        F.sum("near_dups").alias("near_dups"),
        F.round(F.max("max_cos"), 4).alias("max_cos"),
    )


def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    target: str = "lsh_sig",
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane signature as a long — one numpy matmul per Arrow
    batch (vectorized; the plane matrix is captured in the UDF closure and
    shipped once per executor)."""
    planes = _planes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf(T.LongType())
    def sig(s: pd.Series) -> pd.Series:
        mat = np.stack(s.values).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    return df.withColumn(target, sig(F.col(vec_col)))


def lsh_signatures_all(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    vec_col: str,
    target: str = "_sigs",
    seed_base: int = 11,
) -> DataFrame:
    """All n_tables hyperplane signatures in ONE Arrow pass: the per-table
    plane matrices (seeds seed_base + t — bit-identical to calling
    lsh_signatures per table) stack into a single (dim, T·P) matmul and
    pack into an array<long> of per-table signatures."""
    stacked = np.concatenate(
        [_planes(dim, n_planes, seed_base + t) for t in range(n_tables)],
        axis=1,
    )  # (dim, T*P)
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_all(s: pd.Series) -> pd.Series:
        mat = np.stack(s.values).astype(np.float64)          # (batch, dim)
        bits = (mat @ stacked) > 0                           # (batch, T*P)
        packed = (
            bits.reshape(len(mat), -1, len(weights)).astype(np.uint64)
            @ weights
        ).astype(np.int64)                                   # (batch, T)
        return pd.Series(list(packed))

    return df.withColumn(target, sig_all(F.col(vec_col)))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Bucketed ANN: `n_tables` independent plane sets; candidates = vectors
    sharing a bucket with the query in ANY table; exact cosine + top-k on
    candidates only. Shuffles are bucket-key joins — no cross join.

    Each side is scanned ONCE: all table signatures come from a single
    fused Arrow matmul (lsh_signatures_all) and posexplode to (table,
    bucket) rows — the previous per-table loop re-scanned the vector
    table and re-ran the UDF n_tables times per side (18 FileScans at
    n_tables=8, audited r5 second session), and the projected (id, vec)
    frames are materialized so the exact-verify joins re-read pinned
    blocks instead of the store."""
    from beats_spark.scale import truncate_lineage

    v = truncate_lineage(vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec")))
    q = truncate_lineage(queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")))

    # candidates travel as BARE (query_id, neighbor_id) pairs: the bucket
    # joins and the cross-table dropDuplicates exchange never carry the
    # embedding arrays — vectors are joined back BY ID for scoring only
    vs = lsh_signatures_all(v, dim, n_planes, n_tables, "_vvec").select(
        "neighbor_id", F.posexplode("_sigs").alias("_tbl", "_b"))
    qs = lsh_signatures_all(q, dim, n_planes, n_tables, "_qvec").select(
        "query_id", F.posexplode("_sigs").alias("_tbl", "_b"))
    cands = (
        vs.join(qs, ["_tbl", "_b"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = (
        cands.join(v, "neighbor_id")
        .join(q, "query_id")
        .withColumn(
            "score",
            _dot(F.col("_qvec"), F.col("_vvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _assign_cells(v: DataFrame, cents: DataFrame, id_name: str) -> DataFrame:
    """Nearest-centroid assignment by cosine (centroids broadcast).

    groupBy + max_by instead of a row_number window: the window shape
    shuffles AND globally sorts all |V|×n_cells scored rows; the aggregate
    gets map-side partial combine, so the exchange carries one row per
    vector and no sort step. Cosine ties break toward the LOWEST cell_id
    (cell_id negated in the ordering struct), matching the old window's
    (desc score, asc cell_id) determinism."""
    a = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("_d", _dot(F.col("_vvec"), F.col("_cvec"))
                    / (_norm(F.col("_vvec")) * _norm(F.col("_cvec"))))
    )
    best = a.groupBy(id_name).agg(
        F.max_by(
            F.struct(F.col("_vvec"), F.col("cell_id")),
            F.struct(F.col("_d").alias("d"), (-F.col("cell_id")).alias("nc")),
        ).alias("_best")
    )
    return best.select(
        id_name,
        F.col("_best._vvec").alias("_vvec"),
        F.col("_best.cell_id").alias("cell_id"),
    )


def lsh_topk_data_planes(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    plane_id_start: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """LSH top-k with DATA-VECTOR hyperplanes — the engine-reproducible
    twin of `lsh_topk`: table t's planes are the corpus vectors with ids
    [start + t·P, start + (t+1)·P), signature bit = sign of the dot
    product against each plane. Everything is Column expressions (the dot
    runs in whole-stage codegen via zip_with/aggregate — no UDF, no numpy
    plane matrix), so a SQL oracle can recompute the identical buckets,
    candidates, and ranking end-to-end; this powers the driver-verified
    recall@k query (ann_lsh_recall).

    Scale shape = lsh_topk's: planes broadcast (T·P rows); per-vector
    signatures partial-aggregate map-side so the exchange carries bare
    (id, table, sig) triples; candidates are bare id pairs; vectors join
    back BY ID for scoring only."""
    n_total = n_planes * n_tables
    planes = vectors.where(
        (F.col(id_col) >= plane_id_start)
        & (F.col(id_col) < plane_id_start + n_total)
    ).select(
        ((F.col(id_col) - plane_id_start) / n_planes)
        .cast("int").alias("_tbl"),
        ((F.col(id_col) - plane_id_start) % n_planes).alias("_bit"),
        F.col(vec_col).alias("_pvec"),
    )
    from beats_spark.scale import truncate_lineage

    # lineage cut: each side feeds its signature aggregation AND the
    # exact-verify join-back — two reads of the embedding store without it
    v = truncate_lineage(vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec")
    ))
    q = truncate_lineage(queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ))

    def sigs(side: DataFrame, idn: str, vecn: str) -> DataFrame:
        weight = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit AS INT))")
        return (
            side.crossJoin(F.broadcast(planes))
            .groupBy(idn, "_tbl")
            .agg(
                F.sum(
                    F.when(_dot(F.col(vecn), F.col("_pvec")) > 0, weight)
                    .otherwise(F.lit(0).cast("long"))
                ).alias("_sig")
            )
        )

    cands = (
        sigs(v, "neighbor_id", "_vvec")
        .join(sigs(q, "query_id", "_qvec"), ["_tbl", "_sig"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = (
        cands.join(v, "neighbor_id")
        .join(q, "query_id")
        .withColumn(
            "score",
            _dot(F.col("_qvec"), F.col("_vvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings,
    then drop all-but-one of every within-cluster pair whose cosine clears
    `threshold` — the standard semantic-dedup step between exact/minhash
    dedup and training. Keep rule is deterministic: a row is dropped iff a
    LOWER-id row in the same cell sits within `threshold` of it, so the
    survivor set is unique regardless of partitioning or join order.

    Returns every input row as (id_col, cell_id, kept: boolean).

    Scale shape: centroids are broadcast (n_cells rows — explicit frame or
    the same deterministic xxhash64 sample ivf_topk uses); assignment is
    the max_by aggregate (one exchange of (id, vec, cell), no window sort);
    the pair generation is a CELL-keyed equi-join with a codegen cosine
    residual — never an unblocked cross join — and the drop set travels as
    bare ids for the final anti-join-shaped flag. The within-cell pair
    count is quadratic in cell size BY SEMANTICS (SemDeDup compares all
    pairs inside a cluster): at 100 TB you size n_cells so cells fit the
    comparison budget, exactly as the paper sizes k for its k-means; for
    very fat cells swap the residual join for the blocked-GEMM kernel
    (allpairs_cosine_stats) per cell — same contract, BLAS inner loop.
    """
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vvec"))
    if centroids is not None:
        cents = centroids.select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_cvec")
        )
    else:
        cents = (
            vectors.select(
                F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_cvec")
            )
            .orderBy(F.xxhash64(F.col("cell_id")).asc(), F.col("cell_id"))
            .limit(n_cells)
        )
    # lineage cut: the assignment feeds the pair join twice (a and b
    # sides) plus the final kept-flag join — without it the broadcast
    # crossJoin + max_by assignment (|V|·n_cells dot products) and the
    # embedding scan under it re-execute per consumer (6 FileScans
    # audited). Fresh-JVM sf0.1 A/B reads 4.87→5.17 s — the cut COSTS a
    # materialization job at test scale, where the within-cell quadratic
    # dominates — and is kept anyway: at real corpus sizes re-running the
    # assignment and re-reading the embedding store 3× is the larger
    # term, and the within-cell cost is the same either way.
    from beats_spark.scale import truncate_lineage

    va = truncate_lineage(_assign_cells(v, cents, "_id"))
    a = va.select(
        F.col("cell_id"), F.col("_id").alias("_ida"), F.col("_vvec").alias("_va")
    )
    b = va.select(
        F.col("cell_id"), F.col("_id").alias("_idb"), F.col("_vvec").alias("_vb")
    )
    drops = (
        a.join(b, "cell_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            _dot(F.col("_va"), F.col("_vb"))
            / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            >= threshold
        )
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        va.join(drops, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cell_id",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """One-row recall@k of `approx` against `exact` (both (query_id,
    neighbor_id[, ...]) top-k listings): n_queries, n_exact, n_hit,
    recall. A left join on bare id pairs — both sides are k·|Q| rows."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    joined = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
    ).select(
        F.lit(k).alias("k"),
        "n_queries",
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    kmeans_iters: int = 0,
    reliable: bool = False,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat: centroids = deterministic distributed sample (optionally
    refined by distributed Lloyd iterations), vectors assigned to their
    nearest cell, queries probe the `n_probe` nearest cells, exact cosine
    within probed cells.

    Centroid pick is the `n_cells` vectors with the smallest xxhash64(id) —
    a uniform pseudo-random but fully deterministic sample. Spark plans
    orderBy().limit(k) as TakeOrderedAndProject: each partition keeps its
    local top-k and only n_cells rows ever reach the driver, so this holds
    at 10^9+ vectors (the round-1 version collected EVERY id — driver OOM
    at scale). With kmeans_iters > 0 the seed is refined fully in Spark:
    assign (broadcast join) → per-cell per-dimension mean (posexplode +
    groupBy avg) → re-assemble centroids — never a driver-side vector.
    `reliable=True` makes the per-iteration centroid truncation
    cluster-durable (checkpoint dir / DISK_ONLY), same flag convention as
    graph.assign_components and dedup.minhash_dedup. An explicit
    `centroids` frame (id_col + vec_col) overrides the xxhash64 sample —
    the ann_ivf_recall oracle passes a plain id-range slice so DuckDB can
    reproduce the seed set (it has no xxhash64)."""
    if centroids is not None:
        cents = centroids.select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_cvec")
        )
    else:
        cents = (
            vectors.select(
                F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_cvec")
            )
            .orderBy(F.xxhash64(F.col("cell_id")).asc(), F.col("cell_id"))
            .limit(n_cells)
        )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))

    for _ in range(kmeans_iters):
        assign = _assign_cells(v, cents, "neighbor_id")
        means = (
            assign.select("cell_id", F.posexplode("_vvec").alias("_pos", "_val"))
            .groupBy("cell_id", "_pos")
            .agg(F.avg("_val").alias("_m"))
        )
        cents = (
            means.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_s"))
            .select(
                "cell_id",
                F.expr("transform(_s, x -> cast(x._m as float))").alias("_cvec"),
            )
        )
        # n_cells rows: materialize so the assign/probe/broadcast consumers
        # don't each re-run the whole refinement lineage (eager=False:
        # constructing the plan triggers no job; the tiny frame pins on
        # first use). reliable=True → cluster-durable truncation.
        cents = truncate_lineage(cents, reliable=reliable, eager=False)

    va = _assign_cells(v, cents, "neighbor_id")

    qa = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_d", _dot(F.col("_qvec"), F.col("_cvec"))
                    / (_norm(F.col("_qvec")) * _norm(F.col("_cvec"))))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("_d").desc(), F.col("cell_id"))
    qa = qa.withColumn("_rn", F.row_number().over(wq)).filter(
        F.col("_rn") <= n_probe
    ).select("query_id", "_qvec", "cell_id")

    scored = (
        va.join(qa, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            _dot(F.col("_qvec"), F.col("_vvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
