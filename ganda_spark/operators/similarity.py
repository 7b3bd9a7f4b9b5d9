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
