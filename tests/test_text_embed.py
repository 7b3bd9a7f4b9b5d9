"""embed_text: hash-projection bag-of-words embedding (feature-extract
stub) — similarity-preserving and plan-clean."""

from __future__ import annotations

import pyspark.sql.functions as F

from ganda_spark.functions.text import embed_text
from ganda_spark.operators.similarity import cosine


def test_near_dup_docs_embed_closer_than_random(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).limit(80)
    words = F.split("text", " ")
    mutated = docs.where(F.size(words) > 20).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.concat_ws(" ", F.slice(words, 1, F.size(words) - 3)).alias("text"),
    )
    emb = embed_text(docs.unionByName(mutated)).select("doc_id", "embedding")
    a, b = emb.alias("a"), emb.alias("b")

    near = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 50000).select(
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos")
    )
    rand = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 17  # unrelated docs
    ).select(cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"))

    near_avg = near.agg(F.avg("cos")).collect()[0][0]
    rand_avg = rand.agg(F.avg("cos")).collect()[0][0]
    assert near.count() > 10
    assert near_avg > 0.98  # 3 dropped words barely move the mean
    assert near_avg > rand_avg + 0.01


def test_embed_plan_is_jvm_only_one_md5_per_word_per_salt(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = embed_text(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Column expressions
    # hash arrays hoisted: md5 appears once per salt in the projection,
    # not once per dim (8 dims / 2 salts here)
    assert plan.count("md5") <= 4, plan.count("md5")
