"""Similarity search over the embeddings table (array<float>, dim 64).

- ``knn_brute_cosine``: exact top-k for a fixed query set.  The query set
  is tiny and **broadcast**, so the plan is a broadcast nested-loop over
  the candidate scan — at 100 TB this is one pass over the embeddings with
  no shuffle except the final per-query top-k (which AQE keeps small).
- ``ann_lsh_buckets``: random-hyperplane (sign) LSH with arithmetically
  derived hyperplanes (integer weights, so the DuckDB oracle is
  bit-identical); the scale path — candidates only compare within buckets.
- All dot products run as left-fold ``aggregate`` over zipped arrays in
  both engines, so floating-point summation order is identical; cosine is
  rounded to 6 digits before ranking, with doc-id tie-breaks, making the
  top-k deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERY_MOD = 97     # vec_id % 97 == 0 → the fixed query set
TOP_K = 5
LSH_PLANES = 8
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


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


def embed_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return (
        e.withColumn("norm", F.round(_norm(F.col("embedding")), 6))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("norm"), 4).alias("sum_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per query vector (brute force baseline)."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot(F.col("qe"), F.col("embedding"))
        / (_norm(F.col("qe")) * _norm(F.col("embedding"))),
        6,
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("cand_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _plane_weight(k, i):
    """Integer hyperplane weights derived arithmetically — identical
    literal formula in the DuckDB oracle: ((i*73 + k*37) % 19) - 9."""
    return ((i * 73 + k * 37) % 19) - 9


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket id per vector: bit k = [dot(v, plane_k) > 0]."""
    e = _emb(spark, sf_dir)
    bucket = F.lit(0)
    for k in range(LSH_PLANES):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(_plane_weight(k, i))) for i in range(DIM)]),
                lambda x, wgt: x.cast("double") * wgt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0.0, F.lit(1 << k)).otherwise(F.lit(0))
    out = e.select("vec_id", "label", bucket.cast("int").alias("bucket"))
    return out


CENTROID_MOD = 51  # vec_id % 51 == 0 → the deterministic coarse centroids


def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantisation: assign every vector to its nearest (by
    cosine) centroid from a fixed, data-derived centroid set.  Centroids
    are broadcast; one pass over the embeddings — the inverted-file ANN
    scale path (probe a cell, not the corpus)."""
    e = _emb(spark, sf_dir)
    cents = e.where(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    cos = F.round(
        _dot(F.col("ce"), F.col("embedding"))
        / (_norm(F.col("ce")) * _norm(F.col("embedding"))),
        6,
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cent_id", cos.alias("cos_c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"), F.col("cos_c").alias("cell_cosine"))
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbours per query, searched ONLY within the query's IVF
    cell (nprobe=1) — compare with knn_brute_cosine for recall/cost."""
    e = _emb(spark, sf_dir)
    cells = ann_ivf_cells(spark, sf_dir).select("vec_id", "cell")
    v = e.join(cells, "vec_id")
    q = v.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("cell").alias("qcell")
    )
    cand = v.select(F.col("vec_id").alias("cand_id"), "embedding", "cell")
    cos = F.round(
        _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding"))),
        6,
    )
    pairs = cand.join(
        F.broadcast(q), (F.col("cell") == F.col("qcell")) & (F.col("cand_id") != F.col("query_id"))
    ).select("query_id", "cand_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


COS_DUP_MIN = 0.2  # near-dup threshold (synthetic embeddings are diffuse)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket prefiltered:
    candidates are compared ONLY within their sign-LSH bucket, so the
    pairwise work is |bucket|² summed, not N² — the 100 TB-safe shape
    (the brute-force twin is knn_brute_cosine)."""
    e = _emb(spark, sf_dir)
    b = ann_lsh_buckets(spark, sf_dir).select("vec_id", "bucket")
    v = e.join(b, "vec_id").select("vec_id", "bucket", "embedding")
    a, c = v.alias("a"), v.alias("c")
    cos = F.round(
        _dot(F.col("a.embedding"), F.col("c.embedding"))
        / (_norm(F.col("a.embedding")) * _norm(F.col("c.embedding"))),
        6,
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= COS_DUP_MIN)
    )


def ann_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket occupancy — the candidate-set-size diagnostic for the ANN
    scale path."""
    return (
        ann_lsh_buckets(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.countDistinct("label").alias("n_labels"))
    )
