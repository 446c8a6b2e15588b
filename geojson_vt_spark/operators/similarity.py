"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk``      exact brute-force baseline (zip_with dot product,
                       Window top-k) — the correctness oracle;
- ``ivf_topk``         IVF scale path: deterministic centroid sample,
                       assign → probe nprobe nearest lists only;
- ``lsh_topk``         random-hyperplane bucket candidates.

All scoring is Column-expression (JVM); only centroid selection touches
the driver (C small, broadcast back).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _dot, _norm, cosine_col


def _queries(df: DataFrame, id_col: str, vec_col: str,
             query_ids: list[int]) -> DataFrame:
    return (df.where(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"),
                    F.col(vec_col).cast("array<double>").alias("qv")))


def cosine_topk(df: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query id.
    Deterministic: rank by (rounded score desc, id asc)."""
    base = df.select(F.col(id_col).alias("nbr_id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    q = F.broadcast(_queries(df, id_col, vec_col, query_ids))
    scored = (q.crossJoin(base)
              .where(F.col("nbr_id") != F.col("query_id"))
              .withColumn("cosine", F.round(cosine_col("qv", "v"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", "cosine", "rank"))


def ivf_topk(df: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-flat ANN: centroids = deterministic stride sample of the
    corpus; every vector joins its nearest list; queries probe only the
    ``nprobe`` nearest lists.  At scale the stride sample becomes a
    k-means job; the probe join stays the same."""
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("nbr_id"),
                     F.col(vec_col).cast("array<double>").alias("v"))

    cents = (base.withColumn(
        "rk", F.row_number().over(Window.orderBy("nbr_id")))
        .where(F.col("rk") <= n_centroids)
        .select(F.col("nbr_id").alias("centroid_id"), F.col("v").alias("cv")))
    cents = F.broadcast(cents)

    # assign every vector to its nearest centroid (one broadcast join)
    wv = Window.partitionBy("nbr_id").orderBy(
        F.col("cdist").desc(), F.col("centroid_id"))
    assigned = (base.crossJoin(cents)
                .withColumn("cdist", F.round(cosine_col("v", "cv"), 9))
                .withColumn("crk", F.row_number().over(wv))
                .where(F.col("crk") == 1)
                .select("nbr_id", "v", "centroid_id"))

    q = F.broadcast(_queries(df, id_col, vec_col, query_ids))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cdist").desc(), F.col("centroid_id"))
    probes = (q.crossJoin(cents)
              .withColumn("cdist", F.round(cosine_col("qv", "cv"), 9))
              .withColumn("crk", F.row_number().over(wq))
              .where(F.col("crk") <= nprobe)
              .select("query_id", "qv", "centroid_id"))

    scored = (probes.join(assigned, "centroid_id")
              .where(F.col("nbr_id") != F.col("query_id"))
              .withColumn("cosine", F.round(cosine_col("qv", "v"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", "cosine", "rank"))


def lsh_topk(df: DataFrame, query_ids: list[int], k: int = 5,
             n_planes: int = 8, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> DataFrame:
    """Hyperplane-LSH candidates (same bucket), exact rerank inside."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket(vcol):
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[p]])
            sig = sig.bitwiseOR(
                F.when(_dot(vcol, plane) > 0,
                       F.shiftleft(F.lit(1).cast("long"), p))
                .otherwise(F.lit(0).cast("long")))
        return sig

    base = (df.select(F.col(id_col).alias("nbr_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn("bucket", bucket(F.col("v"))))
    q = (_queries(df, id_col, vec_col, query_ids)
         .withColumn("bucket", bucket(F.col("qv"))))
    scored = (F.broadcast(q).join(base, "bucket")
              .where(F.col("nbr_id") != F.col("query_id"))
              .withColumn("cosine", F.round(cosine_col("qv", "v"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", "cosine", "rank"))
