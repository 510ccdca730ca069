"""Approximate nearest neighbors over an embedding column.

- ``brute_force_topk``: exact cosine top-k (the correctness
  baseline; O(Q×N), fine when the query set is bounded/broadcast).
- ``lsh_topk``: random-hyperplane LSH — vectors bucket by sign
  signature; per-bucket exact rerank. At 100 TB: buckets are the
  shuffle key, planes are a broadcast literal, and multi-probe
  (hamming-1 neighbors) trades recall vs fan-out.

Planes are deterministic (±1 entries from an md5 parity) so results
are reproducible without RNG state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import cosine_similarity


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "vec_id", qvec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (self-match excluded).
    Deterministic tie-break on neighbor id."""
    base = embeddings.select(
        F.col(id_col).alias("nbr_id"), _as_double(F.col(vec_col)).alias("nv")
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"), _as_double(F.col(qvec_col)).alias("qv")
    )
    scored = (
        F.broadcast(q).crossJoin(base)
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cos", cosine_similarity(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        out.append(row)
    return out


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-signature bucket id as a string of bits."""
    bits = []
    for plane in planes:
        lit = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit, lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def kmeans_centroids(embeddings: DataFrame, n_centroids: int = 16,
                     iters: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """Deterministic Lloyd's k-means for IVF coarse quantization.

    Init = the ``n_centroids`` lowest-id vectors (deterministic, no
    RNG state — reproducible across runs/resumes). Each iteration:
    broadcast centroids → vectorized argmin assignment → elementwise
    mean per cluster (posexplode + groupBy, all JVM-side aggregation;
    only the (n_centroids × dim) means ever reach the driver)."""

    first = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([r[1] for r in first], dtype=np.float64)
    for _ in range(iters):
        assigned = assign_clusters(embeddings, cents, id_col, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in means:
            new[r["cluster"]][r["i"]] = r["m"]
        cents = new
    return cents


def assign_clusters(embeddings: DataFrame, centroids, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_probe: int = 1,
                    out_col: str = "cluster") -> DataFrame:
    """Nearest-centroid assignment (n_probe=1) or multi-probe list —
    one Arrow-batched matmul per batch against broadcast centroids."""
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    multi = n_probe > 1
    out_type = T.ArrayType(T.IntegerType()) if multi else T.IntegerType()

    @F.pandas_udf(out_type)
    def nearest(vecs: pd.Series) -> pd.Series:
        c = bc.value
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        m = np.array(vecs.tolist(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ cn.T
        if multi:
            idx = np.argsort(-sims, axis=1)[:, :n_probe]
            return pd.Series([row.astype("int32").tolist() for row in idx])
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return embeddings.withColumn(out_col, nearest(_as_double(F.col(vec_col))))


def ivf_topk(embeddings: DataFrame, k: int = 5, n_centroids: int = 16,
             n_probe: int = 2, iters: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF self-search: coarse-quantize once, then each vector probes
    its ``n_probe`` nearest cells and reranks exactly within them.

    Scale shape: the inverted file is the shuffle key (cluster id) —
    candidates co-locate per cell, no all-pairs crossJoin; centroids
    are a broadcast literal. Recall/fan-out tunes via n_probe."""
    cents = kmeans_centroids(embeddings, n_centroids, iters, id_col, vec_col)
    base = assign_clusters(embeddings, cents, id_col, vec_col, 1).select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("nv"),
        F.col("cluster"),
    )
    probes = (
        assign_clusters(embeddings, cents, id_col, vec_col, n_probe, "probes")
        .select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
            F.explode("probes").alias("cluster"),
        )
    )
    scored = (
        probes.join(base, "cluster")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cos", cosine_similarity(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


def lsh_topk(embeddings: DataFrame, k: int = 5, n_planes: int = 8,
             dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """All-pairs top-k restricted to LSH buckets (the scale path)."""
    planes = _planes(dim, n_planes)
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a, b = e.alias("a"), e.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") != F.col("b.vid")),
        )
        .withColumn("cos", cosine_similarity(F.col("a.v"), F.col("b.v")))
    )
    w = Window.partitionBy(F.col("a.vid")).orderBy(F.desc("cos"), F.asc(F.col("b.vid")))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a.vid").alias("query_id"),
            F.col("b.vid").alias("nbr_id"),
            "rank",
            "cos",
        )
    )
