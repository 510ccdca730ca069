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
