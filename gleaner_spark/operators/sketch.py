"""Partitioned Bloom sketch for the URL/doc-seen set (north rule).

The reference's dedup is a per-object StatObject existence check
(jsonutils.go:384-386) — O(1) per doc against the object store. At
10^10-frontier scale the equivalent is: keep the authoritative seen
set as a lake table (anti-join), but pre-filter with a Bloom sketch
so the anti-join shuffle only sees *candidate* duplicates:

    new ──might_contain──► candidates ──left_anti seen──► truly new
       └─negatives (definitely unseen) bypass the shuffle entirely─┘

The sketch is built distributed (one partial bitset per partition,
OR-reduced), checkpoints to the lake as a binary blob, and broadcasts
back to executors for vectorized membership tests. For 10^10 keys
you shard the sketch by ``pmod(xxhash64(key), n_shards)`` — the same
code path, one blob per shard; here one shard suffices for tests.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _params(expected: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / max(expected, 1) * math.log(2)))
    return m, min(k, 16)


def _hash2(value: str) -> tuple[int, int]:
    d = hashlib.md5(value.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def _positions(value: str, m: int, k: int) -> list[int]:
    h1, h2 = _hash2(value)
    return [(h1 + i * h2) % m for i in range(k)]


class BloomSketch:
    def __init__(self, bits: np.ndarray, k: int):
        self.bits = bits  # uint64 array
        self.k = k

    @property
    def m(self) -> int:
        return len(self.bits) * 64

    @classmethod
    def empty(cls, expected: int, fpp: float = 0.01) -> "BloomSketch":
        m, k = _params(expected, fpp)
        return cls(np.zeros(m // 64, dtype=np.uint64), k)

    def add_many(self, values) -> None:
        m = self.m
        for v in values:
            for p in _positions(v, m, self.k):
                self.bits[p >> 6] |= np.uint64(1 << (p & 63))

    def might_contain(self, value: str) -> bool:
        m = self.m
        for p in _positions(value, m, self.k):
            if not (int(self.bits[p >> 6]) >> (p & 63)) & 1:
                return False
        return True

    def union(self, other: "BloomSketch") -> "BloomSketch":
        assert self.m == other.m and self.k == other.k
        return BloomSketch(self.bits | other.bits, self.k)

    def to_bytes(self) -> bytes:
        return self.k.to_bytes(4, "little") + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomSketch":
        k = int.from_bytes(blob[:4], "little")
        return cls(np.frombuffer(blob[4:], dtype=np.uint64).copy(), k)


def build_bloom(df: DataFrame, col: str, expected: int, fpp: float = 0.01) -> BloomSketch:
    """Distributed build: per-partition partial bitsets OR-reduced at
    the driver (sketch bytes, not rows, cross the wire)."""
    m, k = _params(expected, fpp)
    width = m // 64

    schema = T.StructType([T.StructField("bits", T.BinaryType())])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = BloomSketch(np.zeros(width, dtype=np.uint64), k)
        any_rows = False
        for pdf in batches:
            vals = pdf[col].dropna()
            if len(vals):
                any_rows = True
                sk.add_many(vals.tolist())
        if any_rows:
            yield pd.DataFrame({"bits": [sk.bits.tobytes()]})

    parts = df.select(col).mapInPandas(partial, schema).collect()
    out = BloomSketch(np.zeros(width, dtype=np.uint64), k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return out


def might_contain_udf(spark, sketch: BloomSketch):
    """Vectorized membership test over a broadcast sketch."""
    bc = spark.sparkContext.broadcast(sketch.to_bytes())
    holder: dict[str, BloomSketch] = {}

    @F.pandas_udf(T.BooleanType())
    def might_contain(values: pd.Series) -> pd.Series:
        sk = holder.get("sk")
        if sk is None:
            sk = BloomSketch.from_bytes(bc.value)
            holder["sk"] = sk
        return values.map(lambda v: v is not None and sk.might_contain(v))

    return might_contain
