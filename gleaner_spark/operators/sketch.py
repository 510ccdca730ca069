"""Sharded, vectorized Bloom sketch for the URL/doc-seen set (north
rule: "bloom+cuckoo" pre-filter over the 10^10-key frontier).

The reference's dedup is a per-object StatObject existence check
(jsonutils.go:384-386) — O(1) per doc against the object store. At
10^10-frontier scale the equivalent is: keep the authoritative seen
set as a lake table (anti-join), but pre-filter with a Bloom sketch
so the anti-join shuffle only sees *candidate* duplicates:

    new ──might_contain──► candidates ──left_anti seen──► truly new
       └─negatives (definitely unseen) bypass the shuffle entirely─┘

Scale design (all hot paths vectorized, no per-key Python loops):

- **Hashing is JVM-side.** Both the build and the probe compute ONE
  64-bit key hash with Spark's built-in ``xxhash64`` (codegen'd,
  columnar); Python only derives the k probe positions from that
  hash with numpy (splitmix64 double hashing) and touches the
  bitset. A pure-Python XXH64 mirror exists for driver-side
  convenience/tests and is pinned bit-equal to Spark's.
- **Sharded bitset.** ``n_shards`` independent per-shard bitsets in
  one flat uint64 array; a key's shard is ``pmod(xxhash64(key),
  n_shards)``. At the 10^10-key design point a 1%-FPP bloom is
  ~12 GB — shards keep each blob broadcast-able and let the build
  repartition keys by shard so each reduce task ORs exactly one
  shard (driver traffic = total sketch size, not partitions×size).
- **Checkpointable.** Serializes to one versioned blob (per-shard
  rows on a real cluster); unknown/legacy formats fail loading and
  the caller rebuilds from the authoritative table.

A deletable cuckoo-filter variant lives alongside for workloads that
retract keys (the recrawl-after-delete repair path); the bloom is
the default because union/merge is a bitwise OR.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"GBF2"

# -- pure-Python XXH64 (public algorithm), bit-equal to Spark's
#    xxhash64 for string columns (seed 42 over UTF-8 bytes); used only
#    for driver-side convenience + tests — executors hash JVM-side.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` (unsigned); ``& _M64`` of Spark's signed
    result. Spark hashes a string column's UTF-8 bytes with seed 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            for _ in range(1):
                k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ ((_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k1 * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# -- splitmix64 finalizer: derives the two probe-position hashes from
#    the single JVM-computed key hash (numpy-vectorized, wraps mod 2^64)

_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray) -> np.ndarray:
    z = x + _SM_GOLD
    z = (z ^ (z >> np.uint64(30))) * _SM_C1
    z = (z ^ (z >> np.uint64(27))) * _SM_C2
    return z ^ (z >> np.uint64(31))


def _params(expected_per_shard: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected_per_shard * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << (m - 1).bit_length()  # power of two: position mod is a mask
    k = max(1, round(m / max(expected_per_shard, 1) * math.log(2)))
    return m, min(k, 16)


_MASK_LUT = (np.uint64(1) << np.arange(64, dtype=np.uint64))


class BloomSketch:
    """``n_shards`` per-shard bitsets packed in one flat uint64 array
    (shard s owns ``bits[s*width:(s+1)*width]``)."""

    def __init__(self, bits: np.ndarray, k: int, n_shards: int, expected: int):
        self.bits = bits
        self.k = k
        self.n_shards = n_shards
        self.expected = expected

    @property
    def shard_width(self) -> int:
        return len(self.bits) // self.n_shards

    @property
    def m(self) -> int:
        """Bits per shard."""
        return self.shard_width * 64

    @classmethod
    def empty(cls, expected: int, fpp: float = 0.01, n_shards: int = 1) -> "BloomSketch":
        m, k = _params(max(1, expected // n_shards), fpp)
        return cls(np.zeros(m // 64 * n_shards, dtype=np.uint64), k, n_shards, expected)

    # -- vectorized core (int64 hashes as produced by Spark xxhash64) --

    def _locate(self, h1: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(word_index[k,B], bit_mask[k,B]) global positions for a batch
        of signed-int64 key hashes."""
        h1 = np.asarray(h1, dtype=np.int64)
        shard = np.mod(h1, self.n_shards).astype(np.int64)  # == Spark pmod
        h1u = h1.view(np.uint64)
        g1 = _mix(h1u)
        g2 = _mix(h1u ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        # m is a power of two: modulo is a bitmask, bit masks come
        # from a 64-entry LUT gather — both ~5x cheaper than uint64
        # division/shift chains at the 10^6-keys/s/core design point
        pos = (g1[None, :] + i * g2[None, :]) & np.uint64(self.m - 1)
        base = (shard.astype(np.uint64) * np.uint64(self.shard_width))[None, :]
        word = base + (pos >> np.uint64(6))
        mask = _MASK_LUT[(pos & np.uint64(63)).astype(np.intp)]
        return word, mask, shard

    def add_hashed(self, h1: np.ndarray) -> None:
        if len(h1) == 0:
            return
        word, mask, _ = self._locate(h1)
        np.bitwise_or.at(self.bits, word.ravel(), mask.ravel())

    def contains_hashed(self, h1: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        word, mask, _ = self._locate(h1)
        return ((self.bits[word] & mask) == mask).all(axis=0)

    # -- string convenience (driver/tests; python XXH64 mirror) --

    def _h(self, values) -> np.ndarray:
        return np.array(
            [xxh64(v.encode("utf-8")) for v in values], dtype=np.uint64
        ).view(np.int64)

    def add_many(self, values) -> None:
        vals = [v for v in values]
        if vals:
            self.add_hashed(self._h(vals))

    def might_contain(self, value: str) -> bool:
        return bool(self.contains_hashed(self._h([value]))[0])

    def union(self, other: "BloomSketch") -> "BloomSketch":
        assert (
            self.m == other.m and self.k == other.k and self.n_shards == other.n_shards
        ), "sketch params must match to union"
        return BloomSketch(self.bits | other.bits, self.k, self.n_shards, self.expected)

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack("<IIQ", self.k, self.n_shards, self.expected)
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("unknown sketch format (legacy checkpoint?)")
        k, n_shards, expected = struct.unpack_from("<IIQ", blob, 4)
        bits = np.frombuffer(blob[20:], dtype=np.uint64).copy()
        return cls(bits, k, n_shards, expected)


def build_bloom(df: DataFrame, col: str, expected: int, fpp: float = 0.01,
                n_shards: int = 1) -> BloomSketch:
    """Distributed build. Keys hash JVM-side (``xxhash64``); with
    n_shards>1 the hashes repartition by shard so each task reduces
    exactly one shard and driver traffic equals the sketch size (not
    partitions×size)."""
    proto = BloomSketch.empty(expected, fpp, n_shards)
    width, k, m = proto.shard_width, proto.k, proto.m

    hashed = (
        df.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col)).alias("h1"))
    )
    if n_shards > 1:
        hashed = hashed.repartition(n_shards, F.pmod(F.col("h1"), F.lit(n_shards)))

    schema = T.StructType(
        [T.StructField("shard", T.IntegerType()), T.StructField("bits", T.BinaryType())]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-shard partial bitsets for the shards this task actually
        # saw (post-repartition: exactly one)
        acc: dict[int, np.ndarray] = {}
        tmp = BloomSketch(np.zeros(width, dtype=np.uint64), k, 1, expected)
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            shard = np.mod(h1, n_shards)
            for s in np.unique(shard):
                tmp.bits = acc.setdefault(int(s), np.zeros(width, dtype=np.uint64))
                # positions within a shard ignore the shard offset:
                # reuse the 1-shard locate on the shard's own bitset
                tmp.add_hashed(h1[shard == s])
        if acc:
            yield pd.DataFrame(
                {"shard": list(acc), "bits": [b.tobytes() for b in acc.values()]}
            )

    out = BloomSketch.empty(expected, fpp, n_shards)
    for row in hashed.mapInPandas(partial, schema).collect():
        s = int(row["shard"])
        out.bits[s * width:(s + 1) * width] |= np.frombuffer(
            row["bits"], dtype=np.uint64
        )
    return out


def with_might_contain(df: DataFrame, key_col: str, sketch: BloomSketch,
                       out_col: str = "maybe_seen") -> DataFrame:
    """Adds a boolean membership column. The key hash is computed
    JVM-side (whole-stage codegen); the pandas UDF only derives probe
    positions and gathers bits from the broadcast sketch.

    NULL keys are never members (false): Spark's ``xxhash64(NULL)``
    returns the seed, which would otherwise probe the sketch at a
    fixed position and could answer true (ADVICE r2) — the legacy
    ``might_contain_udf`` returns false for nulls and this must
    agree."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(sketch.to_bytes())
    holder: dict[str, BloomSketch] = {}

    @F.pandas_udf(T.BooleanType())
    def probe(h1: pd.Series) -> pd.Series:
        sk = holder.get("sk")
        if sk is None:
            sk = BloomSketch.from_bytes(bc.value)
            holder["sk"] = sk
        return pd.Series(sk.contains_hashed(h1.to_numpy(dtype=np.int64)))

    return df.withColumn(
        out_col,
        F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(
            probe(F.xxhash64(F.col(key_col)))
        ),
    )


def might_contain_udf(spark, sketch: BloomSketch):
    """String-input membership UDF (compat/tests; hashes with the
    python XXH64 mirror). Hot paths use ``with_might_contain``."""
    bc = spark.sparkContext.broadcast(sketch.to_bytes())
    holder: dict[str, BloomSketch] = {}

    @F.pandas_udf(T.BooleanType())
    def might_contain(values: pd.Series) -> pd.Series:
        sk = holder.get("sk")
        if sk is None:
            sk = BloomSketch.from_bytes(bc.value)
            holder["sk"] = sk
        mask = values.notna()
        out = np.zeros(len(values), dtype=bool)
        if mask.any():
            h = np.array(
                [xxh64(v.encode("utf-8")) for v in values[mask]], dtype=np.uint64
            ).view(np.int64)
            out[mask.to_numpy()] = sk.contains_hashed(h)
        return pd.Series(out)

    return might_contain


# ---------------------------------------------------------------------------
# Cuckoo filter: the deletable variant of the seen sketch
# ---------------------------------------------------------------------------

_CK_EMPTY = np.uint16(0)


class CuckooSketch:
    """Bucketized cuckoo filter (4-slot buckets, 16-bit fingerprints,
    ~3% FPP at 95% load). Supports ``remove`` — the sketch analogue of
    the reference's delete-then-recrawl repair (root_internal_test.go:
    708-745): when lake rows are retracted the seen-sketch can retract
    the keys too instead of being rebuilt."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, buckets: np.ndarray):
        self.buckets = buckets  # uint16 [n_buckets, SLOTS]

    @classmethod
    def empty(cls, expected: int) -> "CuckooSketch":
        n = max(8, 1 << int(math.ceil(math.log2(max(1, expected) / 0.95 / cls.SLOTS))))
        return cls(np.zeros((n, cls.SLOTS), dtype=np.uint16))

    @property
    def n_buckets(self) -> int:
        return len(self.buckets)

    def _fp_and_buckets(self, value: str) -> tuple[np.uint16, int, int]:
        h = xxh64(value.encode("utf-8"))
        fp = np.uint16((h & 0xFFFF) or 1)  # 0 marks empty
        i1 = (h >> 16) % self.n_buckets
        i2 = (i1 ^ xxh64(bytes(fp.tobytes()))) % self.n_buckets
        return fp, int(i1), int(i2)

    def _alt(self, i: int, fp: np.uint16) -> int:
        return int((i ^ xxh64(bytes(fp.tobytes()))) % self.n_buckets)

    def _try_insert(self, i: int, fp: np.uint16) -> bool:
        row = self.buckets[i]
        free = np.nonzero(row == _CK_EMPTY)[0]
        if len(free):
            row[free[0]] = fp
            return True
        return False

    def add(self, value: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(value)
        if self._try_insert(i1, fp) or self._try_insert(i2, fp):
            return True
        # evict: random-walk via deterministic slot rotation
        i = i1
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            fp, self.buckets[i][slot] = self.buckets[i][slot], fp
            i = self._alt(i, fp)
            if self._try_insert(i, fp):
                return True
        return False  # table full

    def contains(self, value: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(value)
        return bool((self.buckets[i1] == fp).any() or (self.buckets[i2] == fp).any())

    def remove(self, value: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(value)
        for i in (i1, i2):
            hit = np.nonzero(self.buckets[i] == fp)[0]
            if len(hit):
                self.buckets[i][hit[0]] = _CK_EMPTY
                return True
        return False

    def to_bytes(self) -> bytes:
        return b"GCK1" + struct.pack("<Q", self.n_buckets) + self.buckets.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooSketch":
        if blob[:4] != b"GCK1":
            raise ValueError("unknown cuckoo sketch format")
        (n,) = struct.unpack_from("<Q", blob, 4)
        return cls(
            np.frombuffer(blob[12:], dtype=np.uint16).reshape(n, cls.SLOTS).copy()
        )
