"""Deterministic corpus splitting and sampling for training-data
pipelines.

Train/valid/test membership and downsampling must be REPRODUCIBLE: a
document's assignment may depend only on its identity, never on
partitioning, cluster size, or run order — otherwise a re-shard of a
100 TB corpus silently moves documents across the train/test boundary
(leakage). ``DataFrame.sample`` is per-partition pseudo-random and
loses exactly that property; these operators derive the assignment
from a stable hash of the document id instead.

Scale shape: pure map-side column expressions — ZERO exchanges, no
UDFs, whole-stage codegen; the split column composes with partition
pruning when written as a partition key. The hash is the first 8 hex
chars of md5 (32 bits — engine-portable: DuckDB replays it with a hex
cast, so the driver's oracle verifies the exact assignment), which
bounds modulo bias at < 2⁻²⁵ relative for mod ≤ 10⁶.

Reference parity: beyond-reference (SURVEY §2.4) — the reference has
no corpus-management stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(id_col: str, seed: str, mod: int) -> Column:
    """Stable bucket in [0, mod) from the id (optionally salted by
    ``seed`` so independent splits of one corpus decorrelate)."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def assign_splits(
    docs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 98), ("valid", 1), ("test", 1),
    ),
    seed: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each document to one named
    split with the given integer percentages (must sum to 100).
    Deterministic in (id, seed): disjoint, exhaustive, and identical
    across runs, partitionings, and engines."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percentages must sum to 100, got {total}")
    b = _bucket(id_col, seed, 100)
    lab: Column | None = None
    cum = 0
    for name, pct in splits:
        cum += pct
        cond = b < cum
        lab = F.when(cond, name) if lab is None else lab.when(cond, name)
    return docs.withColumn("split", lab)


def hash_sample(
    docs: DataFrame,
    frac: float,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic Bernoulli-by-hash downsample: keeps the SAME
    ~frac of documents every run (membership is a pure function of
    (id, seed) — unlike ``DataFrame.sample``, which draws per
    partition and changes under repartitioning)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    mod = 1_000_000
    return docs.filter(_bucket(id_col, seed, mod) < int(round(frac * mod)))


def resample_sources(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic corpus mixing: thin or replicate each source to a
    target weight (the "2 epochs of Wikipedia, 0.3 of CommonCrawl"
    knob every pretraining recipe has). A document from a source with
    weight ``w`` gets ``floor(w)`` copies plus one more iff its hash
    bucket falls below ``frac(w)`` — so the expected copy count is
    exactly ``w``, and the copy count is a pure function of
    (id, seed): re-runs, re-shards, and engines agree on which
    documents the fractional part keeps. A 0-based ``copy`` column
    disambiguates replicas downstream (epoch-local salts/seeds).

    Scale shape: map-side only — a literal CASE over the source picks
    the weight, ``explode(sequence(...))`` materializes copies. ZERO
    exchanges, no UDFs; upsampled rows are born in the scan's own
    partitions. Fractional thresholds are pre-rounded to integers in
    the driver so both engines compare the same literals."""
    mod = 1_000_000

    def _parts(w: float) -> tuple[int, int]:
        if w < 0:
            raise ValueError(f"weights must be >= 0, got {w}")
        base = int(w)
        return base, int(round((w - base) * mod))

    b = _bucket(id_col, seed, mod)

    def _copies(w: float) -> Column:
        base, thr = _parts(w)
        return F.lit(base) + (b < thr).cast("int")

    expr: Column | None = None
    for src, w in sorted(weights.items()):
        cond = F.col(source_col) == src
        expr = (
            F.when(cond, _copies(w))
            if expr is None
            else expr.when(cond, _copies(w))
        )
    n = _copies(default_weight) if expr is None else expr.otherwise(
        _copies(default_weight)
    )
    return (
        docs.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "copy",
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    part_col: str = "source",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are concatenated
    in ``id_col`` order within each ``part_col`` shard and cut into
    fixed-``capacity`` training sequences. Each document is labeled
    with the sequence its first token lands in (``seq_id``) and its
    offset there (``seq_offset``) — documents may straddle a boundary,
    exactly like LLM-pretraining context-window packing (vs bin
    packing, which wastes tail capacity and is order-unstable).

    Scale shape: one cumulative-sum window per shard. The per-shard
    ORDER BY is SEMANTIC here (packing is defined by document order),
    so unlike the frontier's removed ordering windows it cannot be
    salted away — at 100 TB you bound the sort by packing within
    finer shards (source × date), which changes the shard key, not
    this operator."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return docs.withColumn(
        "seq_id", F.floor(cum_before / capacity).cast("long")
    ).withColumn("seq_offset", (cum_before % capacity).cast("long"))
