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
        if w > 1000:
            # explode(sequence(0, w)) materializes w rows per doc — a
            # fat-fingered weight (someone passing a token count) would
            # w-plicate the corpus; no pretraining mix exceeds a few
            # epochs, so refuse loudly instead
            raise ValueError(f"weight {w} is implausibly large (max 1000)")
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


def sample_token_budget(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    seed: str = "",
    n_blocks: int = 4096,
) -> DataFrame:
    """Deterministic token-budget sampling: keep the maximal PREFIX of
    the corpus in hash order — ordered by (bucket(id, seed), id) —
    whose cumulative token count stays ≤ ``budget``. "Give me exactly
    20B tokens of this corpus" is the other sampling knob every
    pretraining recipe has (``hash_sample`` fixes a document fraction;
    this fixes the token mass). Prefix-by-hash keeps the two key
    reproducibility properties: membership is a pure function of the
    corpus content + (budget, seed) — never partitioning — and budgets
    nest (the 10B-token sample is a subset of the 20B-token sample).

    Scale shape — a distributed prefix sum, NOT a global sort: the
    bucket space is cut into ``n_blocks`` contiguous blocks; pass 1
    aggregates per-block token totals (one exchange of ≤ n_blocks tiny
    rows, map-side partials) and the driver walks the ≤ n_blocks
    prefix to find the boundary. Fully-kept blocks are a contiguous
    prefix (offsets are monotone), so they come back as a map-side
    range filter with ZERO further exchange; exactly ONE block can
    straddle the budget, and only ITS rows (≈ corpus/n_blocks) take
    the cumulative-sum window — the single-task sort is bounded by
    construction, not by luck. Every document tokenizes to ≥ 1 token
    (split of a trimmed string never returns an empty array), so no
    zero-width row past the boundary can sneak back under the budget.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    from ..functions import text as X

    mod = 1_000_000
    width = -(-mod // n_blocks)
    ntok = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else X.token_count(F.col(text_col))
    )
    base = (
        docs.withColumn("_tb_b", _bucket(id_col, seed, mod))
        .withColumn("_tb_blk", (F.col("_tb_b") / width).cast("int"))
        .withColumn("_tb_n", ntok)
    )
    totals = {
        r["_tb_blk"]: r["t"]
        for r in base.groupBy("_tb_blk").agg(F.sum("_tb_n").alias("t")).collect()
    }
    running = 0
    last_full: int | None = None
    partial: int | None = None
    partial_offset = 0
    for blk in sorted(totals):
        t = int(totals[blk] or 0)
        if running + t <= budget:
            last_full = blk
            running += t
        else:
            if running < budget:
                partial, partial_offset = blk, running
            break
    parts = []
    if last_full is not None:
        parts.append(base.filter(F.col("_tb_blk") <= last_full))
    if partial is not None:
        w = Window.partitionBy("_tb_blk").orderBy("_tb_b", id_col)
        parts.append(
            base.filter(F.col("_tb_blk") == partial)
            .withColumn("_tb_cum", F.sum("_tb_n").over(w))
            .filter(F.col("_tb_cum") <= budget - partial_offset)
            .drop("_tb_cum")
        )
    out = parts[0] if parts else base.filter(F.lit(False))
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.drop("_tb_b", "_tb_blk", "_tb_n")


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every
    document a ``shard`` in [0, n_shards) and a 0-based ``shard_pos``
    within it, both pure functions of (id, seed, n_shards). Reading
    shards round-robin by position replays ONE global pseudo-random
    document order — reproducible across runs, partitionings, and
    engines, unlike ``orderBy(rand())``. The shard hash and the
    within-shard order hash are independently salted so position
    within a shard never correlates with how ids landed in it.

    Scale shape: a global shuffle is semantically a total order, but
    materializing one ordered sequence is a single-task sort at 100
    TB — sharding IS the standard fix (training data ships as 10^3-5
    shard files consumed round-robin). One exchange on the shard key;
    each shard sorts locally (n_shards-way parallel); written with
    ``partitionBy("shard")`` the sort cost is bounded by corpus/
    n_shards per task."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    shard = _bucket(id_col, seed + "|shard", 1_000_000) % n_shards
    order = _bucket(id_col, seed + "|order", 1_000_000)
    w = Window.partitionBy("shard").orderBy("_ord", id_col)
    return (
        docs.withColumn("shard", shard.cast("int"))
        .withColumn("_ord", order)
        .withColumn("shard_pos", F.row_number().over(w).cast("long") - 1)
        .drop("_ord")
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
