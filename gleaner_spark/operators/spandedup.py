"""Cross-document duplicate-SPAN removal (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): document-
level dedup (exact / MinHash / SimHash — operators/dedup.py) misses
boilerplate and quoted passages repeated across otherwise-distinct
pages; span-level dedup removes every k-token window whose exact text
recurs in another document, keeping the rest of both documents.

The reference paper builds a corpus-wide suffix array; the Spark-
native equivalent is the k-gram rolling table: every k-token window
hashes to one row, windows whose hash appears in ≥2 DISTINCT
documents mark their k token positions as covered, and covered tokens
are dropped (overlapping duplicated windows merge naturally through
the covered-position set). Output text is whitespace-normalized
(single spaces), the same normalization the tokenizer applies.

Scale shape: the gram table is the known cost of span dedup —
~n_tokens rows per document, the same blow-up the paper's suffix
array pays (linear in corpus tokens). All per-row work is JVM column
expressions (transform/slice/md5 — no UDFs); the duplicated-hash test
is min(doc)≠max(doc) (two map-side-partial aggregates, never a
countDistinct shuffle of doc-id sets); exchanges are the gram-hash
groupBy + the gram↔dup-hash join (co-partitioned on the hash) + one
per-doc covered-set aggregation. At 100 TB, shard the pass by a gram-
hash prefix (runs are independent) exactly like the paper shards its
suffix array, and df-cap pathological grams (operators/dedup.py's
cap pattern) if a single boilerplate gram's row group skews a
partition.

Beyond-reference (SURVEY §2.4): the reference has no corpus stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def _grams(docs: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, gh): md5 of each k-token window, 0-based pos."""
    toks = X.tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_tk")).withColumn(
        "_n", F.size("_tk")
    )
    hashes = F.transform(
        F.sequence(F.lit(0), F.col("_n") - k),
        lambda i: F.md5(F.array_join(F.slice("_tk", i + F.lit(1), F.lit(k)), " ")),
    )
    return (
        base.filter(F.col("_n") >= k)
        .select(id_col, F.posexplode(hashes).alias("pos", "gh"))
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gh) for every k-token window whose exact text occurs
    in at least one OTHER document. min(doc)≠max(doc) over the gram
    hash is the ≥2-distinct-documents test — map-side partial
    aggregates, no distinct-count shuffle."""
    grams = _grams(docs, k, id_col, text_col)
    dup = (
        grams.groupBy("gh")
        .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("gh")
    )
    return grams.join(dup, "gh").select(id_col, "pos", "gh")


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs + (clean_text, n_removed): drop every token covered by a
    cross-document duplicated k-token window; remaining tokens rejoin
    with single spaces (overlapping duplicate windows merge through
    the covered-position set). Documents with no duplicated span — or
    fewer than k tokens — keep all tokens (whitespace-normalized)."""
    spans = duplicate_spans(docs, k, id_col, text_col)
    covered = (
        spans.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("_ci"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_ci").alias("_cov"))
    )
    toks = X.tokens(F.col(text_col))
    out = docs.join(covered, id_col, "left").withColumn(
        "_cov", F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        toks, lambda x, i: ~F.array_contains(F.col("_cov"), i.cast("int"))
    )
    n_removed = (F.size(toks) - F.size(kept)).cast("long")
    return (
        out.withColumn("clean_text", F.array_join(kept, " "))
        .withColumn("n_removed", n_removed)
        .drop("_cov")
    )
