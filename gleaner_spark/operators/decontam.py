"""Eval-set decontamination: flag / drop training documents that
share any word n-gram with a held-out evaluation set.

The standard training-corpus hygiene step (GPT-3 §C / PaLM / Llama all
use 8–13-gram overlap): a training document containing a verbatim
n-gram from a benchmark leaks the benchmark into the weights.
Beyond-reference (SURVEY §2.4) — the reference stops at object storage
and has no corpus stage.

Scale shape (the asymmetry is the whole design): the eval side is
small by construction — benchmark suites are 10^3–10^6 documents vs
10^9+ train docs — so its DISTINCT n-gram hash set broadcasts, and the
train side pays:

- one map-side explode of its own n-gram hashes (no shuffle — the
  widest intermediate never hits the exchange),
- one broadcast-hash join that filters to HIT rows only (at sane
  contamination rates, orders of magnitude smaller than the corpus),
- one partial-agg groupBy on doc_id over those hits.

No train-side wide shuffle anywhere; the only exchange carries
(doc_id, count) for contaminated documents. ``broadcast=False`` is the
escape hatch for a pathological eval set too big for the driver: the
same plan with a shuffled hash join (both sides exchange on ``sh``).

Hashing: the shared 60-bit md5 hash (functions/text.md5_long), exact
in both engines, so the DuckDB oracle contract verifies the fixed
corpora; a 2⁻⁶⁰-per-pair collision can only ever ADD a false positive
hit, the conservative direction for decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes

# 13 is the GPT-3/PaLM convention; the contract query pins n=4 because
# the synthetic sf corpora are short-doc.
DEFAULT_N = 13


def eval_ngram_hashes(eval_docs: DataFrame, text_col: str = "text",
                      n: int = DEFAULT_N) -> DataFrame:
    """Distinct 60-bit n-gram hashes of the evaluation set — one
    column ``sh``. Distinct ACROSS documents (unlike the per-doc
    distinct of shingle_hashes), so the broadcast build side is the
    n-gram vocabulary, not the n-gram multiset."""
    return (
        shingle_hashes(
            eval_docs.select(F.monotonically_increasing_id().alias("_eid"), text_col),
            "_eid", text_col, n,
        )
        .select("sh")
        .distinct()
    )


def contamination(train: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = DEFAULT_N, broadcast: bool = True) -> DataFrame:
    """(doc_id, n_hits) for every CONTAMINATED training document:
    n_hits = number of distinct n-grams of the document that occur
    anywhere in the eval set. Clean documents are absent (the common
    case — keep the output proportional to the contamination, not the
    corpus)."""
    ev = eval_ngram_hashes(eval_docs, text_col, n)
    if broadcast:
        ev = F.broadcast(ev)
    sh = shingle_hashes(train, id_col, text_col, n)
    return (
        sh.join(ev, "sh", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = DEFAULT_N, min_hits: int = 1,
                  broadcast: bool = True) -> DataFrame:
    """Training rows with contaminated documents removed (anti-join on
    the hit set). ``min_hits`` raises the bar for dropping a document —
    1 (default) drops on any shared n-gram, the conservative
    convention; higher tolerates incidental collisions on short n."""
    hits = contamination(train, eval_docs, id_col, text_col, n,
                         broadcast=broadcast)
    if min_hits > 1:
        hits = hits.filter(F.col("n_hits") >= min_hits)
    flagged = hits.select(F.col("doc_id").alias(id_col))
    # the hit set is bounded by the contamination rate — broadcast it
    # back so the corpus-side anti-join is also shuffle-free
    if broadcast:
        flagged = F.broadcast(flagged)
    return train.join(flagged, id_col, "anti")
