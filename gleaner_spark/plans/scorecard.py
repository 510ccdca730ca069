"""Per-document quality scorecard over a harvested lake.

Every gate the corpus build offers (--min-quality, --max-nll,
--min-nb, repetition filters, token budgets) needs a threshold, and
thresholds are picked by LOOKING at the score distribution first.
This plan computes every per-document signal the operators suite
defines in one pass and lands them as a narrow ``doc_scores`` table
(one row per document, no text), so gate calibration is a SQL query
over a small table instead of a rerun of the heavy text operators:

- ``q_*`` length/punctuation/stopword features + composite
  ``q_score`` (operators/textops.quality_scores);
- ``predicted_lang`` stopword-vote language id (language_id);
- ``n_tokens``/``n_bpe_tokens`` whitespace + GPT-2-pre-tokenizer
  counts (bpe_token_stats) — their ratio flags symbol soup;
- ``top_token_count``/``n_2grams``/``uniq_2grams``/``n_3grams``/
  ``uniq_3grams`` Gopher repetition signals (repetition_stats);
- ``avg_nll`` corpus-trained unigram LM score (unigram_nll);
- ``nb_score`` (optional) seed-classifier log-likelihood ratio when
  a curated seed parquet is supplied (textops.nb_seed_scores — the
  SAME helper the corpus build's --nb-seed gate calls, so the gate
  and this calibration table can never diverge).

Scale shape: the q/lang/bpe/repetition signals are pure map-side
column expressions over one scan; avg_nll and nb_score each add the
two token exchanges their operators document; the final assembly
joins per-doc aggregates on the high-cardinality doc_id (AQE
handles the co-partitioning). The output is ~10 numeric columns per
document — at 10^10 documents a few hundred GB, queryable, vs the
corpus it summarizes.

Reference parity: beyond-reference (SURVEY §2.4); the reference has
no scoring surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import (
    bpe_token_stats,
    language_id,
    nb_seed_scores,
    quality_scores,
    repetition_stats,
    unigram_nll,
)
from .docdedup import corpus_doc_id, split_doc_id
from .lake import Lake


def build_scorecard(docs: DataFrame,
                    nb_seed_docs: DataFrame | None = None) -> DataFrame:
    """One row per document: (doc_id, source_name, q_*, predicted_lang,
    n_tokens, n_bpe_tokens, repetition counts, avg_nll[, nb_score]).
    ``docs`` is the lake documents shape (source_name, unique_id,
    jsonld)."""
    base = docs.select(
        corpus_doc_id().alias("doc_id"),
        F.col("source_name"),
        F.col("jsonld").alias("text"),
    )
    flat = language_id(quality_scores(base, text_col="text"),
                       text_col="text").select(
        "doc_id", "source_name",
        "q_chars", "q_tokens", "q_punct", "q_stopwords",
        "q_mean_token_len", "q_score", "predicted_lang",
    )
    bpe = bpe_token_stats(base).select("doc_id", "n_tokens", "n_bpe_tokens")
    rep = repetition_stats(base).select(
        "doc_id", "top_token_count",
        "n_2grams", "uniq_2grams", "n_3grams", "uniq_3grams",
    )
    nll = unigram_nll(base).select("doc_id", "avg_nll")
    out = flat.join(bpe, "doc_id").join(rep, "doc_id").join(nll, "doc_id")
    if nb_seed_docs is not None:
        nb = nb_seed_scores(base, nb_seed_docs).select("doc_id", "nb_score")
        out = out.join(nb, "doc_id")
    else:
        out = out.withColumn("nb_score", F.lit(None).cast("double"))
    return out


def run_scorecard(
    spark: SparkSession,
    lake: Lake,
    run_id: str,
    nb_seed_path: str | None = None,
    out_path: str | None = None,
) -> dict:
    """Score the lake's documents; append as a ``doc_scores``
    snapshot (default) or write plain parquet to ``out_path``.
    Returns a summary with headline means so the CLI is useful
    without a follow-up query."""
    docs = lake.table("documents").read(spark)
    if docs is None:
        return {"run_id": run_id, "documents": 0}
    seed = spark.read.parquet(nb_seed_path) if nb_seed_path else None
    scores = build_scorecard(docs, nb_seed_docs=seed)
    if out_path:
        scores.write.mode("overwrite").parquet(out_path)
        written = spark.read.parquet(out_path)
        sink: dict = {"out": out_path}
    else:
        entry = lake.table("doc_scores").append(
            split_doc_id(scores, "doc_id"), run_id=run_id
        )
        written = lake.table("doc_scores").read_snapshot(spark, entry)
        sink = {"snapshots": {"doc_scores": entry["snapshot_id"]}}
    agg = written.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("q_score"), 4).alias("mean_q"),
        F.round(F.avg("avg_nll"), 4).alias("mean_nll"),
        F.round(F.avg("nb_score"), 4).alias("mean_nb"),
    ).collect()[0]
    def _f(v):
        # zero-row frames aggregate to NULL means; report None rather
        # than crashing the summary
        return float(v) if v is not None else None

    return {
        "run_id": run_id,
        "documents": int(agg["n"]),
        "mean_q_score": _f(agg["mean_q"]),
        "mean_avg_nll": _f(agg["mean_nll"]),
        "mean_nb_score": _f(agg["mean_nb"]),
        **sink,
    }
