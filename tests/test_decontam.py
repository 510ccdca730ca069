"""Eval-set decontamination (operators/decontam.py): planted-overlap
semantics, per-doc distinct counting, min_hits, the broadcast plan
shape, and the corpus-plan integration."""

import pytest
from pyspark.sql import functions as F

from gleaner_spark.operators.decontam import (
    contamination,
    decontaminate,
    eval_ngram_hashes,
)

EVAL_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
]


def _eval(spark):
    return spark.createDataFrame([(t,) for t in EVAL_TEXTS], "text string")


def _train(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),             # clean
        (2, "xx the quick brown fox jumps yy"),                 # 2 hits
        (3, "pack my box with five dozen liquor jugs indeed"),  # 5 hits
        (4, "quick brown fox strolls calmly home tonight"),     # clean
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContamination:
    def test_planted_overlap_counts(self, spark):
        hits = {
            r["doc_id"]: r["n_hits"]
            for r in contamination(_train(spark), _eval(spark), n=4).collect()
        }
        # doc 2 shares "the quick brown fox" and "quick brown fox
        # jumps"; doc 3 shares all five 4-grams of the pangram it
        # embeds; clean docs are ABSENT, not zero-rowed
        assert hits == {2: 2, 3: 5}

    def test_within_doc_repeats_count_once(self, spark):
        train = spark.createDataFrame(
            [(9, "the quick brown fox the quick brown fox")],
            "doc_id long, text string",
        )
        hits = contamination(train, _eval(spark), n=4).collect()
        # the repeated eval 4-gram is one DISTINCT hit (per-doc
        # distinct in shingle_hashes), not two
        assert [(r["doc_id"], r["n_hits"]) for r in hits] == [(9, 1)]

    def test_shuffled_join_matches_broadcast(self, spark):
        b = {(r["doc_id"], r["n_hits"]) for r in contamination(
            _train(spark), _eval(spark), n=4, broadcast=True).collect()}
        s = {(r["doc_id"], r["n_hits"]) for r in contamination(
            _train(spark), _eval(spark), n=4, broadcast=False).collect()}
        assert b == s

    def test_short_docs_produce_no_ngrams(self, spark):
        # eval docs shorter than n contribute nothing -> nothing drops
        ev = spark.createDataFrame([("too short",)], "text string")
        assert contamination(_train(spark), ev, n=4).count() == 0
        assert decontaminate(_train(spark), ev, n=4).count() == 4


class TestDecontaminate:
    def test_drops_contaminated_keeps_clean(self, spark):
        kept = {r["doc_id"] for r in
                decontaminate(_train(spark), _eval(spark), n=4).collect()}
        assert kept == {1, 4}

    def test_min_hits_raises_the_bar(self, spark):
        kept = {r["doc_id"] for r in decontaminate(
            _train(spark), _eval(spark), n=4, min_hits=3).collect()}
        # doc 2 (2 hits) survives a min_hits=3 bar; doc 3 (5) does not
        assert kept == {1, 2, 4}


class TestDecontamPlanShape:
    def test_broadcast_join_no_train_side_exchange(self, spark):
        """The train-side n-gram explosion — the widest intermediate —
        must reach the join without an exchange: the only
        hashpartitioning(sh) exchange in the plan is the EVAL
        distinct's, and the join is broadcast, not sort-merge."""
        plan = (
            contamination(_train(spark), _eval(spark), n=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        import re

        sh_exchanges = re.findall(r"Exchange hashpartitioning\(sh#", plan)
        assert len(sh_exchanges) == 1, plan


class TestCorpusIntegration:
    def _docs_and_clusters(self, spark):
        docs = spark.createDataFrame(
            [
                ("s0", "d1", "records of alpha beta gamma delta measurements"),
                ("s0", "d2", "contains the quick brown fox jumps over text"),
                ("s0", "d3", "third clean document body with enough tokens"),
            ],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True), ("s0\x1fd2", True), ("s0\x1fd3", True)],
            "id string, is_keeper boolean",
        )
        return docs, clusters

    def test_build_corpus_drops_contaminated_keeper(self, spark):
        from gleaner_spark.plans.corpus import build_corpus

        docs, clusters = self._docs_and_clusters(spark)
        without = build_corpus(docs, clusters, capacity=512)
        assert {r["doc_id"] for r in without.select("doc_id").collect()} == {
            "s0\x1fd1", "s0\x1fd2", "s0\x1fd3"
        }
        with_eval = build_corpus(
            docs, clusters, capacity=512,
            eval_docs=_eval(spark), decontam_n=4,
        )
        assert {r["doc_id"] for r in with_eval.select("doc_id").collect()} == {
            "s0\x1fd1", "s0\x1fd3"
        }

    def test_decontam_runs_before_pii_scrub(self, spark):
        """An eval n-gram containing an email must still match the RAW
        text (scrub order): if the scrub ran first, '<EMAIL>' would
        break the n-gram and the leak would survive."""
        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [("s0", "d1", "contact us at bob@example.com for data access")],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True)], "id string, is_keeper boolean"
        )
        ev = spark.createDataFrame(
            [("contact us at bob@example.com for data",)], "text string"
        )
        out = build_corpus(docs, clusters, capacity=512,
                           eval_docs=ev, decontam_n=4)
        assert out.count() == 0


class TestCorpusSpanDedup:
    def test_span_k_strips_cross_doc_boilerplate_keepers_only(self, spark):
        """--span-k inside the corpus build: a footer shared by two
        KEEPER docs is stripped from both; a span shared only with a
        NON-keeper (already dropped by doc-level dedup) is kept —
        span dedup votes over the keeper set, not the raw table."""
        from pyspark.sql import functions as F

        from gleaner_spark.plans.corpus import build_corpus

        footer = "all rights reserved by the example consortium"
        docs = spark.createDataFrame(
            [
                ("s0", "d1", f"alpha beta gamma delta {footer}"),
                ("s0", "d2", f"epsilon zeta eta theta {footer}"),
                # d3's opening span also appears in the non-keeper d4
                ("s0", "d3", "iota kappa lambda mu nu xi omicron pi"),
                ("s0", "d4", "iota kappa lambda mu nu DIFFERENT tail here"),
            ],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True), ("s0\x1fd2", True),
             ("s0\x1fd3", True), ("s0\x1fd4", False)],
            "id string, is_keeper boolean",
        )
        out = {
            r["doc_id"]: r["text"]
            for r in build_corpus(docs, clusters, capacity=512, span_k=5)
            .select("doc_id", F.col("text")).collect()
        }
        assert out["s0\x1fd1"] == "alpha beta gamma delta"
        assert out["s0\x1fd2"] == "epsilon zeta eta theta"
        assert out["s0\x1fd3"] == "iota kappa lambda mu nu xi omicron pi"
        assert "s0\x1fd4" not in out


class TestCorpusQualityFilter:
    def test_min_quality_drops_junk_first(self, spark):
        """--min-quality drops low-q_score keepers before any other
        stage; None leaves the set untouched."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators.textops import quality_scores
        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [
                ("s0", "good", "the quick brown fox jumps over the lazy "
                               "dog and the story continues with many "
                               "plain readable words in it"),
                ("s0", "junk", "@@@!!! ### $$$ %%% ^^^ &&& *** ((("),
            ],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fgood", True), ("s0\x1fjunk", True)],
            "id string, is_keeper boolean",
        )
        q = {
            r["doc_id"]: r["q_score"]
            for r in quality_scores(
                docs.select(
                    F.concat_ws("\x1f", "source_name", "unique_id").alias("doc_id"),
                    F.col("jsonld").alias("text"),
                ),
                text_col="text",
            ).collect()
        }
        assert q["s0\x1fjunk"] < 30 < q["s0\x1fgood"]
        ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
        assert ids(build_corpus(docs, clusters, capacity=512)) == {
            "s0\x1fgood", "s0\x1fjunk"
        }
        assert ids(
            build_corpus(docs, clusters, capacity=512, min_quality=30.0)
        ) == {"s0\x1fgood"}


class TestCorpusNllGate:
    def test_max_nll_drops_ood_junk(self, spark):
        """--max-nll keeps the common-prose keepers and drops the
        out-of-distribution junk doc under the keeper corpus's own
        unigram model."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators.textops import unigram_nll
        from gleaner_spark.plans.corpus import build_corpus

        rows = [("s0", f"d{i}", "the cat sat on the mat again today")
                for i in range(9)]
        rows.append(("s0", "junk", "zq xv qqj wpk zzv nbg qrx ylk"))
        docs = spark.createDataFrame(
            rows, "source_name string, unique_id string, jsonld string"
        )
        clusters = spark.createDataFrame(
            [(f"s0\x1fd{i}", True) for i in range(9)] + [("s0\x1fjunk", True)],
            "id string, is_keeper boolean",
        )
        nll = {
            r["doc_id"]: r["avg_nll"]
            for r in unigram_nll(
                docs.select(
                    F.concat_ws("\x1f", "source_name", "unique_id").alias("doc_id"),
                    F.col("jsonld").alias("text"),
                )
            ).collect()
        }
        cut = (nll["s0\x1fd0"] + nll["s0\x1fjunk"]) / 2
        ids = {
            r["doc_id"]
            for r in build_corpus(docs, clusters, capacity=512, max_nll=cut)
            .select("doc_id").collect()
        }
        assert ids == {f"s0\x1fd{i}" for i in range(9)}


class TestCorpusNbGate:
    def test_nb_seed_gate_keeps_seed_like_docs_only(self, spark):
        """--nb-seed/--min-nb inside the corpus build: NB trained with
        the seed parquet as class 1 against the keeper corpus as class
        0; docs reading like the seed score positive and survive
        min_nb=0, symbol-soup docs score negative and drop."""
        from pyspark.sql import functions as F  # noqa: F401

        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [("s0", "d1", "alpha beta alpha beta"),
             ("s0", "d2", "zz@@ ### junk junk")],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True), ("s0\x1fd2", True)],
            "id string, is_keeper boolean",
        )
        seed = spark.createDataFrame(
            [("alpha beta alpha beta alpha beta",)], "text string"
        )
        out = build_corpus(docs, clusters, capacity=512,
                           nb_seed_docs=seed, min_nb=0.0)
        assert {r["doc_id"] for r in out.select("doc_id").collect()} == {
            "s0\x1fd1"
        }
        # without the gate both keepers ship
        assert build_corpus(docs, clusters, capacity=512).count() == 2

    def test_nb_seed_requires_threshold(self, spark):
        import pytest as _pytest

        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [("s0", "d1", "alpha beta")],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True)], "id string, is_keeper boolean"
        )
        seed = spark.createDataFrame([("alpha",)], "text string")
        with _pytest.raises(ValueError, match="min_nb"):
            build_corpus(docs, clusters, nb_seed_docs=seed)


class TestCorpusBudgetTokenizer:
    def test_bpe_budget_counts_model_shaped_tokens(self, spark):
        """'a-b_c x' is 2 whitespace tokens but 7 pre-tokenizer tokens:
        a budget of 3 keeps it under ws counting and drops it under
        bpe counting — the budget switch actually switches counters."""
        import pytest as _pytest

        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [("s0", "d1", "a-b_c x")],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True)], "id string, is_keeper boolean"
        )
        ws = build_corpus(docs, clusters, capacity=512,
                          token_budget=3, budget_tokenizer="ws")
        assert ws.count() == 1
        bpe = build_corpus(docs, clusters, capacity=512,
                           token_budget=3, budget_tokenizer="bpe")
        assert bpe.count() == 0
        # and a budget that fits the bpe count keeps it again
        assert build_corpus(docs, clusters, capacity=512,
                            token_budget=7, budget_tokenizer="bpe").count() == 1
        with _pytest.raises(ValueError, match="budget_tokenizer"):
            build_corpus(docs, clusters, token_budget=3,
                         budget_tokenizer="chars")


class TestCorpusLangFilter:
    def test_langs_keeps_detected_languages_only(self, spark):
        from gleaner_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [("s0", "d1", "the cat is on the mat and it is here"),
             ("s0", "d2", "der hund ist bei dem haus und das ist gut"),
             ("s0", "d3", "数据 处理 系统 在 集群 上 运行")],
            "source_name string, unique_id string, jsonld string",
        )
        clusters = spark.createDataFrame(
            [("s0\x1fd1", True), ("s0\x1fd2", True), ("s0\x1fd3", True)],
            "id string, is_keeper boolean",
        )
        def ids(langs):
            return {
                r["doc_id"]
                for r in build_corpus(docs, clusters, capacity=512,
                                      langs=langs).select("doc_id").collect()
            }
        assert ids(("en",)) == {"s0\x1fd1"}
        assert ids(("en", "zh")) == {"s0\x1fd1", "s0\x1fd3"}
        assert ids(None) == {"s0\x1fd1", "s0\x1fd2", "s0\x1fd3"}
