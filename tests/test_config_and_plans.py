"""Config loading (reference YAML samples) + thread/delay policy
vectors (acquire_test.go) + physical-plan quality assertions
(pushdown / column pruning / broadcast — the 100 TB checklist)."""

import pytest

from gleaner_spark.operators.frontier import effective_politeness
from gleaner_spark.sources.config import (
    Source,
    filter_sources_by_headless,
    filter_sources_by_type,
    load_config,
    sources_df,
)


class TestPolitenessPolicy:
    """acquire_test.go:14-89 vectors, 1:1."""

    def test_default(self):
        assert effective_politeness(5, 0, 0) == (5, 0)

    def test_delay_forces_single_thread(self):
        assert effective_politeness(5, 1000, 0) == (1, 1000)

    def test_delay_optional(self):
        assert effective_politeness(5, 0, 0) == (5, 0)

    def test_source_delay_overrides_if_longer(self):
        assert effective_politeness(5, 5, 100) == (1, 100)

    def test_source_delay_not_overriding_if_shorter(self):
        assert effective_politeness(5, 50, 10) == (1, 50)

    def test_zero_threads_forced_to_one(self):
        assert effective_politeness(0, 0, 0) == (1, 0)


class TestConfigLoad:
    def test_just_mainstems_yaml(self):
        cfg = load_config("/root/reference/testHelpers/sampleConfigs/justMainstems.yml")
        assert cfg.bucket == "gleanerbucket"
        assert cfg.summoner.threads == 5
        assert cfg.summoner.delay_ms == 0  # empty delay → default
        assert cfg.summoner.mode == "full"
        assert len(cfg.sources) == 1
        s = cfg.sources[0]
        assert s.name == "mainstems"
        assert s.source_type == "sitemap"
        assert s.active is True and s.headless is False
        assert s.url.endswith("mainstems__0.xml")
        assert s.pid == "https://gleaner.io/genid/geoconnex"

    def test_geoconnex_pids_yaml(self):
        cfg = load_config("/root/reference/testHelpers/sampleConfigs/geoconnex-pids.yaml")
        assert len(cfg.sources) >= 2
        assert all(s.source_type in ("sitemap", "robots") for s in cfg.sources)

    def test_source_filters(self, spark):
        df = sources_df(
            spark,
            [
                Source(name="a", url="u", source_type="sitemap", active=True),
                Source(name="b", url="u", source_type="sitemap", active=False),
                Source(name="c", url="u", source_type="robots", active=True),
                Source(name="d", url="u", source_type="sitemap", headless=True),
            ],
        )
        assert {r["name"] for r in filter_sources_by_type(df, "sitemap").collect()} == {"a", "d"}
        assert {r["name"] for r in filter_sources_by_headless(df, False).collect()} == {"a", "c"}


class TestPhysicalPlans:
    """Plan-shape checks: these are the properties that decide whether
    the job survives a 100× scale-up."""

    def test_filter_pushdown_reaches_scan(self, spark):
        import __spark_entry__ as m

        df = m.queries()["source_filter"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "lang" in plan.split("PushedFilters")[1][:300]

    def test_column_pruning_fetch_join(self, spark):
        """The pages scan feeding the fetch join must not read columns
        the join doesn't need (html/text stay pruned until extract)."""
        from gleaner_spark.operators.harvest import fetch_pages
        from gleaner_spark.sources import corpus
        import tempfile

        pages = corpus.build_pages(spark, 50, partitions=2)
        d = tempfile.mkdtemp() + "/pages"
        pages.write.parquet(d)
        pages = spark.read.parquet(d)
        from pyspark.sql import functions as F

        frontier = spark.read.parquet(d).select(
            "url", F.lit("s").alias("source_name"), F.lit(1).cast("long").alias("position")
        )
        joined = fetch_pages(frontier, pages).select("source_name", "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the scan feeding THIS projection must not carry html
        read_schemas = [seg[:200] for seg in plan.split("ReadSchema: ")[1:]]
        assert any("html" not in seg for seg in read_schemas)

    def test_broadcast_join_for_small_dim(self, spark):
        import __spark_entry__ as m

        df = m.queries()["point_lookup"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_partial_aggregation_present(self, spark):
        """metrics-style aggs must do map-side partial aggregation."""
        import __spark_entry__ as m

        df = m.queries()["metrics_agg"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial" in plan.lower()

    def test_whole_stage_codegen_on_text_ops(self, spark):
        import __spark_entry__ as m

        df = m.queries()["text_tokens"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # '*(n)' prefixes mark whole-stage-codegen spans in the tree dump
        assert "*(1)" in plan
        # and the whole pipeline is a single codegen stage over the scan
        assert "ColumnarToRow" in plan


class TestFetchJoinShape:
    def test_non_broadcast_fetch_join_single_exchange_of_html_side(self, spark):
        """VERDICT r1 #4: the non-broadcast fetch path must shuffle the
        html-bearing pages side exactly once (shuffled-hash join on
        url), never broadcast it, and never re-shuffle the join
        output."""
        import tempfile

        from pyspark.sql import functions as F

        from gleaner_spark.operators.harvest import fetch_pages
        from gleaner_spark.sources import corpus

        d = tempfile.mkdtemp() + "/pages"
        corpus.build_pages(spark, 50, partitions=2).write.parquet(d)
        pages = spark.read.parquet(d)
        frontier = spark.read.parquet(d).select(
            "url", F.lit("s").alias("source_name"),
            F.lit(1).cast("long").alias("position"),
        )
        joined = fetch_pages(frontier, pages, broadcast_frontier=False)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan
        # one exchange per join side, nothing after the join
        assert plan.count("Exchange") == 2


class TestAnnDedupPlanShapes:
    def test_lsh_bucket_join_shape(self, spark):
        """Banded LSH must join on the bucket key (shuffle per side),
        never a cartesian/BNL join, and rank with the group-limit
        pushdown."""
        from gleaner_spark.operators.ann import lsh_topk

        rows = [(i, [float((i * 7 + j) % 13) for j in range(64)]) for i in range(200)]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        plan = lsh_topk(e, k=3, n_planes=8, n_tables=4)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
        assert "hashpartitioning(bucket" in plan
        assert "WindowGroupLimit" in plan  # top-k pushed below the shuffle
        # VERDICT r2 #4: the bucket self-join must carry IDS ONLY —
        # the explode that feeds it keeps just vid, so no vector
        # column rides the N×n_tables bucket exchange (vectors join
        # back once per side for the rerank)
        import re

        gen = re.search(r"Generate explode\(keys#\d+\), \[vid#\d+L?\],", plan)
        assert gen is not None, plan

    def test_grid_dedup_single_exchange(self, spark):
        """Grid tiling: one exchange on the cell key feeding one
        applyInPandas — no driver collect, no all-pairs join."""
        from gleaner_spark.operators.dedup import embedding_near_duplicates

        rows = [(i, [float((i * 3 + j) % 7) for j in range(8)]) for i in range(100)]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        plan = embedding_near_duplicates(e, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "FlatMapGroupsInPandas" in plan
        assert "Join" not in plan

    def test_shingle_hashes_has_no_exchange(self, spark):
        """The per-doc shingle distinct is a map-side array_distinct:
        the exploded shingle set — the widest table in every
        fuzzy-dedup plan — must reach its consumer without its own
        Exchange (the old global .distinct() shuffled it once before
        the self-join's repartition shuffled it again), and the md5
        hashing must stay on the exploded rows where it codegens
        (inside a higher-order transform it is interpreted, measured
        8× slower)."""
        from gleaner_spark.operators.dedup import shingle_hashes

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e f")], "doc_id long, text string"
        )
        plan = shingle_hashes(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "array_distinct" in plan, plan
        # md5 evaluated post-explode (top-level projection), not
        # inside the transform lambda that builds the shingle array
        assert "conv(substring(md5" in plan, plan


class TestLakeSnapshotHygiene:
    def test_dataless_partitioned_append_is_not_published(self, spark, tmp_lake):
        """An all-rows-filtered partitionBy write leaves a dir with
        only _SUCCESS; reading it raises UNABLE_TO_INFER_SCHEMA, so
        publishing it would wedge every later read of the table. The
        lake must refuse it at the manifest boundary — no
        caller-side append-then-retract window."""
        from pyspark.sql import functions as F

        from gleaner_spark.plans.lake import Lake

        lake = Lake(tmp_lake)
        t = lake.table("documents")
        df = spark.range(5).select(
            (F.col("id") % 2).cast("string").alias("source_name"),
            F.col("id").cast("string").alias("v"),
        )
        snap = t.append(df, run_id="r1", partition_by=["source_name"])
        assert snap.get("published", True) is not False
        n_before = len(t.snapshots())

        empty = df.filter(F.lit(False))
        snap2 = t.append(empty, run_id="r2", partition_by=["source_name"])
        assert snap2["published"] is False and snap2["rows"] == 0
        assert len(t.snapshots()) == n_before  # manifest untouched
        assert t.read(spark).count() == 5  # table still readable

    def test_fused_dedup_collapses_slash_collision_like_reference(self, spark):
        """seen_key = source '/' unique_id is not injective: source
        'a' + id 'b/c' and source 'a/b' + id 'c' concat to one key —
        and ONE object path summoned/a/b/c.jsonld in the reference,
        whose StatObject idempotency keys on the path
        (jsonutils.go:355-357). The fused (key-derived) grouping must
        keep collapsing them to one winner; grouping on the real
        source_name column would split them."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators import harvest as hv

        rows = [
            ("a", "u1", 1, 0, "b/c", "doc1"),
            ("a/b", "u2", 2, 0, "c", "doc2"),
            ("a", "u3", 3, 0, "other", "doc3"),
        ]
        df = spark.createDataFrame(
            rows,
            "source_name string, url string, position long, doc_idx int,"
            " unique_id string, fixed_jsonld string",
        )
        out = hv.dedup_new_documents(spark, df, None)
        got = {(r["source_name"], r["unique_id"]) for r in out.collect()}
        # crawl-order winner of the collided key is position 1
        assert got == {("a", "b/c"), ("a", "other")}

    def test_fused_dedup_to_sink_single_exchange(self, spark):
        """VERDICT r4 #2: the claim 'dedup exchange fused with sink
        clustering' pinned as a plan shape — from dedup_new_documents'
        input through the documents-table projection there is exactly
        ONE Exchange (hash on the key-derived segment+salt), and the
        groupBy reuses it (no second exchange for the aggregation).
        Any projection inserted between dedup and sink that breaks
        the distribution match re-inserts a full shuffle of the
        widest column and fails this count."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators import harvest as hv

        rows = [
            (f"src{i % 3}", f"u{i}", i, 0, f"id{i}", "{}", "s", "s2",
             "jsonsha", None, None)
            for i in range(50)
        ]
        df = spark.createDataFrame(
            rows,
            "source_name string, url string, position long, doc_idx int,"
            " unique_id string, fixed_jsonld string, sha string,"
            " sha256 string, identifier_type string, matched_path string,"
            " matched_string string",
        )
        out = hv.documents_table(
            hv.dedup_new_documents(spark, df, None, cluster_files=4)
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "hashpartitioning" in plan
        # partial + final aggregate both present, satisfied by the one
        # exchange (map-side combine retained; min_by over a struct
        # compiles to SortAggregate, so match either aggregate kind)
        assert plan.count("Aggregate(") == 2, plan
