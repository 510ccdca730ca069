"""Connected components (large-star/small-star) over dedup pair graphs.

Differential oracle: a pure-Python union-find over the same edges —
catches any slip in the star emission rules on seeded random graphs,
including shapes (long chains) where naive label propagation would
need O(diameter) rounds.
"""

import random

import pytest
from pyspark.sql import functions as F

from gleaner_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _pairs_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "id_a long, id_b long")
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _nodes_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for i in n_ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _result_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_collapses_to_single_component(spark):
    # a 64-long chain: label propagation would need 64 rounds; the
    # star algorithm converges in O(log^2 n) and must label all with 0
    edges = [(i, i + 1) for i in range(63)]
    got = _result_map(connected_components(_pairs_df(spark, edges)))
    assert got == {i: 0 for i in range(64)}


def test_two_components_and_isolated_nodes(spark):
    edges = [(10, 11), (11, 12), (20, 21)]
    nodes = _nodes_df(spark, [10, 11, 12, 20, 21, 30])
    got = _result_map(
        connected_components(_pairs_df(spark, edges), nodes=nodes, node_col="doc_id")
    )
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_self_loops_duplicates_and_orientation_tolerated(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (3, 2)]
    nodes = _nodes_df(spark, [1, 2, 3, 5])
    got = _result_map(
        connected_components(_pairs_df(spark, edges), nodes=nodes, node_col="doc_id")
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 5}


def test_empty_pairs_all_isolated(spark):
    nodes = _nodes_df(spark, [7, 8])
    got = _result_map(
        connected_components(_pairs_df(spark, []), nodes=nodes, node_col="doc_id")
    )
    assert got == {7: 7, 8: 8}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 200
    ids = list(range(0, 3 * n, 3))  # non-contiguous ids
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(n + 50 * seed)
    ]
    want = _union_find(ids, edges)
    got = _result_map(
        connected_components(
            _pairs_df(spark, edges), nodes=_nodes_df(spark, ids), node_col="doc_id"
        )
    )
    assert got == want


def test_partitioning_invariance(spark):
    rng = random.Random(42)
    ids = list(range(100))
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(120)]
    base = _result_map(connected_components(_pairs_df(spark, edges)))
    repart = _result_map(
        connected_components(_pairs_df(spark, edges).repartition(7, "id_b"))
    )
    assert base == repart


def test_dedup_clusters_keeper_flags(spark):
    edges = [(1, 2), (2, 3)]
    nodes = _nodes_df(spark, [1, 2, 3, 9])
    rows = {
        r["id"]: (r["component"], r["is_keeper"])
        for r in dedup_clusters(_pairs_df(spark, edges), nodes, "doc_id").collect()
    }
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False), 9: (9, True)}


def test_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(31)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, edges), max_iter=1)


def test_constraint_propagation_conf_restored(spark):
    # the Catalyst UnionBase.rewriteConstraints workaround must not
    # leak: the session conf comes back to its prior value whether the
    # iteration succeeds or raises
    from gleaner_spark.operators.components import _CONSTRAINT_PROP

    spark.conf.set(_CONSTRAINT_PROP, "true")
    connected_components(_pairs_df(spark, [(1, 2)]))
    assert spark.conf.get(_CONSTRAINT_PROP) == "true"
    with pytest.raises(RuntimeError):
        connected_components(
            _pairs_df(spark, [(i, i + 1) for i in range(31)]), max_iter=1
        )
    assert spark.conf.get(_CONSTRAINT_PROP) == "true"


def test_string_ids_work(spark):
    # doc ids in the corpus plan are strings (source + US + unique_id)
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b")], "id_a string, id_b string"
    )
    got = _result_map(connected_components(df))
    assert got == {"a": "a", "b": "a", "c": "a"}


class TestQualityKeeper:
    def test_reassign_keepers_argmax_with_ties_and_missing(self, spark):
        """keeper = highest score per component; ties -> min id;
        missing scores never beat scored members; exactly one keeper
        per component."""
        from gleaner_spark.operators.components import reassign_keepers

        clusters = spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("c", "a"),
             ("d", "d"), ("e", "d"),
             ("f", "f")],
            "id string, component string",
        )
        scores = spark.createDataFrame(
            [("a", 10.0), ("b", 99.0), ("c", 50.0),
             ("d", 7.0), ("e", 7.0)],  # tie -> d; f unscored
            "id string, score double",
        )
        got = {r["id"]: r["is_keeper"]
               for r in reassign_keepers(clusters, scores).collect()}
        assert got == {"a": False, "b": True, "c": False,
                       "d": True, "e": False, "f": True}

    def test_reassign_keepers_plan_no_window(self, spark):
        """One aggregation with map-side partials (min_by), never a
        per-component window sort."""
        from gleaner_spark.operators.components import reassign_keepers

        clusters = spark.createDataFrame(
            [(str(i), str(i % 5)) for i in range(50)],
            "id string, component string",
        )
        scores = spark.createDataFrame(
            [(str(i), float(i)) for i in range(50)], "id string, score double"
        )
        plan = (
            reassign_keepers(clusters, scores)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan, plan
        assert "partial_min_by" in plan, plan

    def test_cluster_documents_quality_keeper(self, spark):
        """End-to-end through the docdedup plan: with keeper='quality'
        each cluster keeps its highest-q_score member; keeper counts
        per component stay exactly one."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators.textops import quality_scores
        from gleaner_spark.plans.docdedup import (
            DOC_ID_SEP,
            cluster_documents,
            corpus_doc_id,
        )

        # two near-identical docs (LSH-free: feed the pair directly),
        # one with richer text -> higher q_score
        docs = spark.createDataFrame(
            [
                ("s", "u1", "the quick brown fox jumps over the lazy dog"),
                ("s", "u2", "the quick brown fox jumps over the lazy dog and keeps going with many more quality words in it"),
                ("s", "u3", "unrelated content entirely"),
            ],
            "source_name string, unique_id string, jsonld string",
        )
        exact_groups = spark.createDataFrame(
            [], "content_hash string, keeper_id string"
        )
        pairs = spark.createDataFrame(
            [(f"s{DOC_ID_SEP}u1", f"s{DOC_ID_SEP}u2")], "id_a string, id_b string"
        )
        out = cluster_documents(docs, exact_groups, pairs, keeper="quality")
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 3
        comp = rows[f"s{DOC_ID_SEP}u1"]["component"]
        assert rows[f"s{DOC_ID_SEP}u2"]["component"] == comp
        # the longer (higher q_score) doc wins even though u1 < u2
        q = {
            r["doc_id"]: r["q_score"]
            for r in quality_scores(
                docs.select(corpus_doc_id().alias("doc_id"),
                            F.col("jsonld").alias("text")),
                text_col="text",
            ).collect()
        }
        assert q[f"s{DOC_ID_SEP}u2"] > q[f"s{DOC_ID_SEP}u1"]
        assert rows[f"s{DOC_ID_SEP}u2"]["is_keeper"]
        assert not rows[f"s{DOC_ID_SEP}u1"]["is_keeper"]
        assert rows[f"s{DOC_ID_SEP}u3"]["is_keeper"]  # singleton keeps itself

    def test_cluster_documents_bad_keeper_raises(self, spark):
        import pytest as _pytest

        from gleaner_spark.plans.docdedup import cluster_documents

        docs = spark.createDataFrame(
            [("s", "u1", "x")],
            "source_name string, unique_id string, jsonld string",
        )
        eg = spark.createDataFrame([], "content_hash string, keeper_id string")
        pr = spark.createDataFrame([], "id_a string, id_b string")
        with _pytest.raises(ValueError, match="min_id"):
            cluster_documents(docs, eg, pr, keeper="best")
