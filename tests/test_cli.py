"""spark-submit CLI entry (S33 parity: cmd/root.go:174-238)."""

import json
import os

from gleaner_spark.__main__ import main
from gleaner_spark.sources import corpus

CONFIG_YAML = """
minio:
  bucket: gleanerbucket
summoner:
  threads: 5
  delay: 0
  mode: full
sources:
{sources}
"""


def _write_fixtures(spark, tmpdir: str, n: int = 300) -> dict:
    pages_dir = os.path.join(tmpdir, "pages")
    corpus.build_pages(spark, n, partitions=4).write.mode("overwrite").parquet(pages_dir)
    seeds = {
        "sitemaps": corpus.build_sitemaps(n),
        "robots": corpus.build_robots(),
    }
    seeds_path = os.path.join(tmpdir, "seeds.json")
    with open(seeds_path, "w") as f:
        json.dump(seeds, f)
    src_lines = []
    for s in corpus.build_sources():
        src_lines.append(
            f"  - name: {s.name}\n    url: {s.url}\n    sourcetype: {s.source_type}\n"
            f"    domain: {s.domain}\n    pid: {s.pid or 'pid:' + s.name}\n"
            f"    propername: {s.proper_name or s.name}\n    active: 'true'"
        )
    cfg_path = os.path.join(tmpdir, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_YAML.format(sources="\n".join(src_lines)))
    return {"pages": pages_dir, "seeds": seeds_path, "cfg": cfg_path}


def test_cli_full_run(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path))
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--setup", "--run-id", "cli-1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "cli-1"
    assert out["new_documents"] > 0
    assert out["fetched"] > 0
    assert out["errors"] == []
    # lake tables materialized
    for t in ("documents", "prov", "orgs", "frontier", "metrics"):
        assert os.path.isdir(os.path.join(tmp_lake, t))


def test_cli_diff_mode_fatal(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=10)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--mode", "diff",
    ])
    assert rc == 1
    assert "not supported" in capsys.readouterr().err


def test_cli_unknown_source(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=10)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", "nope",
    ])
    assert rc == 1


def test_cli_single_source_and_resume(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=200)
    name = corpus.build_sources()[0].name
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", name, "--run-id", "cli-s",
    ])
    assert rc == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["new_documents"] > 0
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", name, "--run-id", "cli-s", "--resume",
    ])
    assert rc == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # phases checkpointed → skipped; the resume reports the committed
    # marker's durable counts (ADVICE r4: zeros here misled callers
    # that crashed between the phase-2 commit and the prune), while
    # the lake itself must not grow
    assert second["new_documents"] == first["new_documents"]
    from gleaner_spark.plans.lake import Lake

    docs = Lake(tmp_lake).table("documents")
    assert len({s["run_id"] for s in docs.snapshots()}) == 1


def test_cli_rude_requires_source(tmp_path, capsys):
    """root.go:106-109: --rude without --source is an error."""
    from gleaner_spark.__main__ import main

    rc = main([
        "--cfg", "x.yaml", "--pages", "p", "--lake", str(tmp_path),
        "--seeds", "s.json", "--rude",
    ])
    assert rc == 1
    assert "rude is only valid" in capsys.readouterr().err


def test_cli_dedup_over_harvested_lake(spark, tmp_lake, tmp_path, capsys):
    """VERDICT r4 #6: the LLM-pipeline composition — exact-dedup + LSH
    near-dup run over a HARVESTED lake's documents via the CLI. Mirror
    rows injected under a second source guarantee both passes fire:
    identical content under different (source, unique_id) keys is
    exactly what the harvest seen-set (S27) cannot catch."""
    from pyspark.sql import functions as F

    from gleaner_spark.plans.lake import Lake

    fx = _write_fixtures(spark, str(tmp_path), n=200)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--setup", "--run-id", "dd-h",
    ])
    assert rc == 0
    capsys.readouterr()

    lake = Lake(tmp_lake)
    docs = lake.table("documents").read(spark)
    n_docs = docs.count()
    mirrors = (
        docs.orderBy("source_name", "unique_id").limit(3)
        .withColumn("source_name", F.concat(F.lit("mirror-"), F.col("source_name")))
    )
    lake.table("documents").append(mirrors, run_id="dd-mirror")

    rc = main(["dedup", "--lake", tmp_lake, "--run-id", "dd-1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "dd-1"
    assert out["documents"] == n_docs + 3
    # each mirrored doc forms one byte-identical group of 2
    assert out["exact_groups"] >= 3
    assert out["exact_extra_copies"] >= 3
    # identical text is a near-dup pair at any threshold
    assert out["near_pairs"] >= 3

    exact = lake.table("dup_exact").read(spark)
    assert exact.filter(F.col("n_dups") < 2).count() == 0
    near = lake.table("dup_near").read(spark)
    for c in ("id_a", "id_b", "inter", "uni",
              "id_a_source", "id_b_source",
              "id_a_unique_id", "id_b_unique_id"):
        assert c in near.columns
    # mirror pairs: same unique_id, different source, Jaccard == 1
    mirror_pairs = near.filter(
        (F.col("id_a_unique_id") == F.col("id_b_unique_id"))
        & (F.col("inter") == F.col("uni"))
    )
    assert mirror_pairs.count() >= 3
    # pair ids resolve back to real documents (join closes the loop)
    all_ids = {r["d"] for r in lake.table("documents").read(spark).select(
        F.concat_ws("\x1f", "source_name", "unique_id").alias("d")
    ).collect()}
    for r in near.select("id_a", "id_b").limit(50).collect():
        assert r["id_a"] in all_ids and r["id_b"] in all_ids

    # cluster assignment: one row per document, keepers = clusters,
    # each mirrored doc is a non-keeper member of its original's
    # cluster (transitive closure over exact ∪ near pairs)
    clusters = lake.table("dup_clusters").read(spark)
    assert clusters.count() == n_docs + 3
    assert out["clusters"] + out["duplicate_docs"] == n_docs + 3
    assert out["duplicate_docs"] >= 3
    keepers = clusters.filter(F.col("is_keeper"))
    assert keepers.count() == out["clusters"]
    # every keeper labels itself; every member's component is a keeper id
    assert keepers.filter(F.col("id") != F.col("component")).count() == 0
    comp_ids = {r["component"] for r in clusters.select("component").distinct().collect()}
    keeper_ids = {r["id"] for r in keepers.collect()}
    assert comp_ids == keeper_ids
    # the 3 mirrors cluster with their originals (same unique_id,
    # source minus the "mirror-" prefix): transitivity puts both in
    # one component, and the deterministic min-id rule crowns exactly
    # one of them (the mirror, in fact — "mirror-…" sorts first)
    mirror_rows = clusters.filter(F.col("id_source").startswith("mirror-"))
    assert mirror_rows.count() == 3
    paired = mirror_rows.select(
        F.expr("substring(id_source, 8)").alias("src"),
        F.col("id_unique_id").alias("uid"),
        F.col("component").alias("m_comp"),
        F.col("is_keeper").alias("m_keeper"),
    ).join(
        clusters.select(
            F.col("id_source").alias("src"),
            F.col("id_unique_id").alias("uid"),
            F.col("component").alias("o_comp"),
            F.col("is_keeper").alias("o_keeper"),
        ),
        ["src", "uid"],
    ).collect()
    assert len(paired) == 3
    for r in paired:
        assert r["m_comp"] == r["o_comp"]
        assert not (r["m_keeper"] and r["o_keeper"])


def test_cli_corpus_build_over_harvested_lake(spark, tmp_lake, tmp_path, capsys):
    """The LLM-pipeline end state: harvest -> (auto-)dedup -> corpus.
    Keeper filter, PII scrub, deterministic splits, sequence packing,
    one immutable corpus snapshot."""
    from pyspark.sql import functions as F

    from gleaner_spark.plans.lake import Lake

    fx = _write_fixtures(spark, str(tmp_path), n=150)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--setup", "--run-id", "cb-h",
    ])
    assert rc == 0
    capsys.readouterr()

    lake = Lake(tmp_lake)
    n_docs = lake.table("documents").read(spark).count()
    # dup_clusters absent: the corpus CLI must run the dedup plan itself
    assert lake.table("dup_clusters").read(spark) is None
    rc = main(["corpus", "--lake", tmp_lake, "--run-id", "cb-1",
               "--capacity", "512"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "cb-1"
    assert out["documents"] == n_docs
    assert 0 < out["corpus_docs"] <= n_docs
    assert sum(out["split_counts"].values()) == out["corpus_docs"]
    assert set(out["split_counts"]) <= {"train", "valid", "test"}
    assert out["sequences"] >= 1

    corpus = lake.table("corpus").read(spark)
    assert corpus.count() == out["corpus_docs"]
    # keepers only: corpus ids are exactly the cluster keepers
    keepers = lake.table("dup_clusters").read(spark).filter(F.col("is_keeper"))
    assert corpus.count() == keepers.count()
    # packing invariants: offsets within capacity, seq ids contiguous
    # from 0 per source
    assert corpus.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 512)
    ).count() == 0
    assert corpus.filter(F.col("seq_id") < 0).count() == 0
    # a second corpus run reuses the existing clusters (independent
    # re-runnability) and appends a second snapshot with equal counts
    rc = main(["corpus", "--lake", tmp_lake, "--run-id", "cb-2",
               "--capacity", "512"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["corpus_docs"] == out["corpus_docs"]
    assert out2["split_counts"] == out["split_counts"]


def test_cli_corpus_mixing_knobs(spark, tmp_lake, tmp_path, capsys):
    """--weights / --token-budget / --shards compose over a harvested
    lake: upweighted sources replicate with a copy column (all copies
    in one split), the budget bounds the kept token mass, and every
    packed sequence carries one dense (shard, shard_pos)."""
    from pyspark.sql import functions as F

    from gleaner_spark.plans.lake import Lake

    fx = _write_fixtures(spark, str(tmp_path), n=120)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--setup", "--run-id", "mk-h",
    ])
    assert rc == 0
    capsys.readouterr()

    lake = Lake(tmp_lake)
    src = corpus.build_sources()[0].name
    t = lake.table("corpus")

    def _run(extra):
        rc = main(["corpus", "--lake", tmp_lake, "--capacity", "512",
                   "--weights", f"{src}=2.0"] + extra)
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        sid = out["snapshots"]["corpus"]
        [entry] = [s for s in t.snapshots() if s["snapshot_id"] == sid]
        return out, t.read_snapshot(spark, entry)

    out_a, snap_a = _run(["--run-id", "mk-1"])
    # x2 weight: the weighted source's docs appear as copies {0, 1},
    # every other doc exactly once as copy 0 — and a doc's copies
    # never straddle splits
    by_doc = (
        snap_a.groupBy("doc_id", "doc_id_source")
        .agg(F.sort_array(F.collect_list("copy")).alias("copies"),
             F.countDistinct("split").alias("nsplits"))
        .collect()
    )
    assert len(by_doc) > 0
    for r in by_doc:
        want = [0, 1] if r["doc_id_source"] == src else [0]
        assert r["copies"] == want, (r["doc_id"], r["copies"])
        assert r["nsplits"] == 1
    ntok = F.size(F.split(F.trim("text"), r"\s+"))
    total = snap_a.agg(F.sum(ntok).alias("t")).collect()[0]["t"]
    assert total > 2

    budget = int(total) // 2
    out_b, snap_b = _run(["--run-id", "mk-2", "--token-budget",
                          str(budget), "--shards", "3"])
    kept = snap_b.agg(F.sum(ntok).alias("t")).collect()[0]["t"]
    assert 0 < kept <= budget
    assert out_b["corpus_docs"] < out_a["corpus_docs"]
    # sequence-granular shuffle: one (shard, shard_pos) per sequence,
    # positions dense per shard
    seqs = (
        snap_b.groupBy("doc_id_source", "seq_id")
        .agg(F.countDistinct("shard").alias("ns"),
             F.countDistinct("shard_pos").alias("np"),
             F.first("shard").alias("shard"),
             F.first("shard_pos").alias("shard_pos"))
        .collect()
    )
    assert all(r["ns"] == 1 and r["np"] == 1 for r in seqs)
    per_shard: dict[int, list[int]] = {}
    for r in seqs:
        per_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(per_shard) <= {0, 1, 2}
    for ps in per_shard.values():
        assert sorted(ps) == list(range(len(ps)))
    # default path stays schema-compatible: no shards -> shard 0 /
    # NULL position, copy present
    assert snap_a.filter(F.col("shard") != 0).count() == 0
    assert snap_a.filter(F.col("shard_pos").isNotNull()).count() == 0
    assert set(snap_a.columns) == set(snap_b.columns)


def test_cli_dedup_empty_lake(spark, tmp_path, capsys):
    rc = main(["dedup", "--lake", str(tmp_path / "nothing"), "--run-id", "dd-0"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"run_id": "dd-0", "documents": 0, "exact_groups": 0,
                   "exact_extra_copies": 0, "near_pairs": 0,
                   "clusters": 0, "duplicate_docs": 0}


def test_cli_vacuum_sweeps_orphans_only(tmp_path, capsys):
    """`vacuum` removes unreferenced snap-* dirs past min-age, keeps
    manifest-live and too-young dirs, and needs no Spark session."""
    from gleaner_spark.plans.lake import Lake

    lake = Lake(str(tmp_path / "lake"))
    t = lake.table("documents")
    live = os.path.join(t.dir, "snap-live")
    orphan_old = os.path.join(t.dir, "snap-orphan-old")
    orphan_new = os.path.join(t.dir, "snap-orphan-new")
    for d in (live, orphan_old, orphan_new):
        os.makedirs(d)
    t._write_manifest([{"snapshot_id": "s1", "data_dir": "snap-live",
                        "run_id": "r", "files": []}])
    old = 1_000_000.0
    os.utime(orphan_old, (old, old))

    rc = main(["vacuum", "--lake", lake.root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed"] == {"documents": ["snap-orphan-old"]}
    assert os.path.isdir(live) and os.path.isdir(orphan_new)
    assert not os.path.exists(orphan_old)

    # --min-age-s 0 sweeps the young orphan too; idempotent after
    rc = main(["vacuum", "--lake", lake.root, "--min-age-s", "0"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed"] == {"documents": ["snap-orphan-new"]}
    rc = main(["vacuum", "--lake", lake.root, "--min-age-s", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["removed"] == {}


def test_dedup_embedding_method(spark, tmp_path, capsys):
    """--method embedding: hashed-TF cosine pairs through the grid
    kernel, schema-identical to the MinHash dup_near table, feeding
    the same cluster stage."""
    from gleaner_spark.plans.docdedup import dedup_documents, near_pairs_embedding

    docs = spark.createDataFrame(
        [
            ("s0", "u1", "the quick brown fox jumps over the lazy dog today"),
            # token-reordered copy: shingle Jaccard is low, cosine = 1.0
            ("s0", "u2", "today dog lazy the over jumps fox brown quick the"),
            ("s0", "u3", "entirely different content about spark shuffles here"),
        ],
        "source_name string, unique_id string, jsonld string",
    )
    exact_m, near_m = dedup_documents(docs, method="minhash")
    exact_e, near_e = dedup_documents(docs, method="embedding",
                                      threshold_pct=95)
    assert near_e.columns == near_m.columns  # snapshots union in one table
    pairs = {(r["id_a"], r["id_b"]): r["inter"] / r["uni"]
             for r in near_e.collect()}
    assert set(pairs) == {("s0\x1fu1", "s0\x1fu2")}
    assert pairs[("s0\x1fu1", "s0\x1fu2")] > 0.99  # bag-of-words identical
    # the reordering defeats 3-gram shingles at 80%
    assert near_m.count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="minhash"):
        dedup_documents(docs, method="simhash")


def test_cli_recrawl_schedule(spark, tmp_path, capsys):
    """recrawl subcommand: per-capture index -> budgeted schedule.
    The fast-changing URL outranks the static one; --out writes the
    schedule parquet; summary JSON is the last stdout line."""
    idx_dir = str(tmp_path / "capidx")
    out_dir = str(tmp_path / "sched")
    spark.createDataFrame(
        [
            ("org,hot)/x", 1000, "d1"), ("org,hot)/x", 2000, "d2"),
            ("org,hot)/x", 3000, "d3"),
            ("org,cold)/y", 1000, "dz"), ("org,cold)/y", 3000, "dz"),
            ("org,new)/z", 2500, "dq"),
        ],
        "surt_key string, ts long, digest string",
    ).write.mode("overwrite").parquet(idx_dir)
    rc = main(["recrawl", "--index", idx_dir, "--now", "10000",
               "--budget", "2", "--out", out_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["selected"] == 2 and summary["known_urls"] == 3
    # politeness ETA: 2 selected URLs on 2 hosts at the default 1s
    # delay -> worst lane is 1 fetch = 1s
    assert summary["eta_s"] == 1.0 and summary["bottleneck_host"]
    sel = {r["surt_key"]: r for r in spark.read.parquet(out_dir).collect()}
    assert "org,hot)/x" in sel  # two changes in 2000s dominates
    assert sel["org,hot)/x"]["n_changes"] == 2
    # per-host cap: hot and cold live on different hosts already, so
    # cap=1 forces one URL per host in the selection
    rc = main(["recrawl", "--index", idx_dir, "--now", "10000",
               "--budget", "2", "--per-host-cap", "1", "--out", out_dir])
    assert rc == 0
    capsys.readouterr()
    hosts = [r["host_key"] for r in spark.read.parquet(out_dir).collect()]
    assert len(hosts) == 2 and len(set(hosts)) == 2
    # --robots: the seeds file's Crawl-delay budgets drive the ETA
    seeds_path = str(tmp_path / "seeds.json")
    with open(seeds_path, "w") as f:
        json.dump({"robots": {
            "https://hot.org": "User-agent: *\nCrawl-delay: 7\n",
        }}, f)
    rc = main(["recrawl", "--index", idx_dir, "--now", "10000",
               "--budget", "2", "--robots", seeds_path])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # org,hot's single selected URL at 7s/fetch beats the 1s default
    assert summary["eta_s"] == 7.0
    assert summary["bottleneck_host"] == "org,hot"
    # --sitemaps: a publisher lastmod claim newer than org,new's only
    # capture makes it known-stale, jumping it into a budget-1 cut it
    # would otherwise lose to org,hot's estimate
    sm_path = str(tmp_path / "sm_seeds.json")
    with open(sm_path, "w") as f:
        json.dump({"sitemaps": {"sm": (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            "  <url><loc>https://new.org/z</loc>"
            "<lastmod>2024-06-01</lastmod></url>\n</urlset>\n"
        )}}, f)
    rc = main(["recrawl", "--index", idx_dir, "--now", "10000",
               "--budget", "1", "--sitemaps", sm_path])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["priority_col"] == "boosted_priority"
    assert json.loads(lines[0])["surt_key"] == "org,new)/z"


def test_cli_recrawl_rank_weighted_from_graph_output(spark, tmp_path, capsys):
    """--ranks consumes the graph subcommand's (host, rank) schema:
    plain host names convert to SURT host keys, and the budget cut
    switches to weighted_priority."""
    idx_dir = str(tmp_path / "capidx")
    ranks_dir = str(tmp_path / "ranks")
    spark.createDataFrame(
        [
            ("org,big)/x", 1000, "d1"), ("org,big)/x", 2000, "d2"),
            ("org,tiny)/y", 1000, "d1"), ("org,tiny)/y", 2000, "d2"),
        ],
        "surt_key string, ts long, digest string",
    ).write.mode("overwrite").parquet(idx_dir)
    # graph CLI schema: host (plain, forward order), rank
    spark.createDataFrame(
        [("big.org", 0.9), ("tiny.org", 0.1)], "host string, rank double"
    ).write.mode("overwrite").parquet(ranks_dir)
    rc = main(["recrawl", "--index", idx_dir, "--now", "10000",
               "--budget", "1", "--ranks", ranks_dir])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["priority_col"] == "weighted_priority"
    picked = json.loads(lines[0])
    # equal change histories: the host-rank tiebreak picks big.org
    assert picked["surt_key"] == "org,big)/x"


def test_cli_corpus_langs_validation(tmp_path, capsys):
    """--langs typos fail at parse time instead of silently building
    an empty corpus."""
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["corpus", "--lake", str(tmp_path), "--langs", "EN,klingon"])
    err = capsys.readouterr().err
    assert "klingon" in err


def test_cli_recrawl_ranks_and_sitemaps_compose(spark, tmp_path, capsys):
    """With --ranks AND --sitemaps, rank weighting survives INSIDE the
    known-stale set: two stale URLs order by weighted priority, not by
    the raw estimate."""
    idx_dir = str(tmp_path / "cidx")
    ranks_dir = str(tmp_path / "ranks")
    sm_path = str(tmp_path / "sm.json")
    # lowrank's raw estimate beats bigrank's (3 changes vs 1), but
    # bigrank's host rank (0.9 vs 0.1) must win within the stale set
    spark.createDataFrame(
        [("org,bigrank)/a", 100, "d1"), ("org,bigrank)/a", 200, "d2"),
         ("org,lowrank)/b", 100, "d1"), ("org,lowrank)/b", 150, "d2"),
         ("org,lowrank)/b", 180, "d3"), ("org,lowrank)/b", 200, "d4")],
        "surt_key string, ts long, digest string",
    ).write.mode("overwrite").parquet(idx_dir)
    spark.createDataFrame(
        [("bigrank.org", 0.9), ("lowrank.org", 0.1)],
        "host string, rank double",
    ).write.mode("overwrite").parquet(ranks_dir)
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url><loc>https://bigrank.org/a</loc>"
        "<lastmod>2024-06-01</lastmod></url>\n"
        "  <url><loc>https://lowrank.org/b</loc>"
        "<lastmod>2024-06-01</lastmod></url>\n</urlset>\n"
    )
    with open(sm_path, "w") as f:
        json.dump({"sitemaps": {"sm": xml}}, f)
    assert main(["recrawl", "--index", idx_dir, "--now", "10000",
                 "--budget", "1", "--ranks", ranks_dir,
                 "--sitemaps", sm_path]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[0])["surt_key"] == "org,bigrank)/a"
