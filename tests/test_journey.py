"""The full user journey through the CLI, end to end on one corpus:
WARC archives → harvest (3-phase pipeline) → corpus dedup →
training-corpus build → capture index (+host query) → webgraph →
recrawl schedule. Every subcommand consumes the previous one's
output — the integration pin that the pieces compose, not just pass
their own suites."""

import json

import pytest

from gleaner_spark.__main__ import main
from gleaner_spark.sources import corpus
from gleaner_spark.sources.warc import write_warc_file

N_PAGES = 120


@pytest.fixture(scope="module")
def journey_dirs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("journey")
    rows = [r.asDict() for r in corpus.build_pages(spark, N_PAGES).collect()]
    rows.sort(key=lambda r: r["url"])
    write_warc_file(rows[: N_PAGES // 2], str(d / "a.warc.gz"))
    write_warc_file(rows[N_PAGES // 2:], str(d / "b.warc"))
    return d


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_full_journey(spark, journey_dirs, tmp_path, capsys):
    from tests.test_cli import _write_fixtures

    warc_dir = str(journey_dirs)
    lake = str(tmp_path / "lake")
    fx = _write_fixtures(spark, str(tmp_path), n=N_PAGES)

    # 1. harvest straight from the archives
    assert main([
        "--cfg", fx["cfg"], "--pages", warc_dir, "--pages-format", "warc",
        "--seeds", fx["seeds"], "--lake", lake, "--setup",
        "--run-id", "journey",
    ]) == 0
    harvest = _last_json(capsys)
    assert harvest["new_documents"] > 0 and harvest["errors"] == []

    # 2. corpus dedup over the harvested lake
    assert main(["dedup", "--lake", lake]) == 0
    dd = _last_json(capsys)
    assert dd["documents"] == harvest["new_documents"]
    assert dd["clusters"] >= 0

    # 3. training-corpus build (keeper filter reuses the dedup run)
    assert main(["corpus", "--lake", lake, "--capacity", "512"]) == 0
    cb = _last_json(capsys)
    assert cb["sequences"] > 0 and cb["corpus_docs"] > 0
    assert cb["corpus_docs"] <= harvest["new_documents"]

    # 4. capture index from the same archives + a host query
    idx_out = str(tmp_path / "ccindex")
    assert main(["index", "--pages", warc_dir, "--pages-format", "warc",
                 "--out", idx_out]) == 0
    assert _last_json(capsys)["index_rows"] == N_PAGES
    assert main(["index", "--out", idx_out, "--query-host",
                 "geo0.example.org"]) == 0
    q = _last_json(capsys)
    assert q["query_hits"] > 0

    # 5. webgraph from the same archives (pages have no cross-host
    # anchors in the synthetic corpus, so the graph is legitimately
    # empty — the command must still succeed and write empty tables)
    g_out = str(tmp_path / "graph")
    assert main(["graph", "--pages", warc_dir, "--pages-format", "warc",
                 "--out", g_out, "--anchors", "--domains"]) == 0
    g = _last_json(capsys)
    assert g["edges"] == 0 and g["hosts"] == 0

    # 6. recrawl schedule over a per-capture index from the same
    # archives (one capture per URL here, so every key takes the
    # prior rate and the budget cut is exercised end to end)
    cap_out = str(tmp_path / "capindex")
    assert main(["index", "--pages", warc_dir, "--pages-format", "warc",
                 "--out", cap_out, "--per-capture"]) == 0
    capsys.readouterr()
    sched_out = str(tmp_path / "schedule")
    assert main(["recrawl", "--index", cap_out, "--now", "2000000000",
                 "--budget", "25", "--per-host-cap", "10",
                 "--out", sched_out]) == 0
    rs = _last_json(capsys)
    assert rs["selected"] == 25 and rs["known_urls"] == N_PAGES
    sched = spark.read.parquet(sched_out)
    hosts = [r["host_key"] for r in sched.collect()]
    assert max(hosts.count(h) for h in set(hosts)) <= 10
    # schedule rows are fetchable: original URLs ride along
    assert sched.filter(sched["url"].isNull()).count() == 0

    # 7. the loop closes: the schedule drives a second harvest
    # through the unchanged pipeline (schedule_to_seeds -> one
    # synthetic sitemap source listing exactly the scheduled URLs)
    from gleaner_spark.operators.recrawl import schedule_to_seeds
    from gleaner_spark.plans.lake import Lake
    from gleaner_spark.plans.pipeline import run_harvest
    from gleaner_spark.sources.warc import combine_warc_wet, read_warc

    urls = [r["url"] for r in sched.orderBy("surt_key").collect()]
    src, sm_bodies = schedule_to_seeds(urls)
    pages = combine_warc_wet(read_warc(spark, warc_dir))
    lake2 = Lake(str(tmp_path / "lake2"))
    res = run_harvest(
        spark, lake2, [src], pages, sm_bodies,
        robots_bodies={}, run_id="journey-recrawl",
    )
    # every scheduled URL enters the frontier; docs extract from the
    # re-fetched subset only
    assert res.frontier_size == len(urls)
    assert 0 < res.new_documents
    assert lake2.table("documents").read(spark).count() == res.new_documents
