"""Batch-vs-streaming differential at corpus scale (VERDICT r3 #7).

One batch ``run_harvest`` over the full corpus vs ``incremental_harvest``
over the same pages split into parquet drops that arrive as multiple
micro-batches. The corpus's shared-identifier pairs (i ≡ 16 mod 20
reuses the identifier of i-5, src1/identifiersha) are the duplicates;
the drop boundaries are chosen ≡ 13 (mod 20) so some pairs straddle a
micro-batch boundary — the winner must still be the crawl-order one in
both modes. Asserts documents and prov table equality.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from gleaner_spark.plans.lake import Lake
from gleaner_spark.plans.pipeline import run_harvest
from gleaner_spark.sources import corpus
from gleaner_spark.streaming.incremental import incremental_harvest

N_PAGES = 10_000
# ≡ 13 (mod 20): the pair (B-2, B+3) with B+3 ≡ 16 (mod 20) straddles
# each boundary; these three B values are picked so both pair members
# are robots-allowed AND doc-yielding page shapes (the straddle then
# really exercises cross-batch dedup, not a trivially absent page)
BOUNDS = [0, 2533, 5033, 7573, N_PAGES]

DOC_COLS = ["source_name", "url", "sha", "sha256", "jsonld",
            "identifier_type", "unique_id", "matched_path", "matched_string"]
PROV_COLS = ["source_name", "sha", "url", "prov_jsonld", "prov_sha", "date"]


def _write_drops(spark, stream_dir: str) -> None:
    """One parquet drop per index range, mtimes staged so the file
    stream (oldest-first) replays them in crawl order — the stream's
    semantic contract: drops arrive in capture order."""
    pages = corpus.build_pages(spark, N_PAGES, partitions=8)
    for k, (lo, hi) in enumerate(zip(BOUNDS, BOUNDS[1:])):
        lo_ts = corpus._EPOCH + dt.timedelta(seconds=lo)
        hi_ts = corpus._EPOCH + dt.timedelta(seconds=hi)
        drop = pages.filter(
            (F.col("warc_ts") >= F.lit(lo_ts)) & (F.col("warc_ts") < F.lit(hi_ts))
        )
        # ONE file per drop: a multi-file drop could put a colliding
        # pair's lower index in a later-listed part file, flipping the
        # winner when a trigger boundary falls inside the drop
        drop.repartition(1).write.mode("append").parquet(stream_dir)
        stamp = time.time() - 3600 + 60 * k
        for name in os.listdir(stream_dir):
            p = os.path.join(stream_dir, name)
            if name.endswith(".parquet") and os.path.getmtime(p) > stamp:
                os.utime(p, (stamp, stamp))


@pytest.fixture(scope="module")
def lakes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("diff")
    stream_dir, ckpt = str(base / "drops"), str(base / "ckpt")
    os.makedirs(stream_dir)
    _write_drops(spark, stream_dir)

    batch_lake = Lake(str(base / "batch"))
    res = run_harvest(
        spark, batch_lake, corpus.build_sources(),
        corpus.build_pages(spark, N_PAGES, partitions=8),
        corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
        run_id="batch-1", run_date="2024-01-01",
    )
    assert res.errors == [] and res.new_documents > 0

    stream_lake = Lake(str(base / "stream"))
    q = incremental_harvest(
        spark, stream_lake, corpus.build_sources(), stream_dir, ckpt,
        run_date="2024-01-01", robots_bodies=corpus.build_robots(),
        max_files_per_trigger=1,  # one drop per micro-batch
    )
    q.awaitTermination(600)
    n_batches = len(stream_lake.table("documents").snapshots())
    return {"batch": batch_lake, "stream": stream_lake, "res": res,
            "n_batches": n_batches}


def _table_equal(spark, a, b, table, cols):
    da = a.table(table).read(spark).select(*cols)
    db = b.table(table).read(spark).select(*cols)
    assert da.count() == db.count()
    assert da.exceptAll(db).count() == 0
    assert db.exceptAll(da).count() == 0


class TestBatchStreamingDifferential:
    def test_ran_as_multiple_microbatches(self, lakes):
        # ≥3 splits, or the differential proves nothing about
        # boundary-straddling duplicates
        assert lakes["n_batches"] >= 3

    def test_documents_table_equal(self, spark, lakes):
        _table_equal(spark, lakes["batch"], lakes["stream"],
                     "documents", DOC_COLS)

    def test_prov_table_equal(self, spark, lakes):
        _table_equal(spark, lakes["batch"], lakes["stream"],
                     "prov", PROV_COLS)

    def test_shared_identifier_winner_is_crawl_order(self, spark, lakes):
        """Pairs straddling a drop boundary (e.g. 2511/2516) and pairs
        inside one micro-batch must both resolve to the lower index —
        the batch pipeline's serial-upload winner."""
        docs = lakes["stream"].table("documents").read(spark)
        straddlers = [b + 3 for b in BOUNDS[1:-1]]  # 2536, 5036, 7576
        for i in straddlers:
            assert i % 20 == 16  # really a shared-identifier page
            ident = f"https://doi.example.org/10.5555/{i - 5}"
            stored = docs.filter(F.col("matched_string") == ident).collect()
            assert len(stored) == 1, f"identifier not collapsed for pair {i}"
            assert stored[0]["url"] == corpus.url_for(i - 5), (
                f"late duplicate won for pair {i}"
            )

    def test_redrop_adds_nothing_but_reemits_prov(self, spark, lakes, tmp_path):
        """Recrawl semantics across the stream checkpoint: re-dropping
        an already-harvested slice stores zero new documents while
        prov re-emits for every processed doc (jsonutils.go:378)."""
        stream_lake = lakes["stream"]
        docs_before = stream_lake.table("documents").read(spark).count()
        prov_before = stream_lake.table("prov").read(spark).count()
        stream_dir = str(tmp_path / "redrop")
        ckpt = str(tmp_path / "redrop-ckpt")
        lo_ts = corpus._EPOCH
        hi_ts = corpus._EPOCH + dt.timedelta(seconds=BOUNDS[1])
        corpus.build_pages(spark, N_PAGES, partitions=8).filter(
            (F.col("warc_ts") >= F.lit(lo_ts)) & (F.col("warc_ts") < F.lit(hi_ts))
        ).write.mode("append").parquet(stream_dir)
        q = incremental_harvest(
            spark, stream_lake, corpus.build_sources(), stream_dir, ckpt,
            run_date="2024-01-01", robots_bodies=corpus.build_robots(),
        )
        q.awaitTermination(600)
        assert stream_lake.table("documents").read(spark).count() == docs_before
        prov_after = stream_lake.table("prov").read(spark).count()
        assert prov_after > prov_before  # re-put quirk preserved
