"""WARC/WET ingestion source (sources/warc.py): byte-level parser
unit tests (no Spark), the Spark reader differential against the
synthetic corpus, and a harvest e2e over WARC-read pages that must
produce the identical documents table as the parquet pages path."""

import datetime as dt
import gzip

import pytest

from gleaner_spark.sources import corpus
from gleaner_spark.sources.warc import (
    build_warc_bytes,
    combine_warc_wet,
    iter_warc_records,
    pages_rows_from_archive,
    read_warc,
    write_warc_file,
)

TS = dt.datetime(2024, 1, 1, 0, 0, 5)


def _row(url="https://a.example/p1", html=b"<html>x</html>",
         text="x body", lang="en", ctype="text/html; charset=utf-8"):
    return {"url": url, "warc_ts": TS, "html": html, "text": text,
            "lang": lang, "content_type": ctype}


class TestWarcBytes:
    def test_round_trip_plain_and_gzipped(self):
        rows = [_row(), _row(url="https://a.example/p2", text=None),
                _row(url="https://a.example/p3", html=None)]
        for gz in (False, True):
            data = build_warc_bytes(rows, gzip_members=gz)
            assert data.startswith(b"\x1f\x8b" if gz else b"WARC/1.1")
            got = list(pages_rows_from_archive(data))
            # p1 → response + conversion; p2 → response; p3 → conversion
            assert [(r["url"], r["html"] is not None, r["text"] is not None)
                    for r in got] == [
                ("https://a.example/p1", True, False),
                ("https://a.example/p1", False, True),
                ("https://a.example/p2", True, False),
                ("https://a.example/p3", False, True),
            ]
            resp = got[0]
            assert resp["html"] == b"<html>x</html>"
            assert resp["content_type"] == "text/html; charset=utf-8"
            assert resp["warc_ts"] == TS
            assert resp["lang"] == "en"
            conv = got[1]
            assert conv["text"] == "x body"
            assert conv["content_type"] == "text/plain"

    def test_chunked_and_content_encoded_bodies_decoded(self):
        """Real crawls store wire bytes: chunked framing and gzip /
        deflate content codings must be undone; broken codings keep
        the raw bytes instead of dropping the capture."""
        def rec(http: bytes) -> bytes:
            head = (
                "WARC/1.1\r\nWARC-Type: response\r\n"
                "WARC-Target-URI: https://a.example/enc\r\n"
                "WARC-Date: 2024-01-01T00:00:05Z\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            return head + http + b"\r\n\r\n"

        body = b"<html>decoded!</html>"
        chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
                   b"Content-Type: text/html\r\n\r\n"
                   + b"6\r\n" + body[:6] + b"\r\n"
                   + hex(len(body) - 6)[2:].encode() + b"\r\n"
                   + body[6:] + b"\r\n0\r\n\r\n")
        gz = gzip.compress(body, mtime=0)
        gzipped = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                   b"Content-Type: text/html\r\n\r\n" + gz)
        import zlib as _z

        deflated = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
                    b"Content-Type: text/html\r\n\r\n" + _z.compress(body))
        co = _z.compressobj(wbits=-15)
        raw_deflate = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
                       b"Content-Type: text/html\r\n\r\n"
                       + co.compress(body) + co.flush())
        both = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
                b"Content-Encoding: gzip\r\nContent-Type: text/html\r\n\r\n"
                + hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n")
        broken = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                  b"Content-Type: text/html\r\n\r\nNOTGZIP")
        for http in (chunked, gzipped, deflated, both):
            (row,) = pages_rows_from_archive(rec(http))
            assert row["html"] == body, http[:40]
        # raw-deflate (no zlib wrapper) also decodes
        (row,) = pages_rows_from_archive(rec(raw_deflate))
        assert row["html"] == body
        (row,) = pages_rows_from_archive(rec(broken))
        assert row["html"] == b"NOTGZIP"  # kept raw, not dropped

    def test_non_2xx_responses_dropped(self):
        data = build_warc_bytes([_row(text=None)])
        data = data.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 404 NF")
        assert list(pages_rows_from_archive(data)) == []

    def test_redirect_status_dropped_but_2xx_variants_kept(self):
        data = build_warc_bytes([_row(text=None)])
        assert list(pages_rows_from_archive(
            data.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 301 Moved")
        )) == []
        assert len(list(pages_rows_from_archive(
            data.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 206 Partial")
        ))) == 1

    def test_non_page_record_types_skipped(self):
        info = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\n"
                b"WARC-Target-URI: https://a.example/p1\r\n"
                b"WARC-Date: 2024-01-01T00:00:05Z\r\n"
                b"Content-Length: 2\r\n\r\nok\r\n\r\n")
        req = (b"WARC/1.1\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://a.example/p1\r\n"
               b"Content-Length: 0\r\n\r\n\r\n\r\n")
        real = build_warc_bytes([_row(text=None)])
        got = list(pages_rows_from_archive(info + req + real))
        assert len(got) == 1 and got[0]["html"] is not None

    def test_truncated_tail_dropped_earlier_records_kept(self):
        good = build_warc_bytes([_row(text=None)])
        torn = good + good[: len(good) // 2]
        assert len(list(pages_rows_from_archive(torn))) == 1
        # truncation inside the gzip member stream likewise
        gz = gzip.compress(good, mtime=0)
        assert len(list(pages_rows_from_archive(gz + gz[:40]))) == 1

    def test_bare_lf_headers_and_multi_lang(self):
        rec = ("WARC/1.0\nWARC-Type: response\n"
               "WARC-Target-URI: <https://a.example/lf>\n"
               "WARC-Date: 2024-01-01T00:00:05.250Z\n"
               "WARC-Identified-Content-Language: zho,eng\n"
               "Content-Length: 4\n\r\n\r\nBODY\r\n\r\n").encode()
        (got,) = iter_warc_records(rec)
        assert got[0]["warc-target-uri"] == "<https://a.example/lf>"
        (row,) = pages_rows_from_archive(rec)
        assert row["url"] == "https://a.example/lf"
        assert row["lang"] == "zho"
        assert row["warc_ts"] == dt.datetime(2024, 1, 1, 0, 0, 5, 250000)
        assert row["html"] == b"BODY"  # identity (non-HTTP) payload

    def test_identity_payload_passthrough_content_type_null(self):
        (row,) = pages_rows_from_archive(
            b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/raw\r\n"
            b"WARC-Date: 2024-01-01T00:00:05Z\r\n"
            b"Content-Length: 2\r\n\r\n{}\r\n\r\n"
        )
        assert row["html"] == b"{}" and row["content_type"] is None


N_PAGES = 120


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    """The synthetic corpus written as two archives (one plain, one
    CC-style member-gzipped) — the reader must see the same pages."""
    d = tmp_path_factory.mktemp("warc")
    rows = [r.asDict() for r in corpus.build_pages(spark, N_PAGES).collect()]
    rows.sort(key=lambda r: r["url"])
    half = len(rows) // 2
    write_warc_file(rows[:half], str(d / "part0.warc"))
    write_warc_file(rows[half:], str(d / "part1.warc.gz"))
    return str(d), rows


class TestWarcSpark:
    def test_reader_matches_corpus_pages(self, spark, warc_dir):
        d, rows = warc_dir
        got = combine_warc_wet(read_warc(spark, d)).collect()
        exp = {r["url"]: r for r in rows}
        assert len(got) == len(exp)
        for r in got:
            e = exp[r["url"]]
            assert bytes(r["html"]) == bytes(e["html"])
            assert r["text"] == e["text"]
            assert r["lang"] == e["lang"]
            assert r["content_type"] == e["content_type"]
            assert r["warc_ts"] == e["warc_ts"]

    def test_harvest_over_warc_equals_parquet_pages(
        self, spark, warc_dir, tmp_path
    ):
        """e2e differential: the full 3-phase harvest fed from the
        WARC reader produces the byte-identical documents table as
        the same pages from parquet."""
        from gleaner_spark.plans.lake import Lake
        from gleaner_spark.plans.pipeline import read_documents, run_harvest

        d, _ = warc_dir
        pages_warc = combine_warc_wet(read_warc(spark, d))
        pages_pq = corpus.build_pages(spark, N_PAGES)
        outs = []
        for tag, pages in (("warc", pages_warc), ("pq", pages_pq)):
            lake = Lake(str(tmp_path / tag))
            run_harvest(
                spark, lake, corpus.build_sources(), pages,
                corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
                run_id=f"warc-e2e-{tag}", run_date="2024-01-01",
            )
            outs.append({
                (r["source_name"], r["unique_id"], r["sha"], r["jsonld"])
                for r in read_documents(spark, lake).collect()
            })
        assert outs[0] == outs[1] and len(outs[0]) > 0

    def test_cli_pages_format_warc(self, spark, warc_dir, tmp_lake,
                                   tmp_path, capsys):
        """``--pages-format warc`` drives the full CLI harvest from an
        archive directory and summons documents."""
        import json

        from gleaner_spark.__main__ import main
        from tests.test_cli import _write_fixtures

        d, _ = warc_dir
        fx = _write_fixtures(spark, str(tmp_path), n=N_PAGES)
        rc = main([
            "--cfg", fx["cfg"], "--pages", d, "--pages-format", "warc",
            "--seeds", fx["seeds"], "--lake", tmp_lake, "--setup",
            "--run-id", "cli-warc",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["new_documents"] > 0 and out["errors"] == []
