"""SURT canonicalization + CDX-style capture index
(operators/urlindex.py): pinned key vectors, aggregation semantics,
and the plan shapes the module docstring promises."""

import pytest

from gleaner_spark.operators.urlindex import (
    annotate_surt,
    build_url_index,
    lookup_prefix,
)


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = annotate_surt(df).collect()
    return {r["url"]: r["surt_key"] for r in rows}


class TestSurtKey:
    def test_canonicalization_vectors(self, spark):
        got = _keys(spark, [
            # basic: host reversed, path kept
            "https://example.org/a/b",
            # lowercasing + one www. label stripped
            "HTTPS://WWW.Example.ORG/A",
            # www stripped only as a leading label, only once
            "https://www.www.example.org/x",
            "https://wwwx.example.org/x",
            # default ports stripped, non-default kept
            "http://example.org:80/p",
            "https://example.org:443/p",
            "https://example.org:8443/p",
            # userinfo + trailing dot stripped
            "https://user:pw@example.org./p",
            # empty path -> /
            "https://example.org",
            # query params sorted; fragment dropped
            "https://example.org/p?b=2&a=1#frag",
            "https://example.org/p?a=1&b=2",
            # empty query with fragment only
            "https://example.org/p#frag",
            # deep subdomain
            "https://a.b.c.example.co.uk/",
        ])
        assert got["https://example.org/a/b"] == "org,example)/a/b"
        assert got["HTTPS://WWW.Example.ORG/A"] == "org,example)/a"
        assert got["https://www.www.example.org/x"] == "org,example,www)/x"
        assert got["https://wwwx.example.org/x"] == "org,example,wwwx)/x"
        assert got["http://example.org:80/p"] == "org,example)/p"
        assert got["https://example.org:443/p"] == "org,example)/p"
        assert got["https://example.org:8443/p"] == "org,example:8443)/p"
        assert got["https://user:pw@example.org./p"] == "org,example)/p"
        assert got["https://example.org"] == "org,example)/"
        # both param orders collapse to one key, fragment gone
        assert got["https://example.org/p?b=2&a=1#frag"] == "org,example)/p?a=1&b=2"
        assert got["https://example.org/p?a=1&b=2"] == "org,example)/p?a=1&b=2"
        assert got["https://example.org/p#frag"] == "org,example)/p"
        assert got["https://a.b.c.example.co.uk/"] == "uk,co,example,c,b,a)/"

    def test_non_absolute_urls_get_null_key(self, spark):
        got = _keys(spark, ["not-a-url", "/relative/path", "mailto:x@y.z"])
        assert set(got.values()) == {None}

    def test_annotate_is_map_side(self, spark):
        df = spark.createDataFrame(
            [(f"https://h{i}.example/p{i}",) for i in range(20)], "url string"
        )
        plan = (
            annotate_surt(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan
        assert "*(1)" in plan, plan


class TestSurtPyTwin:
    def test_differential_vs_column_version(self, spark):
        """The driver-side Python twin must equal the column version
        key-for-key over a varied URL corpus (scheme × host-noise ×
        tail-noise grid plus junk/case vectors) — the pin that keeps
        the two implementations from drifting."""
        import itertools

        from gleaner_spark.operators.urlindex import surt_key_py

        hosts = [
            "example.org", "www.example.org", "a.b.example.co.uk",
            "x.example.org:8080", "example.org:443", "example.org:80",
            "user:pw@w.example.net.", "wwww.example.org",
            "www.www.example.org",
        ]
        tails = [
            "", "/", "/p", "/p/q/", "/p?b=2&a=1", "/p?a=1", "?z=1",
            "/p#f", "/p?b=2&a=1#f", "/p?x", "/p?", "/P/Q?B=2&A=1#F",
        ]
        urls = [
            s + h + t
            for s, h, t in itertools.product(
                ["https://", "http://", "ftp://"], hosts, tails
            )
        ]
        urls += ["not-a-url", "/rel/path", "mailto:a@b.c",
                 "HTTPS://USER:PW@WWW.EXAMPLE.ORG:443/UP?B=2&A=1#FRAG"]
        col = _keys(spark, urls)
        for u in urls:
            assert col[u] == surt_key_py(u), (u, col[u], surt_key_py(u))


class TestSurtPropertyDifferential:
    def test_randomized_differential(self, spark):
        """Randomized (seeded, reproducible) version of the grid
        differential: URLs assembled from adversarial parts —
        multiple @ / ? / #, odd ports, empty labels, percent
        escapes, uppercase — the twin and the column version must
        agree on every one. Batched through one Spark job."""
        import random

        from gleaner_spark.operators.urlindex import surt_key_py

        rng = random.Random(20260820)
        schemes = ["https://", "http://", "", "ftp://", "a+b-c://"]
        alpha = "abz09.-_~%@:/?#&=WW"
        examples = []
        for _ in range(400):
            s = rng.choice(schemes)
            h = "".join(rng.choice("abz09@:.-") for _ in range(rng.randint(0, 14)))
            t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 16)))
            examples.append(s + h + t)
        examples += ["https://@/", "https://:8080/", "https://./",
                     "https://..:80", "http://a@b@c/p", "https://h/p??a&&b"]
        col = _keys(spark, list(dict.fromkeys(examples)))
        bad = [
            (u, col[u], surt_key_py(u))
            for u in col
            if col[u] != surt_key_py(u)
        ]
        assert not bad, bad[:5]


class TestUrlIndex:
    def _captures(self, spark):
        rows = [
            # three captures of one canonical page under cosmetic
            # URL variation — must collapse to ONE index row
            ("https://www.example.org/p?b=2&a=1", 100),
            ("https://example.org/p?a=1&b=2", 50),
            ("https://EXAMPLE.org:443/p?b=2&a=1#f", 200),
            # a different page on the same host
            ("https://example.org/q", 10),
            # junk row -> NULL key group
            ("not-a-url", 5),
        ]
        return spark.createDataFrame(rows, "url string, warc_ts long")

    def test_index_semantics(self, spark):
        idx = {r["surt_key"]: r for r in build_url_index(
            self._captures(spark)
        ).collect()}
        assert set(idx) == {"org,example)/p?a=1&b=2", "org,example)/q", None}
        p = idx["org,example)/p?a=1&b=2"]
        assert p["n_captures"] == 3
        assert p["first_ts"] == 50 and p["last_ts"] == 200
        # bytewise-min original url is the deterministic sample
        assert p["url"] == "https://EXAMPLE.org:443/p?b=2&a=1#f"
        assert idx["org,example)/q"]["n_captures"] == 1
        assert idx[None]["n_captures"] == 1 and idx[None]["url"] == "not-a-url"

    def test_index_plan_one_exchange_partial_agg(self, spark):
        plan = (
            build_url_index(self._captures(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan
        assert "partial_count" in plan or "partial" in plan.lower(), plan
        assert "Python" not in plan, plan

    def test_index_over_warc_read_corpus(self, spark, tmp_path):
        """Composition: the WARC reader's output feeds the index —
        the cc-index build a CC-style archive user runs first."""
        from gleaner_spark.sources.warc import combine_warc_wet, read_warc, write_warc_file
        import datetime as dt

        rows = [
            {"url": "https://www.site.example/a?y=2&x=1",
             "warc_ts": dt.datetime(2024, 1, 1, 0, 0, 1),
             "html": b"<html>a</html>", "text": "a", "lang": "en",
             "content_type": "text/html"},
            {"url": "https://site.example/a?x=1&y=2",
             "warc_ts": dt.datetime(2024, 1, 2, 0, 0, 1),
             "html": b"<html>a2</html>", "text": None, "lang": "en",
             "content_type": "text/html"},
        ]
        write_warc_file(rows, str(tmp_path / "t.warc.gz"))
        pages = combine_warc_wet(read_warc(spark, str(tmp_path)))
        idx = build_url_index(pages).collect()
        assert len(idx) == 1
        assert idx[0]["surt_key"] == "example,site)/a?x=1&y=2"
        assert idx[0]["n_captures"] == 2
        assert idx[0]["first_ts"] == dt.datetime(2024, 1, 1, 0, 0, 1)
        assert idx[0]["last_ts"] == dt.datetime(2024, 1, 2, 0, 0, 1)

    def test_cli_index_subcommand(self, spark, tmp_path, capsys):
        """``python -m gleaner_spark index`` writes the sorted index
        from a WARC dir; output parquet is surt_key-ordered within
        files (the cc-index layout)."""
        import datetime as dt
        import json

        from gleaner_spark.__main__ import main
        from gleaner_spark.sources.warc import write_warc_file

        rows = [
            {"url": f"https://www.h{i % 5}.example/p{i}?b=2&a=1",
             "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
             "html": b"<html>x</html>", "text": None, "lang": "en",
             "content_type": "text/html"}
            for i in range(40)
        ]
        wdir = tmp_path / "w"
        wdir.mkdir()
        write_warc_file(rows, str(wdir / "a.warc.gz"))
        out = tmp_path / "idx"
        rc = main(["index", "--pages", str(wdir), "--pages-format",
                   "warc", "--out", str(out), "--files", "2"])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["index_rows"] == 40  # distinct (host, path) pairs
        got = spark.read.parquet(str(out)).collect()
        keys = [r["surt_key"] for r in got]
        assert len(keys) == 40 and all(k.endswith("?a=1&b=2") for k in keys)
        import glob as g

        files = sorted(g.glob(str(out / "part-*")))
        assert len(files) == 2
        # range-partitioned + sorted within: concatenated file order
        # is globally sorted
        per_file = [
            [r["surt_key"] for r in spark.read.parquet(f).collect()]
            for f in files
        ]
        flat = [k for fk in per_file for k in fk]
        assert flat == sorted(flat)

    _LOOKUP_ROWS = [
        ("org,example)/a", 1), ("org,example)/b?x=1", 2),
        ("org,example,sub)/c", 3),       # subdomain
        ("org,examplez)/d", 4),          # raw-prefix hit, host miss
        ("com,other)/e", 5),
    ]

    def test_lookup_prefix_raw_string_semantics(self, spark):
        df = spark.createDataFrame(
            self._LOOKUP_ROWS, "surt_key string, n_captures long"
        )
        got = {r["surt_key"] for r in lookup_prefix(df, "org,example").collect()}
        # raw prefix: examplez is inside the string range (documented)
        assert got == {"org,example)/a", "org,example)/b?x=1",
                       "org,example,sub)/c", "org,examplez)/d"}
        # empty prefix = whole index
        assert lookup_prefix(df, "").count() == 5

    def test_lookup_host_delimiter_correct_and_pushdown(self, spark, tmp_path):
        from gleaner_spark.operators.urlindex import lookup_host

        df = spark.createDataFrame(
            self._LOOKUP_ROWS, "surt_key string, n_captures long"
        )
        got = {r["surt_key"] for r in lookup_host(df, "example.org").collect()}
        assert got == {"org,example)/a", "org,example)/b?x=1",
                       "org,example,sub)/c"}  # examplez excluded
        only = {r["surt_key"] for r in lookup_host(
            df, "WWW.Example.ORG.", include_subdomains=False
        ).collect()}
        assert only == {"org,example)/a", "org,example)/b?x=1"}
        sub = {r["surt_key"] for r in lookup_host(df, "sub.example.org").collect()}
        assert sub == {"org,example,sub)/c"}
        # port canonicalization mirrors surt_key: default ports drop,
        # non-default ports ride after the reversed labels
        pdf = spark.createDataFrame(
            [("org,example:8443)/p", 1), ("org,example)/p", 2)],
            "surt_key string, n_captures long",
        )
        assert {r["surt_key"] for r in lookup_host(
            pdf, "example.org:8443"
        ).collect()} == {"org,example:8443)/p"}
        assert {r["surt_key"] for r in lookup_host(
            pdf, "example.org:443"
        ).collect()} == {"org,example)/p"}
        # pushdown: over a written index, the range pairs reach the
        # parquet scan as PushedFilters
        out = str(tmp_path / "idx")
        df.repartitionByRange(2, "surt_key").sortWithinPartitions(
            "surt_key"
        ).write.parquet(out)
        q = lookup_host(spark.read.parquet(out), "example.org")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(surt_key" in plan, plan
        assert "LessThan(surt_key" in plan, plan
        assert {r["surt_key"] for r in q.collect()} == got

    def test_capture_index_and_cdxj(self, spark, tmp_path, capsys):
        """--per-capture / --format cdxj: one row per capture with a
        SHA-1 digest, exported as globally-sorted CDXJ text lines."""
        import hashlib
        import json
        import datetime as dtm
        import glob as g

        from gleaner_spark.__main__ import main
        from gleaner_spark.operators.urlindex import build_capture_index

        pq = str(tmp_path / "pages")
        spark.createDataFrame(
            [(f"https://www.h{i % 3}.example/p{i}",
              dtm.datetime(2024, 1, 1, 0, 0, i),
              b"body-%d" % i)
             for i in range(12)],
            "url string, warc_ts timestamp, html binary",
        ).write.parquet(pq)
        # unit: digest + zero-exchange plan
        cap = build_capture_index(spark.read.parquet(pq))
        plan = cap._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        row = cap.filter(cap["url"] == "https://www.h1.example/p1").collect()[0]
        assert row["digest"] == hashlib.sha1(b"body-1").hexdigest()
        assert row["surt_key"] == "example,h1)/p1"
        # CLI: cdxj export, sorted layout
        out = tmp_path / "cdxj"
        assert main(["index", "--pages", pq, "--out", str(out),
                     "--format", "cdxj", "--files", "2"]) == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["index_rows"] == 12
        files = sorted(g.glob(str(out / "part-*")))
        assert len(files) == 2
        lines = []
        for f in files:
            lines += open(f).read().splitlines()
        assert len(lines) == 12
        keys = [(l.split(" ")[0], l.split(" ")[1]) for l in lines]
        assert keys == sorted(keys)  # globally sorted (surt, ts)
        surt, ts, payload = lines[0].split(" ", 2)
        assert ts == "20240101000000" or len(ts) == 14
        rec = json.loads(payload)
        assert rec["url"].startswith("https://www.h0.example/")
        assert len(rec["digest"]) == 40

    def test_cdxj_round_trip_and_lookup(self, spark, tmp_path, capsys):
        """to_cdxj_lines → read_cdxj round-trips the capture index,
        and lookup_host applies directly to the parsed frame (the
        consume-real-cc-index path)."""
        import datetime as dtm
        import json

        from gleaner_spark.__main__ import main
        from gleaner_spark.operators.urlindex import lookup_host, read_cdxj

        pq = str(tmp_path / "pages")
        rows = [(f"https://h{i % 3}.example/p{i}",
                 dtm.datetime(2024, 1, 1, 0, 0, i), b"b%d" % i)
                for i in range(12)]
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary"
        ).write.parquet(pq)
        out = tmp_path / "cdxj"
        assert main(["index", "--pages", pq, "--out", str(out),
                     "--format", "cdxj"]) == 0
        capsys.readouterr()
        back = read_cdxj(spark, str(out))
        got = {(r["surt_key"], r["ts"], r["url"], r["digest"])
               for r in back.collect()}
        assert len(got) == 12
        import hashlib

        assert ("example,h1)/p1", dtm.datetime(2024, 1, 1, 0, 0, 1),
                "https://h1.example/p1",
                hashlib.sha1(b"b1").hexdigest()) in got
        hits = lookup_host(back, "h2.example").collect()
        assert {r["url"] for r in hits} == {
            u for u, _, _ in rows if u.startswith("https://h2")
        }
        # malformed/blank lines are skipped, not fatal
        (out / "junk.txt").write_text("\n\nnot-cdxj\n")
        n = read_cdxj(spark, str(out)).count()
        assert n == 13  # 12 good + "not-cdxj" parsed as surt-only
        bad = read_cdxj(spark, str(out)).filter("url is null").collect()
        assert len(bad) == 1 and bad[0]["ts"] is None

    def test_host_stats(self, spark):
        from gleaner_spark.operators.urlindex import host_stats

        caps = spark.createDataFrame(
            [("org,example)/a", 10), ("org,example)/a", 20),
             ("org,example)/b", 30), ("org,example,sub)/c", 5),
             (None, 1)],
            "surt_key string, ts long",
        )
        got = {r["host_key"]: (r["n_captures"], r["n_urls"],
                               r["first_ts"], r["last_ts"])
               for r in host_stats(caps).collect()}
        assert got == {
            "org,example": (3, 2, 10, 30),       # 3 captures, 2 urls
            "org,example,sub": (1, 1, 5, 5),     # subdomain separate
        }

    def test_latest_captures_and_crawl_diff(self, spark):
        from gleaner_spark.operators.urlindex import (
            diff_crawls,
            latest_captures,
        )

        old_caps = spark.createDataFrame(
            [("k1", 10, "a"), ("k1", 20, "b"),       # latest wins: b
             ("k2", 5, "x"), ("k3", 7, "z"),
             ("k4", 9, "t"), ("k4", 9, "s")],        # ts tie: max digest t
            "surt_key string, ts long, digest string",
        )
        new_caps = spark.createDataFrame(
            [("k1", 30, "b"),                         # same digest
             ("k2", 40, "x2"),                        # changed
             ("k5", 50, "q"),                         # new key
             ("k4", 60, "t")],                        # same (tie winner)
            "surt_key string, ts long, digest string",
        )
        old = latest_captures(old_caps)
        assert {(r["surt_key"], r["digest"]) for r in old.collect()} == {
            ("k1", "b"), ("k2", "x"), ("k3", "z"), ("k4", "t")
        }
        d = {r["surt_key"]: r["status"] for r in diff_crawls(
            old, latest_captures(new_caps)
        ).collect()}
        assert d == {"k1": "same", "k2": "changed", "k3": "gone",
                     "k4": "same", "k5": "new"}

    def test_merge_equals_index_of_concatenation(self, spark):
        """merge(index(A), index(B)) must equal index(A ∪ B) row for
        row — the associativity that makes per-crawl indexes safe to
        build independently and merge later."""
        from gleaner_spark.operators.urlindex import merge_url_index

        def caps(lo, hi, step=1):
            return spark.createDataFrame(
                [(f"https://www.h{i % 7}.example/p{i % 13}?b=2&a=1", i)
                 for i in range(lo, hi, step)],
                "url string, warc_ts long",
            )

        a, b = caps(0, 60), caps(40, 120)  # overlapping capture sets
        merged = merge_url_index(build_url_index(a), build_url_index(b))
        direct = build_url_index(a.unionByName(b))
        assert sorted(
            (r["surt_key"], r["n_captures"], r["first_ts"],
             r["last_ts"], r["url"]) for r in merged.collect()
        ) == sorted(
            (r["surt_key"], r["n_captures"], r["first_ts"],
             r["last_ts"], r["url"]) for r in direct.collect()
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "partial" in plan.lower(), plan

    def test_cli_query_modes(self, spark, tmp_path, capsys):
        """--query-host / --query-url over a written index: JSON-line
        hits plus a summary, without rebuilding when --pages is
        omitted."""
        import json

        from gleaner_spark.__main__ import main

        pq = str(tmp_path / "pages")
        spark.createDataFrame(
            [(f"https://www.h{i % 3}.example/p{i}?b=2&a=1", 1000 + i)
             for i in range(30)],
            "url string, warc_ts long",
        ).write.parquet(pq)
        out = str(tmp_path / "idx")
        assert main(["index", "--pages", pq, "--out", out]) == 0
        capsys.readouterr()
        # host query over the existing index (no --pages)
        assert main(["index", "--out", out, "--query-host",
                     "h1.example"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        summary = json.loads(lines[-1])
        hits = [json.loads(l) for l in lines[:-1]]
        assert summary["query_hits"] == len(hits) == 10
        assert all(h["surt_key"].startswith("example,h1)") for h in hits)
        # exact-URL point lookup through the Python twin
        assert main(["index", "--out", out, "--query-url",
                     "https://h1.example:443/p1?a=1&b=2"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert json.loads(lines[-1])["query_hits"] == 1
        assert json.loads(lines[0])["n_captures"] == 1
        # junk URL: zero hits, no crash
        assert main(["index", "--out", out, "--query-url", "junk"]) == 0
        assert json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )["query_hits"] == 0
