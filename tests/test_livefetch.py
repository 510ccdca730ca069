"""Live-fetch mode: the harvest driven end-to-end over real sockets.

The reference's own tests run its fetch stage against a local fixture
HTTP server (testHelpers/mocks.go:13-37, resources_test.go:23-33);
these tests do the analog — a ThreadingHTTPServer serving the
deterministic corpus — and pin:

- live-socket harvest ≡ pages-join harvest (same documents/prov/
  metrics, byte-identical jsonld),
- idempotency over sockets (run 2 adds zero documents, prov re-emits —
  root_internal_test.go:72-106 analog),
- politeness delays observable in fetch timestamps,
- per-host in-flight concurrency never exceeds the thread budget,
- transport failures are counted, skipped, and kill nothing.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from gleaner_spark.operators.frontier import build_frontier, schedule_fetches
from gleaner_spark.operators.livefetch import live_fetch_pages
from gleaner_spark.plans.lake import Lake
from gleaner_spark.plans.pipeline import run_harvest
from gleaner_spark.sources import corpus
from gleaner_spark.sources.config import Source

N_PAGES = 120


def _path_key(url: str) -> str:
    """https://geoK.example.org/a/b → /geoK/a/b (the local server path)."""
    rest = url.split("//", 1)[1]
    host, _, path = rest.partition("/")
    return f"/{host.split('.', 1)[0]}/{path}"


class _CorpusServer:
    """Local fixture server: corpus pages by rewritten path, plus an
    in-flight counter so tests can assert the concurrency budget."""

    def __init__(self, n_pages: int = N_PAGES, latency_s: float = 0.0):
        routes = {}
        for i in range(n_pages):
            html, _ = corpus.html_for(i)
            routes[_path_key(corpus.url_for(i))] = (
                corpus.content_type_for(i), html.encode("utf-8")
            )
        self.routes = routes
        self.latency_s = latency_s
        self.lock = threading.Lock()
        self.inflight = 0
        self.max_inflight = 0
        self.request_log: list[tuple[str, float]] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib API
                with outer.lock:
                    outer.inflight += 1
                    outer.max_inflight = max(outer.max_inflight, outer.inflight)
                    outer.request_log.append((self.path, time.monotonic()))
                try:
                    if outer.latency_s:
                        time.sleep(outer.latency_s)
                    if self.path.startswith("/redir301/"):
                        # canonical-redirect shape: 301 to the real path
                        self.send_response(301)
                        self.send_header(
                            "Location", self.path[len("/redir301"):]
                        )
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    if self.path.startswith("/chain/"):
                        # /chain/<n>/<real path>: n hops then the page
                        _, _, rest = self.path[len("/chain/"):].partition("/")
                        n = int(self.path[len("/chain/"):].split("/", 1)[0])
                        loc = f"/{rest}" if n <= 1 else f"/chain/{n - 1}/{rest}"
                        self.send_response(302)
                        self.send_header("Location", loc)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    if self.path.startswith("/redirloop/"):
                        self.send_response(302)
                        self.send_header("Location", self.path)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    hit = outer.routes.get(self.path)
                    if hit is None:
                        body = b"not found"
                        self.send_response(404)
                        self.send_header("Content-Type", "text/plain")
                    else:
                        ctype, body = hit
                        self.send_response(200)
                        self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                finally:
                    with outer.lock:
                        outer.inflight -= 1

            def log_message(self, *a):  # silence per-request stderr
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def _rewrite_for(port: int):
    # self-contained closure: executors can't import the tests module,
    # so the path logic is inlined rather than calling _path_key
    def rw(url: str) -> str:
        rest = url.split("//", 1)[1]
        host, _, path = rest.partition("/")
        return f"http://127.0.0.1:{port}/{host.split('.', 1)[0]}/{path}"

    return rw


@pytest.fixture(scope="module")
def server():
    s = _CorpusServer()
    yield s
    s.stop()


def _harvest(spark, lake_dir, server, run_id="live-1", **kw):
    return run_harvest(
        spark, Lake(lake_dir), corpus.build_sources(), None,
        corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
        run_id=run_id, run_date="2024-01-01",
        fetch_mode="live", live_url_rewrite=_rewrite_for(server.port),
        **kw,
    )


class TestLiveHarvestE2E:
    def test_live_socket_harvest_equals_pages_join(self, spark, server, tmp_path):
        live_lake = str(tmp_path / "live")
        join_lake = str(tmp_path / "join")
        res_live = _harvest(spark, live_lake, server)
        pages = corpus.build_pages(spark, N_PAGES, partitions=4)
        res_join = run_harvest(
            spark, Lake(join_lake), corpus.build_sources(), pages,
            corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
            run_id="join-1", run_date="2024-01-01",
        )
        assert res_live.errors == [] and res_join.errors == []
        assert res_live.frontier_size == res_join.frontier_size
        assert res_live.fetched == res_join.fetched
        assert res_live.extracted == res_join.extracted
        assert res_live.new_documents == res_join.new_documents > 0
        key_cols = ["source_name", "url", "sha", "sha256", "unique_id", "jsonld"]
        a = {tuple(r) for r in Lake(live_lake).table("documents").read(spark).select(*key_cols).collect()}
        b = {tuple(r) for r in Lake(join_lake).table("documents").read(spark).select(*key_cols).collect()}
        assert a == b  # byte-identical extraction over real sockets
        pa = Lake(live_lake).table("prov").read(spark).count()
        pb = Lake(join_lake).table("prov").read(spark).count()
        assert pa == pb == res_live.prov_records

    def test_live_rerun_is_idempotent_and_reemits_prov(self, spark, server, tmp_path):
        """root_internal_test.go:72-106 analog: the second run over the
        same corpus stores zero new documents; prov re-puts every run
        (the jsonutils.go:378 quirk)."""
        lake_dir = str(tmp_path / "lake")
        r1 = _harvest(spark, lake_dir, server, run_id="live-1")
        r2 = _harvest(spark, lake_dir, server, run_id="live-2")
        assert r1.new_documents > 0
        assert r2.new_documents == 0
        assert r2.prov_records == r1.prov_records
        prov_n = Lake(lake_dir).table("prov").read(spark).count()
        assert prov_n == r1.prov_records + r2.prov_records


def _one_host_frontier(spark, server, n_urls, delay_ms=0, threads=1):
    host = "https://geo0.example.org"
    locs = "\n".join(
        f"<url><loc>{host}/items/item{5 * i}</loc></url>" for i in range(n_urls)
    )
    sitemap = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{locs}</urlset>"
    )
    src = [Source(name="s", url=f"{host}/sitemap.xml", domain=host,
                  delay_ms=delay_ms)]
    from gleaner_spark.sources.config import SummonerConfig

    frontier, errs = build_frontier(
        spark, src, {f"{host}/sitemap.xml": sitemap}, {},
        SummonerConfig(threads=threads),
    )
    assert errs == []
    return schedule_fetches(frontier)


class TestLivePoliteness:
    def test_delay_observable_in_fetch_timestamps(self, spark, server):
        delay_ms = 150
        frontier = _one_host_frontier(spark, server, 5, delay_ms=delay_ms)
        rows = live_fetch_pages(
            frontier, url_rewrite=_rewrite_for(server.port)
        ).orderBy("fetch_seq").collect()
        assert [r["ok"] for r in rows] == [True] * 5
        assert [r["lane"] for r in rows] == [0] * 5  # delay ⇒ one lane
        gaps = [
            rows[i + 1]["fetched_at_ms"] - rows[i]["fetched_at_ms"]
            for i in range(len(rows) - 1)
        ]
        # sleep runs after each completion: consecutive starts are at
        # least the delay apart (minus scheduler jitter)
        assert all(g >= delay_ms - 10 for g in gaps), gaps

    def test_inflight_never_exceeds_thread_budget(self, spark):
        srv = _CorpusServer(latency_s=0.05)
        try:
            frontier = _one_host_frontier(spark, srv, 24, threads=3)
            lanes = frontier.select("lane").distinct().count()
            assert lanes == 3
            rows = live_fetch_pages(
                frontier, url_rewrite=_rewrite_for(srv.port)
            ).collect()
            assert all(r["ok"] for r in rows) and len(rows) == 24
            assert srv.max_inflight <= 3  # lane == task == semaphore slot
        finally:
            srv.stop()

    def test_redirects_followed_like_go_http_client(self, spark, server):
        """3xx responses are followed transparently (client.Do parity):
        the final body is extracted, not the redirect stub; a redirect
        loop is a transport error after 10 hops."""
        port = server.port
        direct = _rewrite_for(port)

        def via_redirect(url):
            rest = url.split("//", 1)[1]
            host, _, path = rest.partition("/")
            return f"http://127.0.0.1:{port}/redir301/{host.split('.', 1)[0]}/{path}"

        frontier = _one_host_frontier(spark, server, 4)
        got = {
            r["url"]: r for r in live_fetch_pages(
                frontier, url_rewrite=via_redirect
            ).collect()
        }
        want = {
            r["url"]: r for r in live_fetch_pages(
                frontier, url_rewrite=direct
            ).collect()
        }
        assert set(got) == set(want) and len(got) == 4
        for u in got:
            # same status AND body as fetching the target directly —
            # the 301 stub (empty body, status 301) never surfaces
            assert got[u]["ok"] and got[u]["status"] == want[u]["status"]
            assert got[u]["status"] != 301
            assert got[u]["html"] == want[u]["html"]  # the TARGET body

        def loop(url):
            return f"http://127.0.0.1:{port}/redirloop/x"

        rows = live_fetch_pages(
            _one_host_frontier(spark, server, 1), url_rewrite=loop
        ).collect()
        assert len(rows) == 1 and not rows[0]["ok"]
        assert "redirect" in rows[0]["error"]

        # the exact Go http.Client boundary: at most 10 requests per
        # chain — 9 hops to the page (10 requests) succeeds, 10 hops
        # (needs an 11th request) is "stopped after N redirects"
        def chain(n):
            def rw(url):
                rest = url.split("//", 1)[1]
                host, _, path = rest.partition("/")
                return (f"http://127.0.0.1:{port}/chain/{n}/"
                        f"{host.split('.', 1)[0]}/{path}")
            return rw

        ok9 = live_fetch_pages(
            _one_host_frontier(spark, server, 1), url_rewrite=chain(9)
        ).collect()
        assert ok9[0]["ok"] and ok9[0]["status"] == want[ok9[0]["url"]]["status"]
        bad10 = live_fetch_pages(
            _one_host_frontier(spark, server, 1), url_rewrite=chain(10)
        ).collect()
        assert not bad10[0]["ok"] and "redirect" in bad10[0]["error"]

    def test_crash_after_stage_resumes_without_recrawling(
        self, spark, server, tmp_path, monkeypatch
    ):
        """Live fetches are durably staged before extraction: a phase-2
        crash after the stage resumes from parquet — zero new HTTP
        requests (politeness on resume) — and a completed run prunes
        the stage from the manifest."""
        from gleaner_spark.operators import harvest as hv
        from gleaner_spark.plans import pipeline as pl

        lake_dir = str(tmp_path / "lake")
        real = hv.extract_and_process

        def boom(*a, **kw):
            raise RuntimeError("injected: crash between stage and extract")

        monkeypatch.setattr(hv, "extract_and_process", boom)
        with pytest.raises(RuntimeError, match="injected"):
            _harvest(spark, lake_dir, server, run_id="live-c", resume=True)
        monkeypatch.setattr(hv, "extract_and_process", real)

        staged = Lake(lake_dir).table("fetched_pages").snapshots()
        assert [s["run_id"] for s in staged] == ["live-c"]
        n_before = len(server.request_log)

        def dead(url):  # any re-crawl attempt would fail loudly
            return "http://127.0.0.1:9/nope"

        res = pl.run_harvest(
            spark, Lake(lake_dir), corpus.build_sources(), None,
            corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
            run_id="live-c", run_date="2024-01-01", resume=True,
            fetch_mode="live", live_url_rewrite=dead,
        )
        assert res.errors == [] and res.new_documents > 0
        assert len(server.request_log) == n_before  # no re-crawl
        # same documents as a straight-through live run
        clean = str(tmp_path / "clean")
        _harvest(spark, clean, server, run_id="live-c2")
        key_cols = ["source_name", "url", "sha", "unique_id", "jsonld"]
        a = {tuple(r) for r in Lake(lake_dir).table("documents").read(spark).select(*key_cols).collect()}
        b = {tuple(r) for r in Lake(clean).table("documents").read(spark).select(*key_cols).collect()}
        assert a == b
        # completed runs prune their stage
        assert Lake(lake_dir).table("fetched_pages").snapshots() == []
        assert Lake(clean).table("fetched_pages").snapshots() == []

    def test_transport_failures_are_counted_not_fatal(self, spark, server, tmp_path):
        """One source's rewrite points at a dead port: its URLs are
        skipped and counted, every other source harvests normally."""
        good = _rewrite_for(server.port)
        dead = _rewrite_for(9)  # port 9 (discard) is closed: refused

        def rw(url):
            return dead(url) if "geo3" in url else good(url)

        lake_dir = str(tmp_path / "lake")
        res = run_harvest(
            spark, Lake(lake_dir), corpus.build_sources(), None,
            corpus.build_sitemaps(N_PAGES), corpus.build_robots(),
            run_id="live-f", run_date="2024-01-01",
            fetch_mode="live", live_url_rewrite=rw,
        )
        assert any("transport failures" in e for e in res.errors)
        docs = Lake(lake_dir).table("documents").read(spark)
        srcs = {r["source_name"] for r in docs.select("source_name").distinct().collect()}
        assert "src3" not in srcs
        assert {"src0", "src1", "src2", "src4"} <= srcs


class TestLiveEmptyFrontier:
    def test_zero_url_live_run_completes(self, spark, server, tmp_path):
        """A live run whose frontier is empty (no reachable sitemaps)
        stages ZERO fetch rows; the dataless staging snapshot is
        refused publication and the staged read returns None — the
        pipeline must complete with empty tables, not crash on the
        None .filter chain."""
        lake = Lake(str(tmp_path / "empty-live"))
        res = run_harvest(
            spark, lake, corpus.build_sources(), None,
            {},  # no sitemap bodies at all -> empty frontier
            corpus.build_robots(),
            run_id="live-empty", run_date="2024-01-01",
            fetch_mode="live", live_url_rewrite=_rewrite_for(server.port),
        )
        assert res.frontier_size == 0
        assert res.new_documents == 0 and res.fetched == 0
        assert lake.table("documents").read(spark) is None
        # the phase still commits: a resume is a no-op, not a re-crawl
        assert any(s["run_id"] == "live-empty"
                   for s in lake.table("phase2_commit").snapshots())


# ---------------------------------------------------------------------------
# Headless render fallback (S30 in live mode, VERDICT r4 #3)
# ---------------------------------------------------------------------------

_JS_PAGE = (
    b"<html><head><title>spa</title>"
    b"<script>/* injects ld+json into the DOM at runtime */</script>"
    b"</head><body>rendered client-side</body></html>"
)


def _js_doc(path: str) -> str:
    return (
        '{"@context":"http://schema.org/","@type":"Dataset",'
        f'"@id":"https://geo0.example.org/{path}","name":"injected {path}"}}'
    )


def _make_stub_renderer():
    """Deterministic stand-in for the CDP browser: 'executes' the JS
    page's injection script by returning the post-JS DOM the real
    renderer would serialize. Built as a NESTED function so cloudpickle
    ships it by value — executors cannot import the tests module."""

    def render(target_url: str, wait_s: int) -> str:
        from gleaner_spark.operators.livefetch import rendered_docs_to_text

        path = "/".join(target_url.split("/")[-2:])  # js/pageN
        doc = (
            '{"@context":"http://schema.org/","@type":"Dataset",'
            f'"@id":"https://geo0.example.org/{path}","name":"injected {path}"}}'
        )
        return rendered_docs_to_text([doc])

    return render


_stub_renderer = _make_stub_renderer()


def _js_frontier(spark, n, name="s", headless_wait=0):
    host = "https://geo0.example.org"
    locs = "\n".join(
        f"<url><loc>{host}/js/page{i}</loc></url>" for i in range(n)
    )
    sitemap = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{locs}</urlset>"
    )
    src = [Source(name=name, url=f"{host}/sitemap.xml", domain=host,
                  headless_wait=headless_wait)]
    from gleaner_spark.sources.config import SummonerConfig

    frontier, errs = build_frontier(
        spark, src, {f"{host}/sitemap.xml": sitemap}, {},
        SummonerConfig(threads=2),
    )
    assert errs == []
    return src, {f"{host}/sitemap.xml": sitemap}, schedule_fetches(frontier)


@pytest.fixture(scope="module")
def js_server(server):
    """Extra routes on the module server: pages whose JSON-LD exists
    only after JS execution (static extraction finds 0 docs)."""
    for i in range(8):
        server.routes[f"/geo0/js/page{i}"] = ("text/html", _JS_PAGE)
    return server


class TestLiveHeadlessFallback:
    def test_zero_doc_page_rendered_and_extracted(self, spark, js_server):
        """A fixture page whose JSON-LD is injected by script is
        summoned via the fallback: the stub renderer's DOM rides
        `text`, and the UNCHANGED downstream text fallback extracts
        the injected doc byte-identically (via_fallback=True)."""
        from gleaner_spark.operators import harvest as hv
        from gleaner_spark.operators.livefetch import CONTRACT_COLS

        src, _, frontier = _js_frontier(spark, 3)
        live = live_fetch_pages(
            frontier, url_rewrite=_rewrite_for(js_server.port),
            headless_wait_by_source={"s": 0}, renderer=_stub_renderer,
        )
        rows = live.collect()
        assert len(rows) == 3 and all(r["ok"] for r in rows)
        assert all(r["text"] and "application/ld+json" in r["text"] for r in rows)
        docs = hv.extract_documents(
            live.select(*CONTRACT_COLS), {"s": 0}
        ).collect()
        got = {r["url"]: (r["jsonld"], r["via_fallback"]) for r in docs}
        assert len(got) == 3
        for url, (jsonld, via_fallback) in got.items():
            path = "/".join(url.split("/")[-2:])
            assert jsonld == _js_doc(path)  # byte-identical
            assert via_fallback is True

    def test_renderer_skipped_when_static_docs_exist(self, spark, js_server):
        """Pages whose static extraction succeeds never hit the
        renderer (acquire.go:204-206 'Direct access worked' branch) —
        a renderer that would blow up proves it was never invoked."""
        def exploding(target_url, wait_s):
            raise AssertionError("renderer must not run for static pages")

        from gleaner_spark.core import extract as ex

        frontier = _one_host_frontier(spark, js_server, 4)
        rows = live_fetch_pages(
            frontier, url_rewrite=_rewrite_for(js_server.port),
            headless_wait_by_source={"s": 0}, renderer=exploding,
        ).collect()
        for r in rows:
            # exactly the check the fetch task ran
            has_static = bool(
                ex.find_jsonld_in_page(r["url"], r["content_type"], r["html"])
            )
            if has_static:
                assert r["ok"] and r["text"] is None and r["error"] is None
            else:
                # 0-doc static page: the exploding renderer DID run —
                # logged as a render error, fetch still ok (the
                # reference logs PageRenderAndUpload errors and moves on)
                assert r["ok"] and r["error"].startswith("headless_render:")

    def test_negative_headless_wait_disables_fallback(self, spark, js_server):
        """HeadlessWait < 0 opts a source out (acquire.go:196 checks
        >= 0), exactly like the pages-mode text fallback."""
        def exploding(target_url, wait_s):
            raise AssertionError("renderer must not run when hw < 0")

        _, _, frontier = _js_frontier(spark, 2)
        rows = live_fetch_pages(
            frontier, url_rewrite=_rewrite_for(js_server.port),
            headless_wait_by_source={"s": -1}, renderer=exploding,
        ).collect()
        assert len(rows) == 2
        assert all(r["ok"] and r["text"] is None and r["error"] is None
                   for r in rows)

    def test_no_renderer_means_no_fallback(self, spark, js_server):
        """Default live mode (no renderer configured) is unchanged:
        0-doc pages flow onward with null text, no errors."""
        _, _, frontier = _js_frontier(spark, 2)
        rows = live_fetch_pages(
            frontier, url_rewrite=_rewrite_for(js_server.port),
            headless_wait_by_source={"s": 0},
        ).collect()
        assert all(r["ok"] and r["text"] is None and r["error"] is None
                   for r in rows)

    def test_live_e2e_harvest_summons_js_injected_docs(
        self, spark, js_server, tmp_path
    ):
        """Full live pipeline with the renderer swap-point: the
        script-injected docs land in the documents table (fixed via
        the same fixup chain as static docs), and the staged
        fetched_pages checkpoint carries the rendered text so a resume
        never re-renders."""
        from gleaner_spark.core import fixups as fx

        src, sitemaps, _ = _js_frontier(spark, 5)
        lake = Lake(str(tmp_path / "js-lake"))
        res = run_harvest(
            spark, lake, src, None, sitemaps, {},
            run_id="live-js", run_date="2024-01-01",
            fetch_mode="live", live_url_rewrite=_rewrite_for(js_server.port),
            live_renderer=_stub_renderer, live_keep_fetched=True,
        )
        assert res.fetched == 5
        assert res.new_documents == 5
        docs = {r["url"]: r["jsonld"]
                for r in lake.table("documents").read(spark).collect()}
        for url, jsonld in docs.items():
            path = "/".join(url.split("/")[-2:])
            assert jsonld == fx.process_json(_js_doc(path))[0]
        staged = lake.table("fetched_pages").read(spark)
        assert staged.filter(F.col("text").isNotNull()).count() == 5

    def test_cdp_renderer_is_import_guarded(self):
        """The real CDP path fails fast at construction when the
        websocket transport is missing (codec-stub pattern) — in this
        sandbox it is missing."""
        from gleaner_spark.operators import livefetch as lf

        if lf.HAS_WEBSOCKET:  # pragma: no cover - cluster path
            pytest.skip("websocket-client present; construction succeeds")
        with pytest.raises(RuntimeError, match="websocket-client"):
            lf.cdp_renderer("http://localhost:9222")


# ---------------------------------------------------------------------------
# The real CDP protocol path, driven against a fake DevTools endpoint
# ---------------------------------------------------------------------------


class _FakeDevtools:
    """Fake Chrome DevTools HTTP endpoint: answers PUT /json/new with a
    target descriptor (headless.go:190-196's devtool.Create analog)."""

    def __init__(self, ws_url: str):
        outer = self
        self.puts: list[str] = []

        class Handler(BaseHTTPRequestHandler):
            def do_PUT(self):  # noqa: N802 - stdlib API
                outer.puts.append(self.path)
                body = json.dumps(
                    {"id": "FAKE-TARGET", "webSocketDebuggerUrl": ws_url}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class _ScriptedWS:
    """Scripted CDP websocket: replies to each method like a real
    browser session, interleaving one page event BEFORE the navigate
    response and one after — the exact ordering hazard _rpc's
    event-buffering exists for (responses and events share the socket)."""

    def __init__(self, evaluate_reply):
        self._evaluate_reply = evaluate_reply
        self.queue: list[dict] = []
        self.sent: list[dict] = []
        self.closed = False

    def send(self, payload):
        msg = json.loads(payload)
        self.sent.append(msg)
        i, m = msg["id"], msg["method"]
        if m == "Page.enable":
            self.queue.append({"id": i, "result": {}})
        elif m == "Page.navigate":
            self.queue.append({"method": "Page.domContentEventFired"})
            self.queue.append({"id": i, "result": {"frameId": "F0"}})
            self.queue.append({"method": "Page.loadEventFired"})
        elif m == "Runtime.evaluate":
            self.queue.append(self._evaluate_reply(i, msg["params"]))

    def recv(self):
        return json.dumps(self.queue.pop(0))

    def close(self):
        self.closed = True


class _FakeWSModule:
    def __init__(self, ws):
        self.ws = ws
        self.connected_to = None

    def create_connection(self, url, timeout=None):
        self.connected_to = url
        return self.ws


def _patched_cdp(monkeypatch, evaluate_reply):
    """(renderer, fake devtools server, scripted ws, ws module) with the
    websocket transport stubbed in — exercises every line of the real
    CDP path except the socket library itself."""
    from gleaner_spark.operators import livefetch as lf

    ws = _ScriptedWS(evaluate_reply)
    mod = _FakeWSModule(ws)
    monkeypatch.setattr(lf, "_websocket", mod)
    monkeypatch.setattr(lf, "HAS_WEBSOCKET", True)
    dt = _FakeDevtools("ws://127.0.0.1:1/devtools/page/FAKE-TARGET")
    render = lf.cdp_renderer(f"http://127.0.0.1:{dt.port}", timeout_s=5.0)
    return render, dt, ws, mod


class TestCdpRendererProtocol:
    def test_successful_render_returns_extractable_html(self, monkeypatch):
        """Full happy path: PUT /json/new → attach to the target's own
        ws URL → Page.enable → Page.navigate → await load events (one
        delivered BEFORE the navigate response) → Runtime.evaluate
        (awaitPromise) → rendered scripts wrapped so re-extraction is
        byte-identical (headless.go:111-357)."""
        from gleaner_spark.core import extract as ex

        docs = ['{"@context":"http://schema.org/","@id":"rendered-1"}',
                '{"@id":"rendered-2"}']

        def reply(i, params):
            return {"id": i,
                    "result": {"result": {"type": "object", "value": docs}}}

        render, dt, ws, mod = _patched_cdp(monkeypatch, reply)
        try:
            out = render("https://js.example.org/page1", 7)
        finally:
            dt.stop()
        assert dt.puts == ["/json/new"]
        assert mod.connected_to == "ws://127.0.0.1:1/devtools/page/FAKE-TARGET"
        # the rendered DOM must re-extract the injected docs byte-identically
        assert ex.extract_from_text_fallback(out) == docs
        assert ws.closed
        # protocol shape: enable → navigate(url) → evaluate(polling expr
        # with the source's HeadlessWait and the reference's 3 retries)
        methods = [m["method"] for m in ws.sent]
        assert methods == ["Page.enable", "Page.navigate", "Runtime.evaluate"]
        assert ws.sent[1]["params"]["url"] == "https://js.example.org/page1"
        ev = ws.sent[2]["params"]
        assert ev["awaitPromise"] and ev["returnByValue"]
        assert 'application/ld+json' in ev["expression"]
        assert "attempt(3)" in ev["expression"]          # headless.go:152
        assert "7000" in ev["expression"]                # wait_s → ms

    def test_promise_rejection_fails_silently(self, monkeypatch):
        """No JSON-LD after all retries → the page's promise rejects →
        exceptionDetails in the reply → None, no exception (the
        reference 'simply does not index' — headless.go:305-311)."""
        def reply(i, params):
            return {"id": i, "result": {
                "result": {"type": "string", "value": "No JSON-LD present"},
                "exceptionDetails": {"text": "Uncaught (in promise)"},
            }}

        render, dt, ws, _ = _patched_cdp(monkeypatch, reply)
        try:
            assert render("https://js.example.org/none", 1) is None
        finally:
            dt.stop()
        assert ws.closed

    def test_empty_value_returns_none(self, monkeypatch):
        def reply(i, params):
            return {"id": i, "result": {"result": {"type": "object", "value": []}}}

        render, dt, ws, _ = _patched_cdp(monkeypatch, reply)
        try:
            assert render("https://js.example.org/empty", 1) is None
        finally:
            dt.stop()

    def test_transport_error_midflow_returns_none_and_closes(self, monkeypatch):
        """A dead browser connection mid-protocol must not kill the
        fetch task: render errors annotate the row upstream, never
        raise (acquire.go:199-201)."""
        def reply(i, params):
            raise ConnectionResetError("browser went away")

        render, dt, ws, _ = _patched_cdp(monkeypatch, reply)
        try:
            assert render("https://js.example.org/dead", 1) is None
        finally:
            dt.stop()
        assert ws.closed
