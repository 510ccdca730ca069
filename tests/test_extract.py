"""Extraction byte-identity + robots + sitemap + identifier kernels."""

import json

import pytest

from gleaner_spark.core import extract as ex
from gleaner_spark.core import identifier as ident
from gleaner_spark.core import robots as rb
from gleaner_spark.core import sitemap as sm
from gleaner_spark.core.prov import org_jsonld, org_nquads, prov_graph

DOC = '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"x"}'
DOC2 = '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"y"}'


class TestExtraction:
    def test_single_script(self):
        html = f'<html><head><script type="application/ld+json">{DOC}</script></head><body>hi</body></html>'
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", html) == [DOC]

    def test_two_scripts_doc_order(self):
        html = (
            f'<html><body><script type="application/ld+json">{DOC}</script>'
            f'<p>mid</p><script type="application/ld+json">{DOC2}</script></body></html>'
        )
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", html) == [DOC, DOC2]

    def test_prefix_match_charset_variant(self):
        # selector is script[type^='application/ld+json'] (acquire.go:252)
        html = f'<script type="application/ld+json;charset=utf-8">{DOC}</script>'
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", html) == [DOC]

    def test_non_matching_script_ignored(self):
        html = f'<script type="text/javascript">var x=1;</script><script type="application/ld+json">{DOC}</script>'
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", html) == [DOC]

    def test_zero_scripts(self):
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", "<html><body>none</body></html>") == []

    def test_whole_body_for_json_content_type(self):
        assert ex.find_jsonld_in_page("https://x.test/a", "application/ld+json", DOC) == [DOC]
        assert ex.find_jsonld_in_page("https://x.test/a", "application/json; charset=utf-8", DOC) == [DOC]

    def test_whole_body_for_json_extension(self):
        assert ex.find_jsonld_in_page("https://x.test/a.jsonld", "text/html", DOC) == [DOC]
        assert ex.find_jsonld_in_page("https://x.test/a.json?q=1", "text/html", DOC) == [DOC]

    def test_invalid_json_dropped(self):
        bad = open("/root/reference/testHelpers/sampleConfigs/badjsonld.jsonld").read()
        html = f'<script type="application/ld+json">{bad}</script>'
        assert ex.find_jsonld_in_page("https://x.test/a", "text/html", html) == []

    def test_byte_identity_exotic_whitespace(self):
        # script content is CDATA: bytes must round-trip exactly
        exotic = '\n\t {"@context":  {"@vocab":"https://schema.org/"} ,\r\n "@type":"Dataset","name":"a  b"}\n '
        html = f'<script type="application/ld+json">{exotic}</script>'
        got = ex.find_jsonld_in_page("https://x.test/a", "text/html", html)
        assert got == [exotic]

    def test_mainstem_fixture_byte_identity(self):
        doc = open("/root/reference/testHelpers/sampleConfigs/mainstem35394ButEdited.jsonld").read()
        html = f'<html><head><script type="application/ld+json">{doc}</script></head></html>'
        got = ex.find_jsonld_in_page("https://x.test/m", "text/html", html)
        assert got == [doc]

    def test_graph_array_split(self):
        arr = f"[{DOC},{DOC2}]"
        html = f'<script type="application/ld+json">{arr}</script>'
        got = ex.find_jsonld_in_page("https://x.test/a", "text/html", html)
        # elements (Go-marshalled) + the raw array text
        assert got[-1] == arr
        assert len(got) == 3
        assert json.loads(got[0])["name"] == "x"

    def test_text_fallback(self):
        assert ex.extract_from_text_fallback(DOC) == [DOC]
        assert ex.extract_from_text_fallback("") == []


ROBOTS_FIXTURE = """User-agent: *
Disallow: /cgi-bin
Disallow: /forms
Disallow: /api/gi-cat
Disallow: /rocs/archives-catalog
Crawl-delay: 10
"""


class TestRobots:
    def test_parse_and_group(self):
        data = rb.parse_robots_txt(ROBOTS_FIXTURE)
        g = data.find_group(ex.EARTHCUBE_AGENT)
        assert g is not None
        assert g.crawl_delay == 10.0

    def test_disallow(self):
        g = rb.parse_robots_txt(ROBOTS_FIXTURE).find_group(ex.EARTHCUBE_AGENT)
        assert not g.test("/cgi-bin/foo")
        assert not g.test("https://example.com/forms")
        assert g.test("/ok/path")
        assert g.test("https://example.com/data/x.jsonld")

    def test_agent_specific_group(self):
        body = "User-agent: EarthCube_DataBot\nDisallow: /private\n\nUser-agent: *\nDisallow: /everything\n"
        data = rb.parse_robots_txt(body)
        g = data.find_group("EarthCube_DataBot/1.0")
        assert not g.test("/private/x")
        assert g.test("/everything")  # agent group overrides *

    def test_allow_wins_tie_and_longest_wins(self):
        body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
        g = rb.parse_robots_txt(body).find_group("anybot")
        assert not g.test("/a/c")
        assert g.test("/a/b/c")

    def test_wildcards(self):
        body = "User-agent: *\nDisallow: /*.pdf$\n"
        g = rb.parse_robots_txt(body).find_group("anybot")
        assert not g.test("/docs/file.pdf")
        assert g.test("/docs/file.pdf.html")

    def test_sitemaps_collected(self):
        body = "Sitemap: https://x.test/sitemap.xml\nUser-agent: *\nDisallow:\n"
        data = rb.parse_robots_txt(body)
        assert data.sitemaps == ["https://x.test/sitemap.xml"]

    def test_no_robots_allows(self):
        assert rb.robots_allowed("https://x.test/a", None, ex.EARTHCUBE_AGENT)

    def test_crawl_delay_units_quirk(self):
        # resources_test.go:76-82 pins max(10 seconds, 1 ms-unit) == 10
        assert rb.resolve_crawl_delay_ms(10.0, 1) == 10
        assert rb.resolve_crawl_delay_ms(None, 5000) == 5000


class TestSitemap:
    def test_reference_fixture_parse(self):
        xml = open("/root/reference/testHelpers/sampleConfigs/mainstemSitemapWithoutMost.xml").read()
        urls = sm.parse_sitemap(xml)
        assert len(urls) > 0
        assert all(u.loc.startswith("http") for u in urls)
        # order preserved = document order
        xml_order = [u.loc for u in urls]
        assert xml_order == sorted(xml_order, key=xml_order.index)

    def test_index_fixture(self):
        xml = open("/root/reference/testHelpers/sampleConfigs/sitemapIndex.xml").read()
        subs = sm.parse_sitemap_index(xml)
        assert len(subs) > 0

    def test_urlset_is_not_index(self):
        xml = open("/root/reference/testHelpers/sampleConfigs/mainstemSitemapWithoutMost.xml").read()
        assert sm.parse_sitemap_index(xml) == []

    def test_normalize_loc(self):
        assert sm.normalize_loc("  https://x.test/a b\nc  ") == "https://x.test/abc"

    def test_malformed_raises(self):
        with pytest.raises(sm.SitemapParseError):
            sm.parse_sitemap("<urlset><url><loc>x</loc>")


class TestIdentifier:
    def test_file_sha(self):
        i = ident.generate_file_sha("hello")
        assert i.unique_id == "aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d"
        assert i.identifier_type == "jsonsha"

    def test_jsonpath_sorted(self):
        doc = '{"identifier": ["b", "a", "c"]}'
        assert ident.get_identifier_by_path("$.identifier[*]", doc) == ["a", "b", "c"]

    def test_jsonpath_object_value(self):
        doc = open("/root/reference/internal/common/testdata/identifier/jsonIdentifierObjectPath.json").read()
        got, path = ident.get_identifier_by_paths(
            ["$.identifier.value", "$.identifier"], doc
        )
        assert got  # non-empty match from the first matching path
        assert path == "$.identifier.value"

    def test_paths_fallthrough(self):
        doc = '{"identifier": "plain-string"}'
        got, path = ident.get_identifier_by_paths(
            ["$.identifier.value", "$.identifier"], doc
        )
        assert got == ["plain-string"]
        assert path == "$.identifier"

    def test_no_match(self):
        got, path = ident.get_identifier_by_paths(["$.nope"], "{}")
        assert got == [] and path == ""

    def test_generate_identifier_dispatch(self):
        doc = '{"identifier": "abc"}'
        i = ident.generate_identifier("identifiersha", ["$.identifier"], doc)
        assert i.identifier_type == "identifiersha"
        assert i.matched_string == "abc"
        assert i.unique_id == ident.get_sha("abc")
        j = ident.generate_identifier("jsonsha", [], doc)
        assert j.unique_id == ident.get_sha(doc)


class TestProvOrg:
    def test_prov_graph_deterministic(self):
        doc, psha, urn = prov_graph(
            "gleaner", "src1", "f" * 40, "https://x.test/a",
            pid="https://pid.test/1", pname="Proper", domain="https://x.test",
            date="2024-01-01",
        )
        assert urn == "urn:gleaner:src1:" + "f" * 40
        parsed = json.loads(doc)
        assert parsed["@graph"][0]["@type"] == "prov:Organization"
        doc2, psha2, _ = prov_graph(
            "gleaner", "src1", "f" * 40, "https://x.test/a",
            pid="https://pid.test/1", pname="Proper", domain="https://x.test",
            date="2024-01-01",
        )
        assert psha == psha2

    def test_org_requires_fields(self):
        with pytest.raises(ValueError):
            org_jsonld("", "https://x.test", "pid")
        with pytest.raises(ValueError):
            org_jsonld("name", "https://x.test", "")

    def test_org_nquads_shape(self):
        nq = org_nquads("src1", "https://x.test", "https://pid.test/1")
        lines = [l for l in nq.strip().split("\n") if l]
        assert all(l.endswith(" .") for l in lines)
        assert any("https://gleaner.io/id/org/src1" in l for l in lines)


class TestContentTypeNegotiation:
    """acquire.go:240: whole-body extraction when the Content-Type
    header CONTAINS application/ld+json or application/json, OR the
    URL extension is .json/.jsonld — a JSON-LD API serving
    extensionless URLs (the JsonProfile use case, sources.go:69) must
    not degrade to script-tag scraping."""

    def test_profile_header_extracts_whole_body(self):
        from gleaner_spark.core.extract import find_jsonld_in_page

        doc = '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"x"}'
        url = "https://geo0.example.org/api/record/7"  # no extension
        got = find_jsonld_in_page(url, "application/ld+json; charset=utf-8", doc)
        assert got == [doc]  # byte-identical whole body
        got2 = find_jsonld_in_page(url, "application/json", doc)
        assert got2 == [doc]
        # without the header the same body yields nothing (no script tags)
        assert find_jsonld_in_page(url, "text/html", doc) == []
        assert find_jsonld_in_page(url, None, doc) == []

    def test_corpus_profile_pages_flow_through_pipeline(self, spark):
        """End-to-end: extensionless profile-served pages are extracted
        whole-body and byte-identical through the fused stage."""
        from pyspark.sql import functions as F

        from gleaner_spark.operators.harvest import extract_and_process, fetch_pages
        from gleaner_spark.sources import corpus

        n = 60
        pages = corpus.build_pages(spark, n, partitions=2)
        profile_idx = [i for i in range(n) if corpus.page_shape(i) == "profile_json"]
        assert profile_idx, "corpus must contain profile-served pages"
        frontier = pages.select(
            "url",
            F.lit("src0").alias("source_name"),
            F.lit(1).cast("long").alias("position"),
        )
        fetched = fetch_pages(frontier, pages, broadcast_frontier=True)
        out = extract_and_process(fetched, corpus.build_sources())
        rows = {r["url"]: r for r in out.filter(F.col("doc_idx") >= 0).collect()}
        for i in profile_idx:
            u = corpus.url_for(i)
            assert "." not in u.rsplit("/", 1)[-1]  # truly extensionless
            assert rows[u]["jsonld"] == corpus.expected_documents_for_page(i)[0]


def test_prov_table_bytes_match_driver_renderer(spark):
    """The JVM-side format_string prov rendering must be byte-equal to
    the reference-exact driver renderer (prov_graph), including the
    SHA-1 object name."""
    from gleaner_spark.operators.harvest import prov_table
    from gleaner_spark.sources.config import Source

    srcs = [Source(name="s1", url="https://h1/x", pid="https://pid/1",
                   proper_name="Org One", domain="https://h1"),
            Source(name="s2", url="https://h2/x")]  # empty meta → 'unknown'
    # row 2 has unique_id != content sha (identifiersha-style source):
    # the template's SHA256/URN must carry the UNIQUE_ID
    # (jsonutils.go:355,377), not the content hash
    rows = [("s1", "abc123", "abc123", "https://h1/items/1"),
            ("s2", "def456", "uid789", "https://h2/items/2")]
    df = spark.createDataFrame(
        rows, "source_name string, sha string, unique_id string, url string"
    )
    got = {r["sha"]: r for r in prov_table(df, srcs, "gleaner", "2024-01-01").collect()}
    meta = {"s1": ("https://pid/1", "Org One", "https://h1"),
            "s2": ("unknown", "unknown", "unknown")}
    for sname, _sha, uid, url in rows:
        pid, pname, domain = meta[sname]
        doc, psha, urn = prov_graph("gleaner", sname, uid, url, pid=pid,
                                    pname=pname, domain=domain, date="2024-01-01")
        # prov table's sha column is the UniqueId (the reference's key)
        assert got[uid]["prov_jsonld"] == doc
        assert got[uid]["prov_sha"] == psha
        assert f"urn:gleaner:{sname}:{uid}" in doc


class TestFastScriptScan:
    """The _fast_scripts linear scan is ONE-SIDED: non-None results
    must be byte-identical to the html.parser collector; uncertain
    shapes must return None (fallback). Both properties differential-
    tested here against the slow collector."""

    @staticmethod
    def _slow(body):
        from gleaner_spark.core.extract import _ScriptAndTextCollector

        c = _ScriptAndTextCollector()
        try:
            c.feed(body)
            c.close()
        except Exception:
            return None  # parser raise → find_jsonld_in_page returns []
        return c.scripts

    def _check(self, body, expect_fast=None):
        from gleaner_spark.core.extract import _fast_scripts

        fast = _fast_scripts(body)
        if fast is not None:
            assert fast == self._slow(body), body
        if expect_fast is not None:
            assert (fast is not None) == expect_fast, body
        return fast

    LD = 'type="application/ld+json"'

    def test_common_shapes_take_fast_path(self):
        ld = self.LD
        cases = [
            f'<html><body><script {ld}>{{"a":1}}</script></body></html>',
            f'<p>x</p><script {ld}>A</script><div>m</div><script {ld}>B</script>',
            f'<script {ld}>A</script>',
            f'<SCRIPT TYPE="application/ld+json;charset=utf-8">A</SCRIPT>',
            f"<script type='application/ld+json'>A</script>",
            f'<script {ld}>A</ script >',       # ws-tolerant close
            f'<script {ld}>A</SCRIPT>',
            '<script type="text/javascript">x</script>',   # non-matching
            '<script>plain</script>',
            f'<script {ld}>with <b>markup</b> inside</script>',  # CDATA
            f'<script data-x="a>b" {ld}>A</script>',  # '>' in quoted attr
            f'<div data-x=\'<script {ld}>evil</script>\'>real</div>'
            f'<script {ld}>good</script>',  # script hidden in attr quote
            "no tags at all",
            "<div>no scripts</div>",
            f'<script {ld}>A</scriptx></script>',  # fake close is data
            f'<script foo {ld}>A</script>',        # bare attr
            f'<script type=application/ld+json>A</script>',  # unquoted
            f'<script {ld} type="nope">A</script>',  # dup attr: last wins
            f'<script {ld}>A</script><',             # trailing bare <
            # '<' + non-ASCII letter is data (starttagopen is ASCII-
            # only): the quoted 'attr' is not an attr, the script is
            # real — both sides must extract it
            f'<п a="<script {ld}>1</script>">',
        ]
        for body in cases:
            self._check(body, expect_fast=True)

    def test_uncertain_shapes_fall_back(self):
        ld = self.LD
        cases = [
            f'<!-- c --><script {ld}>A</script>',          # comment
            f'<!DOCTYPE html><script {ld}>A</script>',     # declaration
            f'<?pi x?><script {ld}>A</script>',            # PI
            f'<style>x</style><script {ld}>A</script>',    # style CDATA
            f'<script {ld}/>',                             # self-closing
            f'<script {ld}>A',                             # unterminated
            f'<script {ld}>A</script foo>',                # weird end tag
            f'<script type="application/ld&#43;json">A</script>',  # entity
            f'<a b=c"d><script {ld}>A</script>',  # quote opened mid-value
            f'</ x<script {ld}>A</script>',       # bogus end tag re-parse
            f'\x00<script {ld}>A</script>',                # NUL
        ]
        for body in cases:
            assert self._check(body) is None, body

    def test_fast_path_results_match_slow_on_corpus(self):
        from gleaner_spark.core.extract import _fast_scripts
        from gleaner_spark.sources import corpus

        n_fast = 0
        for i in range(600):
            html, text = corpus.html_for(i)
            fast = self._check(html)
            n_fast += fast is not None
            self._check(text)
        assert n_fast >= 500  # the corpus shape IS the fast path

    def test_hypothesis_differential(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        ld = self.LD
        frag = st.sampled_from([
            f"<script {ld}>", "<script>", "</script>", "</script >",
            "</scriptx>", "<script", "script>", "<div>", "</div>",
            "<div a='x'>", '<div a="<script>">', "text", "{", "}",
            '"a":1', "<", ">", "'", '"', "=", "/", "<!--", "-->",
            "<style>", "</style>", "&amp;", " ", "<SCRIPT>", "\n",
            f"<script  {ld} >", "<script/>", "<a b=c\"d>", "</ x",
        ])

        @settings(max_examples=400, deadline=None)
        @given(st.lists(frag, min_size=0, max_size=12))
        def run(parts):
            self._check("".join(parts))

        run()

    def test_json_branch_fast_text(self):
        from gleaner_spark.core.extract import find_jsonld_in_page

        doc = '{"@context":"https://schema.org/","@type":"Dataset","@id":"x"}'
        assert find_jsonld_in_page(
            "https://h/d.json", "application/json", doc
        ) == [doc]
        # bodies with markup/entities still go through the parser
        wrapped = f"<html><body>{doc}</body></html>"
        assert find_jsonld_in_page(
            "https://h/d.json", "application/json", wrapped
        ) == [doc]
