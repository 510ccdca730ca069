"""Reference-vector tests for the JSON-LD fixup chain.

Inputs/expected strings come 1:1 from
/root/reference/internal/summoner/acquire/jsonutils_test.go (they are
language-neutral). Exact-equality asserts mirror the reference's
assert.Equal cases; semantic asserts mirror assert.JSONEq.
"""

import json

import pytest

from gleaner_spark.core import fixups as fx
from gleaner_spark.core import jsonedit as je


def json_eq(a: str, b: str):
    assert json.loads(a) == json.loads(b)


CONTEXT_OBJECT_JSON = """{
        "@context": {
            "@vocab":"http://schema.org/"
        },
        "@type":"bar",
        "SO:name":"Some type in a graph"
    }"""

CONTEXT_STRING_JSON = """{
        "@context": "http://schema.org/",
        "@type":"bar",
        "SO:name":"Some type in a graph"
    }"""

CONTEXT_LOCAL_NAMESPACE_JSON = """{
        "@context": [\t
\t\t\t\t "https://schema.org/",
\t\t\t{
\t\t\t\t"NAME": "schema:name",
\t\t\t\t"census_profile": {
\t\t\t\t"@id": "schema:subjectOf",
\t\t\t\t"@type": "@id"
\t\t\t}
\t\t\t}
        ],
      "@type":"bar",
      "SO:name":"Some type in a graph"
    }"""


class TestContextStringFix:
    def test_rewrites_string_context(self):
        result = fx.fix_context_string(CONTEXT_STRING_JSON)
        json_eq(result, CONTEXT_OBJECT_JSON)

    def test_object_context_unchanged(self):
        assert fx.fix_context_string(CONTEXT_OBJECT_JSON) == CONTEXT_OBJECT_JSON

    def test_object_graph_context_unchanged(self):
        src = open(
            "/root/reference/internal/summoner/acquire/testdata/jsonutils/contextObjectGraphJson.json"
        ).read()
        assert fx.fix_context_string(src) == src

    def test_array_context_unchanged(self):
        assert (
            fx.fix_context_string(CONTEXT_LOCAL_NAMESPACE_JSON)
            == CONTEXT_LOCAL_NAMESPACE_JSON
        )


EXPECTED_CONTEXT = """{
"@context": {
"@vocab":"https://schema.org/"
},
"@type":"bar",
"SO:name":"Some type in a graph"
}"""

EXPECTED_CONTEXT_V2 = """{
"@context": {
"@vocab":"https://schema.org/",
"schema":"https://schema.org/"
},
"@type":"bar",
"SO:name":"Some type in a graph"
}"""


def _ctx_doc(vocab, extra=None):
    ctx = '"@vocab":"%s"' % vocab
    if extra:
        ctx += '\n,"schema":"%s"' % extra
    return '{\n"@context": {\n%s\n},\n"@type":"bar",\n"SO:name":"Some type in a graph"\n}' % ctx


class TestContextUrlFix:
    @pytest.mark.parametrize(
        "vocab", ["https://schema.org", "http://schema.org/", "http://schema.org"]
    )
    def test_vocab_only(self, vocab):
        json_eq(fx.fix_context_url(_ctx_doc(vocab)), EXPECTED_CONTEXT)

    @pytest.mark.parametrize(
        "vocab", ["https://schema.org", "http://schema.org/", "http://schema.org"]
    )
    def test_vocab_and_schema(self, vocab):
        json_eq(fx.fix_context_url(_ctx_doc(vocab, vocab)), EXPECTED_CONTEXT_V2)

    def test_object_graph_golden(self):
        # NOTE: the reference's expectedContextObjGraph.json lacks the
        # @vocab key, but fixContextUrl (jsonutils.go:147-149)
        # unconditionally inserts @vocab when missing — the fixture
        # golden is stale w.r.t. the code (the repo also carries stale
        # .received approval files). We follow the CODE: schema ns
        # https-canonicalized AND @vocab inserted.
        src = open(
            "/root/reference/internal/summoner/acquire/testdata/jsonutils/contextObjectGraphJson.json"
        ).read()
        expected = json.loads(
            open(
                "/root/reference/internal/summoner/acquire/testdata/jsonutils/expectedContextObjGraph.json"
            ).read()
        )
        expected["@context"]["@vocab"] = "https://schema.org/"
        assert json.loads(fx.fix_context_url(src)) == expected

    def test_array_fix_byte_layout_matches_sjson_received(self):
        # the reference repo carries sjson's actual output in
        # .received.json approval files — byte-level ground truth for
        # our in-place span replacement + Go map marshalling.
        import ast

        recv = open(
            "/root/reference/internal/summoner/acquire/testdata/"
            "jsonutils_test.TestContextArrayFix.It_rewrites_the_jsonld_context_if_it_is_not_an_object.received.json"
        ).read()
        expected_bytes = json.loads(recv)  # file holds a JSON-encoded string
        assert fx.fix_context_array(CONTEXT_ARRAY_JSON) == expected_bytes

    def test_missing_vocab_inserted(self):
        doc = '{"@context": {"x":"https://example.com/"}, "@type":"bar"}'
        out = fx.fix_context_url(doc)
        parsed = json.loads(out)
        assert parsed["@context"]["@vocab"] == "https://schema.org/"
        assert parsed["@context"]["x"] == "https://example.com/"

    def test_www_quirk_reproduced(self):
        # reference prepends the canonical ctx to the sliced suffix
        doc = '{"@context": {"@vocab":"http://www.schema.org/more"}, "@type":"bar"}'
        out = json.loads(fx.fix_context_url(doc))
        assert out["@context"]["@vocab"] == "https://schema.org/schema.org/more"

    def test_nested_object_namespace_stringified_quirk(self):
        # gjson String() of an object value is its raw JSON; sjson
        # re-sets it as a *string* — reproduced deliberately.
        doc = '{"@context": {"@vocab":"https://schema.org/","deep":{"@id":"x"}}, "@type":"bar"}'
        out = json.loads(fx.fix_context_url(doc))
        assert out["@context"]["deep"] == '{"@id":"x"}'


CONTEXT_ARRAY_JSON = """{
        "@context": [
\t\t\t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t{
\t\t\t\t"@vocab": "https://schema.org/",
\t\t\t\t"NAME": "schema:name",
\t\t\t\t"census_profile": {
\t\t\t\t  "@id": "schema:subjectOf",
\t\t\t\t  "@type": "@id"
\t\t\t      }
\t\t\t}
        ],
     "@type":"bar",
      "SO:name":"Some type in a graph"
    }"""


class TestContextArrayFix:
    def test_array_standardized(self):
        out = json.loads(fx.fix_context_array(CONTEXT_ARRAY_JSON))
        assert out["@context"] == fx.STANDARD_HTTPS_CONTEXT

    def test_object_unchanged(self):
        assert fx.fix_context_array(CONTEXT_OBJECT_JSON) == CONTEXT_OBJECT_JSON

    def test_local_namespace_standardized(self):
        out = json.loads(fx.fix_context_array(CONTEXT_LOCAL_NAMESPACE_JSON))
        assert out["@context"] == fx.STANDARD_HTTPS_CONTEXT


class TestIdIRIFix:
    def test_no_change_with_base(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/",
\t\t\t\t"@base": "http://valid-json.com"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "some_cool_guid"
\t\t}
\t\t"""
        assert fx.fix_id(doc) == doc

    def test_no_change_full_iri(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "http://www.test.com/some_cool_guid"
\t\t}
\t\t"""
        assert fx.fix_id(doc) == doc

    def test_relative_id_gets_file_prefix(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "some_cool_guid"
\t\t}
\t\t"""
        expected = doc.replace('"some_cool_guid"', '"file://some_cool_guid"')
        assert fx.fix_id(doc) == expected

    def test_itemlist_malformed_json_tolerated(self):
        # the reference vector at jsonutils_test.go:467-527 is
        # *mildly malformed* JSON (missing commas); gjson tolerates it
        # and so must we.
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type":"ItemList",
\t\t\t"@id": "Some id we do not need to worry about"
   \t\t"itemListElement":
   \t\t[
\t\t\t\t{
\t\t\t\t\t"@type": "ListItem",
\t\t\t\t\t"@id": "A list item id, perhaps"
\t\t\t\t\t"item": {
\t\t\t\t\t\t"@type": "Dataset",
\t\t\t\t\t\t"@id": "some_cool_guid"
\t\t\t\t\t}
\t\t\t\t},
\t\t\t\t{
\t\t\t\t\t"@type": "ListItem",
\t\t\t\t\t"@id": "A list item id, perhaps"
\t\t\t\t\t"item": {
\t\t\t\t\t\t"@type": "Dataset",
\t\t\t\t\t\t"@id": "another_cool_guid"
\t\t\t\t\t}
\t\t\t\t},
\t\t\t]
\t\t}
\t\t"""
        expected = doc.replace('"some_cool_guid"', '"file://some_cool_guid"').replace(
            '"another_cool_guid"', '"file://another_cool_guid"'
        )
        assert fx.fix_id(doc) == expected

    def test_no_change_with_base_and_full_iri(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/",
\t\t\t\t"@base": "http://valid-json.com"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "http://www.test.com/some_cool_guid"
\t\t}
\t\t"""
        assert fx.fix_id(doc) == doc


INVALID_JSON = """This isn't JSON at all:\"."""

VALID_JSON = """{
    "@graph":[
        {
            "@context": {
                "SO":"http://schema.org/"
            },
            "@type":"bar",
            "SO:name":"Some type in a graph"
        }
    ]
}"""


class TestValidity:
    def test_valid_file_fixture(self):
        src = open(
            "/root/reference/internal/summoner/acquire/testdata/jsonutils/validJson.json"
        ).read()
        ok, err = fx.is_valid(src)
        assert ok and err is None

    def test_invalid(self):
        ok, err = fx.is_valid(INVALID_JSON)
        assert not ok and err is not None

    def test_add_valid_appends(self):
        assert fx.add_to_json_list_if_valid(["test"], VALID_JSON) == ["test", VALID_JSON]

    def test_add_invalid_keeps_original(self):
        assert fx.add_to_json_list_if_valid(["test"], INVALID_JSON) == ["test"]

    def test_bad_fixture_rejected(self):
        src = open("/root/reference/testHelpers/sampleConfigs/badjsonld.jsonld").read()
        ok, _ = fx.is_valid(src)
        assert not ok

    def test_graph_array_split_discards_accumulator_quirk(self):
        arr = '[{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"a"},{"@type":"Dataset","name":"b"}]'
        out = fx.add_to_json_list_if_valid(["earlier"], arr)
        # reference returns append(arrayDocs, rawArray) — 'earlier' dropped
        assert out[-1] == arr
        assert "earlier" not in out
        assert len(out) == 3
        # elements re-marshalled Go-style: sorted keys, compact
        assert out[0] == '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"a"}'


class TestProcessJson:
    def test_chain_and_sha1(self):
        import hashlib

        fixed, sha = fx.process_json(CONTEXT_STRING_JSON)
        assert sha == hashlib.sha1(fixed.encode()).hexdigest()
        parsed = json.loads(fixed)
        assert parsed["@context"]["@vocab"] == "https://schema.org/"

    def test_strict_bypasses_fixups(self):
        fixed, sha = fx.process_json(
            CONTEXT_STRING_JSON, fix_context_option="strict", global_strict=True
        )
        assert fixed == CONTEXT_STRING_JSON

    def test_mainstem_fixture_roundtrip(self):
        src = open(
            "/root/reference/testHelpers/sampleConfigs/mainstem35394ButEdited.jsonld"
        ).read()
        fixed, sha = fx.process_json(src)
        assert len(sha) == 40
        parsed = json.loads(fixed)
        assert "@context" in parsed


class TestGoMarshal:
    def test_sorted_keys_and_html_escape(self):
        assert je.go_marshal({"b": 1, "a": "<&>"}) == '{"a":"\\u003c\\u0026\\u003e","b":1}'

    def test_integral_float(self):
        assert je.go_marshal(json.loads('{"x": 1.0}')) == '{"x":1}'

    def test_sjson_string_no_html_escape(self):
        assert je.sjson_string("a&b<c>") == '"a&b<c>"'


class TestFixContextOptionRouting:
    """getOptions (jsonutils.go:283-296): the per-source option picks
    fixContextUrl's canonical schema.org scheme; fixContextArray always
    splices the HTTPS standard context (standardizeContext is called
    with a hard-coded config.StandardizedHttps)."""

    def test_standardized_http_source_gets_http_schema_refs(self):
        doc = '{"@context": "http://www.schema.org/", "@type": "Person"}'
        fixed, _ = fx.process_json(doc, fix_context_option="standardizedHttp")
        assert json.loads(fixed)["@context"]["@vocab"] == "http://schema.org/schema.org/"
        fixed_https, _ = fx.process_json(doc, fix_context_option="https")
        assert json.loads(fixed_https)["@context"]["@vocab"] == "https://schema.org/schema.org/"

    def test_short_schema_ref_canonicalizes_per_option(self):
        doc = '{"@context": {"@vocab": "https://schema.org/"}, "@type": "Person"}'
        fixed, _ = fx.process_json(doc, fix_context_option="http")
        assert json.loads(fixed)["@context"]["@vocab"] == "http://schema.org/"

    def test_array_context_standardizes_https_then_url_fix_applies_option(self):
        fixed, _ = fx.process_json(CONTEXT_ARRAY_JSON, fix_context_option="standardizedHttp")
        ctx = json.loads(fixed)["@context"]
        # the two schema.org members canonicalize to http; the other 14
        # standard prefixes keep the https values fixContextArray wrote
        assert ctx["@vocab"] == "http://schema.org/"
        assert ctx["schema"] == "http://schema.org/"
        assert ctx["dcat"] == "https://www.w3.org/ns/dcat#"
        expected = dict(fx.STANDARD_HTTPS_CONTEXT)
        expected["@vocab"] = expected["schema"] = "http://schema.org/"
        assert ctx == expected

    def test_standardize_context_switch(self):
        doc = '{"@context": [1], "@type": "x"}'
        assert json.loads(fx.standardize_context(doc, "standardizedHttp"))["@context"] == fx.STANDARD_HTTP_CONTEXT
        assert json.loads(fx.standardize_context(doc, "standardizedHttps"))["@context"] == fx.STANDARD_HTTPS_CONTEXT
        assert fx.standardize_context(doc, "https") == doc


class TestContextMapLifecycle:
    """apply_context_maps must track map CONTENT and support removal —
    a long-lived driver (or reused executor worker) serving a second
    run with different or no contextmaps must not validate against
    the first run's context documents."""

    PREFIX = "https://ctxswap.example.test/v1"

    def test_content_change_and_reset(self):
        import json as _json

        from gleaner_spark.core import rdf

        doc = {"@context": self.PREFIX, "name": "x"}
        try:
            fx.apply_context_maps(
                {self.PREFIX: {"@context": {"@vocab": "https://schema.org/"}}})
            out = _json.dumps(rdf.expand(doc))
            assert "https://schema.org/name" in out
            # same prefix, different document: the memo token covers
            # content, so this must re-install (not hit the old memo)
            fx.apply_context_maps(
                {self.PREFIX: {"@context": {"@vocab": "https://other.example/"}}})
            out = _json.dumps(rdf.expand(doc))
            assert "https://other.example/name" in out
            # mapless run in the same process: the preload must be
            # gone, so the remote context is unresolvable again
            fx.apply_context_maps(None)
            ok, _reason = fx.is_valid(_json.dumps(
                {"@context": self.PREFIX, "@type": "Dataset", "name": "x"}))
            assert not ok
        finally:
            fx.apply_context_maps(None)  # leave builtin-only state
