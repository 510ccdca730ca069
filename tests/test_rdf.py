"""From-scratch JSON-LD → RDF engine (core/rdf.py) vs the reference's
json-gold behavior: the URDNA2015 approval goldens
(common/ldproc_test.go:40-164 + testdata/*.approved.txt), the org
JLD2nq path (jld2nq.go:13-33), and the isValid RDF-rejection rules
(jsonutils.go:69-96)."""

from __future__ import annotations

import json

import pytest

from gleaner_spark.core import rdf
from gleaner_spark.core.fixups import is_valid
from gleaner_spark.core.prov import org_nquads

GOLDEN_DIR = "/root/reference/internal/common/testdata"

NO_CONTEXT = """{
"@type":"bar",
"@id":"idenfitier",
"url": "http://example.com/",
"identifier": [
	{
	"@type": "PropertyValue",
	"@id": "https://doi.org/10.1575/1912/bco-dmo.2343.1",
	"propertyID": "https://registry.identifiers.org/registry/doi",
	"value": "doi:10.1575/1912/bco-dmo.2343.1",
	"url": "https://doi.org/10.1575/1912/bco-dmo.2343.1"
	}
]
}"""

NO_CONTEXT_SIMPLE = '{"@type":"bar","SO:name":"Some type in a graph"}'

GRAPH_FIRST = """{
    "@graph":[
        {
            "@context": {"SO":"http://schema.org/"},
            "@type":"bar",
            "SO:name":"Some type in a graph"
        }
    ]
}"""


class TestNormalizeGoldens:
    """Byte parity with the reference's URDNA2015 approval files."""

    @pytest.mark.parametrize("name,doc", [
        ("noContext", NO_CONTEXT),
        ("noContextSimple", NO_CONTEXT_SIMPLE),
        ("jsonGraphFirst", GRAPH_FIRST),
    ])
    def test_approved(self, name, doc):
        expected = open(
            f"{GOLDEN_DIR}/ldproc_test.TestNormalizeTriple.{name}_jsonID.approved.txt"
        ).read()
        assert rdf.normalize(json.loads(doc)) == expected

    def test_blank_node_canonical_labels(self):
        # two blank nodes, distinguishable by structure → stable c14n ids
        doc = {
            "@context": {"@vocab": "https://ex.org/"},
            "knows": [
                {"name": "a", "age": 1},
                {"name": "b"},
            ],
        }
        out1 = rdf.normalize(doc)
        out2 = rdf.normalize(doc)
        assert out1 == out2
        assert "_:c14n" in out1
        labels = {l.split(" ")[0] for l in out1.strip().split("\n") if l.startswith("_:")}
        assert len(labels) >= 2


class TestOrgNquads:
    def test_identifier_is_pid_iri_node(self):
        """The org template gives identifier an @id (org.go:28-34), so
        JLD2nq yields PID-subject triples — not a blank node."""
        nq = org_nquads("src1", "https://x.test", "https://pid.test/1")
        assert "_:b" not in nq
        assert (
            "<https://gleaner.io/id/org/src1> <https://schema.org/identifier> "
            "<https://pid.test/1> .\n" in nq
        )
        assert (
            "<https://pid.test/1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
            "<https://schema.org/PropertyValue> .\n" in nq
        )
        # json-gold serializes sorted lines
        lines = nq.splitlines(keepends=True)
        assert lines == sorted(lines)


class TestIsValidRdfRejection:
    """valid JSON that fails JSON-LD expansion must be dropped, like
    the reference's proc.ToRDF error path (jsonutils.go:83-92)."""

    @pytest.mark.parametrize("doc", [
        '{"@context": 42, "@type": "Thing"}',             # invalid local context
        '{"@context": true, "name": "x"}',
        '{"@context": {"@vocab": 5}, "name": "x"}',       # invalid vocab mapping
        '{"@context": {"term": 17}, "term": "x"}',        # invalid term definition
        '{"@context": {"@type": "x"}, "name": "n"}',      # keyword redefinition
        '{"@context": {"a": {"@id": 5}}, "a": "x"}',      # invalid IRI mapping
        '{"@context": {"@vocab": "https://s/"}, "@id": 5}',  # invalid @id value
        '{"@context": {"@vocab": "https://s/"}, "@type": 5}',  # invalid type value
        '{"@context": "https://unknown.example/ctx.jsonld", "name": "x"}',  # loader miss
        '{"@context": {"a":{"@id":"b:x","@container":"@bogus"}}, "a": 1}',  # invalid container
    ])
    def test_rejected(self, doc):
        ok, err = is_valid(doc)
        assert ok is False
        assert err == "error in JSON-LD to RDF call"

    @pytest.mark.parametrize("doc", [
        '{"@context": {"@vocab": "https://schema.org/"}, "@type": "Dataset", "name": "x"}',
        '{"@context": "https://schema.org/", "@type": "Dataset", "name": "x"}',
        '{"@context": "http://schema.org/", "name": "x"}',
        '{"@context": ["https://schema.org/", {"dc": "http://purl.org/dc/terms/"}], "dc:title": "t"}',
        '{"no": "context at all"}',  # expansion succeeds (empty output)
    ])
    def test_accepted(self, doc):
        ok, err = is_valid(doc)
        assert ok is True and err is None

    def test_reference_valid_fixture_accepted(self):
        src = open(
            "/root/reference/internal/summoner/acquire/testdata/jsonutils/validJson.json"
        ).read()
        ok, err = is_valid(src)
        assert ok is True and err is None


_REJECT_DOCS = [
    '{"@context": 42, "@type": "Thing"}',
    '{"@context": true, "name": "x"}',
    '{"@context": {"@vocab": 5}, "name": "x"}',
    '{"@context": {"term": 17}, "term": "x"}',
    '{"@context": {"@type": "x"}, "name": "n"}',
    '{"@context": {"a": {"@id": 5}}, "a": "x"}',
    '{"@context": {"@vocab": "https://s/"}, "@id": 5}',
    '{"@context": {"@vocab": "https://s/"}, "@type": 5}',
    '{"@context": "https://unknown.example/ctx.jsonld", "name": "x"}',
    '{"@context": {"a":{"@id":"b:x","@container":"@bogus"}}, "a": 1}',
    '{"@context": {"@vocab": "https://s/"}, "a": {"@value": {"x": 1}}}',
    '{"@context": {"@vocab": "https://s/"}, "a": {"@value": "v", "@language": 5}}',
    '{"@context": {"@vocab": "https://s/"}, "a": {"@reverse": "notadict"}}',
    '{"@context": {"@vocab": "https://s/"}, "a": {"@value": "v", "name": "x"}}',
    # keyword aliases other than @type fail context processing, like
    # json-gold's invalid-IRI-mapping error — never reach the fast path
    '{"@context": {"id": "@id"}, "id": "https://x/1"}',
    '{"@context": {"type": "@type"}, "type": 5}',  # @type alias, bad value
]

_ACCEPT_DOCS = [
    '{"@context": {"@vocab": "https://schema.org/"}, "@type": "Dataset", "name": "x"}',
    '{"@context": "https://schema.org/", "@type": "Dataset", "name": "x"}',
    '{"@context": "http://schema.org/", "name": "x"}',
    '{"@context": ["https://schema.org/", {"dc": "http://purl.org/dc/terms/"}], "dc:title": "t"}',
    '{"no": "context at all"}',
    '{"@context": {"type": "@type"}, "type": "Thing"}',  # @type alias → slow path, accepted
    '{"@context": {"@vocab": "https://s/"}, "a": {"@value": "v", "@language": "en"}}',
    '{"@context": {"@vocab": "https://s/"}, "a": {"@list": [1, 2]}}',
    '{"@context": {"@vocab": "https://s/"}, "@graph": [{"@id": "https://x/1", "name": "n"}]}',
]


class TestValidityFastPathDifferential:
    """The fast accept scan (rdf.expand_known_valid) may only ever
    short-circuit documents the full expansion would ACCEPT; every
    rejection must still come from the real expand()."""

    @pytest.mark.parametrize("doc", _REJECT_DOCS)
    def test_fast_path_never_accepts_invalid(self, doc):
        obj = json.loads(doc)
        assert rdf.expand_known_valid(obj) is False
        ok, _ = is_valid(doc)
        assert ok is False

    @pytest.mark.parametrize("doc", _ACCEPT_DOCS)
    def test_fast_verdict_matches_full_expansion(self, doc):
        obj = json.loads(doc)
        # full expansion accepts; if the fast path claims validity it
        # must agree (it may also fall through — that's allowed)
        rdf.expand(obj)
        if rdf.expand_known_valid(obj):
            ok, err = is_valid(doc)
            assert ok is True and err is None

    def test_hot_corpus_shapes_take_fast_path(self):
        """The harvest corpus's five @context variants must hit the
        fast path (that's the throughput win being claimed)."""
        from gleaner_spark.sources.corpus import _payload

        for i in range(10):
            assert rdf.expand_known_valid(json.loads(_payload(i))) is True

    def test_property_fast_accept_implies_expand_success(self):
        """Randomized differential: whenever the scan accepts, the full
        expansion must succeed."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        keys = st.sampled_from(
            ["name", "@id", "@type", "@value", "@list", "@graph", "@context",
             "@language", "id", "type", "description", "schema:thing"]
        )
        scalars = st.one_of(st.text(max_size=8), st.integers(), st.booleans(), st.none())
        trees = st.recursive(
            scalars,
            lambda kids: st.one_of(
                st.lists(kids, max_size=3),
                st.dictionaries(keys, kids, max_size=4),
            ),
            max_leaves=12,
        )
        ctxs = st.sampled_from([
            None, {"@vocab": "https://s/"}, "https://schema.org/",
            {"id": "@id"}, {"a": {"@container": "@language"}},
        ])

        @settings(max_examples=300, deadline=None)
        @given(body=st.dictionaries(keys, trees, max_size=5), ctx=ctxs)
        def check(body, ctx):
            doc = dict(body)
            if ctx is not None:
                doc["@context"] = ctx
            if rdf.expand_known_valid(doc):
                rdf.expand(doc)  # must not raise

        check()


class TestExpansionErrorsOnlyAssumption:
    """_to_rdf_ok validates via expand() alone; pin the assumption that
    node-map/quad generation never raises where expansion succeeded
    (ADVICE r2: differential over malformed fixtures)."""

    @pytest.mark.parametrize("doc", _REJECT_DOCS + _ACCEPT_DOCS)
    def test_to_rdf_agrees_with_expand(self, doc):
        obj = json.loads(doc)
        try:
            rdf.expand(obj)
            expand_ok = True
        except Exception:
            expand_ok = False
        try:
            rdf.to_rdf_dataset(obj)
            full_ok = True
        except Exception:
            full_ok = False
        assert expand_ok == full_ok


class TestExpansionSemantics:
    def test_vocab_expansion(self):
        out = rdf.expand({"@context": {"@vocab": "https://s/"}, "name": "x"})
        assert out == [{"https://s/name": [{"@value": "x"}]}]

    def test_type_coercion_id(self):
        doc = {
            "@context": {"@vocab": "https://s/", "url": {"@id": "https://s/url", "@type": "@id"}},
            "url": "https://example.org/page",
        }
        quads = rdf.to_rdf(doc)
        objs = [q[2] for q in quads]
        assert ("iri", "https://example.org/page") in objs

    def test_reference_schemaorg_asset_preloaded(self):
        """The reference's preloaded schemaorg asset is a 26-prefix
        namespace map with NO @vocab and NO term definitions — so
        json-gold drops plain terms (``url``) and keeps ``@type``
        document-relative; ``schema:name`` expands via the prefix.
        Pin that exact behavior with the same asset."""
        import copy

        ctx_doc = json.load(open(f"{GOLDEN_DIR}/schemaorg-current-https.jsonld"))
        saved = copy.copy(rdf._PRELOADED)
        try:
            rdf.preload_context(["https://schema.org/"], ctx_doc)
            quads = rdf.to_rdf({
                "@context": "https://schema.org/",
                "@id": "https://x/1",
                "@type": "Dataset",
                "url": "https://example.org/d",
                "schema:name": "n",
            })
            got = {(q[1][1], q[2]) for q in quads}
            assert (rdf.RDF_TYPE, ("iri", "Dataset")) in got  # doc-relative type survives
            assert ("https://schema.org/name", ("literal", "n", rdf.XSD + "string", None)) in got
            assert all("example.org/d" not in str(q) for q in quads)  # url dropped
        finally:
            rdf._PRELOADED.clear()
            rdf._PRELOADED.update(saved)
            rdf._CTX_CACHE.clear()

    def test_preloaded_rich_context_coerces_id(self):
        """A context document with @type:@id coercions (the published
        schema.org jsonldcontext shape) makes url an IRI object."""
        import copy

        saved = copy.copy(rdf._PRELOADED)
        try:
            rdf.preload_context(
                ["https://rich.example/ctx"],
                {"@context": {"@vocab": "https://s/", "url": {"@id": "https://s/url", "@type": "@id"}}},
            )
            quads = rdf.to_rdf({
                "@context": "https://rich.example/ctx",
                "@id": "https://x/1",
                "url": "https://example.org/d",
            })
            assert ("iri", "https://example.org/d") in [q[2] for q in quads]
        finally:
            rdf._PRELOADED.clear()
            rdf._PRELOADED.update(saved)
            rdf._CTX_CACHE.clear()

    def test_lists_and_literals(self):
        doc = {
            "@context": {"@vocab": "https://s/", "seq": {"@id": "https://s/seq", "@container": "@list"}},
            "@id": "https://x/1",
            "seq": ["a", "b"],
            "n": 3,
            "f": 2.5,
            "b": True,
        }
        nq = rdf.to_nquads(doc)
        assert "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first> \"a\"" in nq
        assert "\"3\"^^<http://www.w3.org/2001/XMLSchema#integer>" in nq
        assert "\"2.5E0\"^^<http://www.w3.org/2001/XMLSchema#double>" in nq
        assert "\"true\"^^<http://www.w3.org/2001/XMLSchema#boolean>" in nq

    def test_language_literals(self):
        doc = {
            "@context": {"@vocab": "https://s/", "@language": "en"},
            "@id": "https://x/1",
            "name": "hello",
        }
        nq = rdf.to_nquads(doc)
        assert '"hello"@en' in nq

    def test_named_graph_quads(self):
        doc = {
            "@context": {"@vocab": "https://s/"},
            "@id": "https://g/1",
            "@graph": [{"@id": "https://x/1", "name": "in-graph"}],
        }
        nq = rdf.to_nquads(doc)
        assert '<https://x/1> <https://s/name> "in-graph" <https://g/1> .\n' in nq
