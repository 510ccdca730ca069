"""Differential test: the single-pass fixup fast path must be
byte-identical to the sequential string→array→url→id chain
(jsonutils.go:313-330) on every document shape, including the quirky
ones. The fast path may also answer None (= take the slow chain); it
must never answer a *different* string."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from gleaner_spark.core import fixups as fx


def slow_chain(doc: str, ctx: str = fx.HTTPS_CONTEXT) -> str:
    out = fx.fix_context_string(doc)
    out = fx.fix_context_array(out)
    out = fx.fix_context_url(out, ctx)
    out = fx.fix_id(out)
    return out


def assert_equivalent(doc: str):
    # both ctx options (https sources and http/standardizedHttp ones)
    for ctx in (fx.HTTPS_CONTEXT, fx.HTTP_CONTEXT):
        fast = fx._fast_fixups(doc, ctx)
        if fast is not None:
            assert fast == slow_chain(doc, ctx)


CONTEXT_VARIANTS = [
    '"http://schema.org/"',
    '"https://schema.org/"',
    '"http://schema.org"',
    '"https://www.schema.org/"',
    '"http://www.schema.org/docs/jsonldcontext.jsonld"',
    '"https://example.org/ns/"',
    '["https://schema.org/", {"dc": "http://purl.org/dc/terms/"}]',
    '[]',
    '{}',
    '{"@vocab": "https://schema.org/"}',
    '{"@vocab": "http://schema.org/"}',
    '{"@vocab": "https://schema.org/", "dc": "http://purl.org/dc/terms/"}',
    '{"schema": "http://www.schema.org/"}',
    '{"schema": "schema.org"}',
    '{"@base": "https://example.org/"}',
    '{"@base": ""}',
    '{"@base": null}',
    '{"@base": {"x": 1}}',
    '{"ns": {"@id": "https://schema.org/name"}}',
    '{"ns": 5}',
    '{"ns": true}',
    '{"ns": null}',
    '{"ns": "has <html> & escapes"}',
    '{"@vocab": "https://schema.org/", "@vocab2": "x"}',
    'null',
    '5',
    '"just a string"',
]

TYPE_ID_VARIANTS = [
    ('"Dataset"', '"https://example.org/ds/1"'),
    ('"Dataset"', '"relative/id/1"'),
    ('"Dataset"', '"urn:x:y"'),
    ('"Dataset"', "5"),
    ('"Person"', '"relative/id"'),
    ('["Dataset"]', '"relative/id"'),
    (None, None),
]


@pytest.mark.parametrize("ctx", CONTEXT_VARIANTS)
@pytest.mark.parametrize("typ,ident", TYPE_ID_VARIANTS)
def test_fast_matches_slow_matrix(ctx, typ, ident):
    parts = [f'"@context": {ctx}'] if ctx is not None else []
    if typ is not None:
        parts.append(f'"@type": {typ}')
    if ident is not None:
        parts.append(f'"@id": {ident}')
    parts.append('"name": "n"')
    assert_equivalent("{" + ", ".join(parts) + "}")


SPECIALS = [
    "{}",
    "[]",
    "[{'a': 1}]",
    "not json at all",
    "",
    '{"name": "no context"}',
    '{"@context": "https://schema.org/", "@context": {"@vocab": "x"}}',  # dup top-level
    '{"@context": {"a": "x", "a": "https://www.schema.org/"}}',  # dup in ctx
    '{"@context": {"a": "x"}, "nested": {"@context": "inner"}}',
    '{ "@context" : { "a" : "http://schema.org" } }',  # whitespace layout
    '{"@context": {"a": "x"}\n}\n',
    '{"@type": "ItemList", "itemListElement": [{"item": {"@id": "rel/1"}}, {"noitem": 1}, {"item": {"@id": "rel/2"}}]}',
    '{"@type": "ItemList", "itemListElement": [{"item": {"@id": "https://x/1"}}]}',
    '{"@type": "Dataset", "@id": "rel", "@context": {"@base": "https://b/"}}',
    '{"@type": "Dataset", "@id": "rel", "@context": {"@base": "www.schema.org"}}',
    '{"@context": {"a": "\\u0068ttp://schema.org/"}}',  # escaped chars in value
    '{"@context": {"esc\\u0061ped": "http://schema.org/"}}',  # escaped key
    '{"@context": {"a": "x <b> & c"}}',  # html chars: sjson vs go escaping
    '{"@context": {"a": "line\\nbreak"}}',
    '{"@context": {"a": "\\u2028sep"}}',
    '{"@context": "has <html> & stuff schema.org"}',
    '{"@context": 42}',
    '{"@context": true}',
    '{"@context": null}',
    '{"@context": [1, 2]}',
    '{"@type": "Dataset"}',
    '{"@type": "Dataset", "@id": "rel"}',
]


@pytest.mark.parametrize("doc", SPECIALS)
def test_fast_matches_slow_specials(doc):
    assert_equivalent(doc)


json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-10, 10),
        st.sampled_from([
            "https://schema.org/", "http://schema.org", "www.schema.org",
            "schema.org", "rel/id", "https://x/y", "", "a <b> & c",
            "\u2028x", "uni\u00e9", "nested schema.org ref",
        ]),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(
            st.sampled_from(["@vocab", "@base", "schema", "dc", "a", "@id",
                             "@type", "item", "itemListElement", "@context"]),
            inner, max_size=4,
        ),
    ),
    max_leaves=8,
)

top_docs = st.dictionaries(
    st.sampled_from(["@context", "@type", "@id", "itemListElement", "name"]),
    json_values,
    max_size=5,
)


@settings(max_examples=300, deadline=None)
@given(top_docs)
def test_fast_matches_slow_random(doc):
    assert_equivalent(json.dumps(doc))


@settings(max_examples=150, deadline=None)
@given(top_docs, st.sampled_from(["Dataset", "ItemList", "Person"]))
def test_fast_matches_slow_random_typed(doc, typ):
    doc["@type"] = typ
    assert_equivalent(json.dumps(doc))


def test_fast_path_taken_for_canonical_doc():
    """The common already-canonical shape must use the fast path (not
    fall back) — this is the 100 TB hot path."""
    doc = json.dumps({
        "@context": {"@vocab": "https://schema.org/"},
        "@type": "Person", "name": "x",
    })
    assert fx._fast_fixups(doc) is not None


def test_process_json_still_matches_chain():
    for doc in SPECIALS + [
        '{"@context": "http://schema.org/", "@type": "Dataset", "@id": "x/y"}',
    ]:
        for opt, ctx in [("https", fx.HTTPS_CONTEXT),
                         ("standardizedHttp", fx.HTTP_CONTEXT),
                         ("http", fx.HTTP_CONTEXT),
                         ("standardizedHttps", fx.HTTPS_CONTEXT)]:
            fixed, sha = fx.process_json(doc, fix_context_option=opt)
            assert fixed == slow_chain(doc, ctx)
            assert sha == fx.sha1_hex(fixed)


class TestIterMembersKeyDecode:
    """The escape-free fast key decode must agree with json.loads on
    every class of key: plain, escaped, unicode-escaped, and raw
    control characters (which json.loads REJECTS — the fast path must
    fall through and reject identically, not silently accept)."""

    def test_escaped_and_plain_keys_agree(self):
        import json as _json

        from gleaner_spark.core import jsonedit as je

        s = '{"plain":1,"with\\"quote":2,"tab\\there":3,"uni\\u00e9":4,"":5}'
        _, start, end = je._scan_value(s, 0)
        keys = [k for k, _ks, _vs, _ve in je.iter_members(s, start, end)]
        assert keys == ["plain", 'with"quote', "tab\there", "unié", ""]
        # cross-check every key against json.loads of the raw span
        i = 0
        for (k, ks, _vs, ve) in je.iter_members(s, start, end):
            kend = je._scan_string(s, ks)
            assert k == _json.loads(s[ks:kend])

    def test_raw_control_char_key_still_rejected(self):
        import pytest as _pytest

        from gleaner_spark.core import jsonedit as je

        s = '{"bad\nkey":1}'  # literal newline inside the key
        _, start, end = je._scan_value(s, 0)
        with _pytest.raises(Exception):
            list(je.iter_members(s, start, end))
