"""JSON-LD normalization ("fixups") with reference-exact semantics.

Ports the behavior (not the code) of
/root/reference/internal/summoner/acquire/jsonutils.go:

- ``fix_context_string``  jsonutils.go:130-139
- ``fix_context_array``   jsonutils.go:176-186 + standardizeContext 269-280
- ``fix_context_url``     jsonutils.go:144-171
- ``fix_id``              jsonutils.go:192-227
- ``process_json``        jsonutils.go:299-338 (fixup order string →
                          array → url → id, then SHA-1 of the result;
                          the reference hashes with crypto/sha1 even
                          though the prov template names the field
                          SHA256 — see common/identifier.go:91-96)

All edits are order-preserving string edits (see ``jsonedit``); the
result bytes therefore match what tidwall/sjson would produce for the
replacement spans, which is what the reference hashes.

Known reference quirks reproduced deliberately (pinned by tests):

- ``fix_context_url`` re-sets *every* namespace entry as a JSON
  string; a namespace whose value was an object is therefore
  stringified (gjson Result.String() returns raw JSON which sjson
  re-marshals as a quoted string).
- the ``www.`` rewrite produces ``https://schema.org/schema.org...``
  (resources at jsonutils.go:154-158 prepend the canonical context to
  the sliced suffix).
- ``fix_id`` indexes ItemList elements by *match ordinal*, not array
  position, so elements missing ``item.@id`` shift later rewrites
  (gjson ``#`` collection semantics).
"""

from __future__ import annotations

import hashlib
import json
import re

from . import jsonedit as je

HTTP_CONTEXT = "http://schema.org/"
HTTPS_CONTEXT = "https://schema.org/"

STANDARD_HTTPS_CONTEXT = {
    "@vocab": "https://schema.org/",
    "adms": "https://www.w3.org/ns/adms#",
    "dcat": "https://www.w3.org/ns/dcat#",
    "dct": "https://purl.org/dc/terms/",
    "foaf": "https://xmlns.com/foaf/0.1/",
    "gsp": "https://www.opengis.net/ont/geosparql#",
    "locn": "https://www.w3.org/ns/locn#",
    "owl": "https://www.w3.org/2002/07/owl#",
    "rdf": "https://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "https://www.w3.org/2000/01/rdf-schema#",
    "schema": "https://schema.org/",
    "skos": "https://www.w3.org/2004/02/skos/core#",
    "spdx": "https://spdx.org/rdf/terms#",
    "time": "https://www.w3.org/2006/time",
    "vcard": "https://www.w3.org/2006/vcard/ns#",
    "xsd": "https://www.w3.org/2001/XMLSchema#",
}

STANDARD_HTTP_CONTEXT = {
    k: v.replace("https://", "http://", 1) for k, v in STANDARD_HTTPS_CONTEXT.items()
}

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _url_scheme(u: str) -> str:
    m = _SCHEME_RE.match(u)
    return m.group(0)[:-1] if m else ""


def fix_context_string(jsonld: str) -> str:
    """@context that is a plain string becomes {"@vocab": <string>}."""
    try:
        kind = je.get_kind(jsonld, ["@context"])
        if kind != "string":
            return jsonld
        val = je.get_value(jsonld, ["@context"])
        return je.set_raw(jsonld, ["@context"], je.go_marshal({"@vocab": val}))
    except je.JsonEditError:
        return jsonld


def fix_context_array(jsonld: str, option: str = "https") -> str:
    """@context that is an array is replaced wholesale with the
    standardized 16-prefix context map."""
    try:
        kind = je.get_kind(jsonld, ["@context"])
        if kind != "array":
            return jsonld
        ctx = STANDARD_HTTP_CONTEXT if option == "standardizedHttp" else STANDARD_HTTPS_CONTEXT
        return je.set_raw(jsonld, ["@context"], je.go_marshal(ctx))
    except je.JsonEditError:
        return jsonld


def fix_context_url(jsonld: str, ctx: str = HTTPS_CONTEXT) -> str:
    """Ensure @vocab exists; canonicalize schema.org refs per namespace."""
    try:
        members = je.get_members(jsonld, ["@context"])
        if members is None:
            members = {}
        if "@vocab" not in members:
            jsonld = je.set_raw(jsonld, ["@context", "@vocab"], je.sjson_string(HTTPS_CONTEXT))
        for ns, (kind, raw) in members.items():
            context = je.result_string(kind, raw)
            if "schema.org" in context:
                if "www." in context:
                    i = context.index("schema.org")
                    context = ctx + context[i:]
                if len(context) < 20:  # shorter than 'https://schema.org/x'
                    context = ctx
            jsonld = je.set_raw(jsonld, ["@context", ns], je.sjson_string(context))
    except je.JsonEditError:
        pass
    return jsonld


def fix_id(jsonld: str) -> str:
    """Relative @id values (no scheme) on Dataset / ItemList items get a
    file:// prefix unless the context declares @base."""
    try:
        base = je.get_value(jsonld, ["@context", "@base"])
        if isinstance(base, str) and base != "":
            return jsonld
        top_type = je.get_value(jsonld, ["@type"])
        top_type = top_type if isinstance(top_type, str) else ""
        targets: list[tuple[list, str]] = []
        if top_type == "Dataset":
            v = je.get_value(jsonld, ["@id"])
            if isinstance(v, str):
                targets.append((["@id"], v))
        elif top_type == "ItemList":
            items = je.get_value(jsonld, ["itemListElement"])
            if isinstance(items, list):
                ordinal = 0  # match ordinal, NOT array position (gjson '#')
                for elem in items:
                    if isinstance(elem, dict):
                        item = elem.get("item")
                        if isinstance(item, dict) and isinstance(item.get("@id"), str):
                            targets.append(
                                (["itemListElement", ordinal, "item", "@id"], item["@id"])
                            )
                            ordinal += 1
        else:
            return jsonld
        for path, ident in targets:
            if _url_scheme(ident) == "":
                jsonld = je.set_raw(jsonld, path, je.sjson_string("file://" + ident))
    except je.JsonEditError:
        pass
    return jsonld


# ---------------------------------------------------------------------------
# validity / graph arrays (jsonutils.go:25-96)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - optional dependency
    from pyld import jsonld as _pyld  # type: ignore

    def _to_rdf_ok(doc: dict) -> bool:
        try:
            _pyld.to_rdf(doc)
            return True
        except Exception:
            return False
except ImportError:  # sandbox fallback: structural validation only
    _pyld = None

    def _to_rdf_ok(doc: dict) -> bool:
        return True


def is_valid(jsonld: str) -> tuple[bool, str | None]:
    """(valid, error). Mirrors isValid: must unmarshal into a JSON
    *object* and expand to RDF without error."""
    try:
        doc = json.loads(jsonld)
    except Exception as e:  # noqa: BLE001
        return False, f"error in unmarshaling json: {e}"
    if not isinstance(doc, dict):
        return False, "error in unmarshaling json: not an object"
    if not _to_rdf_ok(doc):
        return False, "error in JSON-LD to RDF call"
    return True, None


def is_graph_array(jsonld: str) -> tuple[bool, list[str]]:
    """Top-level JSON arrays of objects split into per-element docs,
    each re-marshalled Go-style (sorted keys) then validity-checked."""
    try:
        arr = json.loads(jsonld)
    except Exception:  # noqa: BLE001
        return False, []
    if not isinstance(arr, list) or not all(isinstance(x, dict) for x in arr):
        return False, []
    docs = []
    for elem in arr:
        s = je.go_marshal(elem)
        ok, _ = is_valid(s)
        if ok:
            docs.append(s)
    return (len(docs) > 0), docs


def add_to_json_list_if_valid(jsonlds: list[str], new_json: str) -> list[str]:
    """Mirrors addToJsonListIfValid *including* its quirk: when a
    graph array is split, the previously accumulated list is DISCARDED
    and replaced by the array elements + the raw array text
    (jsonutils.go:28-31 returns append(jsonldsArray, new_json))."""
    ok, err = is_valid(new_json)
    if err is not None:
        is_arr, docs = is_graph_array(new_json)
        if is_arr:
            return docs + [new_json]
        return jsonlds
    if not ok:
        return jsonlds
    return jsonlds + [new_json]


# ---------------------------------------------------------------------------
# pipeline (jsonutils.go:299-338)
# ---------------------------------------------------------------------------

def sha1_hex(s: str) -> str:
    """Content identity per common/identifier.go:91-96 (SHA-1, despite
    the prov template's 'SHA256' field name)."""
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def sha256_hex(s: str) -> str:
    """Extra column to satisfy the north-star wording; not the parity key."""
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def process_json(jsonld: str, fix_context_option: str = "https",
                 global_strict: bool = False) -> tuple[str, str]:
    """Apply the fixup chain (unless strict) and return
    (fixed_jsonld, sha1). Order pinned at jsonutils.go:313-330."""
    strict = global_strict and fix_context_option == "strict"
    if not strict:
        jsonld = fix_context_string(jsonld)
        jsonld = fix_context_array(jsonld, "https")
        jsonld = fix_context_url(jsonld, HTTPS_CONTEXT)
        jsonld = fix_id(jsonld)
    return jsonld, sha1_hex(jsonld)
