"""JSON-LD expansion → RDF dataset → N-Quads → URDNA2015, from scratch.

The reference validates every harvested document by expanding it to
RDF (isValid → proc.ToRDF, jsonutils.go:69-96) and converts org
JSON-LD to N-Quads (JLD2nq → proc.ToRDF, common/jld2nq.go:13-33)
with json-gold; its tests additionally pin URDNA2015 Normalize output
(common/ldproc_test.go:40-164). The sandbox has no pyld, so this
module implements the needed subset of the public JSON-LD 1.0/1.1
algorithms (W3C JSON-LD API + RDF Dataset Canonicalization specs):

- context processing: inline contexts (@base/@vocab/@language + term
  definitions with @id/@type/@container/@reverse), remote contexts
  resolved against a PRELOAD MAP (mirroring the reference's caching
  document loader with its schemaorg asset, common/ldproc.go:27-62);
  a remote URL outside the map raises ``loading remote context
  failed`` — the engine never does network IO.
- expansion with json-gold's observed lax IRI behavior, pinned by the
  reference's approval goldens: @type values resolve document-relative
  against the empty base (so a bare ``"bar"`` SURVIVES as a relative
  IRI — ldproc_test golden noContextSimple), terms with a colon pass
  through as IRIs (``SO:name``), and vocab-less plain keys are
  dropped.
- deterministic node-map flattening (_:b0, _:b1, … in first-visit
  order), RDF triple generation (rdf:type, rdf:first/rest lists,
  canonical xsd literal forms) and json-gold-style N-Quads
  serialization (one sorted line set, LF-terminated).
- URDNA2015 canonical labeling (hash-first-degree / hash-n-degree)
  for the Normalize parity goldens.

Errors raise ``JsonLdError`` with the spec error code as message —
``is_valid`` (core/fixups.py) maps any of them to the reference's
"error in JSON-LD to RDF call" drop.
"""

from __future__ import annotations

import hashlib
import json
import re
from itertools import permutations

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

KEYWORDS = {
    "@base", "@container", "@context", "@direction", "@graph", "@id",
    "@import", "@included", "@index", "@json", "@language", "@list",
    "@nest", "@none", "@prefix", "@propagate", "@protected", "@requireAll",
    "@reverse", "@set", "@type", "@value", "@version", "@vocab",
}

_KEYWORD_FORM = re.compile(r"^@[A-Za-z]+$")
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class JsonLdError(ValueError):
    pass


# ---------------------------------------------------------------------------
# document loader (preload map; no network — ldproc.go's cached loader)
# ---------------------------------------------------------------------------

# minimal stand-in for the schema.org context: @vocab covers plain
# terms identically to the published context for vocabulary IRIs.
# (The real context adds @type:@id coercions; pass the published file
# to preload_context for full fidelity — tests do, from the reference
# asset.)
_SCHEMA_ORG_MINIMAL = {"@vocab": "https://schema.org/"}

_PRELOADED: dict[str, dict] = {}
for _u in (
    "http://schema.org", "http://schema.org/", "https://schema.org",
    "https://schema.org/", "http://schema.org/docs/jsonldcontext.jsonld",
    "https://schema.org/docs/jsonldcontext.jsonld",
    "https://schema.org/docs/jsonldcontext.json",
):
    _PRELOADED[_u] = _SCHEMA_ORG_MINIMAL


_BUILTIN_PRELOADED = dict(_PRELOADED)


def preload_context(url_prefixes: list[str], document: dict) -> None:
    """Register a parsed context document for the given URLs — the
    equivalent of the reference's contextmaps YAML + caching loader
    (ldproc.go:27-62)."""
    ctx = document.get("@context", document)
    for u in url_prefixes:
        _PRELOADED[u] = ctx
        _PRELOADED[u.rstrip("/")] = ctx
        _PRELOADED[u.rstrip("/") + "/"] = ctx
    _CTX_CACHE.clear()  # cached contexts may embed stale remote docs
    _FAST_CTX.clear()  # eligibility can change with the new preloads


def reset_preloads() -> None:
    """Drop every preload_context registration, restoring the
    built-in schema.org entries only — so a run whose config maps
    nothing (or maps different documents) doesn't inherit a previous
    run's contexts in the same python process."""
    _PRELOADED.clear()
    _PRELOADED.update(_BUILTIN_PRELOADED)
    _CTX_CACHE.clear()
    _FAST_CTX.clear()


def _load_remote(url: str) -> dict:
    doc = _PRELOADED.get(url)
    if doc is None:
        raise JsonLdError(f"loading remote context failed: {url}")
    return doc


# ---------------------------------------------------------------------------
# context processing
# ---------------------------------------------------------------------------

class Context:
    __slots__ = ("terms", "base", "vocab", "language")

    def __init__(self, base: str = ""):
        self.terms: dict[str, dict | None] = {}
        self.base = base
        self.vocab: str | None = None
        self.language: str | None = None

    def copy(self) -> "Context":
        c = Context(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        return c


def _resolve_iri(base: str, ref: str) -> str:
    """RFC 3986 resolution, degraded: an empty base (the reference
    runs NewJsonLdOptions("")) leaves the reference untouched — which
    is exactly what the approval goldens pin."""
    if not base or _ABS_IRI.match(ref) or ref == "":
        return ref
    from urllib.parse import urljoin

    return urljoin(base, ref)


def process_context(active: Context, local, remote_chain: tuple = ()) -> Context:
    result = active.copy()
    items = local if isinstance(local, list) else [local]
    for ctx in items:
        if ctx is None:
            result = Context(active.base)
        elif isinstance(ctx, str):
            if ctx in remote_chain:
                raise JsonLdError("recursive context inclusion: " + ctx)
            remote = _load_remote(ctx)
            result = process_context(result, remote, remote_chain + (ctx,))
        elif isinstance(ctx, dict):
            if "@base" in ctx:
                b = ctx["@base"]
                if b is None:
                    result.base = ""
                elif isinstance(b, str):
                    result.base = _resolve_iri(result.base, b)
                else:
                    raise JsonLdError("invalid base IRI")
            if "@vocab" in ctx:
                v = ctx["@vocab"]
                if v is None:
                    result.vocab = None
                elif isinstance(v, str) and (_ABS_IRI.match(v) or v.startswith("_:") or v == ""):
                    result.vocab = v
                else:
                    raise JsonLdError("invalid vocab mapping")
            if "@language" in ctx:
                lang = ctx["@language"]
                if lang is None:
                    result.language = None
                elif isinstance(lang, str):
                    result.language = lang.lower()
                else:
                    raise JsonLdError("invalid default language")
            if "@version" in ctx and ctx["@version"] not in (1.1, "1.1"):
                raise JsonLdError("invalid @version value")
            defined: dict[str, bool] = {}
            for term in ctx:
                if term in ("@base", "@vocab", "@language", "@version", "@propagate", "@protected", "@import"):
                    continue
                _create_term_definition(result, ctx, term, defined)
        else:
            raise JsonLdError("invalid local context")
    return result


def _create_term_definition(ctx: Context, local: dict, term: str, defined: dict) -> None:
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError("cyclic IRI mapping: " + term)
    defined[term] = False
    if term in KEYWORDS:
        raise JsonLdError("keyword redefinition: " + term)
    if term == "":
        raise JsonLdError("invalid term definition")
    if _KEYWORD_FORM.match(term):
        # terms that look like keywords are ignored (1.1)
        defined[term] = True
        return
    value = local[term]
    ctx.terms.pop(term, None)
    if value is None or (isinstance(value, dict) and value.get("@id", "") is None):
        ctx.terms[term] = None
        defined[term] = True
        return
    if isinstance(value, str):
        value = {"@id": value}
    if not isinstance(value, dict):
        raise JsonLdError("invalid term definition")

    definition: dict = {"reverse": False}

    if "@reverse" in value:
        if "@id" in value or "@nest" in value:
            raise JsonLdError("invalid reverse property")
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("invalid IRI mapping")
        iri = _expand_iri(ctx, rev, vocab=True, local=local, defined=defined)
        if iri is None or (":" not in iri and not iri.startswith("_:")):
            raise JsonLdError("invalid IRI mapping")
        cont = value.get("@container")
        if cont not in (None, "@set", "@index"):
            raise JsonLdError("invalid reverse property")
        definition["@id"] = iri
        definition["reverse"] = True
        if cont:
            definition["@container"] = cont
        ctx.terms[term] = definition
        defined[term] = True
        return

    if "@id" in value and value["@id"] != term:
        vid = value["@id"]
        if not isinstance(vid, str):
            raise JsonLdError("invalid IRI mapping")
        if _KEYWORD_FORM.match(vid) and vid not in KEYWORDS:
            defined[term] = True
            return
        if vid in KEYWORDS:
            if vid != "@type":
                raise JsonLdError("invalid IRI mapping: " + vid)
            iri = "@type"
        else:
            iri = _expand_iri(ctx, vid, vocab=True, local=local, defined=defined)
            if iri is None or (iri not in KEYWORDS and ":" not in iri and not iri.startswith("_:")):
                raise JsonLdError("invalid IRI mapping")
        definition["@id"] = iri
    elif ":" in term[1:]:
        prefix, _, suffix = term.partition(":")
        if prefix in local:
            _create_term_definition(ctx, local, prefix, defined)
        pdef = ctx.terms.get(prefix)
        if pdef:
            definition["@id"] = pdef["@id"] + suffix
        else:
            definition["@id"] = term
    elif ctx.vocab is not None:
        definition["@id"] = ctx.vocab + term
    else:
        raise JsonLdError("invalid IRI mapping: " + term)

    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError("invalid type mapping")
        if t not in ("@id", "@vocab", "@json", "@none"):
            t = _expand_iri(ctx, t, vocab=True, local=local, defined=defined)
            if t is None or not _ABS_IRI.match(t):
                raise JsonLdError("invalid type mapping")
        definition["@type"] = t
    if "@container" in value:
        cont = value["@container"]
        conts = cont if isinstance(cont, list) else [cont]
        allowed = {"@list", "@set", "@index", "@language", "@graph", "@id", "@type"}
        if not conts or any(c not in allowed for c in conts):
            raise JsonLdError("invalid container mapping")
        definition["@container"] = conts[0] if conts[0] != "@set" or len(conts) == 1 else conts[-1]
    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError("invalid language mapping")
        definition["@language"] = lang.lower() if isinstance(lang, str) else None
    ctx.terms[term] = definition
    defined[term] = True


def _expand_iri(ctx: Context, value, *, vocab: bool = False,
                doc_relative: bool = False, local: dict | None = None,
                defined: dict | None = None):
    if value is None or not isinstance(value, str):
        return None
    if value in KEYWORDS:
        return value
    if _KEYWORD_FORM.match(value):
        return None
    if local is not None and value in local and not (defined or {}).get(value):
        _create_term_definition(ctx, local, value, defined if defined is not None else {})
    if vocab and value in ctx.terms:
        d = ctx.terms[value]
        return d["@id"] if d else None
    if ":" in value[1:]:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        if local is not None and prefix in local and not (defined or {}).get(prefix):
            _create_term_definition(ctx, local, prefix, defined if defined is not None else {})
        pdef = ctx.terms.get(prefix)
        if pdef:
            return pdef["@id"] + suffix
        return value
    if vocab and ctx.vocab is not None:
        return ctx.vocab + value
    if doc_relative:
        return _resolve_iri(ctx.base, value)
    return value


# ---------------------------------------------------------------------------
# expansion
# ---------------------------------------------------------------------------

# a harvest batch sees the same handful of @context shapes millions
# of times (5 variants in the synthetic corpus; a dozen across real
# schema.org publishers) — memoize processed contexts by their JSON
# identity. Bounded; falls through to a fresh parse on miss.
_CTX_CACHE: dict[str, Context] = {}
_CTX_CACHE_MAX = 512


def _process_context_cached(active: Context, local) -> Context:
    try:
        key = json.dumps(local, sort_keys=True, default=str) if not isinstance(local, str) else local
    except (TypeError, ValueError):
        return process_context(active, local)
    # only the root context (empty active) is cacheable
    if active.terms or active.vocab is not None or active.language is not None:
        return process_context(active, local)
    key = active.base + "\x00" + key
    hit = _CTX_CACHE.get(key)
    if hit is not None:
        return hit.copy()
    out = process_context(active, local)
    if len(_CTX_CACHE) < _CTX_CACHE_MAX:
        _CTX_CACHE[key] = out.copy()
    return out


# --- fast validity accept path -------------------------------------------
#
# The harvest hot path only needs expand()'s SUCCESS/FAILURE verdict
# (isValid tosses the triples, jsonutils.go:90-92). Every raise site in
# _expand is reachable only through (a) context processing, (b) a
# keyword key (or keyword alias) with a bad-typed value, or (c) a term
# with @container "@language". So a document whose root context is
# known-eligible and whose body contains no "@"-keys beyond
# @id:str / @type:str|[str] / @graph provably expands without error —
# accept it after a cheap structural scan instead of a full expansion.
# The scan never REJECTS: anything outside the proven-safe shape falls
# through to the real expand(), so invalid documents are still dropped
# with reference-identical classification.

_FAST_CTX: dict[str, bool] = {}
_FAST_CTX_MAX = 512


def _context_fast_eligible(local) -> bool:
    """True iff the root context processes successfully AND its term
    definitions introduce none of the expansion-time raise sites:
    keyword aliases (e.g. "id": "@id" — would make plain keys
    type-checked), @container "@language" (raises on non-string map
    values), or reverse terms (conservative)."""
    try:
        key = local if isinstance(local, str) else json.dumps(
            local, sort_keys=True, default=str
        )
    except (TypeError, ValueError):
        return False
    hit = _FAST_CTX.get(key)
    if hit is not None:
        return hit
    try:
        ctx = _process_context_cached(Context(""), local)
    except JsonLdError:
        ok = False  # context itself fails → slow path produces the error
    else:
        ok = True
        for d in ctx.terms.values():
            if d is None:
                continue
            tid = d.get("@id")
            if isinstance(tid, str) and tid.startswith("@"):
                ok = False  # keyword alias
                break
            if d.get("@container") == "@language" or d.get("reverse"):
                ok = False
                break
    if len(_FAST_CTX) < _FAST_CTX_MAX:
        _FAST_CTX[key] = ok
    return ok


def _scan_fast(element) -> bool:
    """True iff expansion of this element can be proven error-free
    under a fast-eligible context (see raise-site inventory above)."""
    if isinstance(element, dict):
        for k, v in element.items():
            if k.startswith("@"):
                if k == "@id":
                    if not isinstance(v, str):
                        return False
                elif k == "@type":
                    if not (isinstance(v, str) or (
                        isinstance(v, list) and all(isinstance(x, str) for x in v)
                    )):
                        return False
                elif k == "@graph":
                    if not _scan_fast(v):
                        return False
                else:
                    return False  # @value/@list/@reverse/nested @context/… → slow path
            elif not _scan_fast(v):
                return False
        return True
    if isinstance(element, list):
        return all(_scan_fast(x) for x in element)
    return True  # scalars never raise


def expand_known_valid(document) -> bool:
    """True → ``expand(document, base="")`` provably succeeds; False →
    unknown, run the real expansion. Never claims invalidity."""
    if not isinstance(document, dict):
        return False
    local = document.get("@context")
    if local is not None and not _context_fast_eligible(local):
        return False
    for k, v in document.items():
        if k == "@context":
            continue
        if k.startswith("@"):
            if k == "@id":
                if not isinstance(v, str):
                    return False
            elif k == "@type":
                if not (isinstance(v, str) or (
                    isinstance(v, list) and all(isinstance(x, str) for x in v)
                )):
                    return False
            elif k == "@graph":
                if not _scan_fast(v):
                    return False
            else:
                return False
        elif not _scan_fast(v):
            return False
    return True


def expand(document, base: str = "") -> list:
    """Expanded form (list of node objects)."""
    ctx = Context(base)
    result = _expand(ctx, None, document)
    if isinstance(result, dict) and set(result) == {"@graph"}:
        result = result["@graph"]
    if result is None:
        result = []
    if not isinstance(result, list):
        result = [result]
    return result


def _expand_value(ctx: Context, prop: str | None, value):
    d = ctx.terms.get(prop) if prop else None
    t = d.get("@type") if d else None
    if t == "@id":
        return {"@id": _expand_iri(ctx, value, doc_relative=True)} if isinstance(value, str) else {"@value": value}
    if t == "@vocab":
        return {"@id": _expand_iri(ctx, value, vocab=True, doc_relative=True)} if isinstance(value, str) else {"@value": value}
    out: dict = {"@value": value}
    if t not in (None, "@id", "@vocab", "@none"):
        out["@type"] = t
    elif isinstance(value, str):
        lang = d.get("@language", ctx.language) if d else ctx.language
        if lang is not None:
            out["@language"] = lang
    return out


def _expand(ctx: Context, active_prop: str | None, element):
    if element is None:
        return None
    if not isinstance(element, (dict, list)):
        if active_prop is None or active_prop == "@graph":
            return None
        return _expand_value(ctx, active_prop, element)
    if isinstance(element, list):
        out = []
        for item in element:
            v = _expand(ctx, active_prop, item)
            if isinstance(v, list):
                out.extend(v)
            elif v is not None:
                out.append(v)
        return out

    # dict
    if "@context" in element:
        ctx = _process_context_cached(ctx, element["@context"])

    result: dict = {}
    for key in sorted(element.keys()):
        value = element[key]
        if key == "@context":
            continue
        prop = _expand_iri(ctx, key, vocab=True)
        if prop is None or (":" not in prop and prop not in KEYWORDS):
            continue
        if prop in KEYWORDS:
            if active_prop == "@reverse":
                raise JsonLdError("invalid reverse property map")
            if prop in result and prop not in ("@included", "@type"):
                raise JsonLdError("colliding keywords: " + prop)
            if prop == "@id":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @id value")
                result["@id"] = _expand_iri(ctx, value, doc_relative=True)
            elif prop == "@type":
                vals = value if isinstance(value, list) else [value]
                ex = []
                for v in vals:
                    if not isinstance(v, str):
                        raise JsonLdError("invalid type value")
                    t = _expand_iri(ctx, v, vocab=True, doc_relative=True)
                    if t is not None:
                        ex.append(t)
                prev = result.get("@type", [])
                result["@type"] = prev + ex
            elif prop == "@graph":
                v = _expand(ctx, "@graph", value)
                result["@graph"] = v if isinstance(v, list) else [v] if v else []
            elif prop == "@value":
                if value is not None and not isinstance(value, (str, int, float, bool)):
                    raise JsonLdError("invalid value object value")
                result["@value"] = value
            elif prop == "@language":
                if not isinstance(value, str):
                    raise JsonLdError("invalid language-tagged string")
                result["@language"] = value.lower()
            elif prop == "@index":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @index value")
                result["@index"] = value
            elif prop == "@list":
                if active_prop is None or active_prop == "@graph":
                    return None
                v = _expand(ctx, active_prop, value)
                result["@list"] = v if isinstance(v, list) else [v] if v is not None else []
            elif prop == "@set":
                v = _expand(ctx, active_prop, value)
                return v
            elif prop == "@reverse":
                if not isinstance(value, dict):
                    raise JsonLdError("invalid @reverse value")
                rev = _expand(ctx, "@reverse", value)
                if isinstance(rev, dict):
                    for p, items in rev.items():
                        if p in ("@value", "@list") or (isinstance(items, list) and any(
                            isinstance(i, dict) and ("@value" in i or "@list" in i) for i in items
                        )):
                            raise JsonLdError("invalid reverse property value")
                        result.setdefault("@reverse", {}).setdefault(p, []).extend(
                            items if isinstance(items, list) else [items]
                        )
            # other keywords (@nest etc.) ignored in this subset
            continue

        d = ctx.terms.get(key)
        container = d.get("@container") if d else None
        if container == "@language" and isinstance(value, dict):
            items = []
            for lang in sorted(value.keys()):
                for v in (value[lang] if isinstance(value[lang], list) else [value[lang]]):
                    if v is None:
                        continue
                    if not isinstance(v, str):
                        raise JsonLdError("invalid language map value")
                    items.append({"@value": v, "@language": lang.lower()})
            expanded = items
        elif container == "@index" and isinstance(value, dict):
            items = []
            for idx in sorted(value.keys()):
                for v in (value[idx] if isinstance(value[idx], list) else [value[idx]]):
                    ev = _expand(ctx, key, v)
                    for e in (ev if isinstance(ev, list) else [ev] if ev is not None else []):
                        if isinstance(e, dict) and "@index" not in e:
                            e["@index"] = idx
                        items.append(e)
            expanded = items
        else:
            ev = _expand(ctx, key, value)
            if ev is None:
                continue
            expanded = ev if isinstance(ev, list) else [ev]
        if container == "@list" and not (len(expanded) == 1 and isinstance(expanded[0], dict) and "@list" in expanded[0]):
            expanded = [{"@list": expanded}]
        if d and d.get("reverse"):
            result.setdefault("@reverse", {}).setdefault(d["@id"], []).extend(expanded)
        else:
            result.setdefault(prop, []).extend(expanded)

    if "@value" in result:
        bad = set(result) - {"@value", "@type", "@language", "@index"}
        if bad or ("@type" in result and "@language" in result):
            raise JsonLdError("invalid value object")
        if result["@value"] is None:
            return None
        if "@language" in result and not isinstance(result["@value"], str):
            raise JsonLdError("invalid language-tagged value")
        if "@type" in result:
            t = result["@type"]
            t = t[0] if isinstance(t, list) else t
            if not isinstance(t, str):
                raise JsonLdError("invalid typed value")
            result["@type"] = t
        return result
    if "@type" in result and not isinstance(result["@type"], list):
        result["@type"] = [result["@type"]]
    if list(result.keys()) == ["@language"]:
        return None
    if active_prop in (None, "@graph"):
        if not result or set(result) <= {"@value", "@list"}:
            return None
        if set(result) == {"@id"}:
            return None
    return result


# ---------------------------------------------------------------------------
# node map / flattening
# ---------------------------------------------------------------------------

class _BlankIssuer:
    def __init__(self, prefix: str = "_:b"):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict[str, str] = {}
        self.order: list[str] = []

    def issue(self, old: str | None = None) -> str:
        if old is not None and old in self.issued:
            return self.issued[old]
        new = f"{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.issued[old] = new
            self.order.append(old)
        return new


def _node_map(expanded: list):
    graphs: dict[str, dict[str, dict]] = {"@default": {}}
    issuer = _BlankIssuer()

    def gen(element, graph: str, subject=None, prop=None, lst=None):
        if isinstance(element, list):
            for item in element:
                gen(item, graph, subject, prop, lst)
            return
        nodes = graphs.setdefault(graph, {})
        if "@value" in element:
            if lst is not None:
                lst.append(element)
            else:
                nodes[subject].setdefault(prop, []).append(element)
            return
        if "@list" in element:
            sub: list = []
            for item in element["@list"]:
                gen(item, graph, subject, prop, sub)
            entry = {"@list": sub}
            if lst is not None:
                lst.append(entry)
            else:
                nodes[subject].setdefault(prop, []).append(entry)
            return
        # node object
        nid = element.get("@id")
        if nid is None or nid.startswith("_:"):
            nid = issuer.issue(nid)
        node = nodes.setdefault(nid, {"@id": nid})
        if subject is not None:
            ref = {"@id": nid}
            if lst is not None:
                lst.append(ref)
            else:
                vals = nodes[subject].setdefault(prop, [])
                if ref not in vals:
                    vals.append(ref)
        for t in element.get("@type", []):
            tt = issuer.issue(t) if t.startswith("_:") else t
            node.setdefault("@type", [])
            if tt not in node["@type"]:
                node["@type"].append(tt)
        if "@reverse" in element:
            for rprop, rvals in element["@reverse"].items():
                for rv in rvals:
                    gen(rv, graph, None, None)  # materialize the node
                    rid = rv.get("@id")
                    if rid is None or rid.startswith("_:"):
                        rid = issuer.issue(rid)
                    rnode = nodes.setdefault(rid, {"@id": rid})
                    ref = {"@id": nid}
                    vals = rnode.setdefault(rprop, [])
                    if ref not in vals:
                        vals.append(ref)
        if "@graph" in element:
            graphs.setdefault(nid, {})
            gen(element["@graph"], nid)
        for k in sorted(element.keys()):
            if k in ("@id", "@type", "@graph", "@reverse", "@index", "@value", "@list"):
                continue
            for v in element[k]:
                gen(v, graph, nid, k)

    for el in expanded:
        gen(el, "@default")
    return graphs, issuer


# ---------------------------------------------------------------------------
# RDF conversion + N-Quads
# ---------------------------------------------------------------------------

def _canonical_double(v: float) -> str:
    s = f"{v:1.15E}"
    mant, _, exp = s.partition("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    return f"{mant}E{int(exp)}"


def _object_to_rdf(value, issuer: _BlankIssuer, triples, graph):
    if "@value" in value:
        v = value["@value"]
        dt = value.get("@type")
        lang = value.get("@language")
        if isinstance(v, bool):
            lex = "true" if v else "false"
            dt = dt or XSD + "boolean"
        elif isinstance(v, float) or (isinstance(v, int) and dt == XSD + "double"):
            if isinstance(v, float) and v.is_integer() and dt in (None, XSD + "integer"):
                lex = str(int(v))
                dt = dt or XSD + "integer"
            else:
                lex = _canonical_double(float(v))
                dt = dt or XSD + "double"
        elif isinstance(v, int):
            lex = str(v)
            dt = dt or XSD + "integer"
        else:
            lex = str(v)
            if lang is not None:
                return ("literal", lex, RDF_NS + "langString", lang)
            dt = dt or XSD + "string"
        return ("literal", lex, dt, None)
    if "@list" in value:
        return _list_to_rdf(value["@list"], issuer, triples, graph)
    nid = value["@id"]
    return ("blank", nid) if nid.startswith("_:") else ("iri", nid)


def _list_to_rdf(items, issuer: _BlankIssuer, triples, graph):
    if not items:
        return ("iri", RDF_NIL)
    bnodes = [("blank", issuer.issue()) for _ in items]
    for i, item in enumerate(items):
        obj = _object_to_rdf(item, issuer, triples, graph)
        triples.append((bnodes[i], ("iri", RDF_FIRST), obj, graph))
        rest = bnodes[i + 1] if i + 1 < len(items) else ("iri", RDF_NIL)
        triples.append((bnodes[i], ("iri", RDF_REST), rest, graph))
    return bnodes[0]


def to_rdf_dataset(document, base: str = "") -> list:
    """Quads [(subject, predicate, object, graph)] with terms as
    ('iri'|'blank', v) / ('literal', lex, datatype, lang); graph is
    None for the default graph."""
    expanded = expand(document, base)
    graphs, issuer = _node_map(expanded)
    quads: list = []
    for gname in sorted(graphs.keys()):
        gterm = None
        if gname != "@default":
            gterm = ("blank", gname) if gname.startswith("_:") else ("iri", gname)
        nodes = graphs[gname]
        for nid in sorted(nodes.keys()):
            node = nodes[nid]
            if not nid.startswith("_:") and not _ABS_IRI.match(nid):
                # json-gold skips nodes whose subject is a relative
                # IRI, while relative OBJECTS survive — pinned by the
                # reference goldens (noContext → empty vs
                # noContextSimple → `<bar>` object emitted)
                continue
            s = ("blank", nid) if nid.startswith("_:") else ("iri", nid)
            for t in node.get("@type", []):
                o = ("blank", t) if t.startswith("_:") else ("iri", t)
                quads.append((s, ("iri", RDF_TYPE), o, gterm))
            for prop in sorted(node.keys()):
                if prop.startswith("@"):
                    continue
                if prop.startswith("_:"):
                    continue
                for v in node[prop]:
                    obj = _object_to_rdf(v, issuer, quads, gterm)
                    quads.append((s, ("iri", prop), obj, gterm))
    return quads


_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def _term_str(t) -> str:
    kind = t[0]
    if kind == "iri":
        return f"<{t[1]}>"
    if kind == "blank":
        return t[1]
    _, lex, dt, lang = t
    out = f'"{_escape(lex)}"'
    if lang is not None:
        return out + f"@{lang}"
    if dt != XSD + "string":
        return out + "^^<" + dt + ">"
    return out


def quad_to_nquad(q) -> str:
    s, p, o, g = q
    line = f"{_term_str(s)} {_term_str(p)} {_term_str(o)}"
    if g is not None:
        line += f" {_term_str(g)}"
    return line + " .\n"


def to_nquads(document, base: str = "") -> str:
    """json-gold ToRDF with Format=application/n-quads: the sorted
    N-Quads serialization of the dataset."""
    quads = to_rdf_dataset(document, base)
    return "".join(sorted(quad_to_nquad(q) for q in quads))


# ---------------------------------------------------------------------------
# URDNA2015 (RDF Dataset Canonicalization)
# ---------------------------------------------------------------------------

def _quad_bnodes(q):
    out = []
    for t in (q[0], q[2], q[3]):
        if t is not None and t[0] == "blank":
            out.append(t[1])
    return out


def _serialize_for_hash(q, ref: str) -> str:
    def repl(t, is_graph=False):
        if t is None:
            return None
        if t[0] == "blank":
            return ("blank", "_:a" if t[1] == ref else "_:z")
        return t

    s, p, o, g = repl(q[0]), q[1], repl(q[2]), repl(q[3])
    line = f"{_term_str(s)} {_term_str(p)} {_term_str(o)}"
    if g is not None:
        line += f" {_term_str(g)}"
    return line + " .\n"


def _hash_first_degree(bnode: str, quads_by_bnode) -> str:
    lines = sorted(_serialize_for_hash(q, bnode) for q in quads_by_bnode[bnode])
    return hashlib.sha256("".join(lines).encode("utf-8")).hexdigest()


def _hash_related(related: str, quad, issuer, canon, position: str,
                  quads_by_bnode, fdh_cache) -> str:
    if related in canon.issued:
        ident = canon.issued[related]
    elif related in issuer.issued:
        ident = issuer.issued[related]
    else:
        ident = fdh_cache[related]
    inp = position
    if position != "g":
        inp += f"<{quad[1][1]}>"
    inp += ident
    return hashlib.sha256(inp.encode("utf-8")).hexdigest()


def _hash_n_degree(identifier: str, issuer, canon, quads_by_bnode, fdh_cache):
    related_map: dict[str, list[str]] = {}
    for quad in quads_by_bnode[identifier]:
        for t, pos in ((quad[0], "s"), (quad[2], "o"), (quad[3], "g")):
            if t is not None and t[0] == "blank" and t[1] != identifier:
                h = _hash_related(t[1], quad, issuer, canon, pos,
                                  quads_by_bnode, fdh_cache)
                related_map.setdefault(h, []).append(t[1])
    data = ""
    for h in sorted(related_map.keys()):
        data += h
        chosen_path = ""
        chosen_issuer = None
        for perm in permutations(related_map[h]):
            issuer_copy = _BlankIssuer("_:b")
            issuer_copy.counter = issuer.counter
            issuer_copy.issued = dict(issuer.issued)
            issuer_copy.order = list(issuer.order)
            path = ""
            recursion = []
            skip = False
            for related in perm:
                if related in canon.issued:
                    path += canon.issued[related]
                else:
                    if related not in issuer_copy.issued:
                        recursion.append(related)
                    path += issuer_copy.issue(related)
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            for related in recursion:
                res_hash, res_issuer = _hash_n_degree(
                    related, issuer_copy, canon, quads_by_bnode, fdh_cache
                )
                path += issuer_copy.issue(related)
                path += f"<{res_hash}>"
                issuer_copy = res_issuer
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            if not chosen_path or path < chosen_path:
                chosen_path = path
                chosen_issuer = issuer_copy
        data += chosen_path
        issuer = chosen_issuer if chosen_issuer is not None else issuer
    return hashlib.sha256(data.encode("utf-8")).hexdigest(), issuer


def canonicalize_quads(quads: list) -> list:
    """URDNA2015: relabel blank nodes to _:c14n0.. and return quads."""
    quads_by_bnode: dict[str, list] = {}
    for q in quads:
        for b in _quad_bnodes(q):
            quads_by_bnode.setdefault(b, []).append(q)
    canon = _BlankIssuer("_:c14n")
    fdh = {b: _hash_first_degree(b, quads_by_bnode) for b in quads_by_bnode}
    by_hash: dict[str, list[str]] = {}
    for b, h in fdh.items():
        by_hash.setdefault(h, []).append(b)
    simple = True
    while simple:
        simple = False
        for h in sorted(by_hash.keys()):
            nodes = by_hash[h]
            if len(nodes) == 1:
                canon.issue(nodes[0])
                del by_hash[h]
                simple = True
                break
    for h in sorted(by_hash.keys()):
        results = []
        for b in by_hash[h]:
            if b in canon.issued:
                continue
            temp = _BlankIssuer("_:b")
            temp.issue(b)
            nh, nissuer = _hash_n_degree(b, temp, canon, quads_by_bnode, fdh)
            results.append((nh, nissuer))
        for _, nissuer in sorted(results, key=lambda r: r[0]):
            for old in nissuer.order:
                canon.issue(old)

    def relabel(t):
        if t is not None and t[0] == "blank":
            return ("blank", canon.issued.get(t[1], t[1]))
        return t

    return [(relabel(s), p, relabel(o), relabel(g)) for s, p, o, g in quads]


def normalize(document, base: str = "") -> str:
    """URDNA2015-normalized N-Quads (the reference's Normalize test
    path, ldproc_test.go:142-147)."""
    quads = canonicalize_quads(to_rdf_dataset(document, base))
    return "".join(sorted(set(quad_to_nquad(q) for q in quads)))


def to_rdf(document, base: str = "") -> list:
    """isValid's proc.ToRDF equivalent: raises JsonLdError on invalid
    JSON-LD, returns the quad list otherwise."""
    return to_rdf_dataset(document, base)
