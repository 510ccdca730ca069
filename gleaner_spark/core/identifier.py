"""Identifier derivation (SHA + JSONPath extraction).

Mirrors /root/reference/internal/common/identifier.go:

- ``get_sha``                SHA-1 hex (identifier.go:91-96)
- ``generate_file_sha``      (identifier.go:98-112)
- ``get_identifier_by_path`` JSONPath matches, stringified then
                             stable-sorted ascending (identifier.go:32-52)
- ``get_identifier_by_paths``first non-empty path wins
                             (identifier.go:73-89)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

try:
    from jsonpath_ng.ext import parse as _jp_parse
except ImportError:  # pragma: no cover
    from jsonpath_ng import parse as _jp_parse

_PATH_CACHE: dict[str, object] = {}

JSON_SHA = "jsonsha"
IDENTIFIER_SHA = "identifiersha"
IDENTIFIER_STRING = "identifierstring"


@dataclass
class Identifier:
    unique_id: str
    identifier_type: str
    matched_path: str = ""
    matched_string: str = ""
    json_sha: str = ""


def get_sha(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def generate_file_sha(jsonld: str) -> Identifier:
    sha = get_sha(jsonld)
    return Identifier(unique_id=sha, identifier_type=JSON_SHA, json_sha=sha)


def _go_sprint(v) -> str:
    """fmt.Sprint-ish stringification of a JSONPath match result."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "<nil>"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(", ", ":"), ensure_ascii=False)
    return str(v)


def get_identifier_by_path(json_path: str, jsonld: str) -> list[str]:
    """All matches of the path, stringified and stable-sorted
    ascending (identifier.go:44-51). Raises on bad JSON/paths like the
    reference returns errors."""
    obj = json.loads(jsonld)
    expr = _PATH_CACHE.get(json_path)
    if expr is None:
        expr = _jp_parse(json_path)
        _PATH_CACHE[json_path] = expr
    matches = [m.value for m in expr.find(obj)]
    strings = [_go_sprint(m) for m in matches]
    strings.sort()  # python sort is stable
    return strings


def get_identifier_by_paths(json_paths: list[str], jsonld: str) -> tuple[list[str], str]:
    """First path yielding a non-empty match list wins; returns
    (matches, matched_path). Empty-everything => ([], '') mirroring
    the reference's 'no Match' error path."""
    for p in json_paths:
        try:
            got = get_identifier_by_path(p, jsonld)
        except Exception:  # noqa: BLE001 - continue like the reference
            continue
        if got:
            return got, p
    return [], ""


def generate_identifier_deferred(identifier_type: str, identifier_paths: list[str],
                                 jsonld: str) -> Identifier | None:
    """The JSONPath half of the identifier dispatch. Returns None when
    the identity is the content SHA-1 (jsonsha sources, and the
    no-match fallback of identifier.go:73-89) so a distributed caller
    can compute that hash JVM-side (F.sha1 in codegen) instead of
    hashing the full document per-row in Python."""
    if identifier_type in (IDENTIFIER_SHA, IDENTIFIER_STRING) and identifier_paths:
        matches, path = get_identifier_by_paths(identifier_paths, jsonld)
        if matches:
            matched = json.dumps(matches, ensure_ascii=False) if len(matches) > 1 else matches[0]
            uid = get_sha(matched) if identifier_type == IDENTIFIER_SHA else matched
            return Identifier(
                unique_id=uid,
                identifier_type=identifier_type,
                matched_path=path,
                matched_string=matched,
            )
    return None


def generate_identifier(identifier_type: str, identifier_paths: list[str], jsonld: str) -> Identifier:
    """Dispatch equivalent to common/identifier.go's higher-level
    selection: identifiersha/identifierstring use JSONPath matches,
    falling back to the file sha when nothing matches."""
    file_sha = get_sha(jsonld)
    got = generate_identifier_deferred(identifier_type, identifier_paths, jsonld)
    if got is not None:
        got.json_sha = file_sha
        return got
    return Identifier(unique_id=file_sha, identifier_type=JSON_SHA, json_sha=file_sha)
