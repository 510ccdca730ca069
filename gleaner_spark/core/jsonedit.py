"""Order-preserving, in-place JSON editing (gjson/sjson-equivalent).

The reference edits JSON-LD documents *as strings* with targeted
get/set operations that preserve the original byte layout everywhere
except the edited span (tidwall/gjson + tidwall/sjson, used throughout
/root/reference/internal/summoner/acquire/jsonutils.go).  Byte layout
matters because the document's SHA-1 is its identity
(/root/reference/internal/common/identifier.go:91-112): a
parse/re-serialize round trip would change every hash.

This module re-implements just the needed subset:

- a *tolerant* scanner (gjson accepts mildly malformed JSON, e.g. the
  missing-comma ItemList vector in jsonutils_test.go:467-527);
- ``get_value`` / ``get_raw`` / ``get_kind`` for dotted paths;
- ``set_raw`` replacing the value span in place, or appending a new
  key compactly before the parent object's closing brace (sjson
  behavior for missing keys);
- ``go_marshal`` matching Go ``encoding/json.Marshal`` output
  (sorted map keys, compact, HTML-escaping of ``< > &``) so that
  serialized replacement values are byte-identical to the reference.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

WS = " \t\n\r"

# structural-character jump tables: regex .search skips content runs at
# C speed instead of per-character Python loops (this scanner is the
# hot path of the fixup UDF: ~1k docs/s naive vs ~10k docs/s jumped)
_OBJ_STRUCT = re.compile(r'["{}]')
_ARR_STRUCT = re.compile(r'["\[\]]')
_TOKEN_END = re.compile(r"[,}\]\s]")
_NON_WS = re.compile(r"[^ \t\n\r]")
# a quoted string whose body decodes to itself: no escapes, no control
# chars (json.loads would reject raw control chars — the fast key
# decode must reject exactly the same inputs)
_PLAIN_STR = re.compile(r'^"[^"\\\x00-\x1f]*"$')


class JsonEditError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tolerant scanner
# ---------------------------------------------------------------------------

def _skip_ws(s: str, i: int) -> int:
    # fast path: compact JSON (the normal case) has no inter-token
    # whitespace at all — skip the regex machinery entirely
    if i < len(s) and s[i] not in " \t\n\r":
        return i
    m = _NON_WS.search(s, i)
    return m.start() if m else len(s)


def _scan_string(s: str, i: int) -> int:
    """i points at opening quote; return index just past closing quote."""
    j = i + 1
    while True:
        k = s.find('"', j)
        if k < 0:
            raise JsonEditError("unterminated string")
        b = k - 1
        while b >= 0 and s[b] == "\\":
            b -= 1
        if (k - 1 - b) % 2 == 0:  # even number of preceding backslashes
            return k + 1
        j = k + 1


def _scan_value(s: str, i: int) -> tuple[str, int, int]:
    """Return (kind, start, end) of the value starting at/after i.

    kind in {'object','array','string','number','literal'}.
    """
    i = _skip_ws(s, i)
    n = len(s)
    if i >= n:
        raise JsonEditError("eof scanning value")
    c = s[i]
    if c == "{" or c == "[":
        kind = "object" if c == "{" else "array"
        opener, closer = c, ("}" if c == "{" else "]")
        struct = _OBJ_STRUCT if c == "{" else _ARR_STRUCT
        depth = 0
        j = i
        while True:
            m = struct.search(s, j)
            if m is None:
                raise JsonEditError(f"unterminated {kind}")
            j = m.start()
            cj = s[j]
            if cj == '"':
                j = _scan_string(s, j)
                continue
            if cj == opener:
                depth += 1
            else:  # closer
                depth -= 1
                if depth == 0:
                    return kind, i, j + 1
            j += 1
    if c == '"':
        return "string", i, _scan_string(s, i)
    # number / true / false / null / bare token (tolerant)
    m = _TOKEN_END.search(s, i)
    j = m.start() if m else n
    tok = s[i:j]
    if tok in ("true", "false", "null"):
        return "literal", i, j
    return "number", i, j


def iter_members(s: str, start: int, end: int):
    """Yield (key, key_start, vstart, vend) for object span [start,end).

    Tolerant: missing commas between members are accepted (gjson
    parity for the malformed ItemList fixture).
    """
    i = start + 1  # past '{'
    while True:
        i = _skip_ws(s, i)
        if i >= end - 1 or s[i] == "}":
            return
        if s[i] == ",":
            i += 1
            continue
        if s[i] != '"':
            # tolerate garbage tokens (e.g. `{ INCORRECTSYNTAX }`): skip one
            k, _, j = _scan_value(s, i)
            i = j
            continue
        kstart = i
        kend = _scan_string(s, i)
        raw_key = s[kstart:kend]
        # escape-free keys (the overwhelming case) decode to their own
        # body; _PLAIN_STR rejects exactly what json.loads rejects
        if _PLAIN_STR.match(raw_key):
            key = raw_key[1:-1]
        else:
            key = json.loads(raw_key)
        i = _skip_ws(s, kend)
        if i < end and s[i] == ":":
            _, vstart, vend = _scan_value(s, i + 1)
            yield key, kstart, vstart, vend
            i = vend
        else:
            # bare key with no value; treat as done
            return


def iter_items(s: str, start: int, end: int):
    """Yield (vstart, vend) for array span [start,end). Tolerates
    trailing/missing commas."""
    i = start + 1
    while True:
        i = _skip_ws(s, i)
        if i >= end - 1 or s[i] == "]":
            return
        if s[i] == ",":
            i += 1
            continue
        _, vstart, vend = _scan_value(s, i)
        yield vstart, vend
        i = vend


def _find(s: str, path: list) -> tuple[int, int] | None:
    """Span of the value at path, or None."""
    kind, start, end = _scan_value(s, 0)
    for part in path:
        if isinstance(part, int):
            if kind != "array":
                return None
            found = False
            for idx, (vs, ve) in enumerate(iter_items(s, start, end)):
                if idx == part:
                    kind, start, end = _scan_value(s, vs)
                    found = True
                    break
            if not found:
                return None
        else:
            if kind != "object":
                return None
            found = False
            for key, _ks, vs, ve in iter_members(s, start, end):
                if key == part:
                    kind, start, end = _scan_value(s, vs)
                    found = True
                    break
            if not found:
                return None
    return start, end


def get_raw(s: str, path: list) -> str | None:
    span = _find(s, path)
    return None if span is None else s[span[0]:span[1]]


def get_kind(s: str, path: list) -> str | None:
    span = _find(s, path)
    if span is None:
        return None
    kind, _, _ = _scan_value(s, span[0])
    return kind


def parse_tolerant(s: str, start: int = 0):
    """Build a Python value from a (possibly mildly malformed) span."""
    kind, vs, ve = _scan_value(s, start)
    raw = s[vs:ve]
    if kind == "string":
        return json.loads(raw)
    if kind == "number":
        try:
            return json.loads(raw)
        except Exception:
            return raw
    if kind == "literal":
        return {"true": True, "false": False, "null": None}[raw]
    if kind == "array":
        return [parse_tolerant(s, vs2) for vs2, _ in iter_items(s, vs, ve)]
    out = {}
    for key, _ks, vs2, _ve2 in iter_members(s, vs, ve):
        out[key] = parse_tolerant(s, vs2)
    return out


def get_value(s: str, path: list):
    """Decoded Python value at path (None if absent)."""
    span = _find(s, path)
    if span is None:
        return None
    return parse_tolerant(s, span[0])


def get_members(s: str, path: list) -> dict | None:
    """Object members at path in **source order** (None if not an object).

    Mirrors gjson ``Result.Map()``: non-objects yield an empty map.
    Values are returned as (kind, raw) pairs so callers can mimic
    gjson ``Result.String()`` (raw JSON for objects/arrays, decoded
    text for strings).
    """
    span = _find(s, path)
    if span is None:
        return None
    kind, start, end = _scan_value(s, span[0])
    if kind != "object":
        return {}
    out = {}
    for key, _ks, vs, ve in iter_members(s, start, end):
        k2, s2, e2 = _scan_value(s, vs)
        out[key] = (k2, s[s2:e2])
    return out


def result_string(kind: str, raw: str) -> str:
    """gjson Result.String(): decoded string for strings, raw JSON
    text for objects/arrays/numbers, 'true'/'false'/'' literals."""
    if kind == "string":
        return json.loads(raw)
    if kind == "literal":
        return "" if raw == "null" else raw
    return raw


def set_raw(s: str, path: list, new_raw: str) -> str:
    """sjson.Set equivalent: replace the span at path with new_raw;
    create missing trailing object keys compactly at the end of the
    parent object."""
    # fast path: exists
    span = _find(s, path)
    if span is not None:
        return s[: span[0]] + new_raw + s[span[1]:]
    # walk down to deepest existing parent
    for cut in range(len(path) - 1, -1, -1):
        parent_path = path[:cut]
        pspan = _find(s, parent_path) if parent_path else (0, len(s))
        if pspan is None:
            continue
        kind, pstart, pend = _scan_value(s, pspan[0])
        if kind != "object":
            raise JsonEditError(f"cannot set under non-object at {parent_path}")
        # build nested raw for the missing tail
        tail = path[cut:]
        raw = new_raw
        for key in reversed(tail[1:]):
            raw = "{" + go_marshal(key) + ":" + raw + "}"
        first_key = tail[0]
        if not isinstance(first_key, str):
            raise JsonEditError("array element insertion unsupported")
        # is object empty?
        has_member = any(True for _ in iter_members(s, pstart, pend))
        insert = go_marshal(first_key) + ":" + raw
        if has_member:
            insert = "," + insert
        return s[: pend - 1] + insert + s[pend - 1:]
    raise JsonEditError(f"no parent object found for {path}")


# ---------------------------------------------------------------------------
# Go encoding/json-compatible marshalling
# ---------------------------------------------------------------------------

_GO_ESCAPES = {
    '"': '\\"', "\\": "\\\\", "\n": "\\n", "\r": "\\r", "\t": "\\t",
    "<": "\\u003c", ">": "\\u003e", "&": "\\u0026",
    " ": "\\u2028", " ": "\\u2029",
}


def _go_string(s: str) -> str:
    out = ['"']
    for ch in s:
        esc = _GO_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def sjson_string(s: str) -> str:
    """JSON string as tidwall/sjson writes plain Go strings
    (gjson.AppendJSONString): escapes quotes/backslash/control chars
    and U+2028/2029, but — unlike Go json.Marshal — does NOT escape
    HTML characters (< > &)."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        elif ch in (" ", " "):
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _go_float(f: float) -> str:
    # Go encoding/json: strconv.AppendFloat(..., 'g'-like with size
    # heuristics); integral floats print without a decimal point.
    if math.isnan(f) or math.isinf(f):
        raise JsonEditError("json: unsupported float value")
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    r = repr(f)
    if "e" in r or "E" in r:
        # Go uses e notation with no leading zeros in exponent
        mant, _, exp = r.partition("e")
        return f"{mant}e{int(exp):+d}".replace("e+", "e+").replace("e-", "e-")
    return r


def go_marshal(v: Any) -> str:
    """Compact JSON identical to Go ``json.Marshal`` for the value
    shapes that appear in JSON-LD documents (maps get sorted keys)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return _go_string(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _go_float(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(go_marshal(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: kv[0])
        return "{" + ",".join(_go_string(k) + ":" + go_marshal(val) for k, val in items) + "}"
    raise JsonEditError(f"unsupported type {type(v)}")
