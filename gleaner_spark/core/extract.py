"""Byte-identical JSON-LD extraction from fetched pages.

Re-expresses FindJSONInResponse
(/root/reference/internal/summoner/acquire/acquire.go:220-262):

- JSON responses (Content-Type contains ``application/ld+json`` or
  ``application/json``, or URL path ends ``.json``/``.jsonld``): the
  *text* of the whole parsed document is the single candidate
  (acquire.go:240-247, goquery ``doc.Text()``).
- otherwise: every ``<script>`` whose ``type`` attribute *starts
  with* ``application/ld+json`` (CSS ``^=`` prefix match,
  acquire.go:252) contributes its raw text content, in document
  order.

Each candidate passes through ``add_to_json_list_if_valid``
(fixups.py) which reproduces the validity / graph-array-split rules.

Script element content is CDATA in both Go's net/html and Python's
html.parser, so the extracted bytes are identical to the reference —
this is the per-row byte-identity invariant from BASELINE.json.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urlparse

from .fixups import add_to_json_list_if_valid

JSON_CONTENT_TYPE = "application/ld+json"
EARTHCUBE_AGENT = "EarthCube_DataBot/1.0"  # acquire.go:20


class _ScriptAndTextCollector(HTMLParser):
    """Single pass collecting (a) full-document text à la goquery
    doc.Text() and (b) the raw content of matching script tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.scripts: list[str] = []  # matching script contents, doc order
        self._script_depth = 0
        self._script_matches = False
        self._script_buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            self._script_depth += 1
            if self._script_depth == 1:
                type_attr = dict(attrs).get("type") or ""
                self._script_matches = type_attr.startswith(JSON_CONTENT_TYPE)
                self._script_buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._script_depth > 0:
            self._script_depth -= 1
            if self._script_depth == 0 and self._script_matches:
                self.scripts.append("".join(self._script_buf))
                self._script_matches = False

    def handle_data(self, data):
        self.text_parts.append(data)
        if self._script_depth > 0:
            self._script_buf.append(data)

    @property
    def full_text(self) -> str:
        return "".join(self.text_parts)


import html.parser as _hp
import re as _re

# html.parser's CDATA-exit pattern for <script>: "</" + optional ws +
# "script" (set_cdata_mode); the real end tag additionally needs
# optional ws + ">" (endtagfind) — a longer name ("</scriptx>") is
# data and CDATA continues (parse_endtag's cdata_elem check)
_CLOSE_RE = _re.compile(r"</\s*script", _re.IGNORECASE)
_NAME_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-.:_")
_WS = " \t\n\r\f"


def _attrs_of(blob: str) -> dict | None:
    """Attribute dict of a start-tag interior, byte-compatible with
    html.parser.parse_starttag (same attrfind_tolerant regex, same
    lowercasing, same quote stripping, last-duplicate-wins via dict).
    None when the blob has leftovers the regex can't consume or any
    '&' (the parser would entity-unescape) — caller falls back."""
    if "&" in blob:
        return None
    attrs: dict[str, str | None] = {}
    # skip the same (?:\s|/(?!>))* run tagfind_tolerant's tail eats, so
    # attrfind's [\'"\s/] lookbehind has its preceding char in range
    k = _re.match(r"(?:\s|/(?!>))*", blob).end()
    while k < len(blob):
        m = _hp.attrfind_tolerant.match(blob, k)
        if not m:
            break
        name, rest, value = m.group(1, 2, 3)
        if not rest:
            value = None
        elif value[:1] == "'" == value[-1:] or value[:1] == '"' == value[-1:]:
            value = value[1:-1]
        attrs[name.lower()] = value
        k = m.end()
    if blob[k:].strip():
        return None  # junk / self-closing slash: let the parser decide
    return attrs


def _fast_scripts(body: str) -> list[str] | None:
    """Matching-script extraction by linear scan — returns None
    whenever the input contains any construct whose html.parser
    semantics the scan doesn't model bit-exactly (comments, PIs,
    declarations/doctypes, <style> CDATA, self-closing or unterminated
    scripts, entity refs in attributes, NULs). One-sided by design:
    a non-None result is byte-identical to _ScriptAndTextCollector
    (differential-tested); every uncertain shape falls back.

    Why: the stdlib parser walk is ~half the per-doc harvest kernel;
    the common crawl-page shape (plain tags + <script> islands) needs
    only C-level find/regex jumps. Script content is CDATA in
    html.parser — emitted verbatim, no charref conversion — so the
    slice IS the parser's output."""
    low = body.lower()
    if "<script" not in low:
        return []
    for guard in ("<!", "<?", "<style", "\x00"):
        if guard in low:
            return None
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        j = body.find("<", i)
        if j == -1:
            break
        nxt = body[j + 1:j + 2]
        if nxt == "/":
            # stray end tag outside CDATA (ignored by the collector at
            # depth 0) — but ONLY the parser's well-formed endtagfind
            # shape; bogus end tags get partially re-parsed by
            # html.parser, so anything else falls back
            m = _hp.endtagfind.match(body, j)
            if m is None:
                return None
            i = m.end()
            continue
        if not ("a" <= nxt <= "z" or "A" <= nxt <= "Z"):
            # html.parser's starttagopen is ASCII-only ('<[a-zA-Z]');
            # '<' + a non-ASCII letter is data, NOT a tag — str.isalpha
            # would wrongly consume e.g. '<п ...>' as a tag and skip
            # real scripts hidden in its quoted attrs
            i = j + 1  # bare "<" is data
            continue
        # generic start tag: name, then quote-respecting scan to ">"
        k = j + 1
        while k < n and body[k] not in "\t\n\r\f />":
            k += 1
        name = body[j + 1:k].lower()
        p, quote, tag_end = k, None, -1
        while p < n:
            ch = body[p]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "\"'":
                quote = ch
            elif ch == ">":
                tag_end = p
                break
            elif ch == "<":
                return None  # malformed tag: parser treats as data
            p += 1
        if tag_end == -1:
            return None  # unterminated tag
        blob = body[k:tag_end]
        # EVERY tag's attr blob must be fully regex-consumable, or the
        # quote-respecting scan may disagree with the parser about
        # where the tag ends (e.g. a quote opened mid-bare-value)
        attrs = _attrs_of(blob)
        if attrs is None:
            return None
        if name != "script":
            i = tag_end + 1  # quoted '<'/'<script' inside attrs skipped
            continue
        if blob.rstrip().endswith("/"):
            return None  # self-closing <script/>: no CDATA mode
        # CDATA: runs to the first real "</script" end tag
        pos = tag_end + 1
        close = None
        while True:
            m = _CLOSE_RE.search(body, pos)
            if m is None:
                return None  # unterminated CDATA
            q = m.end()
            if q < n and body[q] in _NAME_CHARS:
                pos = q  # "</scriptx": data, CDATA continues
                continue
            while q < n and body[q] in _WS:
                q += 1
            if q >= n or body[q] != ">":
                return None  # "</script foo>": parser-specific, punt
            close = (m.start(), q)
            break
        type_attr = attrs.get("type") or ""
        if type_attr.startswith(JSON_CONTENT_TYPE):
            out.append(body[tag_end + 1:close[0]])
        i = close[1] + 1
    return out


def file_extension_is_json(raw_url: str) -> bool:
    """acquire.go:298-304."""
    # without query/fragment/params the url ends with its path, so the
    # suffix test needs no urlparse — the hot path for html pages
    if "?" not in raw_url and "#" not in raw_url and ";" not in raw_url:
        if not (raw_url.endswith(".json") or raw_url.endswith(".jsonld")):
            return False
    try:
        path = urlparse(raw_url).path
    except ValueError:
        return False
    return path.endswith(".json") or path.endswith(".jsonld")


def content_type_is_json(content_type: str | None) -> bool:
    """acquire.go:240 (header 'contains' match)."""
    if not content_type:
        return False
    return JSON_CONTENT_TYPE in content_type or "application/json" in content_type


def find_jsonld_in_page(url: str, content_type: str | None, body: bytes | str) -> list[str]:
    """The reference's per-page extraction: list of JSON-LD strings."""
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    jsonlds: list[str] = []
    if content_type_is_json(content_type) or file_extension_is_json(url):
        # goquery doc.Text() of a markup-free body IS the body: no
        # tags to strip, no charrefs to convert — skip the parse
        if "<" not in body and "&" not in body:
            return add_to_json_list_if_valid(jsonlds, body)
        collector = _ScriptAndTextCollector()
        try:
            collector.feed(body)
            collector.close()
        except Exception:  # noqa: BLE001 - parser must never kill the batch
            return []
        return add_to_json_list_if_valid(jsonlds, collector.full_text)
    scripts = _fast_scripts(body)
    if scripts is None:
        collector = _ScriptAndTextCollector()
        try:
            collector.feed(body)
            collector.close()
        except Exception:  # noqa: BLE001 - parser must never kill the batch
            return []
        scripts = collector.scripts
    for script_text in scripts:
        jsonlds = add_to_json_list_if_valid(jsonlds, script_text)
    return jsonlds


def extract_from_text_fallback(text: str | None) -> list[str]:
    """Headless-fallback semantics (SURVEY §2 S30): when static
    extraction finds nothing, re-extract from the pre-rendered
    ``text`` column of the pages table."""
    if not text:
        return []
    jsonlds: list[str] = []
    scripts = _fast_scripts(text)
    if scripts is None:
        collector = _ScriptAndTextCollector()
        try:
            collector.feed(text)
            collector.close()
        except Exception:  # noqa: BLE001
            return []
        scripts = collector.scripts
    for script_text in scripts:
        jsonlds = add_to_json_list_if_valid(jsonlds, script_text)
    if not jsonlds:
        jsonlds = add_to_json_list_if_valid(jsonlds, text)
    return jsonlds
