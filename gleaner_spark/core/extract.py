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


def file_extension_is_json(raw_url: str) -> bool:
    """acquire.go:298-304."""
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
    collector = _ScriptAndTextCollector()
    try:
        collector.feed(body)
        collector.close()
    except Exception:  # noqa: BLE001 - parser must never kill the batch
        return []
    jsonlds: list[str] = []
    if content_type_is_json(content_type) or file_extension_is_json(url):
        jsonlds = add_to_json_list_if_valid(jsonlds, collector.full_text)
    else:
        for script_text in collector.scripts:
            jsonlds = add_to_json_list_if_valid(jsonlds, script_text)
    return jsonlds


def extract_from_text_fallback(text: str | None) -> list[str]:
    """Headless-fallback semantics (SURVEY §2 S30): when static
    extraction finds nothing, re-extract from the pre-rendered
    ``text`` column of the pages table."""
    if not text:
        return []
    jsonlds: list[str] = []
    collector = _ScriptAndTextCollector()
    try:
        collector.feed(text)
        collector.close()
    except Exception:  # noqa: BLE001
        return []
    for script_text in collector.scripts:
        jsonlds = add_to_json_list_if_valid(jsonlds, script_text)
    if not jsonlds:
        jsonlds = add_to_json_list_if_valid(jsonlds, text)
    return jsonlds
