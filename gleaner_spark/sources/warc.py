"""WARC/WET ingestion source: Common-Crawl-style web archives → the
pages table (sources/corpus.PAGES_SCHEMA).

BASELINE.json's north star is a harvester over "Common-Crawl-style"
pages; CC's native interchange format is WARC (ISO 28500): a
concatenation of records, each a `WARC/1.x` header block, a CRLFCRLF
blank line, `Content-Length` bytes of payload, and a CRLFCRLF record
separator. This module reads those files into the exact pages schema
the rest of the engine consumes, so a user can point the harvest at a
crawl archive instead of a parquet table:

- ``response`` records (WARC files): the payload is a full HTTP
  response; the HTTP status line and headers are stripped, chunked
  transfer framing and gzip/deflate content codings are undone
  (WARC stores the wire bytes), 2xx bodies land in ``html`` and the
  HTTP ``Content-Type`` in ``content_type``. Non-2xx responses are
  dropped (the fetch operator's success semantics — only 200-class
  bodies are summoned, acquire.go's resp.StatusCode handling).
- ``conversion`` records (WET files): CC's extracted-text sidecars;
  the payload lands in ``text`` (the column the headless fallback
  reads), ``html`` stays null.
- ``warcinfo`` / ``request`` / ``metadata`` records are skipped.
- ``WARC-Identified-Content-Language`` (the CC language annotation)
  populates ``lang`` when present, first subtag only.

Spark shape — designed for the real corpus, not the fixture:
``spark.read.format("binaryFile")`` yields ONE ROW PER FILE (path,
content), which matches how Common Crawl ships WARCs (independent
~1 GB objects, gzipped per record so members concatenate): the unit
of parallelism is the archive file, exactly the layout a 100 TB crawl
has (10^5 files → 10^5 independent tasks, no shuffle). Parsing runs
in ``mapInPandas`` (Arrow-batched, no per-row Python UDF); each task
holds one file's bytes plus one decompressed record at a time —
records are decoded member-by-member (streaming ``zlib``), never the
whole archive at once, and output is yielded in bounded chunks so a
million-record archive can't build one giant Arrow batch. Downstream
should ``repartition`` by url hash if per-record balance matters
(the harvest's fetch join already does).

Writer utilities (``build_warc_bytes`` / ``write_warc_file``) build
spec-shaped archives from pages rows — the differential fixture for
tests (pages → WARC → read_warc == pages) and a local interop path.
They emit the response record and, when a row has ``text``, a paired
conversion record (WARC+WET collapsed into one archive; real CC
ships them as sibling files, which read identically here since the
reader keys on record type, not file name).

Reference parity note: the reference ingests sitemaps over live HTTP
only (internal/summoner/acquire/resources.go) and has no archive
reader; this source is part of the beyond-reference surface that
makes the engine consumable at Common-Crawl scale (SURVEY "Round-5
updates"; the reference's source-type inventory is SURVEY §2.2
"Scans/sources/sinks").
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import zlib
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GZIP_MAGIC = b"\x1f\x8b"
_SEP = b"\r\n\r\n"
# output chunking: bound the Arrow batch a single archive emits
_CHUNK_RECORDS = 256


# ---------------------------------------------------------------------------
# byte-level parsing (pure functions; unit-testable without Spark)
# ---------------------------------------------------------------------------


def _iter_member_bytes(data: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members from a concatenated-member
    stream (CC gzips each record as its own member so HTTP range
    reads work). Plain (non-gzip) input yields itself once. Streaming
    zlib keeps peak memory at one member, not the whole archive."""
    if not data.startswith(_GZIP_MAGIC):
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data[pos:])
        except zlib.error:
            return  # corrupt/truncated tail: keep what decoded so far
        yield member
        tail = d.unused_data
        if not tail or len(tail) >= len(data) - pos:
            break  # no progress guard: never loop on undecodable bytes
        pos = len(data) - len(tail)


def _parse_header_block(block: bytes) -> dict[str, str]:
    """WARC or HTTP header lines → lowercased-name dict. Tolerates
    bare-LF line endings; later duplicates win (none matter here)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\n")[1:]:  # [0] is the version/status line
        line = line.strip(b"\r")
        if not line or b":" not in line:
            continue
        name, _, val = line.partition(b":")
        headers[name.strip().lower().decode("latin-1")] = (
            val.strip().decode("latin-1", "replace")
        )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, payload_block) per record from one
    decompressed WARC segment (a whole plain file, or one gzip
    member). Records a malformed tail can't complete are dropped —
    crawl archives truncate at object boundaries and a reader that
    throws would poison the whole task (the reference's
    log-and-continue error posture, S34)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_SEP, start)
        if hdr_end < 0:
            return
        headers = _parse_header_block(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + len(_SEP)
        if body_start + length > n:
            return  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Decode a ``Transfer-Encoding: chunked`` HTTP body (hex-size
    line, CRLF, chunk bytes, CRLF, …, 0-chunk; trailers ignored).
    Malformed framing returns the bytes decoded so far plus nothing —
    never raises (log-and-continue posture, S34)."""
    out = io.BytesIO()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            break  # torn chunk
        out.write(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF
    return out.getvalue()


def _decode_body(headers: dict[str, str], body: bytes) -> bytes:
    """Undo transfer/content codings a real crawl's raw-HTTP capture
    carries (WARC stores the wire bytes): chunked framing first, then
    gzip/deflate content encoding. Unknown or broken codings keep the
    raw bytes — a wrong-but-present body beats a dropped capture."""
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").strip().lower()
    if enc in ("gzip", "x-gzip", "deflate"):
        try:
            if enc == "deflate":
                try:
                    body = zlib.decompress(body)
                except zlib.error:  # raw-deflate servers (no zlib wrapper)
                    body = zlib.decompress(body, wbits=-15)
            else:
                body = zlib.decompress(body, wbits=31)
        except zlib.error:
            pass  # keep raw bytes
    return body


def _split_http_payload(block: bytes) -> tuple[int, str | None, bytes]:
    """HTTP response payload → (status, content_type, body). A block
    that isn't an HTTP message (identity payloads) passes through as
    status 200 with no type. Chunked framing and gzip/deflate content
    codings are undone (see _decode_body)."""
    if not block.startswith(b"HTTP/"):
        return 200, None, block
    end = block.find(_SEP)
    if end < 0:
        # headers only / torn payload: no body
        return 0, None, b""
    head = block[:end]
    status_line = head.split(b"\n", 1)[0].strip(b"\r")
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = 0
    http_headers = _parse_header_block(head)
    body = _decode_body(http_headers, block[end + len(_SEP):])
    return status, http_headers.get("content-type"), body


def _parse_warc_date(v: str | None) -> dt.datetime | None:
    if not v:
        return None
    try:
        # WARC-Date is ISO 8601 UTC ("2024-01-01T00:00:05Z",
        # optionally fractional); keep it naive-UTC like the corpus
        d = dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        return d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def pages_rows_from_archive(data: bytes) -> Iterator[dict]:
    """All pages rows (PAGES_SCHEMA field dicts) in one archive's raw
    bytes (gzipped or plain)."""
    for member in _iter_member_bytes(data):
        for headers, block in iter_warc_records(member):
            rtype = headers.get("warc-type", "")
            url = headers.get("warc-target-uri", "").strip("<>")
            if not url:
                continue
            ts = _parse_warc_date(headers.get("warc-date"))
            lang = headers.get("warc-identified-content-language")
            lang = lang.split(",")[0].strip() or None if lang else None
            if rtype == "response":
                status, ctype, body = _split_http_payload(block)
                if not 200 <= status < 300:
                    continue
                yield {
                    "url": url, "warc_ts": ts, "html": body, "text": None,
                    "lang": lang, "content_type": ctype,
                }
            elif rtype == "conversion":
                yield {
                    "url": url, "warc_ts": ts, "html": None,
                    "text": block.decode("utf-8", "replace"),
                    "lang": lang,
                    "content_type": headers.get("content-type"),
                }
            # warcinfo/request/metadata: not page content


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """Archive files under ``path`` → pages DataFrame (one row per
    response/conversion record). One task per file — the CC layout's
    natural parallelism; see module docstring for the memory shape."""
    from .corpus import PAGES_SCHEMA

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in batches:
            for data in pdf["content"]:
                chunk: list[dict] = []
                for row in pages_rows_from_archive(bytes(data)):
                    chunk.append(row)
                    if len(chunk) >= _CHUNK_RECORDS:
                        yield pd.DataFrame(chunk, columns=cols)
                        chunk = []
                if chunk:
                    yield pd.DataFrame(chunk, columns=cols)

    return files.mapInPandas(parse, PAGES_SCHEMA)


def combine_warc_wet(pages: DataFrame) -> DataFrame:
    """Merge response (html) and conversion (text) rows for the same
    capture into single pages rows — the WARC+WET pairing. Keyed on
    (url, warc_ts): CC's WET record carries its WARC record's
    original date, so the pair co-groups; re-crawls of a url remain
    distinct captures. One hash exchange; max() per column is exact
    because each side is null on the other's rows."""
    return pages.groupBy("url", "warc_ts").agg(
        F.max("html").alias("html"),
        F.max("text").alias("text"),
        F.max("lang").alias("lang"),
        # the page's content type is the RESPONSE record's (the WET
        # conversion is always text/plain); fall back for text-only rows
        F.coalesce(
            F.max(F.when(F.col("html").isNotNull(), F.col("content_type"))),
            F.max("content_type"),
        ).alias("content_type"),
    ).select("url", "warc_ts", "html", "text", "lang", "content_type")


# ---------------------------------------------------------------------------
# writer (fixtures + local interop)
# ---------------------------------------------------------------------------


def _record(rtype: str, url: str, ts: dt.datetime | None,
            payload: bytes, content_type: str,
            extra: dict[str, str] | None = None) -> bytes:
    ts = ts or dt.datetime(1970, 1, 1)
    rid = hashlib.md5(f"{rtype}|{url}|{ts.isoformat()}".encode()).hexdigest()
    lines = [
        "WARC/1.1",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}",
        f"WARC-Target-URI: {url}",
        f"Content-Type: {content_type}",
        f"Content-Length: {len(payload)}",
    ]
    for k, v in (extra or {}).items():
        lines.append(f"{k}: {v}")
    head = "\r\n".join(lines).encode("utf-8")
    return head + _SEP + payload + _SEP


def build_warc_bytes(rows: Iterable[dict], gzip_members: bool = False) -> bytes:
    """Pages rows (dicts with PAGES_SCHEMA fields) → archive bytes.
    ``gzip_members`` emits one gzip member per record (the CC wire
    layout); plain concatenation otherwise."""
    out = io.BytesIO()
    for r in rows:
        recs: list[bytes] = []
        lang = {"WARC-Identified-Content-Language": r["lang"]} if r.get("lang") else None
        if r.get("html") is not None:
            ctype = r.get("content_type") or "text/html"
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(r['html'])}\r\n\r\n"
            ).encode("latin-1") + bytes(r["html"])
            recs.append(_record(
                "response", r["url"], r.get("warc_ts"), http,
                "application/http; msgtype=response", lang,
            ))
        if r.get("text") is not None:
            recs.append(_record(
                "conversion", r["url"], r.get("warc_ts"),
                r["text"].encode("utf-8"), "text/plain", lang,
            ))
        for rec in recs:
            out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return out.getvalue()


def write_warc_file(rows: Iterable[dict], path: str,
                    gzip_members: bool | None = None) -> None:
    if gzip_members is None:
        gzip_members = path.endswith(".gz")
    with open(path, "wb") as f:
        f.write(build_warc_bytes(rows, gzip_members=gzip_members))
