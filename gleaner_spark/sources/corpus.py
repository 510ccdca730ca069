"""Deterministic synthetic crawl corpus (pages/sitemaps/robots/sources).

Builds the ``pages`` table from BASELINE.json's input_hint —
``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string`` — plus matching sitemap XML, robots.txt bodies and a
source config, per FIXTURES.md. Everything is a pure function of the
row index (seedless determinism), generated *distributed* via
``mapInPandas`` over ``spark.range`` so corpus size scales with the
cluster, not the driver.

Page shapes cycle to exercise every FindJSONInResponse branch
(acquire.go:220-262): single script, multi script, charset-suffixed
type attr, zero scripts, raw .json/.jsonld bodies, invalid JSON,
top-level graph arrays; JSON-LD payloads cycle through the fixup
branches (string/array/http/no-vocab contexts, relative @id).
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import Source

N_SOURCES = 5
HOSTS = [f"https://geo{i}.example.org" for i in range(N_SOURCES)]
SOURCE_NAMES = [f"src{i}" for i in range(N_SOURCES)]

# ---------------------------------------------------------------------------
# per-row payload / page construction (pure functions of the index)
# ---------------------------------------------------------------------------


def _ident_index(i: int) -> int:
    """Pages with i ≡ 16 (mod 20) reuse the identifier of the page 5
    earlier — same source (both ≡ 1 mod 5 → src1, the identifiersha
    source), different content. Exercises the reference's UniqueId
    collapse: objects are named by identifier.UniqueId
    (jsonutils.go:355-357), so two documents sharing
    ``$.identifier.value`` store once but prov twice (the 265/266
    asymmetry pinned by root_internal_test.go:135-147)."""
    return i - 5 if i % 20 == 16 else i


def _payload(i: int) -> str:
    """A JSON-LD document whose @context shape cycles through the
    fixup-exercising variants."""
    variant = i % 5
    name = f"Dataset number {i}"
    ident = f"https://doi.example.org/10.5555/{_ident_index(i)}"
    if variant == 0:  # canonical https object context
        ctx = '{"@vocab":"https://schema.org/"}'
    elif variant == 1:  # string context → fixContextString
        ctx = '"http://schema.org/"'
    elif variant == 2:  # array context → fixContextArray
        ctx = '["https://schema.org/",{"NAME":"schema:name"}]'
    elif variant == 3:  # http, no trailing slash → fixContextUrl
        ctx = '{"@vocab":"http://schema.org"}'
    else:  # no @vocab → fixContextUrl insertion
        ctx = '{"schema":"http://schema.org/"}'
    at_id = f"item-{i}" if i % 7 == 3 else f"https://geo{i % N_SOURCES}.example.org/id/{i}"
    return (
        '{"@context":%s,"@type":"Dataset","@id":"%s",'
        '"name":"%s","identifier":{"@type":"PropertyValue","value":"%s"},'
        '"description":"synthetic record %d for the harvest corpus"}'
        % (ctx, at_id, name, ident, i)
    )


def url_for(i: int) -> str:
    host = HOSTS[i % N_SOURCES]
    if i % 13 == 5:
        return f"{host}/data/item{i}.jsonld"  # whole-body extraction path
    if i % 13 == 9:
        return f"{host}/data/item{i}.json"
    if i % 13 == 10:
        return f"{host}/api/record/{i}"  # EXTENSIONLESS; ld+json header
    if i % 13 == 12:
        return f"{host}/api/data/{i}"  # EXTENSIONLESS; application/json header
    if i % 29 == 11:
        return f"{host}/private/item{i}"  # robots-disallowed
    return f"{host}/items/item{i}"


def page_shape(i: int) -> str:
    if i % 13 in (5, 9):
        return "raw_json"
    if i % 13 in (10, 12):
        # JSON-LD at an extensionless URL: only the Content-Type
        # header's contains-check (acquire.go:240) selects whole-body
        # extraction — the jsonProfile use case (sources.go:69)
        return "profile_json"
    if i % 17 == 2:
        return "invalid_json"
    if i % 11 == 4:
        return "graph_array"
    if i % 13 == 7:
        return "zero_scripts"
    if i % 13 == 3:
        return "two_scripts"
    if i % 13 == 6:
        return "charset_type"
    return "single_script"


def html_for(i: int) -> tuple[str, str]:
    """(html, text) for row i."""
    shape = page_shape(i)
    doc = _payload(i)
    if shape in ("raw_json", "profile_json"):
        return doc, doc
    if shape == "invalid_json":
        body = '<script type="application/ld+json">{ INCORRECTSYNTAX }</script>'
    elif shape == "graph_array":
        arr = "[%s,%s]" % (doc, _payload(i + 1_000_000))
        body = f'<script type="application/ld+json">{arr}</script>'
    elif shape == "zero_scripts":
        body = f"<p>No structured data on page {i}</p>"
    elif shape == "two_scripts":
        body = (
            f'<script type="application/ld+json">{doc}</script>'
            f'<div>divider</div>'
            f'<script type="application/ld+json">{_payload(i + 2_000_000)}</script>'
        )
    elif shape == "charset_type":
        body = f'<script type="application/ld+json;charset=utf-8">{doc}</script>'
    else:
        body = f'<script type="application/ld+json">{doc}</script>'
    html = (
        f"<html><head><title>Item {i}</title></head>"
        f"<body><h1>Item {i}</h1>{body}</body></html>"
    )
    text = f"Item {i} synthetic page text"
    return html, text


def content_type_for(i: int) -> str:
    """The Content-Type header the server would send for page i
    (stored alongside the body, as a WARC-derived corpus would)."""
    s = page_shape(i)
    if s == "raw_json":
        return "application/ld+json" if i % 13 == 5 else "application/json"
    if s == "profile_json":
        # one variant per branch of the reference contains-check
        return (
            "application/ld+json; charset=utf-8"
            if i % 13 == 10
            else "application/json; charset=utf-8"
        )
    return "text/html; charset=utf-8"


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
    ]
)

_EPOCH = dt.datetime(2024, 1, 1)


def build_pages(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of the pages table."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                    "lang": [], "content_type": []}
            for i in idx:
                i = int(i)
                html, text = html_for(i)
                rows["url"].append(url_for(i))
                rows["warc_ts"].append(_EPOCH + dt.timedelta(seconds=i))
                rows["html"].append(html.encode("utf-8"))
                rows["text"].append(text)
                rows["lang"].append("en" if i % 10 else "de")
                rows["content_type"].append(content_type_for(i))
            yield pd.DataFrame(rows)

    return spark.range(0, n_pages, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# sitemaps / robots / sources (small, driver-side by construction)
# ---------------------------------------------------------------------------


def build_sitemaps(n_pages: int) -> dict[str, str]:
    """sitemap_url → XML. One sitemap per source listing its URLs in
    index order; every 8th loc gets dirty whitespace to exercise
    normalization (resources.go:156-168)."""
    per_source: dict[str, list[str]] = {name: [] for name in SOURCE_NAMES}
    for i in range(n_pages):
        loc = url_for(i)
        if i % 8 == 1:
            loc = f"  {loc}\n "  # trim + strip exercise
        per_source[SOURCE_NAMES[i % N_SOURCES]].append(loc)
    out = {}
    for k, name in enumerate(SOURCE_NAMES):
        entries = "\n".join(
            f"  <url><loc>{loc}</loc><lastmod>2024-01-01</lastmod></url>"
            for loc in per_source[name]
        )
        out[f"{HOSTS[k]}/sitemap.xml"] = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            f"{entries}\n</urlset>\n"
        )
    return out


def build_robots() -> dict[str, str]:
    """host → robots.txt body. src0 carries the reference's canonical
    fixture rules + a Crawl-delay; src3 404s (no entry) — crawl
    proceeds without robots (resources.go:51-57)."""
    out = {}
    for k, host in enumerate(HOSTS):
        if k == 3:
            continue  # simulated 404
        delay = "Crawl-delay: 10\n" if k == 0 else ""
        out[host] = (
            "User-agent: *\n"
            "Disallow: /cgi-bin\n"
            "Disallow: /private/\n"
            f"{delay}"
            f"Sitemap: {host}/sitemap.xml\n"
        )
    return out


def build_sources() -> list[Source]:
    return [
        Source(
            name=SOURCE_NAMES[k],
            # robots-type sources point at robots.txt and walk its
            # Sitemap: entries (resources.go:81-115)
            url=f"{HOSTS[k]}/robots.txt" if k == 4 else f"{HOSTS[k]}/sitemap.xml",
            source_type="robots" if k == 4 else "sitemap",
            pid=f"https://pid.example.org/org/{k}",
            proper_name=f"Example Organization {k}",
            domain=HOSTS[k],
            delay_ms=500 if k == 2 else 0,
            identifier_path="$.identifier.value" if k == 1 else "",
            identifier_type="identifiersha" if k == 1 else "jsonsha",
        )
        for k in range(N_SOURCES)
    ]


def expected_documents_for_page(i: int) -> list[str]:
    """Independent per-page oracle for tests: the JSON-LD strings the
    reference would extract from page i (before fixups)."""
    from ..core.extract import find_jsonld_in_page

    html, _ = html_for(i)
    url = url_for(i)
    return find_jsonld_in_page(url, content_type_for(i), html)
