"""URL-level corpus filtering (C4/RefinedWeb-style) for crawl
pipelines: drop frontier or document URLs by scheme, blocked host
suffix, or blocked path/query keyword — the cheap pre-fetch hygiene
pass every web-scale corpus applies before spending politeness budget
on a page (RefinedWeb §3.1 "URL filtering"; C4 used a word blocklist
over the URL).

Beyond-reference (SURVEY §2.4): the reference crawls curated sitemap
seed lists and has no URL blocklist stage; at Common-Crawl frontier
scale one is mandatory.

Scale shape: pure column expressions over literal lists — ZERO
exchanges, no UDFs, whole-stage codegen, and the resulting filter is
eligible for scan pushdown when the URL column is stored. Host
extraction is a single regexp (scheme://authority), deliberately
engine-portable so the driver's DuckDB oracle replays it verbatim.

Composition: apply to the frontier BEFORE politeness scheduling
(operators/frontier.py) so blocked URLs never consume a fetch lane,
or to a harvested documents table for retroactive cleanup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://authority — authority ends at the first /, ?, or #
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_SCHEME_RE = r"^([a-z][a-z0-9+.-]*)://"
_TAIL_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$"


def url_block_reason(
    url_col: str = "url",
    blocked_hosts: tuple[str, ...] = (),
    blocked_words: tuple[str, ...] = (),
    keep_schemes: tuple[str, ...] = ("http", "https"),
) -> Column:
    """First matching block reason for a URL — 'scheme', 'host',
    'word', or NULL when the URL passes. Hosts block by exact match
    or dot-suffix (blocking 'ads.example' blocks 'x.ads.example' but
    never 'bads.example'); words match anywhere in the lowercased
    path+query+fragment, never in the host."""
    u = F.lower(F.col(url_col))
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    host = F.regexp_extract(u, _HOST_RE, 1)
    tail = F.regexp_extract(u, _TAIL_RE, 1)
    scheme_ok = scheme.isin(*[s.lower() for s in keep_schemes])
    host_hit = F.lit(False)
    for h in blocked_hosts:
        h = h.lower()
        host_hit = host_hit | (host == h) | host.endswith("." + h)
    word_hit = F.lit(False)
    for w in blocked_words:
        word_hit = word_hit | tail.contains(w.lower())
    return (
        F.when(~scheme_ok, F.lit("scheme"))
        .when(host_hit, F.lit("host"))
        .when(word_hit, F.lit("word"))
        .otherwise(F.lit(None).cast("string"))
    )


def annotate_urls(
    df: DataFrame,
    blocked_hosts: tuple[str, ...] = (),
    blocked_words: tuple[str, ...] = (),
    url_col: str = "url",
    keep_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Add ``url_block_reason`` (NULL = keep) without dropping rows —
    the auditable form (count blocks per reason before committing a
    blocklist to a 10^10-URL frontier)."""
    return df.withColumn(
        "url_block_reason",
        url_block_reason(url_col, blocked_hosts, blocked_words, keep_schemes),
    )


def filter_urls(
    df: DataFrame,
    blocked_hosts: tuple[str, ...] = (),
    blocked_words: tuple[str, ...] = (),
    url_col: str = "url",
    keep_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Keep only rows whose URL passes the scheme allowlist and both
    blocklists (see ``url_block_reason``)."""
    return df.filter(
        url_block_reason(
            url_col, blocked_hosts, blocked_words, keep_schemes
        ).isNull()
    )
