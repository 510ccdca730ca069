"""Sitemap / sitemap-index XML parsing.

Mirrors /root/reference/internal/summoner/sitemaps/sitemap.go: only
``loc`` is consumed downstream (lastmod parsed but ignored for
recrawl, docs/docs.md:42); document order is preserved — Gleaner's
frontier keeps sitemap order (resources.go:156-168) which becomes the
explicit ``position`` column here.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass


class SitemapParseError(ValueError):
    pass


@dataclass
class SitemapURL:
    loc: str
    lastmod: str = ""
    changefreq: str = ""
    priority: float = 0.0


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _child_text(elem, name: str) -> str:
    for child in elem:
        if _local(child.tag) == name:
            return (child.text or "")
    return ""


def looks_like_index(xml_text: str) -> bool:
    """Cheap root-tag sniff so huge <urlset> docs aren't fully parsed
    twice (index check then sitemap parse) on the driver."""
    head = xml_text[:4096]
    return "<sitemapindex" in head or ":sitemapindex" in head


def parse_sitemap_index(xml_text: str) -> list[str]:
    """<sitemapindex> → child sitemap locs (trimmed). Empty list when
    the doc is a plain <urlset> (GetSitemapsFromIndex falls through,
    resources.go:129-141)."""
    if not looks_like_index(xml_text):
        # still validate it parses as XML at all (dead-link/garbage
        # detection happens in parse_sitemap later)
        return []
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise SitemapParseError(str(e)) from e
    if _local(root.tag) != "sitemapindex":
        return []
    locs = []
    for child in root:
        if _local(child.tag) == "sitemap":
            loc = _child_text(child, "loc").strip()
            if loc:
                locs.append(loc)
    return locs


def parse_sitemap(xml_text: str) -> list[SitemapURL]:
    """<urlset> → URL entries in document order, locs trimmed
    (sitemap.go:41-46)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise SitemapParseError(str(e)) from e
    urls: list[SitemapURL] = []
    for child in root:
        if _local(child.tag) != "url":
            continue
        loc = _child_text(child, "loc").strip()
        prio_text = _child_text(child, "priority").strip()
        try:
            prio = float(prio_text) if prio_text else 0.0
        except ValueError:
            prio = 0.0
        urls.append(
            SitemapURL(
                loc=loc,
                lastmod=_child_text(child, "lastmod").strip(),
                changefreq=_child_text(child, "changefreq").strip(),
                priority=prio,
            )
        )
    return urls


def normalize_loc(loc: str) -> str:
    """URL normalization applied to every sitemap loc before it
    enters the frontier (resources.go:156-168): trim, then strip ALL
    internal spaces and newlines."""
    loc = loc.strip()
    return loc.replace(" ", "").replace("\n", "")
