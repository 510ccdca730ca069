"""Property-based pins for the byte-level WARC parser
(sources/warc.py): round-trip identity over arbitrary pages rows,
and total robustness (never raises, log-and-continue posture S34)
under truncation and byte corruption. Pure Python — no Spark."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from gleaner_spark.sources.warc import (
    build_warc_bytes,
    pages_rows_from_archive,
)

# URL charset kept to what the writer emits verbatim on a header
# line (no header-injection bytes); hosts/paths are realistic ASCII
_url = st.from_regex(
    r"https?://[a-z0-9.-]{1,20}\.example/[a-zA-Z0-9/_.~%-]{0,30}",
    fullmatch=True,
)
_ts = st.datetimes(
    min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2030, 1, 1)
).map(lambda d: d.replace(microsecond=0))

_row = st.fixed_dictionaries({
    "url": _url,
    "warc_ts": _ts,
    "html": st.one_of(st.none(), st.binary(max_size=400)),
    "text": st.one_of(st.none(), st.text(max_size=200)),
    "lang": st.one_of(st.none(), st.sampled_from(["en", "de", "pt-BR"])),
    "content_type": st.sampled_from(
        ["text/html", "application/ld+json; charset=utf-8"]
    ),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(_row, max_size=8), st.booleans())
def test_round_trip_identity(rows, gz):
    """Writer → parser returns exactly the captures that carry a
    body: one response row per non-null html, one conversion row per
    non-null text, bytes/fields intact, in order."""
    data = build_warc_bytes(rows, gzip_members=gz)
    got = list(pages_rows_from_archive(data))
    exp = []
    for r in rows:
        if r["html"] is not None:
            exp.append(("resp", r["url"], bytes(r["html"]), r["warc_ts"],
                        r["lang"], r["content_type"]))
        if r["text"] is not None:
            exp.append(("conv", r["url"], r["text"], r["warc_ts"],
                        r["lang"]))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["url"] == e[1]
        assert g["warc_ts"] == e[3]
        assert g["lang"] == e[4]
        if e[0] == "resp":
            assert g["html"] == e[2] and g["text"] is None
            assert g["content_type"] == e[5]
        else:
            assert g["text"] == e[2] and g["html"] is None


@settings(max_examples=60, deadline=None)
@given(st.lists(_row, min_size=1, max_size=4), st.booleans(),
       st.integers(min_value=0, max_value=10**6))
def test_truncation_never_raises_and_is_prefix_monotone(rows, gz, cut):
    """Any prefix of an archive parses without raising, and yields a
    prefix of the full archive's captures (a torn tail can only lose
    whole records at the end, never corrupt earlier ones)."""
    data = build_warc_bytes(rows, gzip_members=gz)
    full = [
        (r["url"], r["html"], r["text"]) for r in pages_rows_from_archive(data)
    ]
    cut = cut % (len(data) + 1)
    part = [
        (r["url"], r["html"], r["text"])
        for r in pages_rows_from_archive(data[:cut])
    ]
    assert part == full[: len(part)]


@settings(max_examples=60, deadline=None)
@given(st.lists(_row, min_size=1, max_size=3),
       st.integers(min_value=0, max_value=10**6),
       st.binary(min_size=1, max_size=8))
def test_corruption_never_raises(rows, pos, junk):
    """Overwriting arbitrary bytes anywhere in a plain archive never
    raises — every malformed shape degrades to dropped records."""
    data = bytearray(build_warc_bytes(rows, gzip_members=False))
    if not data:  # bodiless rows emit no records
        return
    pos = pos % len(data)
    data[pos : pos + len(junk)] = junk
    for r in pages_rows_from_archive(bytes(data)):
        assert r["url"]  # rows that survive still carry a url
