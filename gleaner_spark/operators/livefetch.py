"""Live HTTP fetch stage — S15 over real sockets (VERDICT r3 #1).

The reference's fetch stage is a bounded-concurrency HTTP client: one
``http.Client`` per source, a semaphore of ``ThreadCount`` goroutines,
``User-Agent``/``Accept`` headers, and ``time.Sleep(Delay)`` after each
completion (acquire.go:116-218). The sandbox pipeline normally resolves
fetches via the pages-table join (``harvest.fetch_pages``, sanctioned by
BASELINE.json's input_hint); this module is the selectable live mode
behind the same contract — its output feeds ``extract_and_process``
unchanged.

Execution model — **a politeness lane IS a Spark task**:

- ``schedule_fetches`` (S13) already assigns every frontier row a
  ``lane`` (``fetch_seq % threads``; exactly 1 lane when ``delay_ms >
  0``, reproducing getConfig's threads→1 collapse, acquire.go:71-73).
  Grouping by ``(host, lane)`` in ``applyInPandas`` therefore gives
  per-host concurrency == the source's thread budget *by construction*:
  Spark can never run more simultaneous requests against a host than
  that host has lanes. No semaphore object needed — the semaphore is
  the group count.
- Within a lane, URLs fetch strictly in ``fetch_seq`` order over ONE
  keep-alive connection per (scheme, netloc) (the reference reuses one
  http.Client's pool per source); ``delay_ms > 0`` sleeps after each
  completion (acquire.go:210 sleeps whether or not the fetch failed).
- 100-TB shape: cross-host parallelism is the scale axis — millions of
  (host, lane) groups spread over the cluster. A single giant host is
  NOT a Spark skew problem: its wall-clock is bounded below by its own
  politeness budget (delay × URLs / lanes), an irreducible serial chain
  no partitioning can shorten; the shuffle moves only (url, schedule)
  width, never bodies (bodies are born executor-side here and flow
  straight into extraction).

Status-code quirk (parity): the reference never checks
``resp.StatusCode`` — any transport-successful response body flows to
extraction (acquire.go:146-157 logs the code at Trace and parses the
body regardless); only transport errors (DNS, refused, timeout) skip
the URL, logged and continued (acquire.go:147-151). ``ok`` here means
"transport succeeded", not "HTTP 200".

``url_rewrite`` maps the logical URL to the socket actually dialed
(tests point the reference corpus at a local fixture server, the
reference does the same via httptest — testHelpers/mocks.go:13-37;
production could point at a mirror/proxy). Output rows always carry the
LOGICAL url, so identity, dedup and prov are rewrite-invariant.
"""

from __future__ import annotations

import http.client
import time
import urllib.parse
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.extract import EARTHCUBE_AGENT

LIVE_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("lane", T.IntegerType()),
        T.StructField("fetch_seq", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("fetched_at_ms", T.LongType()),
        T.StructField("elapsed_ms", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

# the S15 contract columns extract_and_process consumes (text is null in
# live mode: the pages-table text column is a corpus artifact; the
# reference's no-docs fallback goes headless instead, S30)
CONTRACT_COLS = ["source_name", "url", "position", "html", "text", "content_type"]


def _fetch_one(conns: dict, target_url: str, headers: dict[str, str],
               timeout_s: float):
    """GET over a cached keep-alive connection; one transparent
    reconnect when a pooled socket went stale (server-side keep-alive
    close between requests — indistinguishable from the reference's
    http.Client silently re-dialing). Returns (status, content_type,
    body, error)."""
    parsed = urllib.parse.urlsplit(target_url)
    key = (parsed.scheme, parsed.netloc)
    path = parsed.path or "/"
    if parsed.query:
        path += "?" + parsed.query
    last_err = None
    for attempt in (0, 1):
        conn = conns.get(key)
        fresh = conn is None
        if fresh:
            cls = (
                http.client.HTTPSConnection
                if parsed.scheme == "https"
                else http.client.HTTPConnection
            )
            conn = cls(parsed.netloc, timeout=timeout_s)
            conns[key] = conn
        try:
            conn.request("GET", path, headers=headers)
            resp = conn.getresponse()
            body = resp.read()
            return resp.status, resp.getheader("Content-Type"), body, None
        except Exception as e:  # noqa: BLE001 - transport errors skip the URL
            conn.close()
            conns.pop(key, None)
            last_err = f"{type(e).__name__}: {e}"
            if fresh:
                break  # a fresh connection failing is a real error, not staleness
    return None, None, None, last_err


def live_fetch_pages(
    frontier: DataFrame,
    accept_by_source: dict[str, str] | None = None,
    user_agent: str = EARTHCUBE_AGENT,
    timeout_s: float = 30.0,
    url_rewrite: Callable[[str], str] | None = None,
) -> DataFrame:
    """Fetch a scheduled frontier over HTTP, one (host, lane) group per
    task. ``frontier`` must carry the S13 schedule columns (lane,
    fetch_seq, delay_ms) — pass it through ``schedule_fetches`` first;
    a lane-less frontier degrades to one lane per host."""
    accepts = accept_by_source or {}

    def run(key, pdf):
        pdf = pdf.sort_values(
            "fetch_seq" if "fetch_seq" in pdf.columns else "position"
        )
        conns: dict = {}
        out = {f.name: [] for f in LIVE_FETCH_SCHEMA.fields}
        try:
            for r in pdf.itertuples(index=False):
                headers = {
                    "User-Agent": user_agent,
                    "Accept": accepts.get(
                        r.source_name, "application/ld+json, text/html"
                    ),
                }
                target = url_rewrite(r.url) if url_rewrite else r.url
                t0 = time.time()
                status, ctype, body, err = _fetch_one(
                    conns, target, headers, timeout_s
                )
                t1 = time.time()
                out["source_name"].append(r.source_name)
                out["host"].append(r.host)
                out["url"].append(r.url)  # logical url, rewrite-invariant
                out["position"].append(r.position)
                out["lane"].append(int(getattr(r, "lane", 0) or 0))
                out["fetch_seq"].append(int(getattr(r, "fetch_seq", 0) or 0))
                out["html"].append(body)
                out["text"].append(None)
                out["content_type"].append(ctype)
                out["status"].append(status)
                out["fetched_at_ms"].append(int(t0 * 1000))
                out["elapsed_ms"].append(int((t1 - t0) * 1000))
                out["ok"].append(err is None)
                out["error"].append(err)
                delay = int(getattr(r, "delay_ms", 0) or 0)
                if delay > 0:
                    # sleep after each completion, success or not
                    # (acquire.go:210 runs unconditionally)
                    time.sleep(delay / 1000.0)
        finally:
            for c in conns.values():
                c.close()
        return pd.DataFrame(out)

    cols = ["source_name", "host", "url", "position", "delay_ms"]
    cols += [c for c in ("lane", "fetch_seq") if c in frontier.columns]
    grouped = frontier.select(*cols)
    if "lane" not in frontier.columns:
        grouped = grouped.withColumn("lane", F.lit(0))
    return grouped.groupBy("host", "lane").applyInPandas(run, LIVE_FETCH_SCHEMA)
