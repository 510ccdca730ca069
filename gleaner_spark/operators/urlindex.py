"""CDX/cc-index-style capture index: SURT-canonicalized URL keys and
a per-key capture summary over a pages/captures table.

Common Crawl's query surface over a crawl is its URL index (the
cc-index / CDXJ files): one row per capture, keyed by the SURT
(Sort-friendly URI Reordering Transform) of the URL so that all
captures of a host and its subpaths sort adjacently. Any engine that
ingests CC-style archives (sources/warc.py) needs the same index to
answer "which captures of example.org/x do we hold" without scanning
page bodies. The reference has no such operator (it crawls curated
sitemap seed lists); this is beyond-reference surface like
operators/urlfilter.py (SURVEY §2.2 "Scans/sources/sinks" records the
reference's source inventory).

SURT key semantics — pinned, deterministic, engine-portable (every
step is a regex or list op both Spark and DuckDB run identically, so
the driver's oracle replays it verbatim):

- lowercase the whole URL;
- host = the authority minus userinfo (``user:pw@``), minus one
  trailing dot, minus a default ``:80``/``:443`` port (non-default
  ports are kept — they address a different server), minus ONE
  leading ``www.`` label;
- the host's dot-labels are reversed and comma-joined
  (``org,example``), then ``)``;
- path = everything from the first ``/`` up to ``?`` or ``#``;
  empty path becomes ``/``;
- a non-empty query is appended as ``?`` + its ``&``-separated
  params sorted bytewise (CDX canonicalization: param order is
  transport noise); the fragment is always dropped.
- URLs with no ``scheme://authority`` (relative or junk) get a NULL
  key — they are not captures of any host.

Scale shape: ``surt_key`` is pure whole-stage-codegen column
expressions — ZERO exchanges to annotate 10^10 captures.
``build_url_index`` is one hash exchange with map-side partial
aggregation (count/min/max); at CC scale (~3×10^9 captures/crawl)
the index is ~10^9 groups, far smaller than the page table, and the
groupBy key is the high-cardinality surt_key so there is no skew
hazard beyond what AQE already handles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# scheme://authority — authority ends at the first /, ?, or #
_AUTH_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
# everything after the authority (path + query + fragment)
_TAIL_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$"


def surt_key(url_col: str = "url") -> Column:
    """SURT key column for ``url_col`` (see module docstring for the
    pinned canonicalization). NULL for non-absolute URLs."""
    u = F.lower(F.col(url_col))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.regexp_replace(auth, "^[^@]*@", "")      # userinfo
    host = F.regexp_replace(host, r"\.$", "")          # trailing dot
    host = F.regexp_replace(host, ":(80|443)$", "")    # default ports
    host = F.regexp_replace(host, r"^www\.", "")       # one www. label
    # a kept non-default port rides AFTER the reversed labels
    # ("org,example:8443)"), not glued to the TLD label
    port = F.regexp_extract(host, ":([0-9]+)$", 1)
    name = F.regexp_replace(host, ":[0-9]+$", "")
    rev = F.concat(
        F.array_join(F.reverse(F.split(name, r"\.")), ","),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    tail = F.regexp_extract(u, _TAIL_RE, 1)
    path = F.regexp_extract(tail, "^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?([^#]*)", 1)
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    key = F.concat(
        rev, F.lit(")"), path,
        F.when(query != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )
    return F.when(auth == "", F.lit(None).cast("string")).otherwise(key)


def surt_key_py(url: str) -> str | None:
    """Driver-side Python twin of :func:`surt_key` for point lookups
    (a CLI asking "do we hold captures of THIS url" shouldn't spin a
    Spark job to canonicalize one string). Kept step-for-step
    parallel to the column version; the test suite pins the two
    implementations equal over a generated URL corpus, so they can't
    drift silently."""
    import re

    u = url.lower()
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", u)
    if not m:
        return None
    host = m.group(1)
    host = re.sub(r"^[^@]*@", "", host)
    host = re.sub(r"\.$", "", host)
    host = re.sub(r":(80|443)$", "", host)
    host = re.sub(r"^www\.", "", host)
    pm = re.search(r":([0-9]+)$", host)
    port = ":" + pm.group(1) if pm else ""
    name = re.sub(r":[0-9]+$", "", host)
    rev = ",".join(reversed(name.split("."))) + port
    tm = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$", u)
    tail = tm.group(1) if tm else ""
    path = re.match(r"^([^?#]*)", tail).group(1) or "/"
    qm = re.search(r"\?([^#]*)", tail)
    query = qm.group(1) if qm else ""
    qpart = "?" + "&".join(sorted(query.split("&"))) if query else ""
    return rev + ")" + path + qpart


def annotate_surt(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add a ``surt_key`` column — zero exchanges, codegen only."""
    return df.withColumn("surt_key", surt_key(url_col))


def build_url_index(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
) -> DataFrame:
    """Capture index: one row per surt_key with capture count, first/
    last capture time, and the bytewise-min original URL as the
    display sample (deterministic under parallelism). Junk rows
    (NULL surt_key) aggregate into one NULL group so they stay
    countable rather than silently vanishing.

    One hash exchange (map-side partial count/min/max). Sort the
    result by surt_key at write time if CDX-adjacent file layout is
    wanted; the aggregation itself needs no order.
    """
    return (
        annotate_surt(df, url_col)
        .groupBy("surt_key")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.min(url_col).alias("url"),
        )
    )


def build_capture_index(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
    digest_col: str | None = "html",
) -> DataFrame:
    """Per-capture index — the actual cc-index/CDXJ granularity (one
    row per capture, not per key): (surt_key, ts, url, digest).
    ``digest`` is the hex SHA-1 of ``digest_col`` when that column
    exists (CC's CDXJ carries a base32 SHA-1; hex here, documented —
    same identity, different alphabet), NULL otherwise. No
    aggregation: zero exchanges until the caller sorts for layout."""
    cols = [
        surt_key(url_col).alias("surt_key"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
    ]
    if digest_col and digest_col in df.columns:
        cols.append(F.sha1(F.col(digest_col)).alias("digest"))
    else:
        cols.append(F.lit(None).cast("string").alias("digest"))
    return df.select(*cols)


def to_cdxj_lines(capture_index: DataFrame) -> DataFrame:
    """CDXJ text lines (``<surt> <ts> <json>``) from a per-capture
    index — the interchange format CDX servers and pywb consume.
    Timestamps render as CDX's yyyyMMddHHmmss when ``ts`` is a
    timestamp, else as their string form. One ``value`` column;
    write with ``.write.text`` after a range-partition + sort on
    (surt_key, ts) for the canonical sorted layout."""
    ts_t = dict(capture_index.dtypes)["ts"]
    ts_str = (
        F.date_format("ts", "yyyyMMddHHmmss")
        if ts_t.startswith("timestamp")
        else F.col("ts").cast("string")
    )
    payload = F.to_json(F.struct("url", "digest"))
    return capture_index.select(
        F.concat_ws(" ", "surt_key", ts_str, payload).alias("value")
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ index files (``<surt> <ts> <json>`` lines — the
    format CC publishes its index shards in, and what
    :func:`to_cdxj_lines` writes) into a per-capture DataFrame:
    (surt_key, ts: timestamp — NULL when not CDX's 14-digit form,
    ts_raw, url, digest). Pure line parsing, zero exchanges;
    :func:`lookup_host` / :func:`lookup_prefix` apply directly, and
    text scans still prune by the pushed range when the files are
    sorted (Spark collects no min/max stats for text, but the
    filter itself stays JVM-side)."""
    v = F.col("value")
    parts = F.split(v, " ", 3)
    # try_element_at: short/blank lines yield NULL fields, not errors
    surt = F.try_element_at(parts, F.lit(1))
    ts_raw = F.try_element_at(parts, F.lit(2))
    payload = F.try_element_at(parts, F.lit(3))
    j = F.from_json(payload, "url string, digest string")
    return spark.read.text(path).select(
        surt.alias("surt_key"),
        F.when(
            ts_raw.rlike("^[0-9]{14}$"),
            F.to_timestamp(ts_raw, "yyyyMMddHHmmss"),
        ).alias("ts"),
        ts_raw.alias("ts_raw"),
        j["url"].alias("url"),
        j["digest"].alias("digest"),
    ).filter(surt.isNotNull() & (surt != ""))


def host_stats(capture_index: DataFrame) -> DataFrame:
    """Per-host crawl rollup over a per-capture index: captures,
    distinct URLs, first/last capture time, keyed by the surt host
    part (the reversed-label prefix before ``)``, so subdomains stay
    distinct hosts and the output sorts host-adjacently like the
    index itself). count(DISTINCT surt_key) is the exact two-phase
    aggregate — partial distinct per partition, then the merge — the
    standard Catalyst expansion; everything else folds map-side."""
    host = F.substring_index(F.col("surt_key"), ")", 1)
    return (
        capture_index
        .filter(F.col("surt_key").isNotNull())
        .groupBy(host.alias("host_key"))
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.countDistinct("surt_key").alias("n_urls"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def latest_captures(capture_index: DataFrame) -> DataFrame:
    """Latest capture per surt_key from a per-capture index:
    (surt_key, digest, ts) where digest belongs to the most recent
    capture (ties on ts broken by max digest, so the reduction is
    deterministic and partition-invariant). One partial-agg exchange
    — max_by folds map-side like any min/max."""
    pair = F.struct(F.col("ts"), F.col("digest"))
    return capture_index.groupBy("surt_key").agg(
        F.max_by("digest", pair).alias("digest"),
        F.max("ts").alias("ts"),
    )


def diff_crawls(old: DataFrame, new: DataFrame) -> DataFrame:
    """Crawl delta — what changed between two crawls of the same
    web (the monthly-crawl diff every CC consumer computes before
    re-processing): full-outer join of per-key latest digests →
    status ``new`` (key only in the new crawl), ``gone`` (only in
    the old), ``changed`` (digest differs), ``same``. Inputs are
    (surt_key, digest) frames — :func:`latest_captures` output.
    One co-partitioned shuffle join on the high-cardinality
    surt_key; downstream re-processing filters on status, so at
    10^9 keys the common ``same`` majority never leaves the join's
    output pruning."""
    o = old.select("surt_key", F.col("digest").alias("old_digest"))
    n = new.select("surt_key", F.col("digest").alias("new_digest"))
    j = o.join(n, "surt_key", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("new"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select("surt_key", status.alias("status"),
                    "old_digest", "new_digest")


def merge_url_index(*indexes: DataFrame) -> DataFrame:
    """Merge per-crawl capture indexes (CC publishes one index per
    monthly crawl; a multi-crawl archive queries their union): counts
    add, capture windows widen, the sample URL stays the bytewise
    min — so merging N crawls' indexes is exactly equal to indexing
    their concatenated captures (associativity pinned by test). One
    union + one partial-agg exchange; at 10^9 rows per crawl this is
    the same shuffle shape as a single build."""
    if not indexes:
        raise ValueError("merge_url_index needs at least one index")
    df = indexes[0]
    for other in indexes[1:]:
        df = df.unionByName(other)
    return df.groupBy("surt_key").agg(
        F.sum("n_captures").alias("n_captures"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.min("url").alias("url"),
    )


def _prefix_range(surt_prefix: str) -> Column:
    """``surt_key`` is bytewise inside the raw string-prefix range.
    Expressed as a pair of range predicates (``>= p`` and ``< p+1``)
    rather than ``startswith`` so the filter pushes down to the
    parquet scan as min/max-stat skipping. The upper bound bumps the
    prefix's last byte (surt keys are ASCII, so byte-wise and
    codepoint-wise order agree and chr(+1) is safe)."""
    upper = surt_prefix[:-1] + chr(ord(surt_prefix[-1]) + 1)
    return (F.col("surt_key") >= surt_prefix) & (F.col("surt_key") < upper)


def lookup_prefix(index_df: DataFrame, surt_prefix: str) -> DataFrame:
    """All index rows under a RAW surt-string prefix. Note raw string
    semantics: prefix ``org,example`` also matches host
    ``examplez.org`` (the label is a prefix of it) — for
    delimiter-correct host queries use :func:`lookup_host`. Over an
    index written sorted by surt_key (the ``index`` CLI layout) the
    pushed range prunes every file/row-group outside the prefix —
    that, not the filter itself, is what makes a 10^9-row index
    answer prefix queries interactively."""
    if not surt_prefix:
        return index_df
    return index_df.filter(_prefix_range(surt_prefix))


def lookup_host(
    index_df: DataFrame, host: str, include_subdomains: bool = True,
) -> DataFrame:
    """All captures of ``host`` (and, by default, its subdomains) —
    the cc-index host query. Delimiter-correct: ``example.org``
    matches surt keys under ``org,example)`` (the host itself) and
    ``org,example,`` (subdomains), never ``org,examplez``. The host
    argument is canonicalized like :func:`surt_key` canonicalizes
    authorities (lowercase, one leading www. label, trailing dot).
    Both branches are pushdown-friendly ranges; parquet pushes the
    OR of the two range pairs."""
    name = host.lower().rstrip(".")
    if name.startswith("www."):
        name = name[4:]
    port = ""
    if ":" in name:
        name, _, p = name.rpartition(":")
        port = "" if p in ("80", "443") else ":" + p
    rev = ",".join(reversed(name.split("."))) + port
    cond = _prefix_range(rev + ")")
    if include_subdomains:
        cond = cond | _prefix_range(rev + ",")
    return index_df.filter(cond)
