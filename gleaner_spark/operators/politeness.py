"""Per-host politeness pacing for live fetching (SURVEY §2 S13-S15).

The sandbox pipeline resolves fetches via the pages-table join; in
live mode fetches happen inside ``applyInPandas`` grouped by host:
each group is one task, rows processed in ``position`` order through
a token bucket honoring the resolved ``delay_ms`` and ``threads``
budget (acquire.go:118-215's semaphore + sleep, minus the goroutine-
per-URL memory hazard noted at acquire.go:131-133).

``pace_group`` is pure (injectable clock) so the ordering/budget
logic is unit-testable without sleeping; ``paced_fetch`` wires it to
a DataFrame. The fetch callback is injectable — tests use a dict
lookup, live mode would use an HTTP client with the
EarthCube_DataBot/1.0 agent + Accept headers.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pace_group(rows: list[dict], *, now_ms: Callable[[], int],
               sleep_ms: Callable[[int], None],
               fetch: Callable[[str], bytes | None]) -> list[dict]:
    """Fetch one host group in position order under its delay budget.

    Returns rows + (fetched_at_ms, ok). delay>0 ⇒ strictly
    sequential with `delay_ms` between request *completions*
    (reference sleeps after each fetch, acquire.go:210)."""
    rows = sorted(rows, key=lambda r: r["position"])
    out = []
    for r in rows:
        t = now_ms()
        body = fetch(r["url"])
        out.append({**r, "fetched_at_ms": t, "ok": body is not None, "body": body})
        delay = int(r.get("delay_ms") or 0)
        if delay > 0:
            sleep_ms(delay)
    return out


FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("fetched_at_ms", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def paced_fetch(frontier: DataFrame, fetch: Callable[[str], bytes | None],
                simulate: bool = True) -> DataFrame:
    """Live-mode fetch stage: one applyInPandas group per host.

    With ``simulate=True`` the clock is virtual (fetch latency 0,
    sleeps advance the clock) so tests assert pacing without real
    time; live mode uses time.monotonic + time.sleep."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if simulate:
            clock = {"t": 0}

            def now_ms():
                return clock["t"]

            def sleep_ms(ms):
                clock["t"] += ms

        else:  # pragma: no cover - live mode
            import time as _time

            start = _time.monotonic()

            def now_ms():
                return int((_time.monotonic() - start) * 1000)

            def sleep_ms(ms):
                _time.sleep(ms / 1000.0)

        rows = pace_group(
            pdf.to_dict("records"), now_ms=now_ms, sleep_ms=sleep_ms, fetch=fetch
        )
        cols = [f.name for f in FETCHED_SCHEMA.fields]
        return pd.DataFrame([{c: r.get(c) for c in cols} for r in rows])

    cols = ["source_name", "host", "url", "position", "delay_ms"]
    return (
        frontier.select(*cols)
        .groupBy("host")
        .applyInPandas(run, FETCHED_SCHEMA)
    )
