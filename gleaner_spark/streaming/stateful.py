"""Stateful per-host politeness scheduling over a streaming frontier.

The batch pipeline serializes each host's fetches with the S13
(host, lane) schedule consumed by ``operators.livefetch``
(reproducing acquire.go:71-73,210). In a *continuous* crawl the per-host clock must survive across
micro-batches and job restarts — exactly what
``applyInPandasWithState`` gives us: the host's (last_scheduled_ms,
seq) pair lives in the streaming state store, checkpointed with the
query, so a killed job resumes mid-crawl without re-deriving pacing
from scratch (north rule: frontier state + per-host token buckets
checkpoint and resume).

Rows within a micro-batch are scheduled in frontier ``position``
order; across batches the host clock continues from the stored
state. ``delay_ms`` rides on the rows (resolved by S12/S13 during
frontier build).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCHEDULE_OUT_SCHEMA = (
    "host string, url string, position long, seq long, scheduled_ms long"
)
SCHEDULE_STATE_SCHEMA = "last_sched_ms long, seq long"


def schedule_host_batch(rows: list[dict], last_sched_ms: int, seq: int,
                        ) -> tuple[list[dict], int, int]:
    """Pure per-host scheduling step (unit-testable without Spark).

    Each fetch is spaced ``delay_ms`` after the previously *scheduled*
    one, continuing from the stored clock; delay 0 keeps the clock
    (concurrent lanes are the batch scheduler's job — a live stream
    paces conservatively one-lane-per-host)."""
    out = []
    for r in sorted(rows, key=lambda r: (r["position"], r["url"])):
        delay = int(r.get("delay_ms") or 0)
        sched = 0 if seq == 0 else last_sched_ms + delay
        out.append(
            {
                "host": r["host"],
                "url": r["url"],
                "position": r["position"],
                "seq": seq,
                "scheduled_ms": sched,
            }
        )
        last_sched_ms = sched
        seq += 1
    return out, last_sched_ms, seq


def paced_schedule_stream(frontier_stream: DataFrame) -> DataFrame:
    """Streaming politeness scheduler: groupBy(host) →
    ``applyInPandasWithState``. Input needs columns
    (host, url, position, delay_ms)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState,
           ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last_sched_ms, seq = state.get if state.exists else (0, 0)
        rows: list[dict] = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        out, last_sched_ms, seq = schedule_host_batch(rows, last_sched_ms, seq)
        state.update((last_sched_ms, seq))
        yield pd.DataFrame(
            out,
            columns=["host", "url", "position", "seq", "scheduled_ms"],
        )

    return (
        frontier_stream.select("host", "url", "position", "delay_ms")
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            SCHEDULE_OUT_SCHEMA,
            SCHEDULE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
