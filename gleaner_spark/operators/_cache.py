"""Generation-swapped persist registry.

Operators like IVF/LSH/n-gram dedup persist an intermediate frame
(shingle sets, probe assignments) that the returned lazy DataFrame
still depends on — they cannot unpersist before the caller executes.
Left alone, repeated calls in a long session (bench loops, notebook
use) accumulate executor storage until LRU eviction starts degrading
unrelated cached stages (ADVICE r2). ``swap_persist`` keeps exactly
one live generation per tag: persisting generation N releases
generation N-1, so a loop holds at most one extra copy while any
still-running consumer of the previous generation just falls back to
recompute (unpersist is safe, never wrong).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}
# concurrent job submission from multiple driver threads is a normal
# Spark pattern; without the lock two simultaneous swaps of one tag
# would both read the old generation and the loser's persisted frame
# would leak for the application lifetime
_LOCK = threading.Lock()


def swap_persist(tag: str, *dfs: DataFrame) -> list[DataFrame]:
    """Persist ``dfs`` under ``tag``, unpersisting the previous
    generation registered under the same tag.

    Granularity is deliberately per-TAG, not per-input: alternating
    calls over different inputs evict each other and recompute — a
    performance trade that bounds executor storage at one generation
    per operator, and never a correctness issue (a still-running
    consumer of an evicted frame just recomputes its lineage)."""
    with _LOCK:
        olds = _LIVE.get(tag, [])
        _LIVE[tag] = news = [df.persist() for df in dfs]
    for old in olds:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    return news


def release(tag: str) -> None:
    with _LOCK:
        olds = _LIVE.pop(tag, [])
    for old in olds:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001
            pass
