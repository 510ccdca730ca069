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

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def swap_persist(tag: str, *dfs: DataFrame) -> list[DataFrame]:
    """Persist ``dfs`` under ``tag``, unpersisting the previous
    generation registered under the same tag."""
    for old in _LIVE.get(tag, []):
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    _LIVE[tag] = [df.persist() for df in dfs]
    return _LIVE[tag]


def release(tag: str) -> None:
    for old in _LIVE.pop(tag, []):
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001
            pass
