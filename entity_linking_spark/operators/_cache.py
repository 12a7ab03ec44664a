"""Tracked persist + release for operator intermediates.

Operators persist intermediates that their returned (lazy) plans consume
several times (blocking key streams, packed embedding sides, dedup
signatures).  Left alone, those caches outlive the query — a slow leak in
a long-lived session (VERDICT r02 finding #4 / ADVICE r02).  Every
operator persist goes through ``track``, so callers can either

- wrap a unit of work in ``cache_scope()`` — the ``with``-style lifetime:
  everything tracked inside the scope is unpersisted on exit — or
- call ``release_cached()`` between queries (bench.py does this after
  each headline query's sink action).

Releasing is safe at any point: an unpersisted plan recomputes instead of
failing, so a scope that closes "too early" only costs recompute time,
never correctness.  One-shot jobs that exit the JVM after a single query
need neither.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register for later release; returns df.

    Double-tracking the same frame is harmless (persist at the same level
    is a no-op; the extra unpersist is too)."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = len(_TRACKED)
    _release_to(0)
    return n


def _release_to(mark: int) -> None:
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to leak


@contextmanager
def cache_scope():
    """Release (only) the frames tracked inside the scope on exit.

    Materialize results before the scope closes (collect/write) — after
    exit the returned plan still works but recomputes its intermediates."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        _release_to(mark)
