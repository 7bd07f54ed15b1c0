"""Lifecycle management for the package's module-level DataFrame caches.

Several operator families memoize an expensive intermediate per
(SparkSession, sf_dir) — hashed shingle sets, near-dup edge lists,
converged component labels, oriented graph edges, SimHash fingerprints
— as ``persist()``-ed or ``localCheckpoint()``-ed DataFrames. That is
the right call for one-shot bench / verify processes (the driver
re-imports fresh each round), but a long-lived session would otherwise
accumulate executor storage forever: the dicts are module-global and
nothing ever evicted them.

Every such cache dict is created through :func:`register_cache`, and
:func:`clear_caches` evicts entries — optionally scoped to one session
and/or one sf_dir — unpersisting persisted frames and dropping the
references so the ContextCleaner can reclaim localCheckpoint RDD
blocks. ``bench.py`` calls it between scale factors and at teardown.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

# Every registered cache maps (SparkSession, sf_dir) -> cached value.
# Values are DataFrames (storage-holding: the ones this module exists
# for) or plain strings/tuples (temp-dataset paths: freed for dict
# hygiene, no executor storage involved).
_REGISTERED: list[dict[tuple[SparkSession, str], Any]] = []


def register_cache(
    cache: dict[tuple[SparkSession, str], Any],
) -> dict[tuple[SparkSession, str], Any]:
    """Enroll a module-level cache dict; returns it for assignment."""
    _REGISTERED.append(cache)
    return cache


def clear_caches(
    spark: SparkSession | None = None, sf_dir: str | None = None
) -> int:
    """Evict cached entries, unpersisting any cached DataFrame.

    ``spark``/``sf_dir`` scope the eviction (None = match all), so a
    pipeline moving from one dataset to the next can free the first
    dataset's executor storage without disturbing the current one.
    Returns the number of entries evicted. Safe to call repeatedly and
    with a stopped session (unpersist failures are swallowed — the
    storage dies with the session anyway).
    """
    n = 0
    for cache in _REGISTERED:
        for key in list(cache):
            k_spark, k_dir = key
            if spark is not None and k_spark is not spark:
                continue
            if sf_dir is not None and k_dir != sf_dir:
                continue
            value = cache.pop(key)
            if isinstance(value, DataFrame):
                try:
                    value.unpersist()
                except Exception:
                    pass
            n += 1
    return n


def registered_entry_count() -> int:
    """Total live entries across all registered caches (test hook)."""
    return sum(len(c) for c in _REGISTERED)
