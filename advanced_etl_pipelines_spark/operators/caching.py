"""Tracked intermediate-frame caching.

``DataFrame.persist`` registers the plan in the session-level
CacheManager, which releases blocks only on an explicit ``unpersist`` —
NOT when the Python frame goes out of scope (the ContextCleaner GC
applies to RDD-level persistence such as ``localCheckpoint``, not to
CacheManager entries).  So every query builder that persists a derived
frame for reuse within its own plan would, over a long session or a
full registry sweep, pin one more corpus-sized copy in executor
storage per invocation, without bound.

Convention: persist intermediates through :func:`tracked_persist`
(chain-friendly via ``.transform(tracked_persist)``) and have sweep
drivers call :func:`release_tracked_caches` between queries.  A single
query's plan still reuses the cached blocks across its own actions and
across best-of-N repeat runs; only the sweep boundary releases them.

The base-table cache (``sources.readers.cache_sf_tables``) is
deliberately NOT tracked here — it is sweep-lifetime by design and has
its own ``uncache_sf_tables``.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Guarded by _TRACKED_LOCK: sweep drivers are single-threaded today, but
# a threaded sweep (or parallel pytest workers sharing one session) must
# not release another thread's in-use cache mid-query, and list.append /
# pop interleavings are not otherwise coordinated.
_TRACKED: list[DataFrame] = []
_TRACKED_LOCK = threading.Lock()


def tracked_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default — spills, never OOMs)
    and register it so ``release_tracked_caches`` can unpin it.

    Chain form: ``df.groupBy(...).agg(...).transform(tracked_persist)``.
    """
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    with _TRACKED_LOCK:
        _TRACKED.append(out)
    return out


def release_tracked_caches(blocking: bool = False) -> int:
    """Unpersist every frame registered since the last release; returns
    how many were released.  Safe to call at any sweep boundary — a
    released frame that is re-executed later just recomputes (correct,
    merely slower), so callers only release after materializing results.
    """
    with _TRACKED_LOCK:
        drained, _TRACKED[:] = _TRACKED[:], []
    for f in drained:
        try:
            f.unpersist(blocking=blocking)
        except Exception:  # session already stopped — nothing to free
            pass
    return len(drained)
