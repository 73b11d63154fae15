"""Single-slot per-site DataFrame caching (r13, guide §5).

``DataFrame.cache()`` registers the plan in the session CacheManager
until an explicit ``unpersist()`` — but an operator that returns a
LAZY result cannot unpersist its own intermediates (the caller
executes the plan after the operator returned). Before r13 every such
site simply leaked: each invocation added one cached exploded
table/model frame to the CacheManager, permanently. Over a long
session (the bench's ~164 query executions; a production driver doing
per-batch scoring) that accumulates both storage blocks and — worse —
CacheManager *entries*, which every subsequent query compilation
scans for plan-cache matching, taxing all later queries.

The fix keeps full ``.cache()`` semantics (InMemoryRelation with
child statistics, so join planning is unchanged — a lazy
``localCheckpoint`` here measurably lost walls) but bounds the leak
to ONE live cache per call site: registering a new frame unpersists
the previous one. Unpersisting a frame whose plan is still executing
elsewhere is CORRECTNESS-SAFE (Spark recomputes evicted cached data
from lineage); the single-slot model matches how these operators are
actually used — serially, one invocation's result consumed before the
next call.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_SLOTS: dict[tuple[str, str], DataFrame] = {}
_LOCK = threading.Lock()


def _session_key(spark: SparkSession) -> str:
    """Stable identity for a session: the JVM session UUID when
    available (CPython ``id()`` can be reused after GC, aliasing a new
    session onto a dead session's slots)."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:  # noqa: BLE001 — connect mode / stopped session
        return f"id:{id(spark)}"


def slot_cache(site: str, df: DataFrame) -> DataFrame:
    """``df.cache()`` whose lifetime is scoped to the call site: the
    next ``slot_cache(site, ...)`` on the same SparkSession unpersists
    this frame. ``site`` is a stable operator-level key.

    The CacheManager keys entries by *analyzed plan* equality, so when
    the new frame is semantically identical to the live slot (a repeat
    invocation — the bench's warm reps, a production per-batch loop),
    ``df.cache()`` is a no-op registration against the SAME entry and
    unpersisting the previous frame would silently drop it, forcing
    every consumer to recompute on every warm rep. Keep the shared
    entry (and its already-materialized blocks) in that case; only a
    genuinely different plan evicts the previous one."""
    key = (_session_key(df.sparkSession), site)
    with _LOCK:
        prev = _SLOTS.get(key)
        if prev is not None:
            try:
                if prev.sameSemantics(df):
                    return df.cache()  # shared CacheManager entry stays live
            except Exception:  # noqa: BLE001 — session may be stopped
                pass
            try:
                prev.unpersist()
            except Exception:  # noqa: BLE001
                pass
        cached = df.cache()
        _SLOTS[key] = cached
    return cached


def clear_slots() -> None:
    """Unpersist and forget every live slot (test/session teardown)."""
    with _LOCK:
        for df in _SLOTS.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
        _SLOTS.clear()
