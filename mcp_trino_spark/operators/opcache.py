"""Session-scoped lifecycle for DataFrames the operators persist.

Several operator pipelines persist+materialize an intermediate frame so
one job's subtrees don't recompute (or race) an expensive stage — the
LSH band frame (llm_dedup._band_frame), the IVF/semdedup centroid
assignments (llm_similarity).  The frames are plan-internal: once the
entry's result is materialized, the cache is dead weight.  Batch
harnesses clean up with ``spark.catalog.clearCache()`` between entries,
but a RESIDENT service (the MCP server) would accumulate them forever —
storage memory grows with every dedup/ANN request and never returns.

``persist_tracked`` is the persist() the operators use; it records the
frame (strong refs — the JVM cache outlives the Python handle, so a
weakref would drop the only way to unpersist it).  The server calls
``release_operator_caches`` after every tool call: by then the result
rows are collected, so dropping the caches is safe — a later re-read of
the same lazy plan merely recomputes.

The reference (a stateless Trino pass-through, internal/trino/client.go)
has no equivalent: Trino owns its memory server-side.  This is the
embedded-engine counterpart of that ownership.
"""

from __future__ import annotations

import threading
from typing import Dict, List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: frames keyed by the thread that persisted them.  The MCP transport
#: is a ThreadingHTTPServer — each request builds AND releases its
#: caches on its own handler thread, so a global list would let one
#: request's finally unpersist a concurrent request's frame mid-flight
#: (recompute race, and for repartitionByRange-backed plans a silently
#: different partitioning than the offsets collected from the cache).
_TRACKED: Dict[int, List[DataFrame]] = {}


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for release by this thread's next
    ``release_operator_caches`` call."""
    df = df.persist()
    with _LOCK:
        _TRACKED.setdefault(threading.get_ident(), []).append(df)
    return df


def tracked_count() -> int:
    """Frames tracked by the CURRENT thread (the ownership unit)."""
    with _LOCK:
        return len(_TRACKED.get(threading.get_ident(), []))


def _release(frames: List[DataFrame]) -> int:
    released = 0
    for df in frames:
        try:
            # blocking: the caller's contract is "storage is back to
            # baseline when this returns" — async unpersist leaves the
            # blocks live for an unbounded moment
            df.unpersist(blocking=True)
            released += 1
        except Exception:  # noqa: BLE001 — cleanup must never mask results
            pass
    return released


def release_operator_caches() -> int:
    """Unpersist the frames THIS thread persisted; returns the count.

    Idempotent and exception-tolerant (a frame whose session died just
    drops its entry) — safe to call from a server's per-request finally
    without touching concurrent requests' caches.
    """
    with _LOCK:
        frames = _TRACKED.pop(threading.get_ident(), [])
    return _release(frames)


def release_all_operator_caches() -> int:
    """Unpersist EVERY tracked frame regardless of owner — for
    single-threaded harnesses and session teardown, never from a
    concurrent server request."""
    with _LOCK:
        frames = [df for lst in _TRACKED.values() for df in lst]
        _TRACKED.clear()
    return _release(frames)
