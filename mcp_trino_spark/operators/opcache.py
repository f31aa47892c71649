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
from typing import List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: List[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for session-level release."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)


def release_operator_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Idempotent and exception-tolerant (a frame whose session died just
    drops its entry) — safe to call from a server's per-request finally.
    """
    with _LOCK:
        frames, _TRACKED[:] = list(_TRACKED), []
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
