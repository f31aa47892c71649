"""Resident-service cache lifecycle (operators/opcache.py).

Operator pipelines persist intermediate frames (LSH bands, IVF centroid
assignments, ntile partition stats).  Batch harnesses clearCache between
entries; the MCP server must release them after every tool call or a
resident process accumulates storage memory forever.

Assertions read the TRACKED FRAMES' own storage levels rather than
global RDD-storage counts: Spark's ContextCleaner asynchronously frees
earlier tests' localCheckpoint RDDs, so global counts race; a frame's
storageLevel is deterministic.
"""

import threading

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.operators import opcache
from mcp_trino_spark.operators.opcache import (
    release_all_operator_caches,
    release_operator_caches,
    tracked_count,
)
from server.mcp_server import MCPServer


def _my_frames():
    return list(opcache._TRACKED.get(threading.get_ident(), []))


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def _build_and_track(spark, sf_dir):
    from mcp_trino_spark import registry

    release_all_operator_caches()
    spark.catalog.clearCache()
    registry.queries()["l2_minhash_lsh_pairs"](spark, sf_dir).count()
    frames = _my_frames()
    assert frames and all(_is_cached(f) for f in frames)
    return frames


def test_dedup_entry_registers_and_release_frees_storage(spark, sf_dir):
    frames = _build_and_track(spark, sf_dir)
    assert tracked_count() == len(frames)
    released = release_operator_caches()
    assert released == len(frames)
    assert tracked_count() == 0
    assert all(not _is_cached(f) for f in frames)
    # idempotent
    assert release_operator_caches() == 0


def test_server_tool_call_releases_operator_caches(spark, sf_dir):
    # storage must return to baseline after any tools/call — the
    # per-request finally in handle_message owns the cleanup for caches
    # created on the request's thread (here: the same thread)
    frames = _build_and_track(spark, sf_dir)
    server = MCPServer(spark=spark, config=EngineConfig())
    resp = server.handle_message(
        {
            "jsonrpc": "2.0",
            "id": 1,
            "method": "tools/call",
            "params": {
                "name": "execute_query",
                "arguments": {"query": "SELECT 1 AS one"},
            },
        }
    )
    assert resp["result"]["isError"] is False
    assert tracked_count() == 0
    assert all(not _is_cached(f) for f in frames)


def test_release_runs_even_when_tool_call_fails(spark, sf_dir):
    frames = _build_and_track(spark, sf_dir)
    server = MCPServer(spark=spark, config=EngineConfig())
    resp = server.handle_message(
        {
            "jsonrpc": "2.0",
            "id": 2,
            "method": "tools/call",
            "params": {"name": "execute_query", "arguments": {"query": "DROP TABLE x"}},
        }
    )
    assert resp["result"]["isError"] is True  # write gate rejects it
    assert tracked_count() == 0
    assert all(not _is_cached(f) for f in frames)


def test_release_is_scoped_to_the_calling_thread(spark, sf_dir):
    # a concurrent request's finally must not unpersist frames another
    # in-flight request persisted (ThreadingHTTPServer runs requests on
    # separate threads)
    frames = _build_and_track(spark, sf_dir)

    other_released = []

    def other_request():
        # this thread owns nothing; its release must be a no-op
        other_released.append(release_operator_caches())

    t = threading.Thread(target=other_request)
    t.start()
    t.join()
    assert other_released == [0]
    assert tracked_count() == len(frames)  # main thread's frames survive
    assert all(_is_cached(f) for f in frames)
    assert release_operator_caches() == len(frames)
    assert tracked_count() == 0
