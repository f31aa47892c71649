"""Resident-service cache lifecycle (operators/opcache.py).

Operator pipelines persist intermediate frames (LSH bands, IVF centroid
assignments, ntile partition stats).  Batch harnesses clearCache between
entries; the MCP server must release them after every tool call or a
resident process accumulates storage memory forever.
"""

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.operators.opcache import (
    release_operator_caches,
    tracked_count,
)
from server.mcp_server import MCPServer


def _storage_rdd_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_dedup_entry_registers_and_release_frees_storage(spark, sf_dir):
    # baselines are deltas: earlier tests may leave localCheckpoint RDDs
    # in storage, which clearCache does not (and must not) touch
    from mcp_trino_spark import registry

    release_operator_caches()  # isolate from earlier tests in the session
    spark.catalog.clearCache()
    base = _storage_rdd_count(spark)
    df = registry.queries()["l2_minhash_lsh_pairs"](spark, sf_dir)
    df.count()
    assert tracked_count() >= 1
    assert _storage_rdd_count(spark) > base
    released = release_operator_caches()
    assert released >= 1
    assert tracked_count() == 0
    assert _storage_rdd_count(spark) <= base
    # idempotent
    assert release_operator_caches() == 0


def test_server_tool_call_releases_operator_caches(spark, sf_dir):
    # storage memory must return to baseline after any tools/call — the
    # per-request finally in handle_message owns the cleanup even when
    # the cache was created outside the call (e.g. an embedded caller
    # mixing API use with server dispatch)
    from mcp_trino_spark import registry

    release_operator_caches()
    spark.catalog.clearCache()
    base = _storage_rdd_count(spark)
    registry.queries()["l2_minhash_lsh_pairs"](spark, sf_dir).count()
    assert tracked_count() >= 1
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
    assert _storage_rdd_count(spark) <= base


def test_release_runs_even_when_tool_call_fails(spark, sf_dir):
    from mcp_trino_spark import registry

    release_operator_caches()
    spark.catalog.clearCache()
    base = _storage_rdd_count(spark)
    registry.queries()["l2_minhash_lsh_pairs"](spark, sf_dir).count()
    assert tracked_count() >= 1
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
    assert _storage_rdd_count(spark) <= base


def test_release_is_scoped_to_the_calling_thread(spark, sf_dir):
    # a concurrent request's finally must not unpersist frames another
    # in-flight request persisted (ThreadingHTTPServer runs requests on
    # separate threads)
    import threading

    from mcp_trino_spark import registry
    from mcp_trino_spark.operators.opcache import release_all_operator_caches

    release_all_operator_caches()
    spark.catalog.clearCache()
    registry.queries()["l2_minhash_lsh_pairs"](spark, sf_dir).count()
    assert tracked_count() == 1  # owned by the main thread

    other_released = []

    def other_request():
        # this thread owns nothing; its release must be a no-op
        other_released.append(release_operator_caches())

    t = threading.Thread(target=other_request)
    t.start()
    t.join()
    assert other_released == [0]
    assert tracked_count() == 1  # main thread's frame survived
    assert release_operator_caches() == 1
    assert tracked_count() == 0
