"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import pytest

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import WriteQueryNotAllowed, execute_query
from mcp_trino_spark.plans.explain import explain_query
from mcp_trino_spark.sources.catalog import register_tables
from mcp_trino_spark.trino_compat import translate


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_tables(spark, "/root/testdata/sf0.001")


def test_explain_validate_does_not_execute_ddl(spark):
    """The write-gate bypass: VALIDATE/IO of DDL must never execute it."""
    spark.sql("CREATE TABLE IF NOT EXISTS probe_keep (x INT) USING parquet")
    try:
        res = explain_query(spark, "DROP TABLE probe_keep", "VALIDATE")
        # validated (Spark can plan it) but NOT executed
        assert spark.catalog.tableExists("probe_keep")
        assert res.rows[0]["valid"] is True
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_keep")


def test_explain_io_rejects_writes(spark):
    with pytest.raises(WriteQueryNotAllowed):
        explain_query(spark, "DROP TABLE nation", "IO")


def test_explain_logical_of_ddl_does_not_execute(spark):
    spark.sql("CREATE TABLE IF NOT EXISTS probe_keep2 (x INT) USING parquet")
    try:
        explain_query(spark, "DROP TABLE probe_keep2", "LOGICAL")
        assert spark.catalog.tableExists("probe_keep2")
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_keep2")


def test_write_command_runs_under_watchdog_attribution(spark):
    """Commands execute inside spark.sql — the attribution properties
    must be set during (and cleared after) the command itself."""
    cfg = EngineConfig(allow_write_queries=True)
    execute_query(spark, "DROP TABLE IF EXISTS no_such_table_xyz", cfg, user="bob")
    assert spark.sparkContext.getLocalProperty("mcp.user") is None
    assert spark.sparkContext.getLocalProperty("spark.job.description") is None
    assert spark.sparkContext.getLocalProperty("spark.job.interruptOnCancel") is None


def test_segmenter_handles_doubled_quote_identifiers():
    q = 'SELECT "a""b", approx_distinct(x) FROM t'
    assert "approx_count_distinct" in translate(q)


def test_mcp_non_object_and_missing_method(spark):
    from server.mcp_server import MCPServer

    server = MCPServer(spark=spark, config=EngineConfig())
    # JSON array (batch) → -32600 error, not a crash
    reply = server.handle_message([{"jsonrpc": "2.0", "id": 1, "method": "ping"}])
    assert reply["error"]["code"] == -32600
    # id present but method missing → -32600 with the id echoed
    reply = server.handle_message({"jsonrpc": "2.0", "id": 5})
    assert reply["error"]["code"] == -32600 and reply["id"] == 5
    # malformed notification (no id, no method) → silently dropped
    assert server.handle_message({"jsonrpc": "2.0"}) is None


def test_mcp_execute_query_max_rows(spark):
    import json

    from server.mcp_server import MCPServer

    server = MCPServer(spark=spark, config=EngineConfig())
    reply = server.handle_message(
        {
            "jsonrpc": "2.0",
            "id": 9,
            "method": "tools/call",
            "params": {
                "name": "execute_query",
                "arguments": {"query": "SELECT * FROM lineitem", "max_rows": 4},
            },
        }
    )
    rows = json.loads(reply["result"]["content"][0]["text"])
    assert len(rows) == 4


def test_catalog_identifier_quoting(spark):
    from mcp_trino_spark.catalog_api import list_schemas

    cfg = EngineConfig()
    # a hyphenated (quote-requiring) catalog: clean engine error, not a
    # parse of spliced SQL text
    with pytest.raises(Exception) as ei:
        list_schemas(spark, cfg, "no-such-catalog")
    assert "no-such-catalog" in str(ei.value) or "not found" in str(ei.value).lower()


def test_error_message_names_real_env_vars(spark):
    with pytest.raises(WriteQueryNotAllowed) as ei:
        execute_query(spark, "DROP TABLE nation", EngineConfig())
    assert "SPARK_ENGINE_ALLOW_WRITE_QUERIES" in str(ei.value)


@pytest.fixture(scope="module")
def mini_sf(spark):
    """Synthetic mini sf dir exercising data shapes absent from the
    generated testdata: a one-word document (l7 crash repro) and a
    single-vector label whose stddev is zero per dimension (l12 NaN)."""
    import pathlib

    import pandas as pd

    d = pathlib.Path("/root/repo/.tmp/mini_sf")
    d.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["word", "two words here and more words"],
            "lang": ["en", "en"],
            "source": ["web", "web"],
            "n_chars": [4, 29],
        }
    ).to_parquet(d / "documents.parquet")
    pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[1.0, 2.0], [1.0, 4.0], [9.0, 9.0]],
            "label": [0, 0, 1],
        }
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


def test_l7_survives_one_word_document(spark, mini_sf):
    from mcp_trino_spark import registry

    rows = registry.queries()["l7_top_bigrams"](spark, mini_sf).collect()
    # the one-word doc contributes NO bigram rows: everything present
    # must be an adjacent pair from doc 2's text, each seen once
    got = {(r["bigram"], r["n"]) for r in rows}
    assert got == {
        ("two words", 1),
        ("words here", 1),
        ("here and", 1),
        ("and more", 1),
        ("more words", 1),
    }


def test_l12_sigma_zero_yields_null_not_nan(spark, mini_sf):
    import math

    from mcp_trino_spark import registry

    rows = registry.queries()["l12_grouped_normalize"](spark, mini_sf).collect()
    by_key = {(r["vec_id"], r["pos"]): r["z"] for r in rows}
    # label 0, dim 0 is constant (1.0, 1.0): sigma == 0 → NULL, never NaN
    assert by_key[(1, 0)] is None and by_key[(2, 0)] is None
    # label 1 has a single vector: both dims NULL
    assert by_key[(3, 0)] is None and by_key[(3, 1)] is None
    assert not any(z is not None and math.isnan(z) for z in by_key.values())


def test_nested_cast_type_edits_apply_in_offset_order():
    """ADVICE r13 (high): _rewrite_cast_types collected edits in SCAN
    order (outer CAST head first, though its type segment lies RIGHT of
    the inner's), so scan-reverse application shifted the outer edit's
    offsets whenever the inner conversion changed length, corrupting the
    query.  Edits must apply in descending start order."""
    out = translate(
        "SELECT CAST(CAST(x AS ROW(a BIGINT)) AS ROW(a BIGINT)) FROM t"
    )
    assert out == (
        "SELECT CAST(CAST(x AS STRUCT<a: BIGINT>) AS STRUCT<a: BIGINT>) FROM t"
    )
    # length-changing inner conversion, three levels deep
    out = translate(
        "SELECT CAST(CAST(CAST(j AS ARRAY(JSON)) AS ARRAY(JSON)) AS VARCHAR) FROM t"
    )
    assert out == (
        "SELECT CAST(CAST(CAST(j AS ARRAY<STRING>) AS ARRAY<STRING>) AS STRING) FROM t"
    )


def test_closed_subquery_on_does_not_mask_enclosing_clause():
    """ADVICE r13 (low): _nearest_clause_is_on ignored paren depth, so
    the ON of an already-closed subquery classified a later comparison
    in the ENCLOSING clause as a join condition and silently kept
    Spark's null-conflating array equality."""
    q = (
        "SELECT * FROM t WHERE EXISTS "
        "(SELECT 1 FROM a JOIN b ON a.id = b.id) AND arr = ARRAY[1]"
    )
    out = translate(q)
    assert "CASE WHEN" in out and "zip_with" in out, out
    # the subquery's own join key is untouched
    assert "ON a.id = b.id" in out


def test_join_on_conditions_stay_exempt_from_equality_rewrite():
    """The hash-join preservation contract: plain and parenthesized ON
    conditions keep Spark equality; a WHERE on the same line does not."""
    assert translate("SELECT * FROM a JOIN b ON a.arr = b.arr") == (
        "SELECT * FROM a JOIN b ON a.arr = b.arr"
    )
    assert translate("SELECT * FROM a JOIN b ON (a.arr = b.arr)") == (
        "SELECT * FROM a JOIN b ON (a.arr = b.arr)"
    )
    out = translate(
        "SELECT * FROM a JOIN b ON a.id = b.id WHERE a.arr = ARRAY[1]"
    )
    assert "ON a.id = b.id" in out and "zip_with" in out, out


def test_mixed_name_nested_row_equality(spark):
    """r14 self-review (high): the x72 struct recursion applied ONE
    side's merged field names to BOTH sides — a catalog array<struct<
    a,b>> column compared to an ARRAY[ROW(...)] constructor (fields
    col1/col2) raised FIELD_NOT_FOUND.  Shapes are now PER SIDE: each
    operand is accessed through its own names, so the comparison is
    both legal AND three-valued."""
    from mcp_trino_spark.trino_compat import translate

    spark.sql(
        "SELECT array(named_struct('a', 1, 'b', 2)) AS arr"
    ).createOrReplaceTempView("mixed_names_t")
    ct = {"arr": "array<struct<a:int,b:int>>"}
    try:
        got = [
            spark.sql(
                translate(
                    f"SELECT arr = ARRAY[ROW({l})] AS v FROM mixed_names_t",
                    column_types=ct,
                )
            ).collect()[0]["v"]
            for l in ("1, 2", "1, NULL", "2, 2")
        ]
        assert got == [True, None, False], got
    finally:
        # the shared session's catalog-type map resolves bare column
        # names — leaking an `arr` of a different type shadowed the
        # subscript test's array<int> column downstream
        spark.catalog.dropTempView("mixed_names_t")


def test_decimal_avg_named_window_reference():
    """r14 self-review (high): the avg wrap folded only `OVER (…)`,
    stranding a named-window `OVER w` outside the CAST — a parse error
    on valid Trino SQL.  r15: the exact integer protocol replaced the
    wrap; the invariant is now that EVERY generated sum/count carries
    the named-window clause and nothing strands after the final CAST."""
    from mcp_trino_spark.trino_compat import translate

    out = translate(
        "SELECT avg(CAST(x AS DECIMAL(8,3))) OVER w FROM t"
        " WINDOW w AS (PARTITION BY k)"
    )
    assert "sum(CAST(x AS DECIMAL(8,3))) OVER w" in out, out
    assert "count(CAST(x AS DECIMAL(8,3))) OVER w" in out, out
    assert "AS DECIMAL(8, 3)) FROM t WINDOW w AS (PARTITION BY k)" in out, out


def test_angle_split_paren_aware():
    """r14 self-review (high): _split_angle_args was paren-blind, so a
    nested struct with a decimal(p,s)/varchar(n) field collapsed its
    whole shape to None — silently re-opening the x72 conflation for
    every table with parameterized nested types."""
    from mcp_trino_spark.trino_compat import _shape_from_spark_type

    s = _shape_from_spark_type("array<struct<a:decimal(10,2),b:int>>")
    assert s == ("array", ("struct", [("a", None), ("b", None)])), s
    s = _shape_from_spark_type("map<int,struct<x:varchar(5),y:double>>")
    assert s == ("map", ("struct", [("x", None), ("y", ("double",))])), s


def test_float_in_list_subquery_items_not_duplicated():
    """r14 self-review: the x73 IN-list float arm duplicated scalar
    subquery items into the isnan guard (re-planned per copy) — the
    main comparison pass's skip-subqueries contract now applies."""
    from mcp_trino_spark.trino_compat import translate

    out = translate("SELECT 1 FROM t WHERE 1.5E0 IN (nan(), (SELECT f(2)))")
    assert out.count("SELECT f(2)") == 1, out
