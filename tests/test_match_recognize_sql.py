"""MATCH_RECOGNIZE SQL front-end (trino_mr.py): real Trino query text
through execute_query(dialect='trino'), verified against the direct
operator call, plus loud rejection of the unsupported clause space.
"""

import pytest

from mcp_trino_spark.execute import execute_query
from mcp_trino_spark.trino_compat import TrinoCompatError
from mcp_trino_spark.trino_mr import expand_match_recognize, has_match_recognize

VSHAPE_SQL = """
SELECT o_custkey, mn, n_down, n_up, bottom, start_key
FROM orders_mr MATCH_RECOGNIZE (
  PARTITION BY o_custkey
  ORDER BY o_orderdate, o_orderkey
  MEASURES MATCH_NUMBER() AS mn,
           COUNT(D.*) AS n_down,
           COUNT(U.*) AS n_up,
           MIN(o_totalprice) AS bottom,
           FIRST(o_orderkey) AS start_key
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (D+ U+)
  DEFINE D AS o_totalprice < PREV(o_totalprice),
         U AS o_totalprice > PREV(o_totalprice)
) ORDER BY o_custkey, mn
"""


@pytest.fixture(scope="module")
def orders_view(spark, sf_dir):
    from mcp_trino_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_mr")
    return "orders_mr"


def test_vshape_sql_matches_operator(spark, sf_dir, orders_view):
    res = execute_query(spark, VSHAPE_SQL, dialect="trino")
    assert res.columns == ["o_custkey", "mn", "n_down", "n_up", "bottom",
                          "start_key"]
    got = {(r["o_custkey"], r["mn"]): (r["n_down"], r["n_up"], r["bottom"],
                                       r["start_key"]) for r in res.rows}
    assert got, "expected at least one V-shape match in testdata"

    from mcp_trino_spark.registry import QUERIES
    from mcp_trino_spark import registry  # noqa: F401 - trigger load
    registry._ensure_loaded()
    direct = QUERIES["t10_match_recognize_vshape"](spark, sf_dir).collect()
    want = {(r["o_custkey"], r["match_no"]): (r["n_down"], r["n_up"],
                                              r["bottom_price"], r["start_key"])
            for r in direct}
    assert got == want


def test_detection_ignores_literals(spark):
    assert not has_match_recognize("SELECT 'MATCH_RECOGNIZE (x)'")
    assert not has_match_recognize("SELECT 1 -- MATCH_RECOGNIZE")
    assert has_match_recognize("SELECT * FROM t MATCH_RECOGNIZE (PATTERN (A))")


@pytest.mark.parametrize("frag,msg", [
    ("ALL ROWS PER MATCH SHOW EMPTY MATCHES", "modifier|EMPTY"),
    ("AFTER MATCH SKIP TO END OF MATCH", "not supported"),
    ("SUBSET X = D, U", "SUBSET"),  # malformed: needs parens
])
def test_unsupported_clauses_fail_loudly(spark, orders_view, frag, msg):
    # swap the supported row/skip/subset clauses for the unsupported one
    q = VSHAPE_SQL.replace(
        "ONE ROW PER MATCH\n  AFTER MATCH SKIP PAST LAST ROW", frag
    )
    assert frag in q
    with pytest.raises(TrinoCompatError, match=msg):
        expand_match_recognize(spark, q)


def test_subquery_base_rejected(spark):
    q = ("SELECT * FROM (SELECT 1 AS a) MATCH_RECOGNIZE (PARTITION BY a "
         "ORDER BY a MEASURES COUNT(*) AS n PATTERN (X) DEFINE X AS a = 1)")
    with pytest.raises(TrinoCompatError, match="table or view"):
        expand_match_recognize(spark, q)


def test_expression_measure_rejected(spark, orders_view):
    q = VSHAPE_SQL.replace("MIN(o_totalprice) AS bottom",
                           "MIN(o_totalprice * 2) AS bottom")
    with pytest.raises(TrinoCompatError, match="measure argument"):
        expand_match_recognize(spark, q)


def test_next_navigation_and_desc_order(spark, orders_view):
    # NEXT() + DESC ordering both go through the lag/lead rewrite path
    q = """
    SELECT o_custkey, n FROM orders_mr MATCH_RECOGNIZE (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC
      MEASURES COUNT(*) AS n
      PATTERN (R+)
      DEFINE R AS o_totalprice > NEXT(o_totalprice)
    )"""
    res = execute_query(spark, q, dialect="trino")
    assert res.columns == ["o_custkey", "n"]
    assert all(r["n"] >= 1 for r in res.rows)


def test_prev_inside_string_literal_not_rewritten():
    """_rewrite_navigation must be literal-aware: PREV( inside a quoted
    string is content, not navigation (repo invariant: rewrites never
    edit literal text)."""
    from mcp_trino_spark.trino_mr import _rewrite_navigation

    pred, needed = _rewrite_navigation(
        "note <> 'use PREV(price) here' AND price > PREV(price)"
    )
    assert "'use PREV(price) here'" in pred
    assert pred.endswith("price > __prev_price_1")
    assert needed == {"__prev_price_1": ("prev", "price", 1)}


def test_mr_temp_views_dropped_after_execute(spark, sf_dir, orders_view):
    before = {t.name for t in spark.catalog.listTables() if t.name.startswith("__mr_")}
    execute_query(spark, VSHAPE_SQL, dialect="trino")
    after = {t.name for t in spark.catalog.listTables() if t.name.startswith("__mr_")}
    assert after <= before, f"leaked MATCH_RECOGNIZE views: {after - before}"


def test_overlapping_defines_fail_loudly(spark, sf_dir, orders_view):
    sql = """
    SELECT o_custkey, mn FROM orders_mr MATCH_RECOGNIZE (
      PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey
      MEASURES MATCH_NUMBER() AS mn
      PATTERN (A B)
      DEFINE A AS o_totalprice > 0,
             B AS o_totalprice > 10
    )
    """
    with pytest.raises(Exception, match="mutually"):
        execute_query(spark, sql, dialect="trino")


def test_measures_columns_in_declared_order(spark, sf_dir, orders_view):
    """Review fix: SELECT * must present MEASURES columns in their
    DECLARED positions — including MATCH_NUMBER() mid-list, which the
    operator otherwise emits right after the partition keys."""
    res = execute_query(
        spark,
        """
        SELECT * FROM orders_mr MATCH_RECOGNIZE (
          PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          MEASURES FIRST(o_orderkey) AS fk,
                   MATCH_NUMBER() AS mn,
                   COUNT(*) AS n
          PATTERN (D+ U+)
          DEFINE D AS o_totalprice < PREV(o_totalprice),
                 U AS o_totalprice > PREV(o_totalprice)
        ) LIMIT 1
        """,
        dialect="trino",
    )
    assert res.columns == ["o_custkey", "fk", "mn", "n"]


def test_seek_modifier_fails_loudly(spark, orders_view):
    """Review fix: Trino modifiers after ONE ROW PER MATCH (SEEK, ...)
    were silently dropped — they must raise, since running INITIAL
    semantics instead would silently change the match set."""
    with pytest.raises(TrinoCompatError, match="SEEK|modifier"):
        execute_query(
            spark,
            """
            SELECT * FROM orders_mr MATCH_RECOGNIZE (
              PARTITION BY o_custkey
              ORDER BY o_orderdate
              MEASURES COUNT(*) AS n
              ONE ROW PER MATCH SEEK
              PATTERN (D+)
              DEFINE D AS o_totalprice < PREV(o_totalprice)
            )
            """,
            dialect="trino",
        )
