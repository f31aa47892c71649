"""SQL front door for the decontamination plans (VERDICT r12 #6):
``decontaminate('table'[, 'mode'])`` must reach the certified l16/l39
plans from the trino dialect through execute_query, with the l39 shape
plan-guarded (no SortMergeJoin — the corpus never shuffles before the
broadcast verify join)."""

import pytest

from mcp_trino_spark.execute import execute_query
from mcp_trino_spark.sources.catalog import register_tables


@pytest.fixture()
def docs_view(spark, sf_dir):
    register_tables(spark, sf_dir)
    yield "documents"


def _rows(res):
    return {r["doc_id"]: r["n_hit_grams"] for r in res.rows}


def test_decontaminate_exact_and_bloom_agree(spark, sf_dir, docs_view):
    exact = execute_query(
        spark,
        "SELECT doc_id, n_hit_grams FROM decontaminate('documents')"
        " ORDER BY doc_id",
        dialect="trino",
    )
    bloom = execute_query(
        spark,
        "SELECT doc_id, n_hit_grams"
        " FROM TABLE(decontaminate('documents', 'bloom'))"
        " ORDER BY doc_id",
        dialect="trino",
    )
    assert len(exact.rows) > 0  # the testdata corpus has seeded hits
    assert _rows(exact) == _rows(bloom)  # FPs cost work, never results
    # the façade drops the temp views it registered
    leftovers = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__decon_")
    ]
    assert leftovers == []


def test_decontaminate_composes_with_sql(spark, sf_dir, docs_view):
    res = execute_query(
        spark,
        "SELECT count(*) AS n_contaminated, max(n_hit_grams) AS worst"
        " FROM decontaminate('documents', 'exact')"
        " WHERE n_hit_grams >= 1",
        dialect="trino",
    )
    (row,) = res.rows
    assert row["n_contaminated"] >= 1
    assert row["worst"] >= 1


def test_decontaminate_bloom_plan_has_no_sort_merge_join(spark, sf_dir, docs_view):
    from mcp_trino_spark.operators.llm_dedup import rewrite_decontaminate

    q = rewrite_decontaminate(
        spark, "SELECT * FROM TABLE(decontaminate('documents', 'bloom'))"
    )
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_rejects_malformed_table_wrapper(spark, docs_view):
    from mcp_trino_spark.operators.llm_dedup import rewrite_decontaminate

    with pytest.raises(ValueError, match="malformed"):
        rewrite_decontaminate(
            spark, "SELECT * FROM TABLE(decontaminate('documents')"
        )


def test_decontaminate_inside_literal_untouched(spark):
    from mcp_trino_spark.operators.llm_dedup import rewrite_decontaminate

    q = "SELECT 'decontaminate(''documents'')' AS s"
    assert rewrite_decontaminate(spark, q) == q
