"""Registry entries exercising the explain surface (F6) — rows-only
checks (plan text is engine-specific by nature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.registry import register
from mcp_trino_spark.sources.catalog import register_tables


@register("f6_explain_distributed")  # rows-only: plan text is engine-specific
def f6_explain_distributed(spark, sf_dir):
    """DISTRIBUTED (physical) explain of a join+agg query, as rows."""
    from mcp_trino_spark.plans.explain import explain_query

    register_tables(spark, sf_dir)
    res = explain_query(
        spark,
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC
        """,
        "DISTRIBUTED",
    )
    return spark.createDataFrame([(r["plan"],) for r in res.rows], "plan STRING")


@register("f6b_explain_io")  # rows-only: file paths are environment-specific
def f6b_explain_io(spark, sf_dir):
    from mcp_trino_spark.plans.explain import explain_query

    register_tables(spark, sf_dir)
    res = explain_query(
        spark,
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45",
        "IO",
    )
    return spark.createDataFrame(
        [(r["kind"], r["path"], r["bytes"]) for r in res.rows],
        "kind STRING, path STRING, bytes BIGINT",
    )
