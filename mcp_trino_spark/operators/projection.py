"""Projection / filter / predicate operators — SURVEY §2.3 (P1-P9).

Reference surface: SELECT-list projection, aliasing, comparison and
boolean predicates, BETWEEN/IN, NULL tests, LIKE, CASE WHEN, DISTINCT
(reference internal/mcp/handlers.go:290 tool contract;
internal/trino/client_test.go:149, comment_test.go:72-74 show them in
real queries).  All are single-pass narrow operators in Spark: Catalyst
pushes the predicates and the column set into the parquet scan, so at
100 TB these run as a scan-only stage with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import register


@register(
    "p1_projection",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    """,
)
def p1_projection(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    return customer.select("c_custkey", "c_name", "c_acctbal")


@register(
    "p2_alias_expr",
    oracle="""
    SELECT o_orderkey, o_totalprice * 0.9 AS discounted_price FROM orders
    """,
)
def p2_alias_expr(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    # double * exact-binary literal → bit-identical across engines
    return orders.select(
        "o_orderkey", (F.col("o_totalprice") * F.lit(0.9)).alias("discounted_price")
    )


@register(
    "p3_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity >= 30 AND l_discount <> 0.0
    """,
)
def p3_comparison(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") >= 30) & (F.col("l_discount") != 0.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "p4_boolean_connectives",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 100000.0) AND NOT (o_orderpriority = '1-URGENT')
    """,
)
def p4_boolean_connectives(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 100000.0)) & ~(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return orders.filter(cond).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "p5_between_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
    """,
)
def p5_between_in(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "p6_null_predicates",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal IS NOT NULL THEN 1 ELSE 0 END AS has_bal
    FROM customer WHERE c_name IS NOT NULL
    """,
)
def p6_null_predicates(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    return customer.filter(F.col("c_name").isNotNull()).select(
        "c_custkey",
        F.when(F.col("c_acctbal").isNotNull(), 1).otherwise(0).alias("has_bal"),
    )


@register(
    "p7_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_type LIKE '%ECON%' OR p_name LIKE 'red%' OR p_name LIKE 'h_t%'
    """,
)
def p7_like(spark, sf_dir):
    """LIKE with %-wildcards AND the single-char _ wildcard ('h_t%'
    matches 'hot ...').  Patterns chosen to MATCH this testdata's
    vocabulary — the old TPC-H-style '%BRASS%' matched zero rows at
    every scale factor, so the oracle verified only empty == empty."""
    (part,) = T(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("%ECON%")
        | F.col("p_name").like("red%")
        | F.col("p_name").like("h_t%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "p8_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000.0 THEN 'big'
                WHEN o_totalprice > 50000.0 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def p8_case_when(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000.0, "big")
        .when(F.col("o_totalprice") > 50000.0, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "p9_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def p9_distinct(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    # distinct = hash-agg on the key pair: map-side partial dedup first,
    # so the shuffle carries only unique pairs — scale-safe.
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "p11_null_safe_compare",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg_a,
             NULLIF(c_mktsegment, 'MACHINERY') AS seg_b
      FROM customer
    )
    SELECT c_custkey,
           seg_a IS DISTINCT FROM seg_b AS differs,
           seg_a IS NOT DISTINCT FROM seg_b AS same,
           seg_a IS NULL AS a_null
    FROM t
    """,
)
def p11_null_safe_compare(spark, sf_dir):
    """IS [NOT] DISTINCT FROM — null-safe comparison (NULL vs NULL is
    'same', NULL vs value 'differs'), the predicate family where plain
    =/<> silently yields NULL.  Spark's `<=>` operator is the same
    semantics."""
    (customer,) = T(spark, sf_dir, "customer")
    seg_a = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    seg_b = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    same = seg_a.eqNullSafe(seg_b)
    return customer.select(
        "c_custkey",
        (~same).alias("differs"),
        same.alias("same"),
        seg_a.isNull().alias("a_null"),
    )
