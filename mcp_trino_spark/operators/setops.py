"""Sort / limit / top-k / set ops / CTEs / subqueries — SURVEY §2.7 (O1-O10).

Reference examples: ``ORDER BY customer_count DESC`` (reference
docs/tools.md:15,169), top-k ``ORDER BY acctbal DESC LIMIT 5``
(docs/tools.md:235-246), CTE acceptance (internal/trino/client.go:289).
Top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows) — no global sort ever materializes, which is the 100 TB
answer to ORDER BY … LIMIT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.operators._util import T, register_view
from mcp_trino_spark.registry import DSUM, dsum, register


@register(
    "o1_order_by",
    oracle="""
    SELECT n_name, n_regionkey FROM nation
    ORDER BY n_regionkey ASC NULLS LAST, n_name DESC
    """,
)
def o1_order_by(spark, sf_dir):
    (nation,) = T(spark, sf_dir, "nation")
    return nation.select("n_name", "n_regionkey").orderBy(
        F.col("n_regionkey").asc_nulls_last(), F.col("n_name").desc()
    )


@register(
    "o2_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC LIMIT 5
    """,
)
def o2_topk(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    # unique tie-break key (c_custkey) keeps top-k deterministic across engines
    return (
        customer.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc())
        .limit(5)
    )


@register("o3_limit")  # rows-only: LIMIT without ORDER BY is nondeterministic
def o3_limit(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber").limit(10)


@register(
    "o4_nulls_ordering",
    oracle="""
    SELECT has_null, v FROM (
      SELECT CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS v,
             CASE WHEN l_linenumber % 3 = 0 THEN 1 ELSE 0 END AS has_null,
             l_orderkey, l_linenumber
      FROM lineitem
    ) t
    ORDER BY v ASC NULLS FIRST, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def o4_nulls_ordering(spark, sf_dir):
    """Explicit NULLS FIRST/LAST control (Trino defaults NULLS LAST,
    Spark ASC defaults NULLS FIRST — always written explicitly)."""
    (li,) = T(spark, sf_dir, "lineitem")
    t = li.select(
        F.when(F.col("l_linenumber") % 3 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("v"),
        F.when(F.col("l_linenumber") % 3 == 0, 1).otherwise(0).alias("has_null"),
        "l_orderkey",
        "l_linenumber",
    )
    return (
        t.orderBy(
            F.col("v").asc_nulls_first(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
        .select("has_null", "v")
    )


@register(
    "o5_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
)
def o5_union_all(spark, sf_dir):
    customer, supplier = T(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src"))
    b = supplier.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    return a.unionAll(b)


@register(
    "o6_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def o6_union_distinct(spark, sf_dir):
    customer, supplier = T(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("nationkey"))
    b = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@register(
    "o7_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def o7_intersect(spark, sf_dir):
    customer, supplier = T(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("nationkey"))
    b = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@register(
    "o8_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def o8_except(spark, sf_dir):
    """Customers minus high-value purchasers.  The >300k predicate makes
    the difference NON-EMPTY at the oracle scale factors (the old
    nationkey EXCEPT was the empty set at sf0.01 — verifying nothing)."""
    customer, orders = T(spark, sf_dir, "customer", "orders")
    a = customer.select(F.col("c_custkey").alias("custkey"))
    b = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == SQL EXCEPT (set semantics); exceptAll is bag-EXCEPT ALL
    return a.subtract(b)


@register(
    "o9_cte",
    oracle=f"""
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS n_orders, {DSUM('o_totalprice')} AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_customers,
           {DSUM('co.total')} AS segment_total
    FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def o9_cte(spark, sf_dir):
    customer, orders = T(spark, sf_dir, "customer", "orders")
    cust_orders = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total")
    )
    return (
        customer.join(cust_orders, customer.c_custkey == cust_orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), dsum("total").alias("segment_total"))
    )


@register(
    "o10_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(c_acctbal) FROM customer)
    """,
)
def o10_scalar_subquery(spark, sf_dir):
    register_view(spark, sf_dir, "customer")
    # Catalyst plans the scalar subquery as a broadcast single-row join;
    # the correlated variant decorrelates to an aggregate+join.  The
    # threshold mean uses the exact-decimal pattern (registry.py
    # doctrine) — a raw double AVG differs in last ULPs between engines
    # and any row AT the boundary would flip.
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(c_acctbal) FROM customer)"
    )


@register(
    "o10b_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > (SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def o10b_correlated_subquery(spark, sf_dir):
    """Correlated-subquery filter with an exact-decimal per-customer
    mean threshold — identical SQL both engines (a raw double AVG's
    partial-merge order differs, and a price at the 2x-mean boundary
    would flip the row set)."""
    register_view(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o "
        "WHERE o_totalprice > (SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"
    )


_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
      FROM orders
    ),
    spine(month_start, hi) AS (
      SELECT lo, hi FROM bounds
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE), hi FROM spine
      WHERE month_start < hi
    ),
    m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ms, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT s.month_start, COALESCE(m.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN m ON m.ms = s.month_start
"""


@register("o11_recursive_cte", oracle=_RECURSIVE_SPINE_SQL)
def o11_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Trino SQL surface, reference client.go pass-through;
    Spark 4 executes recursive CTEs natively via UnionLoop): a dense
    month spine generated recursively between the corpus's first and
    last order month, left-joined to per-month order counts — the
    gap-preserving calendar shape (cf. t6, which builds the spine with
    sequence+explode instead; both plans are valid, this one exercises
    the recursive execution path).

    The recursion depth is bounded by the date RANGE (~80 months), not
    the data volume — each iteration is a one-row frame, so the loop
    cost is constant at any corpus scale and the data-sized work stays
    in the single month aggregate + join.  The IDENTICAL SQL text runs
    on both engines.
    """
    register_view(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)
