"""Aggregation operators — SURVEY §2.5 (A1-A15).

Reference declares "aggregations" in its tool contract (reference
internal/mcp/handlers.go:290) with worked GROUP BY examples
(docs/tools.md:14-17).  Trino's partial+final hash aggregation across
fragments is exactly Spark's HashAggregateExec partial/final pair —
map-side combine means the shuffle carries one row per (partition ×
group), which is what keeps grand aggregates and low-cardinality
groupings cheap at 100 TB.

Float policy: every SUM/AVG over doubles goes through the exact-decimal
pattern (registry.dsum) so results are order-independent and
oracle-hashable — see registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.operators._util import T, register_view
from mcp_trino_spark.registry import DAVG, DSUM, IAVG, ISUM, davg, dsum, iavg, isum, register


@register(
    "a1_groupby_count",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
    """,
)
def a1_groupby_count(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(F.count("*").alias("n"))


@register(
    "a2_sum_avg_min_max",
    oracle=f"""
    SELECT l_returnflag,
           {ISUM('l_quantity')} AS sum_qty,
           {ISUM('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           {IAVG('l_extendedprice')} AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a2_sum_avg_min_max(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        isum("l_quantity").alias("sum_qty"),
        isum(revenue, 4).alias("revenue"),
        iavg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "a3_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY o_orderstatus
    """,
)
def a3_count_distinct(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    # COUNT(DISTINCT) expands to a two-phase agg (dedup then count) —
    # Catalyst plans it; no driver-side set needed.
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs")
    )


@register(
    "a4_multikey",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_multikey(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "a5_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders FROM orders
    GROUP BY o_custkey HAVING COUNT(*) > 12
    """,
)
def a5_having(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@register(
    "a6_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {ISUM('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def a6_grouping_sets(spark, sf_dir):
    register_li(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "a7_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a7_rollup(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "a8_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a8_cube(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "a9_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS sum_discounted
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_filtered_agg(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.sum(
            F.when(
                F.col("l_discount") > 0.05,
                F.col("l_extendedprice").cast("decimal(25,6)"),
            )
        )
        .cast("double")
        .alias("sum_discounted"),
    )


@register(
    "a10_min_by_max_by",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
      FROM orders
    )
    SELECT o_custkey,
           MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS best_order,
           MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS worst_order
    FROM r GROUP BY o_custkey
    """,
)
def a10_min_by_max_by(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    # Tie-break on o_orderkey inside the ordering struct so both engines
    # pick the same row when totalprice ties.
    ordkey = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("best_order"),
        F.min_by("o_orderkey", ordkey).alias("worst_order"),
    )


@register(
    "a11_stats",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(c_acctbal) AS n,
           {DSUM('c_acctbal')} AS s1,
           {DSUM('c_acctbal * c_acctbal', prec=30)} AS s2
    FROM customer GROUP BY c_mktsegment
    """,
)
def a11_stats(spark, sf_dir):
    """Statistical aggregates, exact-checkable formulation.

    stddev/variance/corr differ across engines in accumulation order, so
    the *declared* check is on exact moment sums (n, Σx, Σx²) from which
    variance/stddev derive deterministically; a11b_stats_native below
    registers the native stddev/var functions under the rows-only check.
    """
    (customer,) = T(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    return customer.groupBy("c_mktsegment").agg(
        F.count(x).alias("n"),
        dsum(x).alias("s1"),
        dsum(x * x, prec=30).alias("s2"),
    )


@register(
    "a11b_stats_native",
    oracle="""
    SELECT c_mktsegment,
           round(stddev(c_acctbal), 6) AS stddev_bal,
           round(var_samp(c_acctbal), 6) AS var_bal,
           round(skewness(c_acctbal) * (count(c_acctbal) - 2)
                 / sqrt(count(c_acctbal) * (count(c_acctbal) - 1.0)),
                 6) AS skew_bal,
           round(kurtosis(c_acctbal), 6) AS kurt_bal,
           round(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 6)
             AS corr_bal_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def a11b_stats_native(spark, sf_dir):
    """Native statistical aggregates with TRINO's conventions.

    Rows-only until round 10 (float accumulation order), which hid a
    real parity bug: Spark's ``kurtosis`` is the POPULATION excess g2
    where Trino documents the UNBIASED sample estimator — silently
    different values on every group.  Emits Trino's form via the
    algebraic bridge G2 = (n-1)/((n-2)(n-3))·((n+1)·g2 + 6) (same as
    the x46 dialect rewrite), NULL below n=4.  Skewness is population
    g1 on BOTH engines (DuckDB's is sample-adjusted — the oracle
    converts).  Rounding to 6 decimals absorbs the cross-engine
    accumulation-order ULPs that forced the old rows-only contract,
    upgrading the entry to a full value-hash oracle.
    """
    (customer,) = T(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    n = F.count(x)
    g2 = F.kurtosis(x)
    kurt = F.when(
        n > 3,
        (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + F.lit(6)),
    )
    return customer.groupBy("c_mktsegment").agg(
        F.round(F.stddev(x), 6).alias("stddev_bal"),
        F.round(F.variance(x), 6).alias("var_bal"),
        F.round(F.skewness(x), 6).alias("skew_bal"),
        F.round(kurt, 6).alias("kurt_bal"),
        F.round(F.corr(x, F.col("c_custkey").cast("double")), 6).alias(
            "corr_bal_key"
        ),
    )


@register(
    "a12_array_agg",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def a12_array_agg(spark, sf_dir):
    (nation,) = T(spark, sf_dir, "nation")
    # collect_list order is undefined → sort_array for determinism, then
    # join to a string so both engines hash the same scalar value.
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names")
    )


@register("a13_approx_distinct")  # rows-only: sketches differ across engines
def a13_approx_distinct(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    # HLL++ sketch: mergeable across partitions → single narrow shuffle of
    # sketch bytes, the 100 TB-safe way to count distincts.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders")
    )


@register(
    "a14_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.5) AS DOUBLE), 6) AS p50,
           ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.9) AS DOUBLE), 6) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a14_percentile(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    # Exact interpolated percentile matches DuckDB's quantile_cont up to
    # interpolation ULPs → ROUND(…,6) both sides; the approx_percentile
    # twin is a14b (rows-only).
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
    )


@register("a14b_approx_percentile")  # rows-only: t-digest vs exact differ
def a14b_approx_percentile(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_approx")
    )


@register(
    "a15_grand_agg",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {DSUM('l_extendedprice')} AS total_price
    FROM lineitem
    """,
)
def a15_grand_agg(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("total_price"),
    )


def register_li(spark, sf_dir):
    register_view(spark, sf_dir, "lineitem")


@register(
    "a16_salted_skew_agg",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {DSUM('l_quantity')} AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a16_salted_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation for pathologically skewed keys.

    l_returnflag has 3 values over 600 k rows — the worst-case skew
    shape: a plain groupBy funnels each key through one reducer.  Phase
    1 salts the key with a random-free deterministic shard (orderkey %
    SALT), aggregating (key, shard) partials across all cores; phase 2
    combines SALT partial rows per key — input to the final shuffle is
    #keys × SALT rows, independent of data size.  (Spark's partial
    aggregation often achieves this implicitly; explicit salting is the
    guaranteed form when partial agg degrades — e.g. high-cardinality
    intermediate state or collect_list-style aggregates.)
    """
    SALT = 32
    (li,) = T(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("shard", (F.col("l_orderkey") % SALT).cast("int"))
        .groupBy("l_returnflag", "shard")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("pqty"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("pqty").cast("double").alias("qty"),
    )


@register(
    "a17_bool_aggs_median",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 400000.0) AS any_over_400k,
           median(CAST(o_totalprice AS DOUBLE)) AS median_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def a17_bool_aggs_median(spark, sf_dir):
    """bool_and / bool_or / median — same names on Spark, Trino and
    DuckDB.  median is exact here (oracle-matchable); the approximate
    scale path is percentile_approx (a14b)."""
    (orders,) = T(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(p > 1000.0).alias("all_over_1k"),
        F.bool_or(p > 400000.0).alias("any_over_400k"),
        F.median(p.cast("double")).alias("median_price"),
    )


@register(
    "a18_pivot",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS status_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS status_o,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS status_p
    FROM orders GROUP BY 1
    """,
)
def a18_pivot(spark, sf_dir):
    """PIVOT: order totals per year, one column per order status.

    Spark's ``groupBy().pivot(col, values)`` with an EXPLICIT values
    list — passing the list keeps the plan a single hash aggregate
    (omit it and Spark runs an extra distinct-collect job to discover
    the columns, a driver-side round-trip you never want at 100 TB).
    The pivot compiles to exactly the conditional-aggregation form the
    oracle spells out, so it scales as a plain groupBy.
    """
    (orders,) = T(spark, sf_dir, "orders")
    piv = (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(25,6)").alias("tp"),
        )
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("tp").cast("double"))
    )
    return piv.select(
        "order_year",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


@register(
    "a19_unpivot",
    oracle="""
    WITH wide AS (
      SELECT n_name,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS customer_bal,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS supplier_bal
      FROM nation
      LEFT JOIN customer ON c_nationkey = n_nationkey
      LEFT JOIN supplier ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, 'customer_bal' AS side, customer_bal AS total FROM wide
    UNION ALL
    SELECT n_name, 'supplier_bal' AS side, supplier_bal AS total FROM wide
    """,
)
def a19_unpivot(spark, sf_dir):
    """UNPIVOT (Trino users write this as a UNION ALL of projections;
    Spark 4 has a native ``DataFrame.unpivot`` / SQL UNPIVOT that melts
    wide columns to (variable, value) rows WITHOUT re-reading the input
    once per column — one pass, narrow transform, no shuffle beyond the
    upstream aggregate).

    Note: the upstream double-join inflates the balances (each customer
    row repeats per supplier in the nation) — deliberate here, it keeps
    the oracle a verbatim standard-SQL unpivot of the same wide table.
    """
    nation, customer, supplier = T(spark, sf_dir, "nation", "customer", "supplier")
    wide = (
        nation.join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .join(supplier, supplier.s_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            dsum("c_acctbal").alias("customer_bal"),
            dsum("s_acctbal").alias("supplier_bal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["customer_bal", "supplier_bal"],
        variableColumnName="side",
        valueColumnName="total",
    )


@register("a20_sketch_reaggregate")  # rows-only: sketch estimates are engine-local
def a20_sketch_reaggregate(spark, sf_dir):
    """Reaggregatable distinct-count sketches (Trino approx_set → merge
    → cardinality; reference passes that SQL through, client.go:501-617;
    the dialect layer rewrites it to this exact plan): per-nation HLL
    sketches of customer keys, UNIONED up to region level without ever
    reshuffling raw keys.

    This is the 100 TB rollup pattern a plain approx_count_distinct
    (a13) can't express: the nation-level sketch table is tiny
    (~KB/sketch) and materializable, and any coarser rollup — region,
    global, time-windowed — reaggregates the sketches instead of
    re-scanning the fact table.  Plan: one partial+final sketch agg on
    nationkey, broadcast nation dim, then a sketch-union agg whose
    shuffle carries |nations| sketch blobs.
    """
    customer, nation = T(spark, sf_dir, "customer", "nation")
    per_nation = customer.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.count("*").alias("n_rows"),
    )
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("approx_distinct_customers"),
            F.sum("n_rows").alias("n_customers"),
        )
    )


@register("a21_qdigest_rollup")  # rows-only: sketch estimates are engine-local
def a21_qdigest_rollup(spark, sf_dir):
    """Reaggregatable QUANTILE sketches — the Trino qdigest family
    (``qdigest_agg`` → ``merge`` → ``value_at_quantile``; the reference
    passes that SQL through, client.go:501-617): per-nation sketches of
    customer balances, merged up to region level without ever
    re-scanning or reshuffling raw balances.

    The quantile twin of a20's HLL rollup, and the pattern Spark's own
    ``percentile_approx`` cannot express (it is not reaggregatable):
    the nation-level sketch table is KB-sized and materializable, and
    any coarser rollup — region, global, time-windowed — merges
    sketches instead of re-reading the fact table.  Plan: two-level
    sketch build on (nationkey, scan-partition shard) so no Python
    worker ever holds a whole nation's values (qdigest.py explains why
    a value-based shard would be exactly wrong for heavy-hitter
    values), broadcast nation dim, then a |nations|-row sketch merge
    per region.  Accuracy and determinism
    are asserted in tests/test_qdigest.py (rank error ≤ 2·W/K).
    """
    from mcp_trino_spark.functions.qdigest import (
        qdigest_by, qdigest_merge_by, with_quantiles,
    )

    customer, nation = T(spark, sf_dir, "customer", "nation")
    per_nation = qdigest_by(customer, "c_acctbal", ["c_nationkey"])
    tagged = per_nation.join(
        F.broadcast(nation), per_nation.c_nationkey == nation.n_nationkey
    ).select("n_regionkey", "vs", "ws")
    per_region = qdigest_merge_by(tagged, ["n_regionkey"])
    return with_quantiles(per_region, [0.5, 0.9, 0.99]).select(
        "n_regionkey", "p50", "p90", "p99"
    )


@register("a21b_weighted_qdigest_rollup")  # rows-only: sketch estimates are engine-local
def a21b_weighted_qdigest_rollup(spark, sf_dir):
    """WEIGHTED reaggregatable quantile sketches — the bounded-memory
    engine path for Trino's ``approx_percentile(x, w, percentage)``
    (reference passes that SQL through, client.go:501-617; the
    trino_compat x45 SQL rewrite is the oracle-exact twin and
    documents why its exact ``percentile(x, p, w)`` plan is a 100 TB
    memory hazard on high-cardinality measures).

    Quantiles of ``l_extendedprice`` weighted by ``l_quantity`` —
    exactly the wall scenario: a near-unique double measure, so an
    exact weighted percentile's value→count state grows linearly with
    the group, while this sketch holds ≤ K centroids per group no
    matter how many distinct prices exist.  Plan: two-level weighted
    build on (returnflag, linestatus, scan-partition shard) — the
    shuffle carries (key, value, weight) triples only — then a
    KB-sized sketch merge rolls (returnflag, linestatus) up to
    returnflag without re-scanning lineitem.  Rank-error ≤ 2·W/K of
    total WEIGHT is pinned on weighted inputs in
    tests/test_qdigest.py.
    """
    from mcp_trino_spark.functions.qdigest import (
        qdigest_merge_by, weighted_qdigest_by, with_quantiles,
    )

    (lineitem,) = T(spark, sf_dir, "lineitem")
    per_pair = weighted_qdigest_by(
        lineitem, "l_extendedprice", "l_quantity",
        ["l_returnflag", "l_linestatus"],
    )
    per_flag = qdigest_merge_by(per_pair, ["l_returnflag"])
    return with_quantiles(per_flag, [0.5, 0.9, 0.99]).select(
        "l_returnflag", "p50", "p90", "p99"
    )


@register("a22_misra_gries_rollup")  # rows-only: sketch estimates are engine-local
def a22_misra_gries_rollup(spark, sf_dir):
    """Reaggregatable HEAVY-HITTER sketches — Misra-Gries summaries
    (the engine-side design behind Trino's ``approx_most_frequent``,
    which the reference passes through, client.go:501-617): per-nation
    market-segment summaries merged up to region level without ever
    re-scanning or reshuffling raw segment values.

    Completes the mergeable-sketch trio (a20 HLL → distinct counts,
    a21 qdigest → quantiles, a22 Misra-Gries → frequencies) and is the
    documented cardinality-wall upgrade path for the EXACT
    approx_most_frequent rewrite (trino_compat.py): when per-group
    distinct values explode, capacity-bounded summaries replace the
    per-(group, value) count shuffle.  Plan: two-level (nationkey,
    scan-partition shard) build — no worker ever holds more than one
    scan partition's contribution — then a |nations|-row summary merge
    per region.  Error bound (undercount ≤ W/(capacity+1)) and
    merge-order invariance are asserted in tests/test_heavyhitters.py.
    """
    from mcp_trino_spark.functions.heavyhitters import (
        heavy_hitters_by, heavy_hitters_merge_by, top_k,
    )

    customer, nation = T(spark, sf_dir, "customer", "nation")
    per_nation = heavy_hitters_by(
        customer, "c_mktsegment", ["c_nationkey"], capacity=3, n_shards=8
    )
    tagged = per_nation.join(
        F.broadcast(nation), per_nation.c_nationkey == nation.n_nationkey
    ).select("n_regionkey", "hh_vals", "hh_counts", "hh_err")
    per_region = heavy_hitters_merge_by(tagged, ["n_regionkey"], capacity=3)
    return top_k(per_region, 2).orderBy("n_regionkey", "value")
