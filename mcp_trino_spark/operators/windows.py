"""Window functions — SURVEY §2.6 (W1-W10).

Part of the reference's declared Trino SQL surface (its EXPLAIN example
shows Trino's NULLS LAST default sort at reference docs/tools.md:182).
Every window here partitions by a real key (order, customer, nation,
user) — never an empty partition — so at 100 TB each partition's state
fits one task and the only shuffle is the hash exchange on the
partition key.  Global-ordering windows are deliberately absent from
the declared surface (they serialize onto one task).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import register


@register(
    "w1_row_number",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_shipdate ASC NULLS LAST, l_linenumber ASC) AS rn
    FROM lineitem
    """,
)
def w1_row_number(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_shipdate").asc_nulls_last(), F.col("l_linenumber").asc()
    )
    return li.select(
        "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn")
    )


@register(
    "w2_rank_dense_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST) AS bal_dense
    FROM customer
    """,
)
def w2_rank_dense_rank(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc_nulls_last())
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense"),
    )


def _global_rank(spark, df, order_cols):
    """Distributed global row_number over a total order — the 100 TB
    form of an unpartitioned ranking window.

    An unpartitioned window funnels the whole table through ONE task.
    The scalable plan: range-repartition on the sort key, rank locally
    per partition, then add per-partition row-count prefix offsets
    (metadata-sized driver collect: one count per partition).  Global
    rank = local rank + offset; NTILE/percent_rank/cume_dist follow
    closed-form from (rank, total).  No stage touches more than one
    partition of data, and the only global coordination is the N-row
    count exchange.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak) so
    range boundaries are unambiguous and rank functions defined on
    peer groups degenerate to row-number formulas exactly.

    Returns ``(ranked_df, total)`` where ranked_df = df's columns + a
    global 1-based ``rn``.  The returned frame is persisted (range
    boundaries are SAMPLED per job, so the counts job and the ranking
    job must share one materialization; at 100 TB: write the
    repartitioned table, then rank from it).  Lifecycle: the registry
    callers (w3/w3b/w4) return lazy DataFrames, so they cannot
    unpersist before execution — every harness (check_correctness,
    bench, driver) clears the cache between entries instead; a library
    caller embedding this in a long-lived session should
    ``spark.catalog.clearCache()`` or unpersist after materializing.
    """
    n_parts = spark.sparkContext.defaultParallelism
    # Sort within the range partitions and stamp each row's partition-
    # local POSITION via monotonically_increasing_id (r16, guide §2.4):
    # mid = (partition id << 33) | row position, evaluated above the
    # sort and frozen by the persist, so local rank = mid − (pid << 33)
    # — no Window node at all.  The old row_number() Window required
    # hashpartitioning(pid), which the planner cannot recognize the
    # range partitioning as satisfying (pid IS the partition, but that
    # fact is invisible to Catalyst), so the whole table was shuffled a
    # SECOND time before ranking; this shape keeps the single range
    # exchange (plans/r16/w3b_*: 2 data exchanges + Window → 1 + none).
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    from mcp_trino_spark.operators.opcache import persist_tracked

    part = persist_tracked(part)
    counts = {
        r["pid"]: r["cnt"]
        for r in part.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    if counts and max(counts.values()) >= (1 << 33):
        # mid's per-partition position field is 33 bits; a partition
        # beyond 8.6B rows would wrap into the partition-id bits.
        # Unreachable with sane n_parts at any target scale — loud
        # guard rather than silent corruption.
        raise RuntimeError(
            "global rank: a range partition exceeds 2^33 rows; "
            "raise the partition count"
        )
    total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "pid INT, off BIGINT",
        )
    )
    ranked = (
        part.join(off_df, "pid")
        .withColumn(
            "rn",
            F.col("__mid")
            - F.col("pid").cast("long") * F.lit(1 << 33)
            + F.lit(1)
            + F.col("off"),
        )
        .drop("pid", "off", "__mid")
    )
    return ranked, total


def _ntile_expr(n, total):
    """Exact SQL NTILE(n) from a global 1-based rn: the first
    (total % n) buckets hold (total // n) + 1 rows."""
    q, r = divmod(total, n)
    big = r * (q + 1)  # rows covered by the larger leading buckets
    if q == 0:
        return F.col("rn").cast("int")
    return (
        F.when(F.col("rn") <= big, ((F.col("rn") - 1) / (q + 1)).cast("int") + 1)
        .otherwise(r + ((F.col("rn") - 1 - big) / q).cast("int") + 1)
    )


@register(
    "w3_ntile",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC) AS quartile
    FROM orders
    """,
)
def w3_ntile(spark, sf_dir):
    """Global NTILE — same semantics as the unpartitioned window, but
    computed via the distributed rank machinery (_global_rank) so no
    single task ever sees the whole table."""
    (orders,) = T(spark, sf_dir, "orders")
    ranked, total = _global_rank(
        spark,
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()],
    )
    return ranked.select("o_orderkey", _ntile_expr(4, total).alias("quartile"))


@register(
    "w3b_ntile_distributed",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC), 9) AS pr
    FROM orders
    """,
)
def w3b_ntile_distributed(spark, sf_dir):
    """NTILE + percent_rank together over one distributed global rank
    (see _global_rank for the 100 TB plan shape)."""
    (orders,) = T(spark, sf_dir, "orders")
    ranked, total = _global_rank(
        spark,
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()],
    )
    return ranked.select(
        "o_orderkey",
        _ntile_expr(4, total).alias("quartile"),
        F.round((F.col("rn") - 1) / F.lit(max(total - 1, 1)), 9).alias("pr"),
    )


@register(
    "w4_percent_rank_cume_dist",
    oracle="""
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal ASC NULLS LAST, s_suppkey ASC), 9) AS pr,
           ROUND(CUME_DIST()   OVER (ORDER BY s_acctbal ASC NULLS LAST, s_suppkey ASC), 9) AS cd
    FROM supplier
    """,
)
def w4_percent_rank_cume_dist(spark, sf_dir):
    """percent_rank / cume_dist via the distributed global rank: with a
    unique tiebreak in the total order every peer group is a singleton,
    so pr = (rn-1)/(total-1) and cd = rn/total exactly — no
    single-partition window anywhere in the plan."""
    (supplier,) = T(spark, sf_dir, "supplier")
    ranked, total = _global_rank(
        spark,
        supplier.select("s_suppkey", "s_acctbal"),
        [F.col("s_acctbal").asc_nulls_last(), F.col("s_suppkey").asc()],
    )
    return ranked.select(
        "s_suppkey",
        F.round((F.col("rn") - 1) / F.lit(max(total - 1, 1)), 9).alias("pr"),
        F.round(F.col("rn") / F.lit(total), 9).alias("cd"),
    )


@register(
    "w5_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS next_value
    FROM events
    """,
)
def w5_lag_lead(spark, sf_dir):
    # order on µs + event_id: DuckDB reads the ns parquet column as a
    # µs TIMESTAMP, so µs is the finest precision both engines see
    # identically; event_id breaks any same-µs ties deterministically
    (events,) = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts").asc(), F.col("event_id").asc())
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "w6_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w6_first_last_nth(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    # Explicit full frame: LAST_VALUE over the default frame is the
    # current row — the classic window gotcha on every engine.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    ).distinct()


@register(
    "w7_window_agg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
    FROM orders
    """,
)
def w7_window_agg(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("cust_total"),
        F.count("*").over(w).alias("cust_orders"),
    )


@register(
    "w8_rows_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(25,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
    FROM events
    """,
)
def w8_rows_frame(spark, sf_dir):
    (events,) = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double").alias("moving_sum"),
    )


@register(
    "w9_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w9_range_frame(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "w10_topn_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC) AS rn
      FROM customer
    )
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM ranked WHERE rn <= 2
    """,
)
def w10_topn_per_group(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    # Catalyst's WindowGroupLimit pushes the rn<=2 limit into the window
    # sort (partial top-k per map task) — the scalable top-N-per-group.
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc()
    )
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "w11_distinct_over_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(DISTINCT o_orderstatus) OVER (PARTITION BY o_custkey) AS n_statuses
    FROM orders
    """,
)
def w11_distinct_over_window(spark, sf_dir):
    """COUNT(DISTINCT) over a window — Spark has no native distinct
    window aggregate, so the idiomatic rewrite is size(collect_set) over
    the same window.  State per partition is the distinct-value set
    (bounded by value cardinality, not row count)."""
    (orders,) = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderstatus").over(w)).cast("bigint").alias("n_statuses"),
    )
