"""Join operators — SURVEY §2.4 (J1-J11).

Reference declares "joins" and "cross-system data exploration" in its
tool contract (reference internal/mcp/handlers.go:290) and its EXPLAIN
example shows distributed HASH join fragments (docs/tools.md:186-193).
Trino's broadcast-vs-partitioned decision maps to Catalyst's
BroadcastHashJoin / SortMergeJoin choice; we declare logical joins and
hint ``broadcast()`` for bounded dimension tables so the big-fact side
never shuffles for dim joins — the key scale property at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import DSUM, dsum, register


@register(
    "j1_inner_equi",
    oracle="""
    SELECT c_custkey, c_name, n_name FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    """,
)
def j1_inner_equi(spark, sf_dir):
    customer, nation = T(spark, sf_dir, "customer", "nation")
    # nation is 25 rows: always broadcast — no shuffle of customer.
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
    ).select("c_custkey", "c_name", "n_name")


@register(
    "j2_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def j2_left_outer(spark, sf_dir):
    customer, orders = T(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "j3_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_cust, b.n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) b
    ON a.k = b.k
    """,
)
def j3_full_outer(spark, sf_dir):
    customer, supplier = T(spark, sf_dir, "customer", "supplier")
    a = customer.groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    b = supplier.groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    return a.join(b, "k", "full").select(
        F.col("k"), F.col("n_cust"), F.col("n_supp")
    )


@register(
    "j4_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def j4_cross(spark, sf_dir):
    region, nation = T(spark, sf_dir, "region", "nation")
    # Cross joins only ever appear dim×dim here; fact-side cross joins
    # are rejected at review time (cardinality explosion at scale).
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "j5_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
    """,
)
def j5_left_semi(spark, sf_dir):
    customer, orders = T(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 200000.0)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j6_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def j6_left_anti(spark, sf_dir):
    """Customers with NO high-value (>300k) order.  NOT EXISTS (not
    NOT IN): null-safe on both engines — SURVEY §7.4.1.  The threshold
    exists so the result is NON-EMPTY at the oracle scale factors
    (every customer has some order in the testdata — an anti-join on
    raw orders verified only that empty == empty)."""
    customer, orders = T(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j7_theta",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_cheaper
    FROM supplier s JOIN part p ON p.p_retailprice < s.s_acctbal
    GROUP BY s.s_suppkey
    """,
)
def j7_theta(spark, sf_dir):
    # Non-equi join → BroadcastNestedLoopJoin; keep the broadcast side the
    # bounded one (part/supplier are dims).  At 100 TB a theta join against
    # a fact table would need banding first (see j8).
    supplier, part = T(spark, sf_dir, "supplier", "part")
    return (
        supplier.join(F.broadcast(part), part.p_retailprice < supplier.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_cheaper"))
    )


@register(
    "j8_range_band",
    oracle="""
    SELECT b.bucket, COUNT(*) AS n_orders, {sum_price} AS sum_price
    FROM orders o JOIN (
        SELECT 0 AS bucket, 0.0 AS lo, 50000.0 AS hi UNION ALL
        SELECT 1, 50000.0, 150000.0 UNION ALL
        SELECT 2, 150000.0, 1000000000.0
    ) b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.bucket
    """.format(sum_price=DSUM("o.o_totalprice")),
)
def j8_range_band(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        [(0, 0.0, 50000.0), (1, 50000.0, 150000.0), (2, 150000.0, 1000000000.0)],
        "bucket INT, lo DOUBLE, hi DOUBLE",
    )
    # Band join: broadcast the (tiny) band table; each orders row probes
    # the bands without shuffling orders — the standard scale pattern for
    # range bucketing.
    return (
        orders.join(
            F.broadcast(buckets),
            (orders.o_totalprice >= buckets.lo) & (orders.o_totalprice < buckets.hi),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "j9_multiway",
    oracle="""
    SELECT r_name, n_name, COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer c ON c_nationkey = n_nationkey
    JOIN orders o ON o_custkey = c_custkey
    GROUP BY r_name, n_name
    """,
)
def j9_multiway(spark, sf_dir):
    region, nation, customer, orders = T(
        spark, sf_dir, "region", "nation", "customer", "orders"
    )
    # Chain dims smallest-out: region/nation/customer broadcast in turn, so
    # only the orders fact stays partitioned; Catalyst + CBO reorders
    # equivalently when stats exist.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "j10_self_join",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
)
def j10_self_join(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    # Self equi-join on the natural key: both sides hash-partition on
    # l_orderkey (same exchange), pairs expand only within an order.
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_linenumber").alias("ln_b"),
    )


@register(
    "j11_asof",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey % 50 = e.user_id
       AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
    )
    SELECT event_id, o_orderkey AS asof_orderkey,
           CAST(o_orderdate AS DATE) AS asof_date,
           o_totalprice AS asof_price
    FROM ranked WHERE rn = 1
    """,
)
def j11_asof(spark, sf_dir):
    """As-of join: the latest ORDER at-or-before each event's time, per
    entity key — the trades-vs-quotes shape (probe side = events,
    reference side = orders).  The testdata's orders all precede its
    events, so every in-domain event finds a match — ~3.4k rows at
    sf0.01; the previous orientation matched events *before* orders,
    which is the empty set on this data, so the oracle verified only
    that empty == empty.

    Spark has no native as-of join in SQL.  The naive rewrite (equi-join
    on the entity key with the time predicate as a join filter, then
    row_number) multiplies every probe by ALL its earlier reference
    rows before discarding all but one — O(probes × refs/key)
    intermediate rows, the thing that dies first at 100 TB.  The
    scalable plan is the union trick: interleave both tables on
    (key, time) and carry the last-seen reference forward with one
    window pass — O(probes + refs) rows, ONE shuffle, no
    multiplication.

    Skew note: partitioning is by entity key; for low-cardinality keys
    add a coarse time-bucket to the partition key and carry the last
    reference of the previous bucket in (two-pass); salting alone is
    wrong here because it hides earlier references from later rows.
    """
    from pyspark.sql import Window

    orders, events = T(spark, sf_dir, "orders", "events")
    # one shared schema: (k, ts_us, is_probe, tiebreak, payload…)
    od = orders.select(
        (F.col("o_custkey") % 50).alias("k"),
        # order's time point = its date at midnight UTC, in µs (the finest
        # precision the oracle engine sees; see timeseries.py)
        (F.col("o_orderdate").cast("timestamp").cast("long") * F.lit(1_000_000)).alias(
            "ts_us"
        ),
        F.lit(0).alias("is_probe"),
        F.col("o_orderkey").alias("tiebreak"),
        F.struct(
            F.col("o_orderkey"),
            # parquet stores o_orderdate as a timestamp; the output
            # contract (and the oracle) is DATE
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice"),
        ).alias("ref"),
        F.lit(None).cast("long").alias("event_id"),
    )
    ev = events.select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("ts_us"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("tiebreak"),
        F.lit(None)
        .cast("struct<o_orderkey:bigint,o_orderdate:date,o_totalprice:double>")
        .alias("ref"),
        F.col("event_id"),
    )
    # references sort before probes at the same instant (is_probe asc),
    # so an order dated exactly at the event's timestamp matches (<=);
    # among same-key same-date orders the LAST in sort order (max
    # o_orderkey) wins, matching the oracle's o_orderkey DESC tiebreak.
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts_us").asc(), F.col("is_probe").asc(), F.col("tiebreak").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = od.unionByName(ev).withColumn(
        "last_ref", F.last("ref", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("is_probe") == 1) & F.col("last_ref").isNotNull())
        .select(
            "event_id",
            F.col("last_ref.o_orderkey").alias("asof_orderkey"),
            F.col("last_ref.o_orderdate").alias("asof_date"),
            F.col("last_ref.o_totalprice").alias("asof_price"),
        )
    )


_LATERAL_SQL = """
    SELECT n_name, c.c_name, c.c_acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
    ) c
"""


@register("j12_lateral_topn", oracle=_LATERAL_SQL)
def j12_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    customers per nation (Trino's per-row derived table idiom).
    Catalyst decorrelates this into a ranked join, so it scales as a
    window-over-partition, not N subquery executions; the identical SQL
    runs on both engines.
    """
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "j13_bloom_prefilter_semi",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def j13_bloom_prefilter_semi(spark, sf_dir):
    """Semi-join with an explicit bloom-filter prefilter on the fact
    side — the pattern behind Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter.*), built by hand so the
    plan is visible and tunable.  (Reference parity: Trino's dynamic
    filtering does the same fact-side pre-pruning for selective joins.)

    Plan shape: the dim side aggregates its keys into a 1-row, 8 KiB
    bitmap (1024 longs = 65536 bits, k=3 xxhash64 probes); the bitmap
    broadcasts to every fact partition (BroadcastNestedLoopJoin of ONE
    row — constant cost), and non-matching fact rows die at the scan
    stage, BEFORE the shuffle/broadcast of the exact semi-join that
    removes false positives.  At 100 TB this is the difference between
    shuffling the full fact table and shuffling the ~selectivity
    fraction; the bitmap math (shiftleft/OR build, subscript/AND probe)
    is all whole-stage-codegen JVM work.  Exactness does NOT depend on
    the hash functions (false positives are re-checked), so xxhash64 is
    safe here even with a DuckDB oracle.
    """
    customer, orders = T(spark, sf_dir, "customer", "orders")
    keys = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    n_words = 1024  # 65536 bits
    probes = [F.pmod(F.xxhash64(F.lit(i), F.col("c_custkey")), F.lit(65536)) for i in range(3)]
    positions = keys.select(F.explode(F.array(*probes)).alias("pos")).distinct()
    bitmap = positions.agg(F.collect_list("pos").alias("ps")).select(
        F.expr(
            f"""
            transform(sequence(0, {n_words - 1}), w ->
              aggregate(filter(ps, p -> CAST(p DIV 64 AS INT) = w),
                        CAST(0 AS BIGINT),
                        (acc, p) -> acc | shiftleft(CAST(1 AS BIGINT),
                                                    CAST(p % 64 AS INT))))
            """
        ).alias("bitmap")
    )

    probed = orders.crossJoin(F.broadcast(bitmap))
    for i in range(3):
        probed = probed.withColumn(
            f"_pos{i}", F.pmod(F.xxhash64(F.lit(i), F.col("o_custkey")), F.lit(65536))
        )
    bit_ok = " AND ".join(
        f"(shiftright(bitmap[CAST(_pos{i} DIV 64 AS INT)],"
        f" CAST(_pos{i} % 64 AS INT)) & 1) = 1"
        for i in range(3)
    )
    prefiltered = probed.filter(F.expr(bit_ok)).drop(
        "bitmap", "_pos0", "_pos1", "_pos2"
    )
    return prefiltered.join(
        F.broadcast(keys),
        prefiltered["o_custkey"] == keys["c_custkey"],
        "left_semi",
    ).select("o_orderkey", "o_orderstatus")


@register(
    "j14_salted_skew_join",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS k, value
      FROM events
    ),
    dim AS (
      SELECT DISTINCT k, 'u' || CAST(k AS VARCHAR) AS label
      FROM (SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS k
            FROM events)
    )
    SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(f.value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY d.label
    """,
)
def j14_salted_skew_join(spark, sf_dir):
    """Salted join for a skewed key — the join-side twin of
    a16_salted_skew_agg.  A deterministic hot key (70% of fact rows land
    on k=0) would pin one reducer in a plain shuffle join; salting
    splits it: the fact side gets salt = hash(row) % R, the dim side is
    exploded into R replicas, and the join key becomes (k, salt) — the
    hot key's rows spread over R tasks.  SHUFFLE_HASH hint models the
    100 TB case where the dim is too big to broadcast (AQE's skew-join
    handles moderate skew on its own; explicit salting is the lever
    when one key exceeds a whole executor).  Oracle: the same join
    unsalted — salting must be invisible in the result.
    Reference surface: Trino handles this engine-side (client.go:501-617
    passes the join; Trino's cost-based optimizer picks the
    distribution); in Spark the salt is the user-space spelling.
    """
    R = 8
    (events,) = T(spark, sf_dir, "events")
    skew_k = F.when(F.col("user_id") % 10 < 7, F.lit(0)).otherwise(
        F.col("user_id")
    )
    fact = events.select(
        skew_k.alias("k").cast("bigint"), "value", "event_id"
    ).withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(R)).cast("int"))
    dim = (
        events.select(skew_k.cast("bigint").alias("k"))
        .distinct()
        .withColumn("label", F.concat(F.lit("u"), F.col("k")))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(R)]))
    )
    joined = fact.hint("shuffle_hash").join(dim_salted, ["k", "salt"])
    return joined.groupBy("label").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )
