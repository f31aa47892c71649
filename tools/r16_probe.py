"""Round-16 measurement probes (guide §1: measure first).

Usage:
  python tools/r16_probe.py xtax       # x-entry cost breakdown:
                                       # register/translate/analyze/execute
  python tools/r16_probe.py cc_jobs    # Spark job count per CC round
  python tools/r16_probe.py w3b        # w3b stage breakdown
  python tools/r16_probe.py mg         # Misra-Gries compress microbench
  python tools/r16_probe.py minhash    # minhash signature kernel A/B

All probes run on the bench session settings (local[$SPARK_GRAFT_CPUS],
sf from $SPARK_GRAFT_SF_DIR) and print plain text — never JSON on
stdout's last line, so they can't be confused with the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from mcp_trino_spark.session import get_spark

    return get_spark("r16_probe")


def probe_xtax() -> None:
    """Where does an x-entry's wall time go?  Split one representative
    entry (x64: big UNION over lineitem) plus a pure-VALUES one (x71)
    into register_tables / column_types / translate / spark.sql
    (analysis) / execution."""
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    spark = _spark()
    import inspect

    from mcp_trino_spark import registry

    qs = registry.queries()

    # pull the raw SQL of x64 out of its source (the probe re-creates
    # the entry's stages by hand)
    x64_sql = """
            SELECT CAST(l_returnflag AS VARCHAR) AS grp,
                   round(corr(l_quantity, l_extendedprice), 6) AS c_norm,
                   corr(l_quantity * 0.0 + 5.0, l_extendedprice) AS c_const,
                   regr_slope(l_extendedprice, l_quantity * 0.0) AS s_const,
                   round(regr_slope(l_extendedprice, l_quantity), 6) AS s_norm,
                   regr_intercept(l_extendedprice, l_quantity * 0.0 + 3.0)
                     AS i_const
            FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_returnflag
            UNION ALL
            SELECT 'o' || CAST(l_orderkey AS VARCHAR),
                   corr(l_quantity, l_extendedprice),
                   corr(l_quantity, l_extendedprice),
                   regr_slope(l_extendedprice, l_quantity),
                   regr_slope(l_extendedprice, l_quantity),
                   regr_intercept(l_extendedprice, l_quantity)
            FROM lineitem WHERE l_orderkey < 200
            GROUP BY l_orderkey HAVING count(*) = 1
    """

    # warm session
    register_tables(spark, SF_DIR)
    spark.sql("SELECT 1").collect()

    for rep in range(3):
        t0 = time.perf_counter()
        register_tables(spark, SF_DIR)
        t1 = time.perf_counter()
        ct = _catalog_column_types(spark)
        t2 = time.perf_counter()
        tq = translate(x64_sql, column_types=ct)
        t3 = time.perf_counter()
        df = spark.sql(tq)
        t4 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t5 = time.perf_counter()
        print(
            f"x64 rep{rep}: register={t1 - t0:.3f} coltypes={t2 - t1:.3f} "
            f"translate={t3 - t2:.3f} analyze={t4 - t3:.3f} exec={t5 - t4:.3f} "
            f"total={t5 - t0:.3f}"
        )

    # full end-to-end per benched x entry (3 reps each, min)
    for name in (
        "x20_approx_most_frequent",
        "x21_reduce_agg",
        "x26_nth_from_last",
        "x42_exclude_current_row_minmax",
        "x64_stat_agg_edge_contracts",
        "x71_decimal_avg_semantics",
    ):
        fn = qs[name]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            out.write.mode("overwrite").format("noop").save()
            t_exec = time.perf_counter() - t1
            ts.append((t_build, t_exec))
        best = min(ts, key=lambda p: p[0] + p[1])
        print(f"{name}: build(min)={best[0]:.3f} exec={best[1]:.3f}")


def probe_cc_jobs() -> None:
    """Spark job count + wall per CC propagation run (VERDICT #3)."""
    from mcp_trino_spark.operators._util import spread
    from mcp_trino_spark.operators.llm_dedup import (
        _propagate_clusters,
        minhash_lsh_pairs_plan,
    )
    from mcp_trino_spark.operators.opcache import release_all_operator_caches
    from mcp_trino_spark.sources.catalog import load_table

    spark = _spark()
    sc = spark.sparkContext
    docs = spread(load_table(spark, SF_DIR, "documents"))
    pairs = minhash_lsh_pairs_plan(docs).localCheckpoint()

    for rep in range(4):
        st = sc.statusTracker()
        before = len(st.getJobIdsForGroup() or [])
        all_before = st.getJobIdsForGroup()
        t0 = time.perf_counter()
        out = _propagate_clusters(pairs)
        out.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        after = sc.statusTracker().getJobIdsForGroup()
        n_jobs = len(set(after) - set(all_before))
        release_all_operator_caches()
        spark.catalog.clearCache()
        print(f"cc rep{rep}: wall={el:.3f}s jobs={n_jobs}")
    pairs.unpersist()


def probe_w3b() -> None:
    """w3b stage/job breakdown: persist+counts vs final select."""
    from mcp_trino_spark.operators.opcache import release_all_operator_caches
    from mcp_trino_spark import registry

    spark = _spark()
    qs = registry.queries()
    fn = qs["w3b_ntile_distributed"]
    for rep in range(4):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0  # includes persist + collect
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t_exec = time.perf_counter() - t1
        release_all_operator_caches()
        spark.catalog.clearCache()
        print(f"w3b rep{rep}: build(persist+counts)={t_build:.3f} exec={t_exec:.3f}")


def probe_mg() -> None:
    """Misra-Gries compress: pure-Python sort vs numpy lexsort, over
    realistic group sizes."""
    import numpy as np

    from mcp_trino_spark.functions.heavyhitters import compress

    rng = np.random.default_rng(7)
    for n_distinct in (100, 1_000, 10_000, 100_000):
        vals = [f"v{i:06d}" for i in range(n_distinct)]
        counts = {v: int(c) for v, c in zip(vals, rng.integers(1, 1000, n_distinct))}
        t0 = time.perf_counter()
        for _ in range(20):
            compress(counts, 100)
        el = (time.perf_counter() - t0) / 20
        print(f"compress n={n_distinct}: {el * 1e3:.2f} ms/call")


def probe_minhash() -> None:
    """A/B: current JVM explode+md5+min-agg signatures vs an Arrow
    mapInPandas numpy/hashlib signature kernel (VERDICT #5)."""
    from pyspark.sql import functions as F

    from mcp_trino_spark.operators._util import spread
    from mcp_trino_spark.operators.llm_dedup import (
        minhash_signatures_plan,
    )
    from mcp_trino_spark.sources.catalog import load_table

    spark = _spark()
    docs = spread(load_table(spark, SF_DIR, "documents"))

    def time_plan(label, df):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}")

    time_plan("jvm-signatures", minhash_signatures_plan(docs))
    try:
        from mcp_trino_spark.operators.llm_dedup import (
            _minhash_signatures_arrow,
        )

        time_plan("arrow-signatures", _minhash_signatures_arrow(docs))
    except ImportError:
        print("arrow kernel not built yet")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "xtax"
    {
        "xtax": probe_xtax,
        "cc_jobs": probe_cc_jobs,
        "w3b": probe_w3b,
        "mg": probe_mg,
        "minhash": probe_minhash,
    }[which]()
