"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mcp_trino_spark.sources.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load the named testdata tables (lazy parquet scans)."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before compute-heavy
    work (explodes, hashing, vector math, Python UDFs, long
    broadcast-join pipelines) — but ONLY when the input is actually
    under-partitioned.

    A small/single-file source (or single-row-group parquet, like the
    testdata) scans as ONE task; without this, everything up to the
    first shuffle runs on one core.  The shuffle moves only the slim
    base rows — orders of magnitude cheaper than the work it enables.
    At 100 TB a fact scan is already thousands of partitions, so the
    condition makes this a no-op there — it never degenerates into
    re-shuffling big data.

    Call this on SCAN-stage DataFrames (before joins/aggregations):
    ``df.rdd`` under AQE materializes upstream query stages eagerly, so
    probing the partition count of a post-join DataFrame would execute
    part of the query outside the caller's timing/cancellation scope.
    All call sites in this package follow that rule.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    parts = df.rdd.getNumPartitions()
    # no-op when already at/above the target (repartition buys nothing,
    # incl. local[1]) or within half of it (marginal gain < shuffle cost)
    if parts >= target or parts >= max(target // 2, 2):
        return df
    return df.repartition(target)


def register_view(spark, sf_dir, name):
    """Register ONE testdata table as a temp view (normalized via
    load_table).  Shared by the SQL-text operators (a6, o10/o10b/o11)
    — previously each module carried its own copy, which could drift
    from any future hook added here."""
    from mcp_trino_spark.sources.catalog import load_table

    load_table(spark, sf_dir, name).createOrReplaceTempView(name)
