"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mcp_trino_spark.sources.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load the named testdata tables (lazy parquet scans)."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before compute-heavy
    fan-out (explodes, hashing, vector math, Python UDFs).

    A small/single-file source scans as one partition; without this,
    every downstream expression runs on one core.  The shuffle moves
    only the slim base rows — orders of magnitude cheaper than the
    work it parallelizes.  (At 100 TB sources are already many-file,
    but rebalancing before a 100× fan-out is still the right call —
    matches AQE's own rebalancing heuristics.)
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
