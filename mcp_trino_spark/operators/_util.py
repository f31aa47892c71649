"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mcp_trino_spark.sources.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load the named testdata tables (lazy parquet scans)."""
    return tuple(load_table(spark, sf_dir, n) for n in names)
