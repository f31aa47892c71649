"""Testdata catalog: parquet files → DataFrames / temp views.

Mirrors the reference's catalog model (catalog → schema → table,
reference internal/trino/client.go:736-757) in its minimum concrete
form: one directory of parquet files per scale factor, each file a
table, registered as temp views under the bare table name so that both
``spark.sql`` queries and the DuckDB oracle address the same names.

Scale notes (100 TB posture): each table here is a single parquet file
only because the driver materializes it that way; ``spark.read.parquet``
accepts a directory of thousands of files identically, and everything
downstream (pushdown, pruning, AQE) is agnostic to file count.  On a
real deployment these would be external tables with partition columns
(date for the fact tables) — see ``register_tables(analyze=...)`` for
the CBO stats hook.
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; schema comes from the parquet footer (schema-on-read).

    ``events.ts`` is nanosecond-precision in the parquet (TESTDATA /
    FIXTURES); Spark's TimestampType is µs, so the session reads nanos
    as long (session.py) and this layer exposes both views of it:
    ``ts``  — TimestampType, truncated to µs (what SQL functions want;
    also the finest precision DuckDB 1.x sees — it reads the ns parquet
    column as a µs TIMESTAMP, so oracle-checked operators order/gap on
    µs + an id tiebreak, never on ns)
    ``ts_ns`` — the exact int64 nanos, kept for consumers that need
    sub-µs exactness (not oracle-comparable).
    """
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark only
        # reads that type when nanosAsLong is on.  The conf is runtime-
        # settable, and callers (the driver) pass their OWN SparkSession
        # which won't have it — so self-provision here rather than relying
        # on session.py having built the session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES if os.path.exists(table_path(sf_dir, t))}


def register_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """Register every testdata table as a temp view under its bare name.

    Temp views are metadata-only (no data copied); Catalyst resolves them
    like catalog tables, so predicate pushdown / column pruning reach the
    parquet scan unchanged.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
