"""SparkSession builder tuned for the engine.

Replaces the reference's connection pool (reference
internal/trino/client.go:157-181 — 10 open / 5 idle conns): a single
resident SparkSession *is* the pool.  Session-level settings encode the
cross-engine semantics SURVEY §5.2 calls out (UTC timezone) and the
scale posture (AQE on, skew-join on, partition coalescing on) so the
same logical plans survive a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: on local[N] match core count so every shuffle
# round-trips once; on a real cluster this is overridden per-deploy
# (rule of thumb: 2-3× total executor cores, or rely on AQE coalescing
# from a high initial value).
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "mcp_trino_spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the resident SparkSession.

    All engine semantics that affect correctness are pinned here:
    - ``spark.sql.session.timeZone=UTC``: Trino's timestamp-with-tz and
      DuckDB's oracle runs are both UTC-normalized.
    - AQE + skew-join + coalescing: runtime re-planning stands in for
      Trino's cost-based fragment scheduling at scale.
    - ANSI mode is left at Spark 4's default, which is **ON**
      (``spark.sql.ansi.enabled=true``): runtime errors raise instead
      of yielding NULL.  Where Trino's semantics differ (NULL
      out-of-bounds element_at, IEEE log of non-positives, …) the
      dialect layer rewrites to ``try_``/CASE forms (x36–x40 in
      trino_compat.py) rather than flipping this engine-wide switch —
      so do NOT "fix" a per-function mismatch by disabling ANSI here.
    """
    cpus = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.cbo.enabled", "true")
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's
        # TimestampType (µs) can't hold; read as long and convert in the
        # catalog layer (sources/catalog.py) — lossless, and keeps the
        # vectorized reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
