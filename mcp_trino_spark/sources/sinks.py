"""Write-path sinks — SURVEY §2.2 S6 (gated writes) + §2.1 F2-F5 as
registry entries.

The reference gates every write keyword behind
``TRINO_ALLOW_WRITE_QUERIES`` (reference internal/trino/client.go:306-310,
519-522) and otherwise passes CTAS/INSERT through to the engine.  Spark
executes CTAS/INSERT natively against the session catalog; UPDATE /
DELETE / MERGE need a transactional format (Delta/Iceberg, not in this
container) and are declared out of the exact-match scope (SURVEY §2.2).

Scale notes: the parquet round-trip writes ``partitionBy`` so the sink
lays out one directory per partition value — the layout that gives
partition pruning on re-read; CTAS inherits the select's partitioning
(shuffle-free when the plan is narrow).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import execute_query
from mcp_trino_spark.registry import DSUM, dsum, register
from mcp_trino_spark.sources.catalog import load_table, register_tables

_WRITE_CFG = EngineConfig(allow_write_queries=True)


@register(
    "s6_ctas_insert",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 0
    """,
)
def s6_ctas_insert(spark, sf_dir):
    """CTAS + INSERT INTO through the gated execute_query path, then read
    the managed table back.  The write gate itself (writes rejected when
    disabled) is unit-tested in tests/test_engine.py.
    """
    register_tables(spark, sf_dir)
    execute_query(spark, "DROP TABLE IF EXISTS sink_nation_r0", _WRITE_CFG)
    # a fresh session doesn't know the managed table, so DROP alone
    # leaves an orphaned warehouse dir that would fail the CTAS
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        os.path.join(warehouse.removeprefix("file:"), "sink_nation_r0"),
        ignore_errors=True,
    )
    # split region-0 nations between the CTAS and a follow-up INSERT so
    # both write statements contribute rows
    execute_query(
        spark,
        """
        CREATE TABLE sink_nation_r0 USING parquet AS
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey = 0 AND n_nationkey % 2 = 0
        """,
        _WRITE_CFG,
    )
    execute_query(
        spark,
        """
        INSERT INTO sink_nation_r0
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey = 0 AND n_nationkey % 2 = 1
        """,
        _WRITE_CFG,
    )
    # materialize the (dimension-sized) result, then drop the table so
    # the catalog surface (f4_list_tables, SHOW TABLES) stays
    # execution-order independent across a shared session
    result = spark.table("sink_nation_r0")
    rows, schema = result.collect(), result.schema
    execute_query(spark, "DROP TABLE sink_nation_r0", _WRITE_CFG)
    return spark.createDataFrame(rows, schema)


@register(
    "s6b_parquet_partitioned_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {DSUM('o_totalprice')} AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def s6b_parquet_partitioned_roundtrip(spark, sf_dir):
    """DataFrame parquet sink partitioned by a column, then re-read and
    aggregate — proves the sink layout supports partition pruning (the
    re-read scans pruned directories, visible in the IO explain)."""
    out = "/root/repo/.tmp/sink_orders_by_status"
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    orders = load_table(spark, sf_dir, "orders")
    (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("total"),
    )


# --- F2-F5 metadata tools as registry entries ------------------------------
# The full API (allowlists, name resolution, errors) is unit-tested in
# tests/test_engine.py; these entries put the metadata surface under the
# driver's per-round check too.


@register("f2_list_catalogs")  # rows-only: catalog set is engine-specific
def f2_list_catalogs(spark, sf_dir):
    from mcp_trino_spark.catalog_api import list_catalogs

    names = list_catalogs(spark, EngineConfig())
    return spark.createDataFrame([(n,) for n in names], "catalog STRING")


@register("f3_list_schemas")  # rows-only: schema set is engine-specific
def f3_list_schemas(spark, sf_dir):
    from mcp_trino_spark.catalog_api import list_schemas

    names = list_schemas(spark, EngineConfig())
    return spark.createDataFrame([(n,) for n in names], "schema STRING")


@register("f4_list_tables")  # rows-only: includes session temp views
def f4_list_tables(spark, sf_dir):
    from mcp_trino_spark.catalog_api import list_tables

    register_tables(spark, sf_dir)
    names = list_tables(spark, EngineConfig())
    return spark.createDataFrame([(n,) for n in names], "table STRING")


@register(
    "f5_table_schema",
    oracle="SELECT column_name FROM (DESCRIBE nation)",
)
def f5_table_schema(spark, sf_dir):
    """get_table_schema column names for nation — the one metadata field
    with an engine-independent oracle (types spell differently)."""
    from mcp_trino_spark.catalog_api import get_table_schema

    register_tables(spark, sf_dir)
    cols = get_table_schema(spark, EngineConfig(), "nation")
    return spark.createDataFrame([(c.name,) for c in cols], "column_name STRING")


_VALUES_SQL = """
    SELECT t.id, t.name, n.n_name
    FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(id, name)
    JOIN nation n ON n.n_nationkey = t.id
"""


@register("s3_values_relation", oracle=_VALUES_SQL)
def s3_values_relation(spark, sf_dir):
    """VALUES constant relation (SURVEY §2.2 S3) joined against a real
    table — identical SQL on both engines; the literal relation plans
    as LocalRelation (no scan)."""
    register_tables(spark, sf_dir)
    return spark.sql(_VALUES_SQL)


@register(
    "s2b_multiformat_roundtrip",
    oracle=f"""
    SELECT n_regionkey, COUNT(*) AS n, {DSUM('n_nationkey')} AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def s2b_multiformat_roundtrip(spark, sf_dir):
    """CSV and JSON sources (the reference's cross-system claim maps to
    Spark's format-pluggable reader): nation written to both formats,
    read back with explicit schemas, unioned halves re-aggregated to the
    parquet-source truth.  Schema-on-read: CSV gets an explicit DDL
    schema, JSON infers then casts."""
    base = "/root/repo/.tmp/formats"
    os.makedirs(base, exist_ok=True)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    lo = nation.filter(F.col("n_nationkey") % 2 == 0)
    hi = nation.filter(F.col("n_nationkey") % 2 == 1)
    lo.write.mode("overwrite").option("header", True).csv(f"{base}/nation_csv")
    hi.write.mode("overwrite").json(f"{base}/nation_json")
    csv_back = spark.read.option("header", True).schema(
        "n_nationkey BIGINT, n_name STRING, n_regionkey INT"
    ).csv(f"{base}/nation_csv")
    json_back = (
        spark.read.json(f"{base}/nation_json")
        .select(
            F.col("n_nationkey").cast("bigint"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
    )
    both = csv_back.unionByName(json_back)
    return both.groupBy("n_regionkey").agg(
        F.count("*").alias("n"),
        dsum("n_nationkey").alias("key_sum"),
    )
