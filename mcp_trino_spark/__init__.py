"""mcp_trino_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of
lineardevon/mcp-trino (an MCP façade over the Trino distributed SQL
engine), re-expressed Spark-first: Spark SQL + Catalyst replace Trino's
parser/optimizer/executors, a resident ``SparkSession`` replaces the
connection pool, and the façade's own logic (read-only SQL classifier,
allowlists, metadata tools, result shaping, timeouts) is re-implemented
natively in Python.

Layout:
    session.py       SparkSession builder (UTC, AQE, broadcast tuning)
    sources/         testdata catalog: parquet → temp views / DataFrames
    operators/       SURVEY §2 operator implementations (queries+oracles)
    functions/       scalar-function surface (string/date/math/array/JSON)
    plans/           EXPLAIN formats incl. the IO plan walker
    streaming/       Structured Streaming twins of the batch time-series ops
    validate.py      read-only SQL classifier + literal/comment sanitizer
    allowlist.py     catalog/schema/table allowlist filtering
    config.py        env-var configuration
    execute.py       gate → spark.sql → timeout → row shaping
    catalog_api.py   list_catalogs/schemas/tables, get_table_schema
    registry.py      central registry mapping query names → (spark fn, oracle)
"""

__version__ = "0.1.0"
