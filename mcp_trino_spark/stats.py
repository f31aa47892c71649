"""SHOW STATS FOR <table> — Trino's table-statistics statement.

Trino surfaces per-column NDV / null-fraction / min / max plus a
row-count summary row from its connector metadata; the reference passes
the statement through verbatim (internal/trino/client.go:501-617) and
its own EXPLAIN path builds ``EXPLAIN (TYPE %s)`` text (client.go:783),
so reference users type both spellings at this engine.

Spark's ANALYZE-table stats live in the catalog and don't exist for
temp views, so this computes the same numbers directly with ONE
partial+final aggregate over the table — approx NDV (HLL), null counts,
min/max per column, string data size — then transposes the single
result row driver-side (metadata-sized: |columns| values, never data
rows).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F


#: Trino's SHOW STATS output schema
_COLUMNS = [
    "column_name",
    "data_size",
    "distinct_values_count",
    "nulls_fraction",
    "row_count",
    "low_value",
    "high_value",
]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "date",
            "timestamp", "timestamp_ntz", "boolean"}


def show_stats(spark: SparkSession, table: str) -> "tuple[List[str], List[dict]]":
    """→ (columns, rows) in Trino's SHOW STATS shape."""
    df: DataFrame = spark.table(table)
    aggs = [F.count(F.lit(1)).alias("__rc")]
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    simple = {}  # name -> whether per-column stats are computable
    for i, (name, dtype) in enumerate(fields):
        c = df[name]  # not F.col: a dotted column name must not parse as a field path
        # complex types (map/array/struct) are not hashable/orderable for
        # NDV/min-max — Trino likewise reports null stats for them
        simple[name] = not dtype.startswith(("map<", "array<", "struct<"))
        if not simple[name]:
            continue
        aggs.append(F.approx_count_distinct(c).alias(f"__ndv__{i}"))
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nulls__{i}"))
        if dtype in _NUMERIC or dtype.startswith("decimal"):
            aggs.append(F.min(c).cast("string").alias(f"__lo__{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__hi__{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__lo__{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__hi__{i}"))
        if dtype in ("string", "binary"):
            # octet_length = bytes (Trino reports data size in bytes;
            # length() is characters and under-reports multi-byte UTF-8)
            aggs.append(F.sum(F.octet_length(c)).cast("double").alias(f"__sz__{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__sz__{i}"))
    row = df.agg(*aggs).first()

    rc = row["__rc"]
    out = []
    for i, (name, _dtype) in enumerate(fields):
        if not simple[name]:
            out.append(
                {
                    "column_name": name,
                    "data_size": None,
                    "distinct_values_count": None,
                    "nulls_fraction": None,
                    "row_count": None,
                    "low_value": None,
                    "high_value": None,
                }
            )
            continue
        nulls = row[f"__nulls__{i}"]
        out.append(
            {
                "column_name": name,
                "data_size": row[f"__sz__{i}"],
                "distinct_values_count": float(row[f"__ndv__{i}"]),
                "nulls_fraction": (float(nulls) / rc) if rc else None,
                "row_count": None,
                "low_value": row[f"__lo__{i}"],
                "high_value": row[f"__hi__{i}"],
            }
        )
    # Trino's summary row: only row_count populated
    out.append(
        {
            "column_name": None,
            "data_size": None,
            "distinct_values_count": None,
            "nulls_fraction": None,
            "row_count": float(rc),
            "low_value": None,
            "high_value": None,
        }
    )
    return list(_COLUMNS), out
