"""explain_query — SURVEY §2.1 F6, reference internal/mcp/handlers.go:241-282
and internal/trino/client.go:777-791.

The reference validates ``format ∈ {LOGICAL, DISTRIBUTED, VALIDATE, IO}``
and prepends ``EXPLAIN (TYPE f)`` to the query.  Spark mapping:

- LOGICAL     → ``EXPLAIN EXTENDED`` (parsed/analyzed/optimized logical)
- DISTRIBUTED → ``EXPLAIN FORMATTED`` (physical plan; Spark ``Exchange``
  nodes are Trino's fragment boundaries)
- VALIDATE    → parse/analyze only, report ok/error without executing
- IO          → report the files/bytes each scan reads plus the
  FileScan plan lines showing PushedFilters/ReadSchema — the Spark
  equivalent of Trino's table-access report, and the quickest check
  that pushdown and pruning actually reached the scan (SURVEY §3.3)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List

from pyspark.sql import SparkSession

VALID_FORMATS = ("LOGICAL", "DISTRIBUTED", "VALIDATE", "IO")


class InvalidExplainFormat(ValueError):
    pass


@dataclass
class ExplainResult:
    format: str
    rows: List[dict]


def explain_query(spark: SparkSession, query: str, format: str = "DISTRIBUTED") -> ExplainResult:
    fmt = (format or "DISTRIBUTED").strip().upper()
    if fmt not in VALID_FORMATS:
        # mirror the reference's error contract (client.go:779-787)
        raise InvalidExplainFormat(
            f"invalid explain format: {format} (valid: LOGICAL, DISTRIBUTED, VALIDATE, IO)"
        )
    if fmt == "VALIDATE":
        try:
            spark.sql(query).schema  # parse + analyze, no execution
            return ExplainResult(fmt, [{"valid": True, "error": None}])
        except Exception as exc:  # noqa: BLE001 — surface analysis errors as rows
            return ExplainResult(fmt, [{"valid": False, "error": str(exc)}])
    if fmt == "LOGICAL":
        plan = spark.sql(f"EXPLAIN EXTENDED {query}").collect()[0][0]
        return ExplainResult(fmt, [{"plan": plan}])
    if fmt == "DISTRIBUTED":
        plan = spark.sql(f"EXPLAIN FORMATTED {query}").collect()[0][0]
        return ExplainResult(fmt, [{"plan": plan}])
    return ExplainResult(fmt, io_report(spark, query))


def io_report(spark: SparkSession, query: str) -> List[dict]:
    """Per-scan IO report: input files, total bytes, and the physical
    FileScan lines (which carry PushedFilters / ReadSchema)."""
    df = spark.sql(query)
    rows: List[dict] = []
    for path in sorted(df.inputFiles()):
        local = path[len("file:"):] if path.startswith("file:") else path
        try:
            size = os.path.getsize(local)
        except OSError:
            size = None
        rows.append({"kind": "file", "path": path, "bytes": size})
    plan = spark.sql(f"EXPLAIN FORMATTED {query}").collect()[0][0]
    for line in plan.splitlines():
        stripped = line.strip()
        if any(k in stripped for k in ("Scan ", "PushedFilters", "ReadSchema", "Location")):
            rows.append({"kind": "plan", "path": stripped, "bytes": None})
    if not rows:
        rows.append({"kind": "none", "path": "no file scans in plan", "bytes": None})
    return rows
