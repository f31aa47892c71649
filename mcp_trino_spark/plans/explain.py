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
    """Explain without ever executing: every format routes through
    Spark's EXPLAIN command (verified: EXPLAIN of DDL/DML does not run
    it), except IO which must build the DataFrame and is therefore
    gated read-only — Spark runs commands eagerly inside ``spark.sql``,
    so an ungated ``spark.sql(query)`` here would be a write-gate
    bypass."""
    from mcp_trino_spark.execute import WriteQueryNotAllowed
    from mcp_trino_spark.validate import is_read_only_query, strip_trailing_semicolon

    fmt = (format or "DISTRIBUTED").strip().upper()
    if fmt not in VALID_FORMATS:
        # mirror the reference's error contract (client.go:779-787)
        raise InvalidExplainFormat(
            f"invalid explain format: {format} (valid: LOGICAL, DISTRIBUTED, VALIDATE, IO)"
        )
    query = strip_trailing_semicolon(query)
    if fmt == "VALIDATE":
        try:
            plan = spark.sql(f"EXPLAIN {query}").collect()[0][0]
        except Exception as exc:  # noqa: BLE001 — parse errors raise
            return ExplainResult(fmt, [{"valid": False, "error": str(exc)}])
        # analysis errors surface as text inside the EXPLAIN output
        if plan.lstrip().startswith("Error occurred during query planning"):
            return ExplainResult(fmt, [{"valid": False, "error": plan.strip()}])
        return ExplainResult(fmt, [{"valid": True, "error": None}])
    if fmt == "LOGICAL":
        plan = spark.sql(f"EXPLAIN EXTENDED {query}").collect()[0][0]
        return ExplainResult(fmt, [{"plan": plan}])
    if fmt == "DISTRIBUTED":
        plan = spark.sql(f"EXPLAIN FORMATTED {query}").collect()[0][0]
        return ExplainResult(fmt, [{"plan": plan}])
    if not is_read_only_query(query):
        raise WriteQueryNotAllowed(
            "explain format IO requires a read-only query (the IO report "
            "builds the plan via spark.sql, which executes commands eagerly)"
        )
    return ExplainResult(fmt, io_report(spark, query))


def explain_analyze(spark: SparkSession, query: str) -> ExplainResult:
    """Trino's ``EXPLAIN ANALYZE``: execute the query, then render the
    physical plan annotated with the runtime metrics Spark collected
    per operator (actual output rows, files/bytes scanned, shuffle
    records) — the reference forwards EXPLAIN ANALYZE to Trino like any
    EXPLAIN (client.go:501-617).  Only read-only queries are accepted:
    the statement EXECUTES its operand, and the outer text starts with
    EXPLAIN so the write gate's classifier cannot see an inner write —
    gating here closes that bypass."""
    from mcp_trino_spark.execute import WriteQueryNotAllowed
    from mcp_trino_spark.validate import is_read_only_query

    if not is_read_only_query(query):
        raise WriteQueryNotAllowed(
            "EXPLAIN ANALYZE executes its query — only read-only "
            "statements are supported"
        )
    df = spark.sql(query)
    # execute through the noop sink: metrics populate identically, but
    # no result row ever crosses to the driver (Trino's EXPLAIN ANALYZE
    # likewise discards output engine-side — a collect() here would OOM
    # the driver on exactly the large scans worth profiling)
    df.write.mode("overwrite").format("noop").save()
    lines: List[str] = []

    def walk(node, depth: int) -> None:
        name = node.getClass().getSimpleName()
        # unwrap AQE and materialized query stages to the executed plan
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), depth)
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan(), depth)
            return
        mets = []
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            mets.append((kv._1(), kv._2().value()))
        shown = {
            k: v
            for k, v in sorted(mets)
            if k
            in (
                "numOutputRows",
                "numFiles",
                "filesSize",
                "numPartitions",
                "shuffleRecordsWritten",
                "recordsRead",
                "spillSize",
                "peakMemory",
            )
        }
        suffix = (
            " [" + ", ".join(f"{k}: {v}" for k, v in shown.items()) + "]"
            if shown
            else ""
        )
        lines.append("  " * depth + node.nodeName() + suffix)
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return ExplainResult("ANALYZE", [{"plan": "\n".join(lines)}])


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
