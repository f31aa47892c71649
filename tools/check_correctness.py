"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle on the same
parquet, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns) — a strict
superset of the driver's value-hash check: if this passes, the hash
matches.

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from mcp_trino_spark import registry  # noqa: E402
from mcp_trino_spark.session import get_spark  # noqa: E402
from mcp_trino_spark.sources.catalog import TABLES, table_path  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def norm(v):
    """Normalize a cell to a comparable primitive."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        # NaN is NOT NULL: the driver's value-hash distinguishes them,
        # so conflating here would false-PASS a NaN-vs-NULL divergence
        return "NaN"
    try:
        if pd.isna(v):  # pandas NaT / pd.NA (true missing markers)
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        # date vs midnight-datetime (pandas has no date dtype): equal
        return s[:-9] if s.endswith("T00:00:00") else s
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int) or type(v).__name__.startswith(("int", "uint")):
        return int(v)
    if isinstance(v, float) or type(v).__name__.startswith("float"):
        return float(v)
    if type(v).__name__ == "Decimal":
        return float(v)
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """→ sorted list of row tuples, columns in name order."""
    cols = sorted(df.columns)
    rows = [
        tuple(norm(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    n_bad = 0
    first = None
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            n_bad += 1
            if first is None:
                first = (i, ra, rb)
    if n_bad:
        i, ra, rb = first
        detail = ""
        for c, va, vb in zip(s_cols, ra, rb):
            if va != vb:
                detail = f" col {c}: spark={va!r} oracle={vb!r}"
                break
        problems.append(f"values differ: {n_bad} rows; first at sorted row {i}:{detail}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("check_correctness")
    con = duck_connect(args.sf)
    qs = registry.queries()
    oracles = registry.oracle_sql()
    names = args.names or sorted(qs)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(exc).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {str(exc).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
