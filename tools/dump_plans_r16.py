"""Dump .explain("formatted") for named queries to plans/r16/.

Usage:
    python tools/dump_plans_r16.py before q0_flagship_revenue_by_region l33_editdist_verify ...
    python tools/dump_plans_r16.py after  <names...>

Writes plans/r16/<name>_<suffix>.txt — the optimization-round evidence
files the judge checks plan claims against (OPTIMIZATION_r16.md).
Runs at sf0.001: plan SHAPE is scale-invariant, and the dump must not
compete with the bench for cores.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from mcp_trino_spark import registry  # noqa: E402
from mcp_trino_spark.operators.opcache import release_all_operator_caches  # noqa: E402
from mcp_trino_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = "/root/repo/plans/r16"


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans_r16")
    qs = registry.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            plan = formatted(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN DUMP FAILED: {e!r}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_all_operator_caches()
        spark.catalog.clearCache()
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
