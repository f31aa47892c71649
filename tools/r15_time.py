"""Isolated per-entry timing at sf0.1 — bench.py methodology (noop sink,
min of N, opcache release + clearCache between runs) for A/B comparisons
during the r15 optimization round.

Usage: python tools/r15_time.py [-n REPS] entry [entry ...]
`l21b_cc_propagation` routes through bench.py's _SPECIAL_BENCH.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_trino_spark import registry  # noqa: E402
from mcp_trino_spark.operators.opcache import (  # noqa: E402
    release_all_operator_caches,
)
from mcp_trino_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    spark = get_spark("r15_time")
    qs = registry.queries()
    # same warmup as bench.py
    qs["a1_groupby_count"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    release_all_operator_caches()
    spark.catalog.clearCache()
    import bench

    for name in args:
        if name in bench._SPECIAL_BENCH:
            t = bench._SPECIAL_BENCH[name](spark, SF_DIR, reps)
            print(f"{name}: {t:.3f}s (special, min of {reps})")
            continue
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r15_time: {name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            release_all_operator_caches()
            spark.catalog.clearCache()
        print(
            f"{name}: {min(times):.3f}s (min of {reps}; all="
            + ",".join(f"{t:.2f}" for t in times)
            + ")"
        )


if __name__ == "__main__":
    main()
