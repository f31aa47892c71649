"""Full-registry timed sweep (BASELINE.md's per-round record): every
registry entry forced to full materialization through the noop sink,
one pass, cold per-entry caches — the coverage complement to bench.py's
headline min-of-N (first-positioned entries absorb planning/JIT, so
steady-state numbers are the BENCH rows).

Usage: python tools/full_sweep.py [--sf DIR]   # default sf0.1
Prints one JSON line {"total_sec": ..., "n": ..., "errors": {...},
"queries": {name: sec, ...}} plus a sorted table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_one  # noqa: E402
from mcp_trino_spark import registry  # noqa: E402
from mcp_trino_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("full_sweep")
    qs = registry.queries()
    times, errors = {}, {}
    t0 = time.perf_counter()
    for name, fn in qs.items():
        try:
            times[name] = round(run_one(spark, fn, sf_dir), 3)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            errors[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        print(f"{name}: {times.get(name, 'ERR')}", file=sys.stderr, flush=True)
    total = round(time.perf_counter() - t0, 1)
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"SLOW {sec:7.2f}  {name}", file=sys.stderr)
    print(json.dumps({
        "total_sec": total, "n": len(qs), "errors": errors, "queries": times,
    }))


if __name__ == "__main__":
    main()
