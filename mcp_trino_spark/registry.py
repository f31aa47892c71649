"""Central query registry: name → (PySpark builder, DuckDB oracle SQL).

Every operator from SURVEY §2 registers here via the ``@register``
decorator; ``__spark_entry__.py`` re-exports the two dicts to the
driver.  The driver compares the Spark result against the oracle with
an order-insensitive value hash after sorting columns by name, so the
helpers below exist to make float aggregation *bit-exact* across
engines:

Doubles summed in different orders differ in the last ULPs, and no
post-hoc ROUND reliably heals that (a sum can land on a rounding
boundary).  The robust fix is to do the aggregation in *exact decimal*
arithmetic on both sides — cast each input to DECIMAL before SUM (both
Spark and DuckDB sum decimals exactly, order-independent), then cast
the final value back to DOUBLE (exact-decimal → double conversion is
deterministic).  ``dsum`` / ``DSUM`` encode that pattern.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

QueryFn = Callable[[SparkSession, str], DataFrame]


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries with no oracle get the driver's weaker rows-only check
    (approx sketches, nondeterministic sampling, streaming)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query name {name!r} — a second registration "
                "would silently shadow the first in the driver contract"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# ---------------------------------------------------------------------------
# Cross-engine exact-arithmetic helpers (see module docstring).
# DECIMAL(25,6) inputs: |x| < 10^19 with 6 fractional digits — covers every
# money/measure column in the testdata (≤ ~1e7) with huge headroom; decimal
# SUM widens precision engine-side and stays exact.


def dec(col: Column | str, prec: int = 25, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: Column | str, prec: int = 25, scale: int = 6) -> Column:
    """Order-independent SUM over doubles: exact-decimal sum → double."""
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: Column | str, prec: int = 25, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, prec, scale) / F.count(c)


def DSUM(expr: str, prec: int = 25, scale: int = 6) -> str:
    """DuckDB-side twin of ``dsum``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def DAVG(expr: str, prec: int = 25, scale: int = 6) -> str:
    return f"{DSUM(expr, prec, scale)} / COUNT({expr})"


def queries() -> Dict[str, QueryFn]:
    _ensure_loaded()
    return dict(QUERIES)


def oracle_sql() -> Dict[str, str]:
    _ensure_loaded()
    return dict(ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once (imports populate the dicts)."""
    global _LOADED
    if _LOADED:
        return
    try:
        _import_operator_modules()
    except BaseException:
        # a partial import left orphaned registrations; clear them so a
        # retry re-imports cleanly instead of tripping the duplicate guard
        QUERIES.clear()
        ORACLES.clear()
        raise
    _LOADED = True


def _import_operator_modules() -> None:
    from mcp_trino_spark import flagship  # noqa: F401
    from mcp_trino_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        llm_dedup,
        llm_multimodal,
        llm_similarity,
        llm_text,
        projection,
        setops,
        timeseries,
        windows,
    )
    from mcp_trino_spark.functions import scalar  # noqa: F401
    from mcp_trino_spark.plans import explain_queries  # noqa: F401
    from mcp_trino_spark.sources import sinks  # noqa: F401
