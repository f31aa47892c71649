"""Z-order data layout — multi-dimensional clustering for scan pruning.

At 100 TB the dominant scan-cost lever after partitioning is FILE
layout: parquet keeps per-file/per-row-group min-max statistics, and a
reader with predicates on two columns can skip a file only if the
file's bounding box misses the predicate box.  Row-order (or single-
column-sort) layouts give tight ranges on one dimension and full-span
ranges on every other; interleaving the bits of both dimensions into a
Z-value and range-partitioning on it bounds EVERY file to a small
hyper-rectangle, so selective multi-column queries skip most files.

This is the Delta/Iceberg `OPTIMIZE ... ZORDER BY` idea (Trino's
Iceberg connector exposes plain `optimize`; Z-ordering is the layout
extension a training-data lake actually runs) expressed Spark-first:
the Z-value is pure JVM column math (bit shifts/masks inside
whole-stage codegen), the clustering is one `repartitionByRange` on
it, and the write is ordinary parquet — no custom writer, no UDF.

Scale posture: two passes over the data (min/max agg, then the range
shuffle + write).  The range boundaries come from Spark's own range
sampler; skew in the Z-value behaves like any range-partition skew
(AQE).  Layout quality is ASSERTED in tests/test_layout.py from the
written parquet footers: the mean per-file bounding-box area under
Z-order must beat the row-order layout by a wide margin.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

#: bits per dimension: 2 dims × 16 bits interleave into a 32-bit
#: Z-value — 65k distinct cells per axis is far below range-partition
#: granularity, so finer quantization buys nothing
_BITS = 16


def _zvalue(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1.  Pure column
    arithmetic — stays in codegen."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def _quantized(df: DataFrame, cols: Sequence[str], bits: int = _BITS
               ) -> Tuple[DataFrame, List[str]]:
    """Min-max scale each clustering column to [0, 2^bits) as a bigint.

    The min/max frame is one tiny aggregate row, broadcast back — the
    same two-pass shape every range writer uses.  NULLs quantize to 0
    (they cluster together at the curve's origin)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    qcols = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        q = F.floor(
            (F.col(c).cast("double") - lo) / span * top
        ).cast("bigint")
        q = F.coalesce(F.least(F.greatest(q, F.lit(0)), F.lit(top)), F.lit(0))
        qcols.append(f"__q_{c}")
        out = out.withColumn(f"__q_{c}", q)
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]), qcols


def zorder_frame(df: DataFrame, cols: Sequence[str], n_files: int) -> DataFrame:
    """Return ``df`` clustered for writing: range-partitioned into
    ``n_files`` tasks by the Z-value of ``cols`` (exactly 2 columns),
    rows sorted by Z within each task.  Write the result with an
    ordinary ``.write.parquet`` — one file per task, each covering a
    compact hyper-rectangle of the clustering space."""
    if len(cols) != 2:
        raise ValueError(
            "zorder_frame clusters exactly 2 columns (bit interleave); "
            f"got {list(cols)!r}"
        )
    reserved = {"__z"} | {f"__q_{c}" for c in cols} | {
        f"__min_{c}" for c in cols
    } | {f"__max_{c}" for c in cols}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"zorder_frame reserves column names {sorted(clash)} for its "
            "internal quantization/curve columns — rename them first"
        )
    qdf, qcols = _quantized(df, cols)
    z = _zvalue(F.col(qcols[0]), F.col(qcols[1]))
    return (
        qdf.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *qcols)
    )


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 16) -> None:
    """Cluster ``df`` by Z-order of ``cols`` and write parquet at
    ``path`` (one file per range partition)."""
    zorder_frame(df, cols, n_files).write.mode("overwrite").parquet(path)
