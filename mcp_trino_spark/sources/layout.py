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

#: default bits per dimension: 16 bits ≈ 65k distinct cells per axis,
#: far below range-partition granularity — finer quantization buys
#: nothing.  With k dims the interleave uses min(16, 48 // k) bits per
#: dim so the Z-value stays comfortably inside a signed 64-bit long.
_BITS = 16


def _zvalue(qcols: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of k non-negative ints: bit i of
    column j lands at position i·k + j (Morton order).  Pure column
    arithmetic — stays in codegen."""
    k = len(qcols)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(qcols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
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


def zorder_frame(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    lead_cols: Sequence[str] = (),
) -> DataFrame:
    """Return ``df`` clustered for writing: range-partitioned into
    ``n_files`` tasks by the Z-value of ``cols`` (2-4 columns), rows
    sorted by Z within each task.  Write the result with an ordinary
    ``.write.parquet`` — one file per task, each covering a compact
    hyper-rectangle of the clustering space.  Beyond ~4 dimensions the
    curve's locality (and with it file skipping) degrades to noise, so
    higher arities are rejected rather than silently ineffective.

    ``lead_cols`` prefixes the range/sort keys — for HIVE-PARTITIONED
    tables pass the partition columns, so the range tasks align with
    partition boundaries and a partitionBy writer emits contiguous
    z-ranges per partition instead of |tasks| x |partitions| shards
    (the z-columns are independent of the partition columns, so
    without the prefix every task would hold rows of every
    partition)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(
            "zorder_frame clusters 2-4 columns (bit interleave); "
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
    bits = min(_BITS, 48 // len(cols))
    qdf, qcols = _quantized(df, cols, bits)
    z = _zvalue([F.col(c) for c in qcols], bits)
    keys = [*lead_cols, "__z"]
    return (
        qdf.withColumn("__z", z)
        .repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .drop("__z", *qcols)
    )


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 16) -> None:
    """Cluster ``df`` by Z-order of ``cols`` and write parquet at
    ``path`` (one file per range partition)."""
    zorder_frame(df, cols, n_files).write.mode("overwrite").parquet(path)
