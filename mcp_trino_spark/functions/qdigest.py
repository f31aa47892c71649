"""Mergeable quantile sketches — the Trino qdigest surface, Spark-first.

Reference surface: Trino's quantile-digest family — ``qdigest_agg(x)``,
``merge(qdigest)``, ``value_at_quantile(qdigest, q)``,
``values_at_quantiles``, ``quantile_at_value`` (the reference passes
that SQL through to Trino verbatim, client.go:501-617).  Spark has
``percentile_approx`` for direct quantiles but NO reaggregatable
quantile sketch: a per-day percentile cannot be rolled up to a
per-month percentile without re-scanning the fact table.  This module
closes that gap the same way ``a20_sketch_reaggregate`` does for
distinct counts with HLL: per-group sketches are small (≤ K centroid
pairs), materializable, and any coarser rollup — region, global,
time-windowed — merges sketches instead of re-reading 100 TB.

Sketch representation and guarantees
------------------------------------
A sketch is an equi-depth centroid list: values sorted ascending,
clustered into at most ``K`` (default 200) centroids of near-equal
weight, each kept as ``(mean value, weight)``.  Build and merge use
the same deterministic one-pass clustering primitive (no randomness,
no order dependence beyond the value sort), so the same data always
yields the same sketch — unlike t-digest, whose result depends on
arrival order.

Rank-error bound: one clustering pass over total weight ``W`` moves
any value's rank estimate by at most one cluster, i.e. ``≈ W/K``
(cluster weights are ``ceil``-balanced).  A two-level build (shards →
merge) compounds two passes: error ``≤ 2·W/K`` — at K=200 that is
1% of rank, comparable to Trino's default qdigest accuracy (0.01).
``tests/test_qdigest.py`` asserts the bound empirically against exact
quantiles, plus build determinism and shard-count invariance.

Distributed shape (the part that must survive 100 TB)
-----------------------------------------------------
``qdigest_by`` builds per-key sketches in TWO levels, mirroring
partial+final aggregation:

1. partial: group by ``(key, shard)`` where ``shard`` is the input
   partition id (mod n_shards) — a partial group holds at most the
   rows one scan partition contributes for that key (bounded by
   ``spark.sql.files.maxPartitionBytes``), so no single Python worker
   ever materializes a whole key's values (``applyInPandas`` hands a
   worker the full group; sharding is what keeps that bounded on
   skewed keys — and a ROW-based shard stays bounded even when one
   heavy-hitter VALUE dominates, which a value-hash shard does not);
2. final: merge the ≤ ``n_shards`` partial sketches per key — each a
   ≤ K centroid list, so the final groups are KB-sized regardless of
   the fact table's size.

Python crossings are Arrow-batched (``applyInPandas``); the fact-table
shuffle carries ``(key, shard, value)`` — never whole rows.

SQL note: Trino's ``merge()`` over qdigest in *SQL* stays a loud
``TrinoCompatError`` in the dialect layer (an aggregate over this
sketch type is not expressible as a registered SQL UDF); this module
is the engine's DataFrame-level equivalent, used by the ``a21*``
registry entries.
"""

from __future__ import annotations

import math
from typing import Iterable, List, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: default sketch size (number of centroids) — rank error ≈ W/K per
#: clustering pass; 200 matches Trino's default qdigest accuracy (1%)
DEFAULT_K = 200


# ---------------------------------------------------------------------------
# pure sketch core (deterministic, order-independent, mergeable)


def _cluster(
    pairs: Sequence[Tuple[float, int]], k: int
) -> List[Tuple[float, int]]:
    """One-pass equi-depth clustering of value-sorted ``(v, w)`` pairs
    into ≤ k centroids of near-equal weight.  Deterministic: the cut
    points depend only on the sorted weights, never on input order."""
    if not pairs:
        return []
    if len(pairs) <= k:
        return list(pairs)
    total = sum(w for _, w in pairs)
    target = math.ceil(total / k)
    out: List[Tuple[float, int]] = []
    acc_vw = 0.0  # Σ v*w of the open cluster
    acc_w = 0
    for v, w in pairs:
        acc_vw += v * w
        acc_w += w
        if acc_w >= target:
            out.append((acc_vw / acc_w, acc_w))
            acc_vw, acc_w = 0.0, 0
    if acc_w:
        out.append((acc_vw / acc_w, acc_w))
    return out


# --- numpy twin of _cluster (r15, guide §4.2: hand whole batches to
# vectorized native code inside the Python boundary).  BIT-IDENTICAL to
# the pure loop by construction:
# - cut points are integer math (np.cumsum of int64 weights is exact;
#   searchsorted finds the same first-index-where-acc≥target the loop's
#   running acc_w found, because acc_w at index j equals cumw[j]-base);
# - each cluster's Σ v·w seeds with the same literal 0.0 and adds the
#   same products LEFT-TO-RIGHT (np.add.accumulate is sequential), so
#   every intermediate double — including the sign of a ±0.0 sum — is
#   the one the loop produced;
# - callers use STABLE sorts that reproduce list.sort()'s tie order.
# A randomized differential test pins the equivalence
# (tests/test_qdigest.py::test_numpy_kernel_matches_pure_reference).


def _cluster_np(
    v: "np.ndarray", w: "np.ndarray", k: int
) -> List[Tuple[float, int]]:
    """Cluster value-sorted (v, w) arrays — the vectorized _cluster."""
    n = len(v)
    if n == 0:
        return []
    if n <= k:
        return list(zip(v.tolist(), w.tolist()))
    total = int(w.sum())
    target = -(-total // k)  # ceil
    cumw = np.cumsum(w)
    # errstate: plain Python float arithmetic produces the same
    # inf/nan silently; numpy's RuntimeWarning is noise, not a signal
    with np.errstate(over="ignore", invalid="ignore"):
        vw = v * w
    out: List[Tuple[float, int]] = []
    start = 0
    base = 0
    while start < n:
        j = int(np.searchsorted(cumw, base + target, side="left"))
        if j >= n:
            j = n - 1
        acc_w = int(cumw[j] - base)
        # seed 0.0 first, then left-to-right — the loop's exact fold
        # (errstate as above: Python float adds overflow to inf
        # silently; the warning is noise)
        with np.errstate(over="ignore", invalid="ignore"):
            acc_vw = float(
                np.add.accumulate(np.concatenate(([0.0], vw[start : j + 1])))[-1]
            )
        out.append((acc_vw / acc_w, acc_w))
        base = int(cumw[j])
        start = j + 1
    return out


def build_sketch(values: Iterable[float], k: int = DEFAULT_K) -> List[Tuple[float, int]]:
    """Sketch raw values: sort, then cluster to ≤ k centroids."""
    if isinstance(values, np.ndarray):
        v = values.astype(np.float64, copy=False)
    else:
        v = np.asarray([x for x in values if x is not None], dtype=np.float64)
    v = v[~np.isnan(v)]
    # unweighted ties are interchangeable (w ≡ 1), but keep the stable
    # kind anyway so the order matches list.sort() exactly
    v = np.sort(v, kind="stable")
    return _cluster_np(v, np.ones(len(v), dtype=np.int64), k)


def build_sketch_weighted(
    pairs: Iterable[Tuple[float, int]], k: int = DEFAULT_K
) -> List[Tuple[float, int]]:
    """Sketch ``(value, weight)`` pairs — the input shape of Trino's
    weighted ``approx_percentile(x, w, percentage)``, whose qdigest is
    bounded-memory where Spark's exact ``percentile(x, p, w)`` keeps a
    per-group value→count map that grows with DISTINCT values (the
    trino_compat x45 rewrite documents that wall and points here).
    A pair ``(v, w)`` carries rank mass w — identical to sketching w
    copies of v, without materializing them.  NULL/NaN values and
    NULL/non-positive weights are skipped (Trino requires w ≥ 1 and
    raises; the DataFrame surface drops them like NULL inputs)."""
    if isinstance(pairs, tuple) and len(pairs) == 2 and isinstance(pairs[0], np.ndarray):
        # array fast path: (values, weights) ndarrays straight off Arrow
        # (NULLs already spelled as NaN — the same clean masks apply)
        v = pairs[0].astype(np.float64, copy=False)
        w_f = pairs[1].astype(np.float64, copy=False)
    else:
        lst = pairs if isinstance(pairs, (list, tuple)) else list(pairs)
        try:
            # vectorized clean path (r16, guide §4.2): numeric pair
            # lists convert in one C pass.  NOTE: numpy converts None
            # to NaN here (it does NOT raise), which the NaN/finite
            # masks below drop — exactly the rows the old comprehension
            # filtered.  The except arm is for genuinely unconvertible
            # inputs (ragged tuples, non-numeric objects).
            arr = np.asarray(lst, dtype=np.float64)
            arr = arr.reshape(len(lst), 2) if len(lst) else arr.reshape(0, 2)
            v, w_f = arr[:, 0].copy(), arr[:, 1].copy()
        except (TypeError, ValueError):
            vw = [(v, w) for v, w in lst if v is not None and w is not None]
            v = np.asarray([p[0] for p in vw], dtype=np.float64)
            w_f = np.asarray([p[1] for p in vw], dtype=np.float64)
    # NULL long columns surface as NaN through Arrow/pandas.  The
    # int64 cast below is UNDEFINED for non-finite or >=2^63 doubles
    # (numpy silently wraps, typically to INT64_MIN, and the w>0 mask
    # would then silently DROP the row where the old pure-Python
    # int(w) raised a loud OverflowError) — mask them out explicitly
    # before the cast (ADVICE r15).  Engine callers cast weights from
    # LONG columns, so this arm only guards external float inputs.
    keep = (
        ~np.isnan(v)
        & np.isfinite(w_f)
        & (np.abs(w_f) < 2.0**63)
    )
    v, w_f = v[keep], w_f[keep]
    w = w_f.astype(np.int64)
    keep = w > 0
    v, w = v[keep], w[keep]
    # sort by (value, weight): value alone is not a total order when
    # duplicate values carry different weights, and the build must be
    # input-order invariant like the unweighted one.  lexsort is
    # stable with v primary, w secondary — list.sort()'s tuple order.
    order = np.lexsort((w, v))
    return _cluster_np(v[order], w[order], k)


def merge_sketches(
    sketches: Iterable[Sequence[Tuple[float, int]]], k: int = DEFAULT_K
) -> List[Tuple[float, int]]:
    """Merge any number of sketches: concatenate centroids, re-sort by
    value, re-cluster.  Associative up to the documented rank-error
    bound; deterministic regardless of merge order (the concatenated
    multiset is what gets sorted)."""
    vs: List[float] = []
    ws: List[int] = []
    for s in sketches:
        for v, w in s:
            vs.append(float(v))
            ws.append(int(w))
    v = np.asarray(vs, dtype=np.float64)
    w = np.asarray(ws, dtype=np.int64)
    # drop non-positive-weight centroids (ADVICE r15): engine-built
    # sketches never contain them (cluster weights are >= 1), but a
    # FOREIGN sketch with a trailing zero-weight centroid made
    # _cluster_np divide a zero accumulated weight where the pure
    # reference skipped the empty tail via ``if acc_w:``.  Filtering
    # before the stable sort preserves the survivors' relative order,
    # so engine outputs are bit-unchanged.
    keep = w > 0
    v, w = v[keep], w[keep]
    # sort by VALUE ONLY, stable — ties keep concatenation order
    # exactly like list.sort(key=p[0]) did (tie order decides which
    # chunk an equal-valued centroid's weight lands in, so the kind
    # matters for bit-equality)
    order = np.argsort(v, kind="stable")
    return _cluster_np(v[order], w[order], k)


def value_at_quantile(sketch: Sequence[Tuple[float, int]], q: float) -> float:
    """Estimate the q-quantile (0 ≤ q ≤ 1) from a sketch: walk the
    cumulative weights to the target rank, interpolating linearly
    between neighboring centroid means (t-digest-style midpoint rule:
    a centroid's mean sits at the midpoint of its weight span)."""
    if not sketch:
        return float("nan")
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    total = sum(w for _, w in sketch)
    rank = q * total
    # centroid i's mean represents rank position cum_before + w/2
    cum = 0.0
    prev_pos, prev_v = None, None
    for v, w in sketch:
        pos = cum + w / 2.0
        if rank <= pos:
            if prev_pos is None:
                return v  # below the first midpoint → first mean
            frac = (rank - prev_pos) / (pos - prev_pos)
            if frac >= 1.0:
                return v
            if frac <= 0.0:
                return prev_v
            # Cancellation-safe interpolation, BOTH limits: with
            # |v| << |prev_v| and frac→1, prev_v + frac*(v-prev_v)
            # rounds (v-prev_v) to -prev_v and returns 0.0 instead of
            # v (the r9 failure); mirrored, with |prev_v| << |v| and
            # frac→0, v - (1-frac)*(v-prev_v) cancels the same way and
            # returns 0.0 instead of ~prev_v.  Branch at 0.5 so the
            # anchor is always the NEAR endpoint — each endpoint-
            # anchored form is exact in its own limit.
            if frac < 0.5:
                return prev_v + frac * (v - prev_v)
            return v - (1.0 - frac) * (v - prev_v)
        cum += w
        prev_pos, prev_v = pos, v
    return sketch[-1][0]


def quantile_at_value(sketch: Sequence[Tuple[float, int]], v: float) -> float:
    """Inverse of ``value_at_quantile``: the estimated rank fraction of
    ``v`` (Trino's quantile_at_value)."""
    if not sketch:
        return float("nan")
    total = sum(w for _, w in sketch)
    cum = 0.0
    prev_pos, prev_v = None, None
    x = float(v)
    for cv, w in sketch:
        pos = cum + w / 2.0
        if x <= cv:
            if prev_pos is None:
                return 0.0 if x < cv else pos / total
            frac = (x - prev_v) / (cv - prev_v) if cv != prev_v else 1.0
            if frac >= 1.0:
                return pos / total
            if frac <= 0.0:
                return prev_pos / total
            # same two-sided cancellation guard as value_at_quantile:
            # anchor at the near endpoint of the rank span
            if frac < 0.5:
                return (prev_pos + frac * (pos - prev_pos)) / total
            return (pos - (1.0 - frac) * (pos - prev_pos)) / total
        cum += w
        prev_pos, prev_v = pos, cv
    return 1.0

# ---------------------------------------------------------------------------
# Spark plumbing: sketch columns are two parallel arrays (vs: array<double>,
# ws: array<long>) — Arrow moves them as columnar buffers, and pandas sees
# plain lists (no per-centroid struct boxing)


def _sketch_schema(key_fields: str) -> str:
    return f"{key_fields}, vs array<double>, ws array<long>"


def qdigest_partial(
    df: DataFrame, value_col: str, keys: Sequence[str],
    k: int = DEFAULT_K, n_shards: int = 32,
) -> DataFrame:
    """Level 1: per-(key, shard) sketches.  The shard key bounds every
    ``applyInPandas`` group to what one scan partition contributes for
    that key, so a skewed key never lands a whole group on one Python
    worker (see the sharding comment below)."""
    key_fields = ", ".join(
        f"{kc} {df.schema[kc].dataType.simpleString()}" for kc in keys
    )
    out_schema = _sketch_schema(key_fields)
    kk = int(k)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        # ndarray in: build_sketch's vectorized path filters NaN (the
        # Arrow spelling of NULL) itself — no per-row dropna/tolist
        sk = build_sketch(pdf["__qv"].to_numpy(dtype="float64"), kk)
        row = {kc: pdf[kc].iloc[0] for kc in keys}
        row["vs"] = [v for v, _ in sk]
        row["ws"] = [w for _, w in sk]
        return pd.DataFrame([row])

    # shard by INPUT PARTITION, not by value hash: hashing the value
    # sends every duplicate of a heavy-hitter value (and every NULL) to
    # one shard, un-bounding the group a single Python worker holds.
    # spark_partition_id caps a (key, shard) group at the rows one scan
    # partition contributes for that key — bounded by
    # spark.sql.files.maxPartitionBytes — and is deterministic for a
    # fixed file layout, keeping repeated builds bit-identical.
    return (
        df.select(*keys, F.col(value_col).cast("double").alias("__qv"))
        .withColumn("__shard", F.pmod(F.spark_partition_id(), F.lit(n_shards)))
        .groupBy(*keys, "__shard")
        .applyInPandas(build, out_schema)
    )


def qdigest_merge_by(
    df: DataFrame, keys: Sequence[str], k: int = DEFAULT_K
) -> DataFrame:
    """Merge sketch rows (vs/ws columns) grouped by ``keys`` — the
    final level of a build, or any coarser rollup.  Input groups are
    ≤ K-centroid lists, so this stage shuffles KB-sized rows only."""
    key_fields = ", ".join(
        f"{kc} {df.schema[kc].dataType.simpleString()}" for kc in keys
    )
    out_schema = _sketch_schema(key_fields)
    kk = int(k)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sketches = [
            list(zip(vs, ws)) for vs, ws in zip(pdf["vs"], pdf["ws"])
        ]
        sk = merge_sketches(sketches, kk)
        row = {kc: pdf[kc].iloc[0] for kc in keys}
        row["vs"] = [v for v, _ in sk]
        row["ws"] = [w for _, w in sk]
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(merge, out_schema)


def qdigest_by(
    df: DataFrame, value_col: str, keys: Sequence[str],
    k: int = DEFAULT_K, n_shards: int = 32,
) -> DataFrame:
    """Per-key sketches via the two-level (partial → merge) build."""
    return qdigest_merge_by(
        qdigest_partial(df, value_col, keys, k=k, n_shards=n_shards), keys, k=k
    )


def weighted_qdigest_partial(
    df: DataFrame, value_col: str, weight_col: str, keys: Sequence[str],
    k: int = DEFAULT_K, n_shards: int = 32,
) -> DataFrame:
    """Level 1 of the WEIGHTED build: per-(key, shard) sketches over
    ``(value, weight)`` rows.  Same distributed shape as
    ``qdigest_partial`` — the shard key bounds every Python group to
    one scan partition's contribution, the shuffle carries
    ``(key, shard, value, weight)`` only — so executor memory stays
    KB-bounded however many distinct values a group holds (the
    property Spark's exact ``percentile(x, p, w)`` lacks)."""
    key_fields = ", ".join(
        f"{kc} {df.schema[kc].dataType.simpleString()}" for kc in keys
    )
    out_schema = _sketch_schema(key_fields)
    kk = int(k)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        # (values, weights) ndarray fast path — no per-row tuple boxing
        sk = build_sketch_weighted(
            (
                pdf["__qv"].to_numpy(dtype="float64"),
                pdf["__qw"].to_numpy(dtype="float64"),
            ),
            kk,
        )
        row = {kc: pdf[kc].iloc[0] for kc in keys}
        row["vs"] = [v for v, _ in sk]
        row["ws"] = [w for _, w in sk]
        return pd.DataFrame([row])

    return (
        df.select(
            *keys,
            F.col(value_col).cast("double").alias("__qv"),
            F.col(weight_col).cast("long").alias("__qw"),
        )
        .withColumn("__shard", F.pmod(F.spark_partition_id(), F.lit(n_shards)))
        .groupBy(*keys, "__shard")
        .applyInPandas(build, out_schema)
    )


def weighted_qdigest_by(
    df: DataFrame, value_col: str, weight_col: str, keys: Sequence[str],
    k: int = DEFAULT_K, n_shards: int = 32,
) -> DataFrame:
    """Per-key WEIGHTED sketches (partial → merge) — the bounded-memory
    engine path for Trino's ``approx_percentile(x, w, percentage)``.
    Rank error ≤ 2·W/K of total weight W (tests/test_qdigest.py pins
    the bound on weighted inputs)."""
    return qdigest_merge_by(
        weighted_qdigest_partial(
            df, value_col, weight_col, keys, k=k, n_shards=n_shards
        ),
        keys,
        k=k,
    )


def with_quantiles(df: DataFrame, quantiles: Sequence[float]) -> DataFrame:
    """Append ``p<q>`` columns estimated from the vs/ws sketch columns
    (vectorized pandas UDF — one Arrow batch per partition)."""
    def make_udf(q: float):
        @F.pandas_udf("double")
        def est(vs: pd.Series, ws: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    value_at_quantile(list(zip(v, w)), q)
                    if v is not None and len(v)
                    else float("nan")
                    for v, w in zip(vs, ws)
                ]
            )

        return est

    for q in (float(q) for q in quantiles):
        # round before is_integer: 0.29*100 is 28.999…96 in binary;
        # the fallback replaces '.' (a dot in a column name parses as
        # struct-field access downstream)
        pct = round(q * 100, 9)
        name = (
            f"p{int(pct):02d}" if pct.is_integer()
            else "p" + str(q).replace(".", "_")
        )
        df = df.withColumn(name, make_udf(q)("vs", "ws"))
    return df
