"""Mergeable quantile sketches — mcp_trino_spark/functions/qdigest.py.

Parity target: Trino's qdigest family (qdigest_agg / merge /
value_at_quantile / quantile_at_value), re-expressed as a
deterministic equi-depth centroid sketch with a two-level
(shard → merge) distributed build.  The correctness contract is the
documented rank-error bound (≤ 2·W/K over two clustering passes),
asserted here against exact quantiles — plus determinism and
merge-order invariance, which Trino's qdigest also guarantees for
fixed input multisets.
"""

import bisect
import random

import pytest

from mcp_trino_spark.functions.qdigest import (
    DEFAULT_K,
    build_sketch,
    merge_sketches,
    quantile_at_value,
    value_at_quantile,
)

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def rank_of(sorted_vals, v):
    return bisect.bisect_left(sorted_vals, v) / len(sorted_vals)


@pytest.fixture(scope="module")
def gauss_50k():
    rng = random.Random(20260814)
    return [rng.gauss(0.0, 1.0) for _ in range(50_000)]


# ---------------------------------------------------------------------------
# pure core


def test_small_input_sketch_is_exact():
    vals = [5.0, 1.0, 3.0, 2.0, 4.0]
    sk = build_sketch(vals)
    # below K centroids the sketch IS the sorted data
    assert sk == [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1), (5.0, 1)]
    assert value_at_quantile(sk, 0.5) == 3.0
    assert value_at_quantile(sk, 0.0) == 1.0
    assert value_at_quantile(sk, 1.0) == 5.0


def test_rank_error_bound_single_build(gauss_50k):
    sk = build_sketch(gauss_50k)
    assert len(sk) <= DEFAULT_K
    exact = sorted(gauss_50k)
    for q in QS:
        est = value_at_quantile(sk, q)
        # documented bound: one clustering pass ≈ W/K rank error; allow 2×
        assert abs(rank_of(exact, est) - q) <= 2.0 / DEFAULT_K


def test_rank_error_bound_after_sharded_merge(gauss_50k):
    shards = [build_sketch(gauss_50k[i::8]) for i in range(8)]
    merged = merge_sketches(shards)
    assert len(merged) <= DEFAULT_K
    exact = sorted(gauss_50k)
    for q in QS:
        est = value_at_quantile(merged, q)
        # two clustering passes: 2·W/K, allow 2×
        assert abs(rank_of(exact, est) - q) <= 4.0 / DEFAULT_K


def test_merge_is_order_invariant(gauss_50k):
    shards = [build_sketch(gauss_50k[i::4]) for i in range(4)]
    assert merge_sketches(shards) == merge_sketches(list(reversed(shards)))


def test_build_is_input_order_invariant(gauss_50k):
    shuffled = list(gauss_50k)
    random.Random(1).shuffle(shuffled)
    assert build_sketch(shuffled) == build_sketch(gauss_50k)


def test_quantile_at_value_inverts(gauss_50k):
    sk = build_sketch(gauss_50k)
    for q in (0.1, 0.5, 0.9):
        v = value_at_quantile(sk, q)
        assert abs(quantile_at_value(sk, v) - q) <= 4.0 / DEFAULT_K
    assert quantile_at_value(sk, -1e9) == 0.0
    assert quantile_at_value(sk, 1e9) == 1.0


def test_weights_conserved(gauss_50k):
    sk = build_sketch(gauss_50k)
    assert sum(w for _, w in sk) == len(gauss_50k)
    merged = merge_sketches([sk, sk])
    assert sum(w for _, w in merged) == 2 * len(gauss_50k)


def test_nan_and_none_dropped():
    sk = build_sketch([1.0, float("nan"), 2.0, None, 3.0])
    assert sum(w for _, w in sk) == 3


def test_empty_and_bad_quantile():
    assert value_at_quantile([], 0.5) != value_at_quantile([], 0.5)  # NaN
    with pytest.raises(ValueError, match="quantile"):
        value_at_quantile([(1.0, 1)], 1.5)


# ---------------------------------------------------------------------------
# Spark path (two-level build, rollup merge, determinism)


SF = "/root/testdata/sf0.001"


def test_spark_two_level_build_matches_exact_quantiles(spark):
    from mcp_trino_spark.functions.qdigest import qdigest_by, with_quantiles
    from mcp_trino_spark.sources.catalog import load_table

    cust = load_table(spark, SF, "customer")
    sk = qdigest_by(cust, "c_acctbal", ["c_nationkey"])
    got = {
        r["c_nationkey"]: r["p50"]
        for r in with_quantiles(sk, [0.5]).select("c_nationkey", "p50").collect()
    }
    pdf = cust.select("c_nationkey", "c_acctbal").toPandas()
    for nk, grp in pdf.groupby("c_nationkey"):
        vals = sorted(grp["c_acctbal"].tolist())
        # groups here are far below K → sketch is exact; the estimate
        # must land within one value of the exact median rank
        r = rank_of(vals, got[nk])
        assert abs(r - 0.5) <= 0.5 / max(len(vals), 1) + 2.0 / DEFAULT_K


def test_spark_build_is_deterministic_and_shard_invariant(spark):
    from mcp_trino_spark.functions.qdigest import qdigest_by, with_quantiles
    from mcp_trino_spark.sources.catalog import load_table

    cust = load_table(spark, SF, "customer")

    def run(n_shards):
        df = with_quantiles(
            qdigest_by(cust, "c_acctbal", ["c_nationkey"], n_shards=n_shards),
            [0.5, 0.9],
        ).select("c_nationkey", "p50", "p90")
        return {r["c_nationkey"]: (r["p50"], r["p90"]) for r in df.collect()}

    a, b = run(32), run(32)
    assert a == b  # same plan → bit-identical (no order dependence)
    c = run(4)
    # different sharding → same rank-error contract, not bit equality
    pdf = cust.select("c_nationkey", "c_acctbal").toPandas()
    for nk, grp in pdf.groupby("c_nationkey"):
        vals = sorted(grp["c_acctbal"].tolist())
        for est in (a[nk][0], c[nk][0]):
            assert abs(rank_of(vals, est) - 0.5) <= 0.5 / max(len(vals), 1) + 4.0 / DEFAULT_K


def test_a21_registry_entry_shape(spark):
    from mcp_trino_spark import registry

    df = registry.queries()["a21_qdigest_rollup"](spark, SF)
    rows = df.collect()
    assert len(rows) == 5  # one row per region
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_with_quantiles_column_naming(spark):
    from mcp_trino_spark.functions.qdigest import qdigest_by, with_quantiles
    from mcp_trino_spark.sources.catalog import load_table

    cust = load_table(spark, SF, "customer")
    sk = qdigest_by(cust, "c_acctbal", ["c_nationkey"])
    # 0.29*100 = 28.999…96 in binary: must still name the column p29
    cols = with_quantiles(sk, [0.29, 0.5, 0.123]).columns
    assert "p29" in cols and "p50" in cols and "p0_123" in cols


def test_heavy_hitter_value_does_not_collapse_shards(spark):
    # a constant column is the worst case for value-hash sharding: every
    # row has one value; row-based sharding must still split the groups
    from pyspark.sql import functions as F
    from mcp_trino_spark.functions.qdigest import qdigest_partial

    df = spark.range(0, 100_000, 1, 16).select(
        F.lit(1).alias("g"), F.lit(42.0).alias("x")
    )
    partials = qdigest_partial(df, "x", ["g"], n_shards=16)
    assert partials.count() > 1  # multiple partial groups, not one giant


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis)


from hypothesis import example, given, settings, strategies as st

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=3000))
def test_prop_weights_conserved_and_bounded(vals):
    sk = build_sketch(vals)
    assert len(sk) <= DEFAULT_K
    assert sum(w for _, w in sk) == len(vals)
    # centroid means stay inside the data range and sorted
    assert min(vals) <= sk[0][0] and sk[-1][0] <= max(vals)
    assert all(sk[i][0] <= sk[i + 1][0] for i in range(len(sk) - 1))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(finite_floats, min_size=10, max_size=2000),
    st.floats(min_value=0.0, max_value=1.0),
)
@example(
    vals=[0.0,
     0.0,
     0.0,
     0.0,
     -1.0,
     -1.0,
     -1.0,
     -1.0,
     -1.0,
     -2.7755575615628914e-17,
     -2.982044536372854e-131],
    q=0.5,
).via('discovered failure')
def test_prop_rank_error_bound(vals, q):
    sk = build_sketch(vals)
    est = value_at_quantile(sk, q)
    exact = sorted(vals)
    # rank of the estimate within the documented bound (duplicates can
    # widen the bisect window: compare against the closed rank interval)
    lo = bisect.bisect_left(exact, est) / len(exact)
    hi = bisect.bisect_right(exact, est) / len(exact)
    slack = 2.0 / DEFAULT_K + 1.0 / len(exact)
    assert lo - slack <= q <= hi + slack


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=1000), st.integers(2, 6))
def test_prop_sharded_merge_conserves_weight(vals, shards):
    parts = [build_sketch(vals[i::shards]) for i in range(shards)]
    merged = merge_sketches(parts)
    assert sum(w for _, w in merged) == len(vals)
    assert len(merged) <= DEFAULT_K


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=500), st.randoms())
def test_prop_build_order_invariant(vals, rnd):
    shuffled = list(vals)
    rnd.shuffle(shuffled)
    assert build_sketch(shuffled) == build_sketch(vals)


def test_interpolation_cancellation_regression():
    """Pinned r9-verdict failure: with prev_v=-1.0, v=-2.78e-17, frac=1.0,
    the naive prev_v + frac*(v - prev_v) rounds (v - prev_v) to 1.0 and
    returns 0.0 instead of v, jumping the estimate past four duplicate
    zeros (rank 7/11 vs target 5.5/11 — outside the 2/K + 1/n slack).
    The cancellation-safe form must return v exactly at frac == 1."""
    vals = [0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0, -1.0,
            -2.7755575615628914e-17, -2.982044536372854e-131]
    sk = build_sketch(vals)
    est = value_at_quantile(sk, 0.5)
    exact = sorted(vals)
    lo = bisect.bisect_left(exact, est) / len(exact)
    hi = bisect.bisect_right(exact, est) / len(exact)
    slack = 2.0 / DEFAULT_K + 1.0 / len(exact)
    assert lo - slack <= 0.5 <= hi + slack
    # and specifically: the median of this multiset is a tiny negative,
    # not 0.0 — the estimate must not land in the duplicate-zero block
    assert est < 0.0


def test_interpolation_mirrored_cancellation_regression():
    """ADVICE r10: the r9 fix anchored at v, exact as frac→1 — but the
    MIRRORED case (|prev_v| << |v|, frac→0) still cancelled:
    v - (1-frac)*(v - prev_v) rounds (v - prev_v) to v and returns 0.0
    instead of ~prev_v, jumping the estimate across a duplicate-zero
    block from the other side.  The two-sided form anchors at the NEAR
    endpoint, so each limit is exact."""
    prev_v, v = -2.7755575615628914e-17, 1.0
    sk = [(prev_v, 5), (v, 5)]
    # rank barely past prev centroid's midpoint: frac ≈ 1e-18
    total = 10.0
    rank = (2.5 + 5e-18) / total
    est = value_at_quantile(sk, rank)
    assert est < 0.0  # ~prev_v, NOT 0.0
    # quantile_at_value shares the interpolation: a value barely above
    # prev_v must map to a rank at prev's midpoint, not pos's
    r = quantile_at_value(sk, prev_v + 1e-18 * (v - prev_v))
    assert abs(r - 0.25) < 1e-6


# ---------------------------------------------------------------------------
# weighted build — the bounded-memory path for Trino's
# approx_percentile(x, w, percentage) (trino_compat x45 documents the
# exact rewrite's distinct-value memory wall; this is the scale path)


def weighted_rank_interval(pairs, est):
    """Closed weight-rank interval of ``est`` in the weighted multiset."""
    total = sum(w for _, w in pairs)
    below = sum(w for v, w in pairs if v < est)
    at_or_below = sum(w for v, w in pairs if v <= est)
    return below / total, at_or_below / total


def test_weighted_rank_error_bound(gauss_50k):
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    rng = random.Random(20260815)
    pairs = [(v, rng.randint(1, 20)) for v in gauss_50k]
    sk = build_sketch_weighted(pairs)
    assert len(sk) <= DEFAULT_K
    total_w = sum(w for _, w in pairs)
    assert sum(w for _, w in sk) == total_w  # weight conservation
    for q in QS:
        est = value_at_quantile(sk, q)
        lo, hi = weighted_rank_interval(pairs, est)
        assert lo - 2.0 / DEFAULT_K <= q <= hi + 2.0 / DEFAULT_K


def test_weighted_build_drops_nulls_and_nonpositive_weights():
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    pairs = [(1.0, 3), (None, 5), (float("nan"), 2), (2.0, None),
             (3.0, 0), (4.0, -7), (5.0, float("nan")), (2.0, 1)]
    sk = build_sketch_weighted(pairs)
    assert sk == [(1.0, 3), (2.0, 1)]


from hypothesis import example as _example  # noqa: E402  (grouped with the property suite)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(finite_floats, st.integers(1, 50)), min_size=5, max_size=600
    ),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_prop_weighted_rank_error_bound(pairs, q):
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    sk = build_sketch_weighted(pairs)
    est = value_at_quantile(sk, q)
    total_w = sum(w for _, w in pairs)
    assert sum(w for _, w in sk) == total_w
    lo, hi = weighted_rank_interval(pairs, est)
    # equi-depth clustering closes a cluster only at acc_w >= target,
    # so one heavy pair can widen a cluster by its own weight: bound is
    # 2/K of total weight plus the heaviest single pair's mass
    slack = 2.0 / DEFAULT_K + max(w for _, w in pairs) / total_w
    assert lo - slack <= q <= hi + slack


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.tuples(finite_floats, st.integers(1, 20)), min_size=1, max_size=300),
    st.randoms(),
)
def test_prop_weighted_build_order_invariant(pairs, rnd):
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    shuffled = list(pairs)
    rnd.shuffle(shuffled)
    assert build_sketch_weighted(shuffled) == build_sketch_weighted(pairs)


# --- r15: the numpy kernel must be BIT-identical to the pure reference ---

def _ref_build_sketch(values, k=DEFAULT_K):
    """The pre-r15 pure-Python build, kept verbatim as the semantic
    reference for the vectorized kernel."""
    import math as _math

    from mcp_trino_spark.functions.qdigest import _cluster

    pairs = [(float(v), 1) for v in values if v is not None and not (
        isinstance(v, float) and _math.isnan(v)
    )]
    pairs.sort(key=lambda p: p[0])
    return _cluster(pairs, k)


def _ref_build_sketch_weighted(pairs, k=DEFAULT_K):
    import math as _math

    from mcp_trino_spark.functions.qdigest import _cluster

    clean = []
    for v, w in pairs:
        if v is None or w is None:
            continue
        v, w = float(v), float(w)
        if _math.isnan(v) or _math.isnan(w):
            continue
        w = int(w)
        if w <= 0:
            continue
        clean.append((v, w))
    clean.sort()
    return _cluster(clean, k)


def _ref_merge_sketches(sketches, k=DEFAULT_K):
    from mcp_trino_spark.functions.qdigest import _cluster

    pairs = [(float(v), int(w)) for s in sketches for v, w in s]
    pairs.sort(key=lambda p: p[0])
    return _cluster(pairs, k)


def _bits(sk):
    import struct

    return [(struct.pack("<d", v), w) for v, w in sk]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.none(),
            st.just(-0.0),
            st.just(0.0),
        ),
        max_size=800,
    ),
    st.integers(2, 12),
)
def test_numpy_build_matches_pure_reference(values, k):
    from mcp_trino_spark.functions.qdigest import build_sketch

    assert _bits(build_sketch(values, k)) == _bits(_ref_build_sketch(values, k))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.floats(allow_nan=True, width=64), st.none(),
                      st.just(-0.0), st.just(0.0)),
            st.one_of(st.integers(-3, 40), st.none()),
        ),
        max_size=600,
    ),
    st.integers(2, 12),
)
def test_numpy_weighted_build_matches_pure_reference(pairs, k):
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    assert _bits(build_sketch_weighted(pairs, k)) == _bits(
        _ref_build_sketch_weighted(pairs, k)
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.floats(allow_nan=False, allow_infinity=False, width=64),
                      st.integers(1, 30)),
            max_size=60,
        ),
        max_size=8,
    ),
    st.integers(2, 12),
)
def test_numpy_merge_matches_pure_reference(sketches, k):
    from mcp_trino_spark.functions.qdigest import merge_sketches

    assert _bits(merge_sketches(sketches, k)) == _bits(
        _ref_merge_sketches(sketches, k)
    )


# ---------------------------------------------------------------------------
# ADVICE r15 hardening: foreign/edge inputs must degrade cleanly


def test_weighted_build_nonfinite_and_huge_weights_are_dropped():
    """inf/NaN/>=2^63 weights previously hit numpy's undefined
    float→int64 cast (silent wrap to INT64_MIN); they must now be
    dropped like NULLs, leaving the well-formed rows' sketch intact."""
    from mcp_trino_spark.functions.qdigest import build_sketch_weighted

    good = [(1.0, 3), (2.0, 5), (4.0, 1)]
    dirty = good + [
        (9.0, float("inf")),
        (9.0, float("-inf")),
        (9.0, float("nan")),
        (9.0, 2.0**63),
        (9.0, -(2.0**64)),
    ]
    assert build_sketch_weighted(dirty, 4) == build_sketch_weighted(good, 4)


def test_merge_tolerates_foreign_zero_weight_centroids():
    """A foreign sketch carrying zero/negative-weight centroids (never
    produced by this module's builders) raised ZeroDivisionError in the
    numpy kernel where the pure reference skipped the empty tail."""
    clean = [[(1.0, 2), (3.0, 4)], [(2.0, 1)]]
    dirty = [[(1.0, 2), (3.0, 4), (9.0, 0)], [(2.0, 1), (-5.0, -3)]]
    assert merge_sketches(dirty, 3) == merge_sketches(clean, 3)
