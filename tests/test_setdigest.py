"""SetDigest (KMV) sketch properties — functions/setdigest.py.

Below the fold (< K distinct values) every reader is exact; above it
the KMV estimator must stay inside its published error envelope.
Merging must commute with direct construction.
"""

import random

import pytest

from mcp_trino_spark.functions.setdigest import (
    K,
    digest_cardinality,
    intersection_cardinality,
    jaccard,
    make_digest_from_values,
    merge_digests,
)


def test_exact_below_the_fold():
    a = make_digest_from_values(range(0, 50))
    b = make_digest_from_values(range(25, 75))
    assert digest_cardinality(a) == 50
    assert intersection_cardinality(a, b) == 25
    assert jaccard(a, b) == pytest.approx(25 / 75)


def test_duplicates_and_nulls_ignored():
    d = make_digest_from_values([1, 1, 2, None, 2, 3, None])
    assert digest_cardinality(d) == 3


def test_empty_and_disjoint():
    e = make_digest_from_values([])
    a = make_digest_from_values([1, 2])
    b = make_digest_from_values([3, 4])
    assert digest_cardinality(e) == 0
    assert jaccard(e, e) == 1.0  # Trino: two empty sets
    assert jaccard(a, b) == 0.0
    assert intersection_cardinality(a, b) == 0


def test_merge_equals_direct_construction():
    rng = random.Random(7)
    parts = [[rng.randrange(10_000) for _ in range(400)] for _ in range(5)]
    merged = merge_digests([make_digest_from_values(p) for p in parts])
    direct = make_digest_from_values([v for p in parts for v in p])
    assert merged == direct  # bottom-K of the union, byte-identical


def test_merge_order_invariance():
    parts = [make_digest_from_values(range(i, i + 300)) for i in (0, 200, 900)]
    fwd = merge_digests(parts)
    rev = merge_digests(list(reversed(parts)))
    assert fwd == rev


def test_kmv_estimate_error_envelope():
    # n = 100k >> K: the (K-1)/h_K estimator has σ ≈ n/√K ≈ 4.4%;
    # assert a generous 4σ band (deterministic: md5 hashing is fixed)
    n = 100_000
    d = make_digest_from_values(range(n))
    est = digest_cardinality(d)
    assert abs(est - n) < 4 * n / (K ** 0.5)


def test_jaccard_estimate_above_the_fold():
    # |A| = |B| = 20k, overlap 10k -> J = 1/3; bottom-k resemblance
    # error ~1/sqrt(K); allow 4 sigma
    a = make_digest_from_values(range(0, 20_000))
    b = make_digest_from_values(range(10_000, 30_000))
    assert jaccard(a, b) == pytest.approx(1 / 3, abs=4 / (K ** 0.5))


def test_composed_cardinality_rewrite_sql(spark):
    from mcp_trino_spark.execute import execute_query

    r = execute_query(
        spark,
        "SELECT cardinality((SELECT make_set_digest(x) FROM"
        " (SELECT id % 100 AS x FROM range(1000)))) AS c",
        dialect="trino",
    ).rows[0]["c"]
    assert r == 100
    # merge rollup: per-group digests merged == distinct of the whole
    r = execute_query(
        spark,
        "SELECT cardinality((SELECT merge_set_digest(d) FROM ("
        " SELECT g, make_set_digest(x) AS d FROM"
        " (SELECT id % 7 AS g, id % 200 AS x FROM range(2000))"
        " GROUP BY g))) AS c",
        dialect="trino",
    ).rows[0]["c"]
    assert r == 200
