"""Connected-components clustering over the LSH pair graph (l20).

Drives the same iterative min-label/pointer-jump loop as
l21_dup_clusters but on hand-built graphs where the expected components
are obvious — a long chain (worst case for plain label propagation,
where pointer jumping must converge in O(log n) rounds) and disjoint
components mixed with singletons implied by the pair graph.
"""

from pyspark.sql import functions as F

from mcp_trino_spark.operators.llm_dedup import _propagate_clusters


def _cluster_map(rows):
    return {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in rows}


def test_chain_collapses_to_one_cluster(spark):
    # 0-1-2-...-9 chain: one component, keeper = 0.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    got = _cluster_map(_propagate_clusters(pairs).collect())
    assert set(got) == set(range(10))
    assert all(lab == 0 for lab, _ in got.values())
    assert [d for d, (_, keep) in got.items() if keep] == [0]


def test_disjoint_components(spark):
    # {1,2,3} triangle, {10,11} pair, nodes appear only via edges.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = _cluster_map(_propagate_clusters(pairs).collect())
    assert {d: lab for d, (lab, _) in got.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10
    }
    assert sorted(d for d, (_, keep) in got.items() if keep) == [1, 10]
