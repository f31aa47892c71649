"""Interleaved A/B of CC-propagation loop shapes (VERDICT r15 #3).

Variants over the SAME localCheckpoint'd pair frame (bench l21b
protocol):
  a) current committed shape: per changed round = count job (also
     materializes the persisted stepped) + pointer-jump localCheckpoint
     job.
  b) observe-fused WITH jump: one job per round — the jump's
     localCheckpoint materializes stepped (persisted, observed);
     convergence read from the Observation.  Jump at a fixpoint is the
     identity, so the extra final-round jump is a no-op value-wise.
  c) observe-fused WITHOUT jump: one job per round — localCheckpoint
     of the stepped labels with the Observation below; no pointer jump
     (LSH dup graphs are clique-dense; measure whether the jump still
     buys rounds).

Prints per-variant wall (min/median of N alternated reps), per-variant
Spark job count, and the changed-counts sequence (labels must converge
identically — the cluster assignment is checked equal to variant (a)'s
output).

Usage: python tools/r16_cc_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Observation, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges_frame(pairs: DataFrame):
    from mcp_trino_spark.operators.opcache import persist_tracked

    try:
        n_part = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_part = pairs.sparkSession.sparkContext.defaultParallelism
    edges = persist_tracked(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
                    F.struct(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")),
                    F.struct(F.col("doc_a").alias("a"), F.col("doc_a").alias("b")),
                    F.struct(F.col("doc_b").alias("a"), F.col("doc_b").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .repartition(n_part, "b")
    )
    edges.count()
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("lab"))
        .select(F.col("a").alias("node"), "lab")
    )
    return edges, labels


def _finish(labels):
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("lab").alias("cluster_id"),
        (F.col("lab") == F.col("node")).alias("is_keeper"),
    )


def _round_agg(edges, labels):
    return (
        edges.join(labels.hint("shuffle_hash"), edges["b"] == labels["node"])
        .groupBy("a")
        .agg(
            F.min("lab").alias("lab"),
            F.max(F.when(F.col("b") == F.col("a"), F.col("lab"))).alias("old_lab"),
        )
        .select(F.col("a").alias("node"), "old_lab", "lab")
    )


def variant_a(pairs):
    """Committed r15 shape (copy of llm_dedup._propagate_clusters)."""
    from mcp_trino_spark.operators.opcache import persist_tracked

    edges, labels = _edges_frame(pairs)
    seq = []
    for _ in range(15):
        stepped = persist_tracked(_round_agg(edges, labels))
        changed = stepped.filter(F.col("lab") != F.col("old_lab")).count()
        seq.append(changed)
        if changed == 0:
            labels = stepped.select("node", "lab")
            break
        parents = stepped.select(
            F.col("node").alias("p_node"), F.col("lab").alias("p_lab")
        )
        labels = (
            stepped.join(parents, stepped["lab"] == parents["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("p_lab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
        stepped.unpersist()
    return _finish(labels), seq


def variant_b(pairs):
    """Observe-fused, jump kept: one localCheckpoint job per round."""
    from mcp_trino_spark.operators.opcache import persist_tracked

    edges, labels = _edges_frame(pairs)
    seq = []
    for _ in range(15):
        obs = Observation()
        stepped = persist_tracked(
            _round_agg(edges, labels).observe(
                obs,
                F.sum(
                    (F.col("lab") != F.col("old_lab")).cast("long")
                ).alias("changed"),
            )
        )
        parents = stepped.select(
            F.col("node").alias("p_node"), F.col("lab").alias("p_lab")
        )
        labels = (
            stepped.join(parents, stepped["lab"] == parents["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("p_lab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
        changed = obs.get["changed"] or 0
        seq.append(changed)
        stepped.unpersist()
        if changed == 0:
            break
    return _finish(labels), seq


def variant_c(pairs):
    """Observe-fused, NO jump: one localCheckpoint job per round."""
    edges, labels = _edges_frame(pairs)
    seq = []
    for _ in range(15):
        obs = Observation()
        stepped = _round_agg(edges, labels).observe(
            obs,
            F.sum((F.col("lab") != F.col("old_lab")).cast("long")).alias(
                "changed"
            ),
        )
        labels = stepped.select("node", "lab").localCheckpoint()
        changed = obs.get["changed"] or 0
        seq.append(changed)
        if changed == 0:
            break
    return _finish(labels), seq


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from mcp_trino_spark.operators._util import spread
    from mcp_trino_spark.operators.llm_dedup import minhash_lsh_pairs_plan
    from mcp_trino_spark.operators.opcache import release_all_operator_caches
    from mcp_trino_spark.sources.catalog import load_table
    from mcp_trino_spark.session import get_spark

    spark = get_spark("r16_cc_ab")
    sc = spark.sparkContext
    docs = spread(load_table(spark, SF_DIR, "documents"))
    pairs = minhash_lsh_pairs_plan(docs).localCheckpoint()

    variants = {"a": variant_a, "b": variant_b, "c": variant_c}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    jobs: dict[str, list[int]] = {k: [] for k in variants}
    seqs: dict[str, list] = {}
    results: dict[str, list] = {}

    for rep in range(reps):
        for k, fn in variants.items():
            before = set(sc.statusTracker().getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            out, seq = fn(pairs)
            out.write.mode("overwrite").format("noop").save()
            walls[k].append(time.perf_counter() - t0)
            after = set(sc.statusTracker().getJobIdsForGroup() or [])
            jobs[k].append(len(after - before))
            seqs[k] = seq
            if rep == 0:
                results[k] = sorted(map(tuple, out.collect()))
            release_all_operator_caches()
            spark.catalog.clearCache()

    base = results["a"]
    for k in variants:
        ws = sorted(walls[k])
        same = results[k] == base
        print(
            f"variant {k}: min={ws[0]:.3f} med={ws[len(ws) // 2]:.3f} "
            f"jobs={jobs[k][-1]} rounds={len(seqs[k])} seq={seqs[k]} "
            f"output==a: {same}"
        )
    pairs.unpersist()


if __name__ == "__main__":
    main()
