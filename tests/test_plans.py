"""Physical-plan regression guards — the 100 TB posture, asserted.

Correctness tests prove the operators compute the right rows; these
prove the plans stay the SHAPE that survives scale: filters pushed into
the parquet scan, projections pruned to the read schema, dimension
joins broadcast, fact joins free of cartesian products, whole-stage
codegen covering the hot path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_trino_spark import registry
from mcp_trino_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = formatted(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45" in plan


def test_column_pruning_reaches_parquet(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = formatted(df)
    # ReadSchema carries only the projected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_flagship_joins_are_broadcast_not_cartesian(spark):
    df = registry.queries()["q0_flagship_revenue_by_region"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_flagship_uses_whole_stage_codegen(spark):
    import contextlib
    import io

    df = registry.queries()["q0_flagship_revenue_by_region"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")  # AQE hides codegen spans in 'formatted'
    out = buf.getvalue()
    assert "Found" in out and "WholeStageCodegen" in out


def test_multiway_join_no_shuffle_on_fact_dims(spark):
    """j9 star join: every dimension side must broadcast — the fact
    table is never shuffled for a dim join."""
    df = registry.queries()["j9_multiway"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then merge), never a global sort."""
    df = registry.queries()["o2_topk"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_partitioned_window_has_no_single_partition_exchange(spark):
    """w1 row_number partitions by l_orderkey: the exchange must be hash
    partitioning, not SinglePartition."""
    df = registry.queries()["w1_row_number"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "SinglePartition" not in plan


def test_distributed_ntile_avoids_single_partition_window(spark):
    """w3, w3b, and w4 all ride _global_rank: one range-partitioned
    exchange, NO window at all (r16 — local rank is read off
    monotonically_increasing_id frozen by the persist; the old
    row_number window forced a second full-data exchange the range
    partitioning could not satisfy), and never a single partition."""
    for name in ("w3_ntile", "w3b_ntile_distributed", "w4_percent_rank_cume_dist"):
        df = registry.queries()[name](spark, SF_DIR)
        plan = physical_plan(df)
        assert "rangepartitioning" in plan.lower(), name
        assert "Window" not in plan, name
        assert "monotonically_increasing_id" in plan, name
        assert "SinglePartition" not in plan, name
        spark.catalog.clearCache()


def test_asof_join_is_linear_union_not_join(spark):
    """j11: the union-trick as-of must contain no join at all."""
    df = registry.queries()["j11_asof"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert "Union" in plan


def test_agg_is_partial_final(spark):
    """a1: hash aggregation must run partial (map-side) + final —
    visible as two HashAggregate nodes around the exchange."""
    df = registry.queries()["a1_groupby_count"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2


def test_lsh_band_join_is_hash_based(spark):
    """l2: candidate generation must be an equi-join on band_key
    (hash/sort-merge), never a nested-loop product."""
    df = registry.queries()["l2_minhash_lsh_pairs"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_topk_similarity_is_take_ordered(spark):
    """l4: top-k over similarities must plan as TakeOrderedAndProject."""
    df = registry.queries()["l4_topk_similarity"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_sessionization_single_shuffle_for_windows(spark):
    """t3: both window passes share the user_id partitioning — exactly
    one exchange feeds the window stage (plus the final agg exchange)."""
    df = registry.queries()["t3_sessionization"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_stratified_sample_is_broadcast_no_corpus_shuffle(spark):
    """l23: the rates table broadcasts; the corpus side must reach the
    filter without an exchange (sampling is a narrow map over the scan)."""
    df = registry.queries()["l23_stratified_sample"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # the only exchange allowed is the broadcast of the tiny rates side
    assert plan.count("Exchange hashpartitioning") <= 1  # rates-side distinct only


def test_tfidf_df_join_is_broadcast(spark):
    """l24: the vocab-sized df table and the n_docs scalar both come in
    as broadcasts — the corpus-sized terms aggregate is never on the
    build side."""
    df = registry.queries()["l24_tfidf"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # n_docs scalar cross join
    assert "CartesianProduct" not in plan


def test_dedup_apply_corpus_joins_labels_once(spark):
    """l22: document text reaches the output through exactly one join
    with the label table; the clustering loop shuffles only long keys."""
    df = registry.queries()["l22_dedup_apply"](spark, SF_DIR)
    plan = physical_plan(df)
    # the kept-corpus join is a hash join on doc_id, not a cartesian
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_batch_ann_has_window_group_limit(spark):
    """l25: the rank-≤-k filter must push WindowGroupLimit below the
    window exchange — per-partition top-k heaps BEFORE the shuffle, so
    the exchange carries k×queries×partitions rows, not corpus×queries."""
    df = registry.queries()["l25_batch_ann"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # query batch broadcast
    assert "CartesianProduct" not in plan


def test_match_recognize_single_hash_shuffle_pruned_scan(spark):
    """t10b: the matcher's plan is scan -> codegen classify -> ONE hash
    exchange on the partition key -> sort -> Arrow FlatMapGroupsInPandas;
    the text/props/value columns never reach the shuffle (pruned read
    schema) and there is no single-partition exchange."""
    df = registry.queries()["t10b_match_recognize_funnel"](spark, SF_DIR)
    plan = formatted(df)
    # per-PARTITION Arrow crossing (mapInPandas + pandas groupby inside),
    # not one Python call per key
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 2  # one hash exchange (+AQE read)
    assert "hashpartitioning(user_id" in plan
    # pruned scan: only the four needed columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_id", "ts", "user_id", "event_type"
    }


def test_semdedup_centroid_join_is_broadcast(spark):
    """l27: centroid assignment must broadcast the 8-centroid table
    (BroadcastNestedLoopJoin over the KB-sized cents), never shuffle the
    corpus for it; the pair join shuffles on cent_id only."""
    df = registry.queries()["l27_semdedup"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_vocab_join_is_broadcast(spark):
    """l28: the per-term logprob table is vocab-sized and must come back
    to the token stream as a broadcast hash join."""
    df = registry.queries()["l28_unigram_logprob"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_stats_no_text_shuffle(spark):
    """l29: both aggregates are partial+final (HashAggregate pairs) and
    the shuffled payload is (source, md5, counts) — the text column must
    not appear beyond the scan stage's hash projection."""
    df = registry.queries()["l29_dedup_stats"](spark, SF_DIR)
    plan = formatted(df)
    # exactly two hash exchanges ((source, md5) then (source)), none single-partition
    assert plan.count("Arguments: hashpartitioning") == 2
    assert "SinglePartition" not in plan
    # partial+final pairs on both levels
    assert plan.count("HashAggregate") >= 4
    # the shuffle carries the hash; text dies at the pre-shuffle projection:
    # no Exchange block may list the text column among its inputs
    assert "md5" in plan
    import re as _re

    for block in _re.split(r"\n\n", plan):
        if _re.match(r"\(\d+\) Exchange", block.strip()):
            assert "text#" not in block, f"text crossed a shuffle:\n{block}"


def test_salted_skew_join_spreads_hot_key(spark):
    """j14: the join must shuffle on (k, salt) — the hot key's rows land
    in R different tasks — and the dim side must NOT be broadcast (the
    100 TB model where salting is the lever)."""
    df = registry.queries()["j14_salted_skew_join"](spark, SF_DIR)
    plan = formatted(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "hashpartitioning(k" in plan and "salt" in plan


def test_sequence_packing_single_shuffle(spark):
    """l31: one hash exchange on (source, shard) for the cumsum window;
    no single-partition stage."""
    df = registry.queries()["l31_sequence_packing"](spark, SF_DIR)
    plan = formatted(df)
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "SinglePartition" not in plan
    assert "shard" in plan


def test_doc_chunking_no_shuffle(spark):
    """l32: generator + narrow substring math — zero exchanges."""
    df = registry.queries()["l32_doc_chunking"](spark, SF_DIR)
    plan = formatted(df)
    assert "Exchange" not in plan
    assert "Generate" in plan  # sequence+explode


def test_prep_pipeline_two_shuffles(spark):
    """l30: the whole prep pipeline rides exactly two hash exchanges —
    dedup on md5(norm_text), packing cumsum on (source, shard)."""
    df = registry.queries()["l30_prep_pipeline"](spark, SF_DIR)
    plan = formatted(df)
    assert plan.count("Arguments: hashpartitioning") == 2
    assert "SinglePartition" not in plan


def test_groups_frame_rewrite_single_exchange(spark):
    """w12 (GROUPS → RANGE over dense_rank): both window passes must
    share ONE hash exchange on user_id — the rewrite may not add a
    shuffle over the native frame's cost — and the user_id filter must
    reach the parquet scan."""
    df = registry.queries()["w12_groups_frame"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(user_id), LessThan(user_id,50)]" in plan
    assert plan.count("Window ") == 2  # dense_rank pass + frame pass


def test_with_ties_no_single_partition_window(spark):
    """o12 (FETCH ... WITH TIES): the threshold rewrite must plan a
    distributed top-n (TakeOrderedAndProject) plus a parallel filter —
    never the textbook global RANK() window, whose no-PARTITION-BY
    WindowExec moves every input row through one task at scale."""
    df = registry.queries()["o12_fetch_with_ties"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rare_ngram_overlap_no_cartesian_filter_before_pairs(spark):
    """l34: the pair join must be a hash join on the gram key (never a
    cartesian/NLJ), and the rarity cap (df BETWEEN 2 AND 5) must sit
    UPSTREAM of the pair join — the cap is the scale contract (join
    work ≤ 25·|rare grams|), so a plan that joins first and filters
    later is quadratic in disguise."""
    from mcp_trino_spark.operators.opcache import release_all_operator_caches

    df = registry.queries()["l34_rare_ngram_overlap"](spark, SF_DIR)
    try:
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the df cap appears in a Filter above the gram count aggregate
        assert "df#" in plan and ">= 2" in plan and "<= 5" in plan
        # final partial+final agg on (doc_a, doc_b)
        assert "HashAggregate" in plan
    finally:
        release_all_operator_caches()
        spark.catalog.clearCache()


def test_quality_percentile_single_window_exchange(spark):
    """l35: one hash exchange for the per-source percent_rank window,
    never a SinglePartition global sort; the score is scan-side."""
    df = registry.queries()["l35_quality_percentile"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan
    assert "Window" in plan


def test_quality_percentile_scaled_no_per_source_window(spark):
    """l35b: the scale path must contain NO WindowExec over row data
    partitioned by source alone (one task per source at scale — the
    l35 weakness this entry exists to fix).  The row_number window
    must be partitioned by (spark_partition_id, source) — splittable
    by raising the range-partition count — and the offsets join must
    broadcast the tiny counts frame, never shuffle the corpus for it."""
    import re

    df = registry.queries()["l35b_quality_percentile_scaled"](spark, SF_DIR)
    plan = physical_plan(df)
    # r16: NO window over row data at all — the local rank is read off
    # monotonically_increasing_id frozen by the persist, so the only
    # windows left run over the tiny (pid, source) counts aggregate
    # (they never order by doc_id).  The old shape's row_number window
    # over (pid, source) forced a second full-data hashpartitioning
    # exchange the range partitioning could not satisfy.
    for w in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "doc_id" not in w, f"window over row data: {w}"
    assert "monotonically_increasing_id" in plan
    assert "SinglePartition" not in plan
    # offsets come back via broadcast, and the range shuffle feeds both
    # branches (ReuseExchange fires in the AQE final plan; statically we
    # assert the join is broadcast so the corpus is not re-shuffled)
    assert "BroadcastHashJoin" in plan
    assert plan.count("rangepartitioning") >= 1
    # the full data is hash-exchanged by (pid, source) NOWHERE: every
    # hashpartitioning exchange must be over the counts aggregate
    # (c/base rows), never over row data carrying doc_id
    fplan = formatted(df)
    for block in re.split(r"\n\(\d+\) ", fplan):
        if block.startswith("Exchange") and "hashpartitioning" in block:
            assert "doc_id" not in block, f"row-data hash exchange: {block}"


def test_ngram_jaccard_inverted_index_hash_joins(spark):
    """l2c (word-3-gram spec): inverted-index pair join is hash-based,
    the persisted gram frame is reused (InMemoryTableScan on both join
    sides), and no cartesian product anywhere."""
    from mcp_trino_spark.operators.opcache import release_all_operator_caches

    df = registry.queries()["l2c_ngram_jaccard"](spark, SF_DIR)
    try:
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    finally:
        release_all_operator_caches()
        spark.catalog.clearCache()


def test_lm_contamination_broadcasts_lm_tables_no_text_shuffle(spark):
    """l37: the benchmark LM tables (bigram logprobs, prefix counts)
    must come in as broadcast joins; the only corpus shuffle is the
    partial+final aggregate on doc_id — text never sort-merge-joins."""
    df = registry.queries()["l37_ngram_lm_contamination"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side partial agg on doc_id


def test_window_exclude_peer_subtraction_single_window(spark):
    """EXCLUDE GROUP/TIES spell the peer aggregate over the SAME
    (partition, order) window spec with a RANGE CURRENT ROW..CURRENT
    ROW frame, so Spark evaluates frame + peer aggregates in ONE
    Window operator over one exchange — a PARTITION BY part+keys peer
    window would add a second sort (and, pre-AQE-reuse, a second
    shuffle)."""
    from mcp_trino_spark.trino_compat import translate

    spark.createDataFrame(
        [(1, 1, 1.0)], "p int, k int, x double"
    ).createOrReplaceTempView("excl_plan_t")
    q = translate(
        "SELECT sum(x) OVER (PARTITION BY p ORDER BY k RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS s "
        "FROM excl_plan_t"
    )
    plan = physical_plan(spark.sql(q))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan


def test_exclude_minmax_single_exchange(spark):
    """x35: both GROUPS sub-windows of every MIN/MAX EXCLUDE column
    must share ONE dense_rank group column and ONE hash exchange —
    a second exchange would mean the sub-windows repartitioned
    separately (the whole point of sharing the (partition, order)
    spec)."""
    df = registry.queries()["x35_exclude_minmax"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert plan.lower().count("dense_rank") == 1


def test_substring_dedup_reuses_span_index(spark):
    """l38: the (doc_id, fp, span) index must be built ONCE (persisted
    InMemoryRelation, scanned for both join sides and the df filter)
    and the df-capped fp set must BROADCAST — a shuffle there would
    move the span text for a KB-sized key set."""
    df = registry.queries()["l38_substring_dedup"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("InMemoryTableScan") >= 3, "span index not reused"
    assert "BroadcastExchange" in plan
    # the pair join keys on the 16-byte fp (plus the span verify),
    # never on document text
    import re

    join_keys = re.findall(r"BroadcastHashJoin \[([^\]]*)\]", plan)
    assert join_keys, plan[:400]
    assert all("fp#" in k or "span#" in k for k in join_keys), join_keys
    assert all("text#" not in k for k in join_keys), join_keys


def test_exclude_current_row_minmax_one_exchange(spark):
    """x42: the EXCLUDE CURRENT ROW rewrite adds a window re-partitioned
    by (partition + order keys), but that MUST NOT shuffle again —
    ClusteredDistribution(part + keys) is satisfied by the coarser
    hash(part) exchange (a key-subset hash co-locates every superset
    group), so the whole rewrite is one exchange plus per-partition
    sub-sorts.  A second hashpartitioning exchange here would mean
    Catalyst stopped recognizing the subset-distribution, doubling the
    shuffle on every EXCLUDE CURRENT ROW query at scale."""
    df = registry.queries()["x42_exclude_current_row_minmax"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert plan.lower().count("dense_rank") == 1
    assert "CartesianProduct" not in plan


def test_bloom_decontamination_no_corpus_shuffle_before_filter(spark):
    """l39: corpus grams drop at the Arrow-vectorized bloom filter
    BEFORE any join; the exact verify is a broadcast hash join of the
    surviving candidates; the only shuffles are the candidate distinct
    and the per-doc count — never a sort-merge join of corpus text."""
    df = registry.queries()["l39_bloom_decontamination"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan  # bloom probe
    assert "BroadcastHashJoin" in plan                       # exact verify
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_filters_partial_aggs_no_corpus_window(spark):
    """l40: the line/word statistics are combiner-friendly partial
    aggregations keyed by doc_id — no window function over the corpus
    (the top word is min(struct(-count, word))), and the doc joins
    stay hash joins."""
    df = registry.queries()["l40_repetition_filters"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_pii_scan_zero_shuffles(spark):
    """l41: regex counting is a pure codegen projection — the plan must
    contain NO Exchange beyond the parallelism repartition and no join
    or aggregate at all."""
    df = registry.queries()["l41_pii_scan"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
    # the documented zero-shuffle contract: no hash exchange at all
    # (spread()'s parallelism repartition is roundrobin)
    assert "Exchange hashpartitioning" not in plan


def test_nan_guarded_filter_still_pushes_down(spark):
    """x73 plan contract: the NaN-comparison rewrite emits CONJUNCTIVE
    forms so the raw comparison stays an independent conjunct Catalyst
    pushes into the parquet scan — a CASE-wrapped predicate would blank
    PushedFilters on every guarded float comparison (a 100 TB scan
    regression)."""
    from mcp_trino_spark.trino_compat import translate

    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .createOrReplaceTempView("li_nan_plan")
    t = translate(
        "SELECT l_orderkey FROM li_nan_plan WHERE l_quantity > 24.0E0",
        column_types={"l_quantity": "double"},
    )
    assert "isnan" in t  # the guard is present...
    try:
        plan = spark.sql(t)._jdf.queryExecution().executedPlan().toString()
        scan = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert scan, plan
        assert "GreaterThan(l_quantity,24.0)" in scan[0], scan[0]
    finally:
        spark.catalog.dropTempView("li_nan_plan")


def test_nan_between_guard_still_pushes_down(spark):
    """x77 plan contract: a guarded BETWEEN desugars into CONJUNCTIVE
    _dbl_ord_expr forms, so the pushable base comparison still reaches
    the parquet scan's PushedFilters."""
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .createOrReplaceTempView("li_btw_plan")
    t = translate(
        "SELECT l_orderkey FROM li_btw_plan"
        " WHERE l_quantity BETWEEN 1.0E0 AND nan()",
        column_types={"l_quantity": "double"},
    )
    assert "isnan" in t
    try:
        plan = spark.sql(t)._jdf.queryExecution().executedPlan().toString()
        scan = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert scan, plan
        assert "GreaterThanOrEqual(l_quantity,1.0)" in scan[0], scan[0]
    finally:
        spark.catalog.dropTempView("li_btw_plan")


def test_nan_subquery_guard_reuses_subquery(spark):
    """x77 plan contract: the scalar-subquery NaN guards duplicate the
    subquery TEXT, but Catalyst's ReuseSubquery collapses the copies —
    the executed plan carries ReusedSubquery nodes, not extra
    executions (the duplication is compile-time only)."""
    from mcp_trino_spark.execute import _make_subquery_type
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    t = translate(
        "SELECT nan() > (SELECT max(x) FROM"
        " (SELECT 1.0E0 AS x UNION ALL SELECT 2.0E0) t) AS r",
        subquery_type=_make_subquery_type(spark),
    )
    assert "isnan" in t
    df = spark.sql(t)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedSubquery" in plan, plan
