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


# Integer-scaled exact sums — the FAST exactness protocol for columns
# with a KNOWN small decimal scale (TPC-H money/quantity columns: 2;
# price*(1-discount) products: 4).  ``round(x·10^s)`` recovers the true
# scaled integer (both engines compute the identical IEEE double
# x·10^s, whose error is ~1e-9 of an integer — far from any rounding
# boundary), the BIGINT sum is exact and order-independent up to
# ±9.2e18 (covers 100 TB of money), and the final bigint→double cast +
# division are the same deterministic operations in both engines.
# Measured ~2× faster than the decimal(25,6) protocol (no Decimal128
# arithmetic in the agg loop).  Use dsum for columns whose scale is
# unknown or unbounded — rounding those would CHANGE the answer.


def isum(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = 10 ** scale
    return (F.sum(F.round(c * m).cast("bigint")).cast("double") / F.lit(float(m)))


def iavg(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return isum(c, scale) / F.count(c)


def ISUM(expr: str, scale: int = 2) -> str:
    m = 10 ** scale
    return (
        f"CAST(SUM(CAST(round(({expr}) * {m}) AS BIGINT)) AS DOUBLE) / {float(m)}"
    )


def IAVG(expr: str, scale: int = 2) -> str:
    return f"{ISUM(expr, scale)} / COUNT({expr})"


#: Entries certified by the driver in rounds 2-3 (CORRECTNESS_r02/r03:
#: 50/50 green, rows + schema + hash, two rounds running).  Kept as a named
#: regression set for the local gate (``make check-proven``) so the round-4
#: window rotation below can't silently regress them.
_PROVEN_R03 = [
    "q0_flagship_revenue_by_region",
    "p1_projection",
    "p8_case_when",
    "j1_inner_equi",
    "j3_full_outer",
    "j8_range_band",
    "j11_asof",
    "j12_lateral_topn",
    "j14_salted_skew_join",
    "a1_groupby_count",
    "a2_sum_avg_min_max",
    "a6_grouping_sets",
    "a16_salted_skew_agg",
    "w1_row_number",
    "w5_lag_lead",
    "w10_topn_per_group",
    "w3b_ntile_distributed",
    "o1_order_by",
    "o2_topk",
    "o9_cte",
    "o10b_correlated_subquery",
    "x1_string_basics",
    "x3_date_extract",
    "x11_map_struct",
    "x12_json",
    "x19_trino_dialect",
    "t1_tumbling_window",
    "t3_sessionization",
    "t4_event_dedup",
    "t8_ohlc_resample",
    "t10b_match_recognize_funnel",
    "s6_ctas_insert",
    "s7_merge_upsert",
    "s7b_update",
    "s7c_delete",
    "s4_memory_table",
    "s8_bucketed_colocated_join",
    "s9_cross_catalog_join",
    "f5_table_schema",
    "o11_recursive_cte",
    "l1_exact_dedup",
    "l2_minhash_lsh_pairs",
    "l16_decontamination",
    "l31_sequence_packing",
    "l3b_embedding_neardup",
    "l4_topk_similarity",
    "l4b_ivf_topk",
    "l9b_multimodal_features",
    "l10b_udtf_word_counts",
    "l5_text_stats",
]

#: Entries certified by the driver in rounds 4-5 (CORRECTNESS_r04/r05:
#: 50/50 green in r5, including the x18 fix).  Pinned, like ``_PROVEN_R03``,
#: as a local regression set (``make check-proven``) now that round 6
#: rotates the window again.
_PROVEN_R45 = [
    "o12_fetch_with_ties",
    "w12_groups_frame",
    "s10_time_travel",
    "l33_editdist_verify",
    "l21_dup_clusters",
    "l22_dedup_apply",
    "l26_minhash_estimate",
    "l27_passage_dedup",
    "l30_prep_pipeline",
    "a7_rollup",
    "a8_cube",
    "a14_percentile",
    "a18_pivot",
    "a19_unpivot",
    "j2_left_outer",
    "j5_left_semi",
    "j6_left_anti",
    "j7_theta",
    "j9_multiway",
    "j10_self_join",
    "j13_bloom_prefilter_semi",
    "p5_between_in",
    "p6_null_predicates",
    "p7_like",
    "p11_null_safe_compare",
    "o4_nulls_ordering",
    "o7_intersect",
    "o8_except",
    "o10_scalar_subquery",
    "w2_rank_dense_rank",
    "w4_percent_rank_cume_dist",
    "w6_first_last_nth",
    "w8_rows_frame",
    "w9_range_frame",
    "x2_regex",
    "x4_date_arith",
    "x6_math",
    "x8_casting",
    "x14_hashing",
    "x18_array_setops",
    "t2_sliding_window",
    "t6_gap_fill",
    "t9_funnel_pattern",
]

#: Entries certified by the driver in round 6 (CORRECTNESS_r06: 49/50
#: green; the one red, l18_mix_weights, was a diagnosed oracle-typing
#: bug — DuckDB HUGEINT → driver float64 coercion — fixed by an outer
#: CAST, so it re-enters the round-7 window below for re-certification).
#: Pinned like the other proven sets for the local regression gate.
_PROVEN_R06 = [
    "p2_alias_expr",
    "p3_comparison",
    "p4_boolean_connectives",
    "p9_distinct",
    "o5_union_all",
    "o6_union_distinct",
    "w3_ntile",
    "w7_window_agg",
    "x5_timestamp_fmt",
    "x7_conditional",
    "x15_bitwise",
    "x17_url",
    "x12b_json_structured",
    "x20_approx_most_frequent",
    "x21_reduce_agg",
    "t9b_pattern_regex",
    "t10_match_recognize_vshape",
    "s2b_multiformat_roundtrip",
    "s2c_orc_roundtrip",
    "s3_values_relation",
    "s6b_parquet_partitioned_roundtrip",
    "s12_table_changes",
    "l6_regex_search",
    "l8b_langid",
    "l8c_token_count",
    "l8d_fingerprint",
    "l14_text_normalize",
    "l15_length_histogram",
    "l17_repetition_score",
    "l20_pii_scrub",
    "l13_training_pipeline",
    "l19_hash_split",
    "l23_stratified_sample",
    "l24_tfidf",
    "l32_doc_chunking",
    "l25_batch_ann",
    "l27_semdedup",
    "l28_incremental_dedup",
    "l29_dedup_stats",
]

#: The only entries allowed in the graded window WITHOUT a DuckDB oracle:
#: mergeable sketches (nondeterministic bounds), LIMIT without ORDER BY
#: (nondeterministic row choice), plan text, and catalog listings.
#: tools/rotate_window.py enforces this during rotation and
#: tests/test_registry_window.py pins it.
ROWS_ONLY_OK = {
    "a20_sketch_reaggregate",
    "a21_qdigest_rollup",
    "a21b_weighted_qdigest_rollup",
    "a22_misra_gries_rollup",
    "o3_limit",
    "f6b_explain_io",
    "f2b_list_catalogs_federated",
    "f2_list_catalogs",
    "f3_list_schemas",
    "f4_list_tables",
    # iterative floating-point clustering — assignment depends on
    # accumulation order, no deterministic SQL oracle exists; covered
    # by property tests (within-cluster distance < cross-cluster)
    "l11_kmeans_embeddings",
    # HLL / t-digest sketches — approximate values have no
    # deterministic cross-engine oracle; covered by property tests
    # (bounded relative error vs exact)
    "a13_approx_distinct",
    "a14b_approx_percentile",
}


#: Driver-facing ordering: the per-round correctness harness verifies the
#: FIRST 50 registry entries.  Since round 11 the window is DERIVED, not
#: hand-curated: ``make rotate-window`` (tools/rotate_window.py) rewrites
#: the generated block below from tools/check_changed.py staleness output
#: — never/strong-stale entries lead (certification must track code
#: churn), dialect-stale entries re-enter oldest-green-first when the
#: shared translator changed, module-stale entries drain oldest-first,
#: and proven-set family representatives fill the tail.  The pre-commit
#: hook (tools/install_hooks.sh) blocks engine commits whose window
#: violates the freshness invariants, making the r8-r10 "forgot to
#: re-rotate" failure mode structural rather than a reminder.
# --- BEGIN GENERATED WINDOW (tools/rotate_window.py; make rotate-window) ---
# Derived for round 16 from tools/check_changed.py: never/strong
# leads, dialect-stale (oldest green first), module-stale drain,
# then proven-set family representatives.  Do not edit by hand —
# run `make rotate-window` after any engine change.
_WINDOW_HEAD = [
    "x20_approx_most_frequent",
    "x21_reduce_agg",
    "x26_nth_from_last",
    "x42_exclude_current_row_minmax",
    "x71_decimal_avg_semantics",
    "x64_stat_agg_edge_contracts",
    "s7c_delete",
    "s10_time_travel",
    "s12_table_changes",
    "x19_trino_dialect",
    "o12_fetch_with_ties",
    "x22_quantified_subqueries",
    "w12_groups_frame",
    "x25_dialect_round7",
    "x27_lambda_regexp_replace",
    "x28_dialect_round8",
    "x29_window_exclude",
    "x30_escape_free_literals",
    "x31_window_exclude_peers",
    "x32_subscript_semantics",
    "x33_arith_null_semantics",
    "x34_null_ordering_defaults",
    "x43_substr_semantics",
    "x44_map_concat_lastwin",
    "x45_weighted_percentile",
    "x46_stats_shape_semantics",
    "x53_cast_rounding_semantics",
    "x60_unicode_case_semantics",
    "x61_date_interval_semantics",
    "x62_real_varchar_rendering",
    "x72_nested_complex_equality",
    "x73_nan_comparison_semantics",
    "x74_nested_nan_equality",
    "x75_nan_ordering_semantics",
    "x76_nan_membership_semantics",
    "w10_topn_per_group",
    "l11_kmeans_embeddings",
    "l12_grouped_normalize",
    "l27_semdedup",
    "w2_rank_dense_rank",
    "w4_percent_rank_cume_dist",
    "w6_first_last_nth",
    "w8_rows_frame",
    "a13_approx_distinct",
    "l36_embedding_outliers",
    "x10_array_hof",
    "x13_struct_row",
]
_WINDOW_TAIL = [
    "p4_boolean_connectives",
    "t9_funnel_pattern",
    "f5_table_schema",
]
# --- END GENERATED WINDOW ---

_PRIORITY = _WINDOW_HEAD + _WINDOW_TAIL


def _priority_order(d: Dict[str, "object"]) -> list:
    head = [n for n in _PRIORITY if n in d]
    seen = set(head)
    return head + [n for n in d if n not in seen]


def queries() -> Dict[str, QueryFn]:
    _ensure_loaded()
    return {n: QUERIES[n] for n in _priority_order(QUERIES)}


def oracle_sql() -> Dict[str, str]:
    _ensure_loaded()
    return {n: ORACLES[n] for n in _priority_order(ORACLES)}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once (imports populate the dicts)."""
    global _LOADED
    if _LOADED:
        return
    try:
        _import_operator_modules()
    except BaseException:
        # A partial import left orphaned registrations.  Clearing the dicts
        # alone is not enough: already-imported operator modules stay in
        # sys.modules, so a retry's imports would be no-ops and their
        # registrations permanently lost.  Evict them too so the retry
        # re-imports (and re-registers) everything from scratch.
        import sys

        for mod in [m for m in sys.modules if m.startswith("mcp_trino_spark.operators")
                    or m in ("mcp_trino_spark.flagship",
                             "mcp_trino_spark.functions.scalar",
                             "mcp_trino_spark.plans.explain_queries",
                             "mcp_trino_spark.sources.sinks")]:
            del sys.modules[mod]
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
        pattern,
        projection,
        setops,
        timeseries,
        windows,
    )
    from mcp_trino_spark.functions import scalar  # noqa: F401
    from mcp_trino_spark.plans import explain_queries  # noqa: F401
    from mcp_trino_spark.sources import federation, sinks  # noqa: F401
