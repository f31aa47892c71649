"""Guards on the driver-facing registry ordering.

The driver grades the FIRST 50 ``queries()`` entries (rows + schema +
value hash vs ``oracle_sql()``).  Round 4 rotated that window to
never-driver-checked entries and round 6 rotated it again to the final
51 never-graded entries (42 oracle-backed + 9 rows-only).  These tests
pin the invariants the rotation relies on so a refactor can't silently
waste window slots or drop the proven sets.
"""

from mcp_trino_spark import registry

#: The only entries allowed in the graded window WITHOUT a DuckDB oracle:
#: mergeable sketches (nondeterministic bounds), LIMIT without ORDER BY
#: (nondeterministic row choice), plan text, and catalog listings.
_ROWS_ONLY_OK = {
    "a20_sketch_reaggregate",
    "a21_qdigest_rollup",
    "a22_misra_gries_rollup",
    "o3_limit",
    "f6b_explain_io",
    "f2b_list_catalogs_federated",
    "f2_list_catalogs",
    "f3_list_schemas",
    "f4_list_tables",
}


def test_window_oracle_coverage():
    qs = registry.queries()
    oracles = registry.oracle_sql()
    window = list(qs)[:50]
    assert len(window) == 50
    # oracle-backed entries lead; any rows-only entry must be one of the
    # known no-oracle-possible surfaces, never an accidental omission
    missing = [n for n in window if n not in oracles and n not in _ROWS_ONLY_OK]
    assert not missing, f"window entries without a DuckDB oracle: {missing}"
    assert len([n for n in window if n in oracles]) >= 42


def test_window_matches_priority_list_exactly():
    # a typo'd name in _PRIORITY is skipped silently by _priority_order,
    # pulling an unintended entry into the graded window — catch that here
    qs = registry.queries()
    assert list(qs)[:50] == registry._PRIORITY[:50]
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_window_rotated_off_the_proven_sets():
    # round-6 goal: the graded window spends no slots re-grading entries
    # already certified by the driver in rounds 2-5
    window = set(list(registry.queries())[:50])
    proven = set(registry._PROVEN_R03) | set(registry._PROVEN_R45)
    overlap = window & proven
    assert not overlap, f"window re-grades already-proven entries: {sorted(overlap)}"


def test_proven_sets_still_fully_registered():
    # rotation moves the certified entries behind the fold; they must all
    # remain registered with their oracles for the local regression gate
    qs = registry.queries()
    oracles = registry.oracle_sql()
    for proven in (registry._PROVEN_R03, registry._PROVEN_R45):
        missing = [n for n in proven if n not in qs]
        assert not missing, f"proven entries dropped from the registry: {missing}"
        no_oracle = [n for n in proven if n not in oracles]
        assert no_oracle == [], f"proven entries lost their oracle: {no_oracle}"


def test_no_complex_typed_output_in_graded_window(spark, sf_dir):
    """No graded-window entry may expose Array/Map/Struct at the top level.

    The driver canonicalizes result cells before hashing; complex-typed
    columns crash or diverge in that canonicalizer (the root cause of the
    r4 x18 red row — arrays must be flattened to joined strings on both
    the Spark and oracle sides).  Schema-only: building the DataFrame
    runs analysis, not execution, for pure queries; DML-backed entries
    execute their (small, sf0.001) lifecycle.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs = registry.queries()
    offenders = []
    for name in list(qs)[:50]:
        df = qs[name](spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"complex-typed top-level output columns: {offenders}"
