"""Guards on the driver-facing registry ordering.

The driver grades the FIRST 50 ``queries()`` entries (rows + schema +
value hash vs ``oracle_sql()``).  Round 4 rotated that window to
never-driver-checked entries; these tests pin the invariants the
rotation relies on so a refactor can't silently waste window slots or
drop the proven set.
"""

from mcp_trino_spark import registry


def test_window_is_50_oracle_backed_entries():
    qs = registry.queries()
    oracles = registry.oracle_sql()
    window = list(qs)[:50]
    assert len(window) == 50
    missing = [n for n in window if n not in oracles]
    assert not missing, f"window entries without a DuckDB oracle: {missing}"


def test_window_matches_priority_list_exactly():
    # a typo'd name in _PRIORITY is skipped silently by _priority_order,
    # pulling an unintended entry into the graded window — catch that here
    qs = registry.queries()
    assert list(qs)[:50] == registry._PRIORITY[:50]
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_window_rotated_off_the_proven_set():
    # round-4 goal: >=45 graded entries that were NOT in the r02/r03 window
    window = set(list(registry.queries())[:50])
    overlap = window & set(registry._PROVEN_R03)
    assert len(overlap) <= 5, f"window re-grades already-proven entries: {sorted(overlap)}"


def test_proven_set_still_fully_registered():
    # rotation moves the proven 50 behind the fold; they must all remain
    # registered with their oracles for the local regression gate
    qs = registry.queries()
    oracles = registry.oracle_sql()
    missing = [n for n in registry._PROVEN_R03 if n not in qs]
    assert not missing, f"proven entries dropped from the registry: {missing}"
    no_oracle = [n for n in registry._PROVEN_R03 if n not in oracles]
    assert not no_oracle, f"proven entries lost their oracle: {no_oracle}"
