"""Time travel over the DML version store — sources/timetravel.py.

Parity target: Trino's Iceberg time-travel syntax (``FOR VERSION AS
OF``), which the reference passes through like any SELECT
(client.go:501-617).  The end-to-end hash-exact check is the
s10_time_travel oracle entry; these tests cover the reconstruction
edge cases the oracle can't: partition-bounded commits, partitions
created/deleted mid-history, vacuum floors, and the SQL rewrite's
literal-masking.
"""

import os

import pytest
from pyspark.sql import Row

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import execute_query
from mcp_trino_spark.sources.dml import (
    DmlError,
    delete_from,
    merge_into,
    update_table,
    vacuum_table_versions,
)
from mcp_trino_spark.sources.timetravel import (
    read_table_version,
    rewrite_version_as_of,
    table_history,
)

WRITE = EngineConfig(allow_write_queries=True)


@pytest.fixture()
def flat(spark, tmp_path, request):
    """Fresh unpartitioned 5-row table; yields its name."""
    name = f"tt_flat_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(1, 6)]
    ).write.parquet(str(tmp_path / name))
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{tmp_path / name}'")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.fixture()
def parted(spark, tmp_path, request):
    """Fresh hive-partitioned table (p in 0..2, 3 rows each)."""
    name = f"tt_part_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(p=i % 3, k=i, v=float(i)) for i in range(9)]
    ).write.partitionBy("p").parquet(str(tmp_path / name))
    spark.sql(
        f"CREATE TABLE {name} (k bigint, v double, p bigint) USING parquet "
        f"PARTITIONED BY (p) LOCATION '{tmp_path / name}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_versions_accumulate_and_reconstruct(spark, flat):
    v0 = snap(spark.table(flat))
    update_table(spark, flat, {"v": "v * 10"}, "k <= 2")
    v1 = snap(spark.table(flat))
    delete_from(spark, flat, "k = 5")
    assert snap(read_table_version(spark, flat, 0)) == v0
    assert snap(read_table_version(spark, flat, 1)) == v1
    assert snap(read_table_version(spark, flat, 2)) == snap(spark.table(flat))


def test_history_records_ops(spark, flat):
    update_table(spark, flat, {"v": "0.0"}, "k = 1")
    delete_from(spark, flat, "k = 2")
    hist = table_history(spark, flat).collect()
    assert [(r["version"], r["op"]) for r in hist] == [(1, "update"), (2, "delete")]


def test_nonexistent_version_rejected(spark, flat):
    with pytest.raises(DmlError, match="does not exist"):
        read_table_version(spark, flat, 1)
    with pytest.raises(DmlError, match="does not exist"):
        read_table_version(spark, flat, -1)


def test_partition_bounded_commit_reconstructs(spark, parted):
    v0 = snap(spark.table(parted))
    update_table(spark, parted, {"v": "v + 100"}, "p = 1")  # bounded to p=1
    v1 = snap(spark.table(parted))
    delete_from(spark, parted, "p = 2")  # retires p=2 entirely
    assert snap(read_table_version(spark, parted, 0)) == v0
    assert snap(read_table_version(spark, parted, 1)) == v1
    assert snap(read_table_version(spark, parted, 2)) == snap(spark.table(parted))
    # untouched partition p=0 was never rewritten: still served live
    hist = table_history(spark, parted).collect()
    assert hist[0]["kind"] == "partitions" and hist[0]["n_partitions_touched"] == 1


def test_partition_created_by_merge_absent_in_history(spark, parted):
    src = spark.createDataFrame([Row(p=9, k=90, v=900.0)])
    merge_into(
        spark, parted, src, "t.k = s.k", insert_all=True,
    )
    # table column order is (k, v, p) — partition column last
    assert (90, 900.0, 9) in {tuple(r) for r in spark.table(parted).collect()}
    # version 0 must NOT contain the created partition
    v0 = snap(read_table_version(spark, parted, 0))
    assert all(r[2] != 9 for r in v0) and len(v0) == 9


def test_vacuum_raises_floor(spark, flat):
    update_table(spark, flat, {"v": "1.0"}, "k = 1")
    update_table(spark, flat, {"v": "2.0"}, "k = 1")
    floor = vacuum_table_versions(spark, flat, keep_last=1)
    assert floor == 1
    with pytest.raises(DmlError, match="vacuumed"):
        read_table_version(spark, flat, 0)
    assert len(snap(read_table_version(spark, flat, 1))) == 5
    # store dir for the dropped commit is gone
    loc = str(spark.sql(f"DESCRIBE FORMATTED {flat}").filter("col_name = 'Location'")
              .collect()[0].data_type).removeprefix("file:")
    store = os.path.join(os.path.dirname(loc), f".{os.path.basename(loc)}.versions")
    assert not os.path.isdir(os.path.join(store, "v1"))
    assert os.path.isdir(os.path.join(store, "v2"))


def test_sql_front_door(spark, flat):
    update_table(spark, flat, {"v": "v * 10"}, "k <= 2")
    r = execute_query(
        spark, f"SELECT sum(v) AS s FROM {flat} FOR VERSION AS OF 0",
        dialect="trino",
    )
    assert r.rows[0]["s"] == 15.0
    r = execute_query(
        spark, f"SELECT sum(v) AS s FROM {flat} FOR VERSION AS OF 1",
        dialect="trino",
    )
    assert r.rows[0]["s"] == 42.0
    # the temp view is dropped after the query (no catalog leak);
    # names carry a uuid suffix, so match this table's __v<n>_ prefix
    # (scoped to THIS table: the s10_time_travel registry entry keeps
    # its own reconstruction view alive until its next call by design,
    # and the shared session may have run it first)
    assert not any(
        v.name.startswith(f"{flat}__v0_") for v in spark.catalog.listTables()
    )


def test_sql_rewrite_masks_literals(spark, flat):
    q = rewrite_version_as_of(
        spark, f"SELECT '{flat} FOR VERSION AS OF 0' AS s FROM {flat}"
    )
    # inside a string literal → untouched
    assert f"'{flat} FOR VERSION AS OF 0'" in q


def test_current_version_read_is_plain_table(spark, flat):
    # version == current short-circuits to spark.table (no store I/O)
    assert snap(read_table_version(spark, flat, 0)) == snap(spark.table(flat))


def test_timestamp_as_of(spark, flat):
    import json
    from mcp_trino_spark.sources.dml import _history_path, _table_location
    from mcp_trino_spark.sources.timetravel import version_at_timestamp

    update_table(spark, flat, {"v": "v * 10"}, "k <= 2")
    update_table(spark, flat, {"v": "v + 1"}, "k = 3")
    # pin commit timestamps so the test is time-independent
    loc = _table_location(spark, flat)
    with open(_history_path(loc)) as f:
        hist = json.load(f)
    hist["commits"][0]["ts"] = "2026-01-01T10:00:00+00:00"
    hist["commits"][1]["ts"] = "2026-01-02T10:00:00+00:00"
    with open(_history_path(loc), "w") as f:
        json.dump(hist, f)

    assert version_at_timestamp(spark, flat, "2025-12-31T00:00:00") == 0
    assert version_at_timestamp(spark, flat, "2026-01-01T10:00:00") == 1
    assert version_at_timestamp(spark, flat, "2026-01-01T23:00:00") == 1
    assert version_at_timestamp(spark, flat, "2026-03-01T00:00:00") == 2

    r = execute_query(
        spark,
        f"SELECT sum(v) AS s FROM {flat} "
        "FOR TIMESTAMP AS OF TIMESTAMP '2026-01-01 12:00:00'",
        dialect="trino",
    )
    assert r.rows[0]["s"] == 42.0  # version 1: 10+20+3+4+5
    r = execute_query(
        spark,
        f"SELECT sum(v) AS s FROM {flat} FOR TIMESTAMP AS OF '2025-01-01'",
        dialect="trino",
    )
    assert r.rows[0]["s"] == 15.0  # version 0


def test_vacuum_does_not_reset_version_counter(spark, flat):
    update_table(spark, flat, {"v": "1.0"}, "k = 1")
    update_table(spark, flat, {"v": "2.0"}, "k = 1")
    vacuum_table_versions(spark, flat, keep_last=0)  # floor = 2, no commits
    update_table(spark, flat, {"v": "3.0"}, "k = 1")  # must be version 3
    hist = table_history(spark, flat).collect()
    assert [r["version"] for r in hist] == [3]
    # state 2 (the vacuum-time live state) is reconstructible from v3's
    # retired data; a generous vacuum keeps the fresh commit intact
    assert (1, 2.0) in {(r.k, r.v) for r in read_table_version(spark, flat, 2).collect()}
    vacuum_table_versions(spark, flat, keep_last=5)
    assert [r["version"] for r in table_history(spark, flat).collect()] == [3]


def test_non_literal_as_of_fails_loudly(spark, flat):
    from mcp_trino_spark.trino_compat import TrinoCompatError

    update_table(spark, flat, {"v": "0.0"}, "k = 1")
    for q in (
        f"SELECT * FROM {flat} FOR TIMESTAMP AS OF CURRENT_TIMESTAMP",
        f"SELECT * FROM {flat} FOR VERSION AS OF 1+1",
        f"SELECT * FROM {flat} FOR VERSION AS OF (1)",
    ):
        with pytest.raises(TrinoCompatError, match="literal"):
            execute_query(spark, q, dialect="trino")


def test_multiple_as_of_clauses_in_one_query(spark, flat):
    update_table(spark, flat, {"v": "v * 10"}, "k <= 2")  # v1
    r = execute_query(
        spark,
        f"SELECT a.s AS s0, b.s AS s1 FROM "
        f"(SELECT sum(v) AS s FROM {flat} FOR VERSION AS OF 0) a "
        f"CROSS JOIN (SELECT sum(v) AS s FROM {flat} FOR VERSION AS OF 1) b",
        dialect="trino",
    )
    assert r.rows[0] == {"s0": 15.0, "s1": 42.0}


# ---------------------------------------------------------------------------
# append commits (gated INSERT INTO through the commit log)


def test_insert_append_commit_excluded_from_history(spark, flat):
    v0 = snap(spark.table(flat))
    update_table(spark, flat, {"v": "v + 100"}, "k = 1")  # v1 (full)
    v1 = snap(spark.table(flat))
    execute_query(spark, f"INSERT INTO {flat} VALUES (99, 9.9)", config=WRITE)  # v2
    live = snap(spark.table(flat))
    assert (99, 9.9) in live and len(live) == 6
    hist = {(r.version, r.op, r.kind) for r in table_history(spark, flat).collect()}
    assert hist == {(1, "update", "full"), (2, "insert", "append")}
    # the appended row postdates v1 and v0: both historical reads exclude it
    assert snap(read_table_version(spark, flat, 1)) == v1
    assert snap(read_table_version(spark, flat, 0)) == v0
    assert snap(read_table_version(spark, flat, 2)) == live


def test_append_inside_later_full_snapshot_is_filtered(spark, flat):
    # the appended file gets RETIRED into the v2 snapshot by the later
    # full commit; a v0 read resolves from that snapshot and must filter
    # the appended file back out, while a v1 read keeps it
    v0 = snap(spark.table(flat))
    execute_query(spark, f"INSERT INTO {flat} VALUES (99, 9.9)", config=WRITE)  # v1
    v1 = snap(spark.table(flat))
    update_table(spark, flat, {"v": "0.0"}, None)  # v2 (full, retires tree)
    assert snap(read_table_version(spark, flat, 1)) == v1
    assert snap(read_table_version(spark, flat, 0)) == v0


def test_append_creates_partition_absent_historically(spark, parted):
    update_table(spark, parted, {"v": "v + 1"}, "p = 0")  # v1 (partition commit)
    v1 = snap(spark.table(parted))
    execute_query(
        spark, f"INSERT INTO {parted} VALUES (100, 1.5, 7)", config=WRITE
    )  # v2: creates partition p=7
    live = snap(spark.table(parted))
    assert (100, 1.5, 7) in live
    got_v1 = snap(read_table_version(spark, parted, 1))
    assert got_v1 == v1  # p=7 did not exist at v1
    assert not any(r[2] == 7 for r in got_v1)
    assert snap(read_table_version(spark, parted, 2)) == live


def test_append_into_existing_partition_filtered_per_partition(spark, parted):
    v0 = snap(spark.table(parted))
    execute_query(
        spark, f"INSERT INTO {parted} VALUES (200, 2.5, 0)", config=WRITE
    )  # v1: appends into live partition p=0
    v1 = snap(spark.table(parted))
    update_table(spark, parted, {"v": "v * 10"}, "p = 0")  # v2 retires p=0 (incl. append)
    assert snap(read_table_version(spark, parted, 1)) == v1
    assert snap(read_table_version(spark, parted, 0)) == v0


def test_insert_sql_front_door_time_travel(spark, flat):
    update_table(spark, flat, {"v": "v * 2"}, "k = 2")  # v1
    execute_query(spark, f"INSERT INTO {flat} VALUES (50, 5.0)", config=WRITE)  # v2
    r = execute_query(
        spark,
        f"SELECT COUNT(*) AS n FROM {flat} FOR VERSION AS OF 1",
        dialect="trino",
    )
    assert r.rows == [{"n": 5}]


# ---------------------------------------------------------------------------
# commit-record ordering (catalog refresh failure cannot desync history)


def test_commit_record_survives_refresh_failure(spark, flat, monkeypatch):
    orig_sql = spark.sql

    def failing_sql(q, *a, **k):
        if q.strip().upper().startswith("REFRESH TABLE"):
            raise RuntimeError("simulated catalog refresh failure")
        return orig_sql(q, *a, **k)

    v0 = snap(spark.table(flat))
    monkeypatch.setattr(spark, "sql", failing_sql)
    with pytest.raises(RuntimeError, match="simulated"):
        update_table(spark, flat, {"v": "v + 1"}, "k = 1")
    monkeypatch.undo()
    spark.sql(f"REFRESH TABLE {flat}")
    # the swap landed, so the commit record MUST exist — otherwise the
    # next commit reuses version 1 and v0 reconstructs the wrong state
    assert [r.version for r in table_history(spark, flat).collect()] == [1]
    assert snap(read_table_version(spark, flat, 0)) == v0
    assert (1, 2.0) in {(r.k, r.v) for r in spark.table(flat).collect()}


def test_refresh_failure_leaves_no_scratch_dirs(spark, parted, monkeypatch):
    # partitioned path: the staged/retired scratch directories must be
    # cleaned up even when the post-commit catalog refresh throws — the
    # commit record is already durable, so leaking them just doubles the
    # touched partitions' storage until someone notices
    import glob
    import os

    from mcp_trino_spark.sources.dml import _table_location

    loc = _table_location(spark, parted)
    orig_sql = spark.sql

    def failing_sql(q, *a, **k):
        if q.strip().upper().startswith("REFRESH TABLE"):
            raise RuntimeError("simulated catalog refresh failure")
        return orig_sql(q, *a, **k)

    v0 = snap(spark.table(parted))
    monkeypatch.setattr(spark, "sql", failing_sql)
    with pytest.raises(RuntimeError, match="simulated"):
        update_table(spark, parted, {"v": "v + 1"}, "p = 0")
    monkeypatch.undo()
    spark.sql(f"REFRESH TABLE {parted}")
    parent, base = os.path.dirname(loc), os.path.basename(loc)
    leaks = glob.glob(os.path.join(parent, f".{base}.staged-*")) + glob.glob(
        os.path.join(parent, f".{base}.retired-*")
    )
    assert leaks == [], f"orphaned DML scratch dirs: {leaks}"
    # and the commit itself landed: version 1 recorded, v0 reconstructs
    assert [r.version for r in table_history(spark, parted).collect()] == [1]
    assert snap(read_table_version(spark, parted, 0)) == v0


# ---------------------------------------------------------------------------
# partition values must read back byte-identical (no path type inference)


def test_string_partition_value_with_leading_zero(spark, tmp_path, request):
    name = f"tt_strp_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(k=1, c="01"), Row(k=2, c="01"), Row(k=3, c="2")]
    ).write.partitionBy("c").parquet(str(tmp_path / name))
    spark.sql(
        f"CREATE TABLE {name} (k bigint, c string) USING parquet "
        f"PARTITIONED BY (c) LOCATION '{tmp_path / name}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")
    try:
        v0 = snap(spark.table(name))
        assert ("01" in {r[1] for r in v0})
        update_table(spark, name, {"k": "k + 10"}, "c = '2'")  # v1
        # a '01' partition value inferred as int would read back as '1'
        assert snap(read_table_version(spark, name, 0)) == v0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_comment_prefixed_insert_still_versioned(spark, flat):
    # the classifier and execute_insert must agree on where the
    # statement starts — a comment-prefixed INSERT previously passed
    # is_insert_into_statement but failed the re-parse and silently
    # skipped its append commit
    update_table(spark, flat, {"v": "v + 1"}, "k = 1")  # v1
    execute_query(
        spark, f"-- ticket 42\nINSERT INTO {flat} VALUES (77, 7.7)", config=WRITE
    )  # must be v2
    hist = {(r.version, r.kind) for r in table_history(spark, flat).collect()}
    assert (2, "append") in hist
    assert (77, 7.7) not in snap(read_table_version(spark, flat, 1))


def test_append_exclusion_with_uri_encoded_partition_value(spark, tmp_path, request):
    # partition value with a non-ASCII char: input_file_name() reports
    # it URI-encoded; exclusion must still match the raw path
    name = f"tt_uri_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(k=1, c="café"), Row(k=2, c="plain")]
    ).write.partitionBy("c").parquet(str(tmp_path / name))
    spark.sql(
        f"CREATE TABLE {name} (k bigint, c string) USING parquet "
        f"PARTITIONED BY (c) LOCATION '{tmp_path / name}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")
    try:
        update_table(spark, name, {"k": "k + 10"}, "c = 'plain'")  # v1
        v1 = snap(spark.table(name))
        execute_query(
            spark,
            f"INSERT INTO {name} VALUES (99, 'café')",
            config=WRITE,
        )  # v2 appends into the encoded partition
        assert (99, "café") in snap(spark.table(name))
        assert snap(read_table_version(spark, name, 1)) == v1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_append_then_optimize_preserves_history(spark, tmp_path, request):
    # the OPTIMIZE snapshot retires the appended file along with the
    # originals; a pre-append read resolves from that snapshot and must
    # still filter the appended file out
    from mcp_trino_spark.sources.dml import optimize_table

    name = f"tt_opt_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(8)]
    ).repartition(4).write.parquet(str(tmp_path / name))
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{tmp_path / name}'")
    try:
        v0 = snap(spark.table(name))
        execute_query(spark, f"INSERT INTO {name} VALUES (99, 9.9)", config=WRITE)  # v1
        v1 = snap(spark.table(name))
        rewritten = optimize_table(spark, name, file_size_threshold_mb=128.0)  # v2
        assert rewritten == 9
        assert snap(spark.table(name)) == v1  # content unchanged by compaction
        assert snap(read_table_version(spark, name, 1)) == v1
        assert snap(read_table_version(spark, name, 0)) == v0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# ---------------------------------------------------------------------------
# version diff (CDC): table_changes


def test_table_changes_update_is_delete_plus_insert(spark, flat):
    from mcp_trino_spark.sources.timetravel import table_changes

    update_table(spark, flat, {"v": "v * 10"}, "k = 2")  # v1
    got = sorted(tuple(r) for r in table_changes(spark, flat, 0, 1).collect())
    assert got == [(2, 2.0, "delete"), (2, 20.0, "insert")]


def test_table_changes_append_and_range_selection(spark, flat):
    from mcp_trino_spark.sources.timetravel import table_changes

    update_table(spark, flat, {"v": "0.0"}, "k = 1")  # v1
    execute_query(spark, f"INSERT INTO {flat} VALUES (9, 9.0)", config=WRITE)  # v2
    assert sorted(tuple(r) for r in table_changes(spark, flat, 1, 2).collect()) == [
        (9, 9.0, "insert")
    ]
    full = sorted(tuple(r) for r in table_changes(spark, flat, 0, 2).collect())
    assert full == [(1, 0.0, "insert"), (1, 1.0, "delete"), (9, 9.0, "insert")]
    # empty range and inverted range
    assert table_changes(spark, flat, 1, 1).count() == 0
    with pytest.raises(DmlError, match="from_version"):
        table_changes(spark, flat, 2, 1)


def test_table_changes_prunes_to_touched_partitions(spark, parted):
    from mcp_trino_spark.sources.timetravel import table_changes

    update_table(spark, parted, {"v": "v + 100"}, "p = 1")  # v1 touches p=1 only
    diff = table_changes(spark, parted, 0, 1)
    rows = sorted(tuple(r) for r in diff.collect())
    assert all(r[2] == 1 for r in rows)  # only p=1 rows appear (k, v, p, type)
    assert len(rows) == 6  # 3 deletes + 3 inserts
    # the pruning predicate must reach EVERY scan as a partition filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        diff.explain("formatted")
    pf = [
        ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln
    ]
    assert pf and all("<=> 1" in ln for ln in pf), pf


def test_table_changes_pruning_cap_falls_back_exact(
    spark, parted, monkeypatch, caplog
):
    # a version range touching more partitions than the cap must skip
    # the per-partition OR-chain (analyzer hazard at 100k partitions)
    # and still produce the exact diff
    import logging

    from mcp_trino_spark.sources import timetravel
    from mcp_trino_spark.sources.timetravel import table_changes

    update_table(spark, parted, {"v": "v + 100"}, "v < 100")  # v1: all 3 partitions
    expected = sorted(tuple(r) for r in table_changes(spark, parted, 0, 1).collect())
    assert len(expected) == 18  # 9 deletes + 9 inserts
    monkeypatch.setattr(timetravel, "_MAX_PRUNE_PARTITIONS", 2)
    with caplog.at_level(logging.INFO, logger="mcp_trino_spark.sources.timetravel"):
        capped = sorted(
            tuple(r) for r in table_changes(spark, parted, 0, 1).collect()
        )
    assert capped == expected
    assert any("pruning cap" in r.message for r in caplog.records)


def test_table_changes_sql_front_door(spark, flat):
    update_table(spark, flat, {"v": "v * 10"}, "k = 2")  # v1
    for q in (
        f"SELECT k, v, _change_type FROM TABLE(system.table_changes('{flat}', 0, 1)) ORDER BY v",
        f"SELECT k, v, _change_type FROM table_changes('{flat}', 0, 1) ORDER BY v",
    ):
        r = execute_query(spark, q, dialect="trino")
        assert [(row["k"], row["v"], row["_change_type"]) for row in r.rows] == [
            (2, 2.0, "delete"), (2, 20.0, "insert"),
        ]
    # masked occurrences are untouched; malformed TABLE( wrapper is loud
    r = execute_query(
        spark, "SELECT 'table_changes(''x'', 0, 1)' AS s", dialect="trino"
    )
    assert r.rows == [{"s": "table_changes('x', 0, 1)"}]
    from mcp_trino_spark.sources.dml import DmlError

    with pytest.raises(DmlError, match="malformed"):
        execute_query(
            spark,
            f"SELECT * FROM TABLE(table_changes('{flat}', 0, 1) JOIN x ON 1=1",
            dialect="trino",
        )
