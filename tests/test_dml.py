"""Copy-on-write DML (sources/dml.py): UPDATE / DELETE / MERGE.

Reference parity: client.go:306-310 declares these as gated write
statements (keyword tests client_test.go:395-446).  The end-to-end
oracle checks live in sources/sinks.py (s7/s7b/s7c); these tests cover
the edge cases the oracle can't: cardinality guards, NULL-predicate
semantics, rollback, the SQL grammar's loud failures, and the write
gate in front of the whole thing.
"""

import pytest
from pyspark.sql import Row

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import WriteQueryNotAllowed, execute_query
from mcp_trino_spark.sources.dml import (
    DmlError,
    MergeCardinalityError,
    delete_from,
    execute_dml,
    is_dml_statement,
    merge_into,
    update_table,
)

WRITE = EngineConfig(allow_write_queries=True)


@pytest.fixture()
def target(spark, tmp_path, request):
    """A fresh 3-row parquet-backed table; yields its name."""
    name = f"dml_t_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [Row(k=1, v=10.0, s="a"), Row(k=2, v=20.0, s="b"), Row(k=3, v=None, s="c")]
    ).write.mode("overwrite").parquet(str(tmp_path / name))
    spark.sql(
        f"CREATE TABLE {name} USING parquet LOCATION '{tmp_path / name}'"
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def rows(spark, name):
    return {
        (r.k, r.v, r.s) for r in spark.table(name).collect()
    }


# ---------------------------------------------------------------------------
# UPDATE


def test_update_where(spark, target):
    n = update_table(spark, target, {"v": "v * 2"}, "k <= 2")
    assert n == 2
    assert rows(spark, target) == {(1, 20.0, "a"), (2, 40.0, "b"), (3, None, "c")}


def test_update_no_where_touches_all(spark, target):
    n = update_table(spark, target, {"s": "upper(s)"})
    assert n == 3
    assert {r[2] for r in rows(spark, target)} == {"A", "B", "C"}


def test_update_unknown_column_fails_loudly(spark, target):
    with pytest.raises(DmlError, match="unknown column"):
        update_table(spark, target, {"nope": "1"})
    assert rows(spark, target) == {(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")}


def test_update_casts_to_target_type(spark, target):
    # SET v = integer expr must come back as the column's DOUBLE type
    update_table(spark, target, {"v": "7"}, "k = 1")
    t = spark.table(target)
    assert dict(t.dtypes)["v"] == "double"
    assert {r.v for r in t.filter("k = 1").collect()} == {7.0}


# ---------------------------------------------------------------------------
# DELETE


def test_delete_where(spark, target):
    n = delete_from(spark, target, "k = 2")
    assert n == 1
    assert {r[0] for r in rows(spark, target)} == {1, 3}


def test_delete_null_predicate_keeps_row(spark, target):
    # v is NULL for k=3: "v > 0" is NULL there — SQL DELETE removes only
    # TRUE matches, so the NULL row must survive.
    n = delete_from(spark, target, "v > 0")
    assert n == 2
    assert {r[0] for r in rows(spark, target)} == {3}


def test_delete_all(spark, target):
    n = delete_from(spark, target, None)
    assert n == 3
    assert spark.table(target).count() == 0


# ---------------------------------------------------------------------------
# MERGE


def test_merge_update_and_insert(spark, target):
    src = spark.createDataFrame([Row(k=2, v=99.0, s="B2"), Row(k=4, v=44.0, s="d")])
    src.createOrReplaceTempView("merge_src")
    n = merge_into(
        spark,
        target,
        spark.table("merge_src"),
        "t.k = s.k",
        matched_update={"v": "s.v", "s": "s.s"},
        insert_all=True,
    )
    assert n == 2  # 1 update + 1 insert
    assert rows(spark, target) == {
        (1, 10.0, "a"),
        (2, 99.0, "B2"),
        (3, None, "c"),
        (4, 44.0, "d"),
    }


def test_merge_matched_delete_with_condition(spark, target):
    src = spark.createDataFrame([Row(k=1), Row(k=2)])
    n = merge_into(
        spark,
        target,
        src,
        "t.k = s.k",
        matched_delete=True,
        matched_condition="t.v >= 20",
    )
    assert n == 1  # only k=2 passes the AND condition
    assert {r[0] for r in rows(spark, target)} == {1, 3}


def test_merge_cardinality_guard(spark, target):
    src = spark.createDataFrame([Row(k=2, v=1.0), Row(k=2, v=2.0)])
    with pytest.raises(MergeCardinalityError):
        merge_into(spark, target, src, "t.k = s.k", matched_update={"v": "s.v"})
    # table state untouched
    assert rows(spark, target) == {(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")}


def test_merge_update_and_delete_mutually_exclusive(spark, target):
    src = spark.createDataFrame([Row(k=1)])
    with pytest.raises(DmlError):
        merge_into(
            spark, target, src, "t.k = s.k",
            matched_update={"v": "1"}, matched_delete=True,
        )


# ---------------------------------------------------------------------------
# SQL front door


def test_is_dml_statement():
    assert is_dml_statement("  update t set x=1")
    assert is_dml_statement("DELETE FROM t")
    assert is_dml_statement("merge into t using s on t.k=s.k when matched then delete")
    assert not is_dml_statement("SELECT * FROM t")
    assert not is_dml_statement("INSERT INTO t VALUES (1)")  # native Spark path


def test_sql_update_roundtrip(spark, target):
    n = execute_dml(spark, f"UPDATE {target} SET v = v + 1, s = 'z' WHERE k = 1;")
    assert n == 1
    assert (1, 11.0, "z") in rows(spark, target)


def test_sql_merge_full(spark, target):
    spark.createDataFrame([Row(k=3, v=33.0, s="C"), Row(k=5, v=55.0, s="e")]
                          ).createOrReplaceTempView("msrc")
    n = execute_dml(
        spark,
        f"""
        MERGE INTO {target} AS t USING msrc AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (s.k, s.v, s.s)
        """,
    )
    assert n == 2
    assert (3, 33.0, "c") in rows(spark, target)
    assert (5, 55.0, "e") in rows(spark, target)


def test_sql_merge_insert_star(spark, target):
    spark.createDataFrame([Row(k=9, v=9.0, s="i")]).createOrReplaceTempView("msrc2")
    # no aliases: unaliased tables are referenced by their bare names
    n = execute_dml(
        spark,
        f"MERGE INTO {target} USING msrc2 ON {target}.k = msrc2.k "
        f"WHEN NOT MATCHED THEN INSERT *",
    )
    assert n == 1
    assert (9, 9.0, "i") in rows(spark, target)


def test_sql_garbage_fails_loudly(spark):
    with pytest.raises(DmlError):
        execute_dml(spark, "UPDATE t1 FROB x = 1")
    with pytest.raises(DmlError):
        execute_dml(spark, "MERGE INTO t USING s ON t.k = s.k")  # no WHEN
    with pytest.raises(DmlError):
        execute_dml(
            spark,
            "MERGE INTO t USING s ON t.k=s.k WHEN NOT MATCHED THEN "
            "INSERT (a, b) VALUES (1)",  # count mismatch
        )


def test_where_keyword_in_string_literal_not_split(spark, target):
    # the WHERE-finder must skip literals: SET s = 'WHERE' has no filter
    n = execute_dml(spark, f"UPDATE {target} SET s = 'WHERE x'")
    assert n == 3
    assert {r[2] for r in rows(spark, target)} == {"WHERE x"}


# ---------------------------------------------------------------------------
# write gate + façade integration


def test_dml_blocked_without_write_flag(spark, target):
    with pytest.raises(WriteQueryNotAllowed):
        execute_query(spark, f"DELETE FROM {target}", EngineConfig())
    assert spark.table(target).count() == 3


def test_dml_through_execute_query(spark, target):
    res = execute_query(spark, f"DELETE FROM {target} WHERE k = 1", WRITE)
    assert res.rows == [{"rows_affected": 1}]
    assert spark.table(target).count() == 2


def test_update_case_insensitive_columns(spark, target):
    """Spark SQL resolution is case-insensitive; the COW layer must be
    too — `SET V = …` resolves to column v instead of raising."""
    n = update_table(spark, target, {"V": "v + 1"}, "k = 1")
    assert n == 1
    assert (1, 11.0, "a") in rows(spark, target)


def test_merge_unknown_update_column_fails_loudly(spark, target):
    """A typo'd SET column must raise, not commit matched rows
    unchanged with rows_affected > 0."""
    src = spark.createDataFrame([Row(k=2, v=99.0, s="x")])
    with pytest.raises(DmlError, match="unknown column"):
        merge_into(
            spark, target, src, "t.k = s.k", matched_update={"vv": "s.v"}
        )
    assert rows(spark, target) == {(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")}


def test_merge_unknown_insert_column_fails_loudly(spark, target):
    """A mis-named INSERT column must raise, not NULL-fill silently."""
    src = spark.createDataFrame([Row(k=4, v=44.0, s="d")])
    with pytest.raises(DmlError, match="unknown column"):
        merge_into(
            spark, target, src, "t.k = s.k",
            insert_values={"k": "s.k", "vee": "s.v"},
        )


def test_merge_case_insensitive_columns(spark, target):
    src = spark.createDataFrame([Row(k=2, v=99.0, s="B2")])
    n = merge_into(
        spark, target, src, "t.k = s.k", matched_update={"V": "s.v"}
    )
    assert n == 1
    assert (2, 99.0, "b") in rows(spark, target)


def test_commented_dml_routes_to_cow_layer(spark, target):
    """Leading comments must not break DML routing: the write gate
    strips comments, so the router must too."""
    assert is_dml_statement(f"/* ticket-123 */ UPDATE {target} SET v = 0")
    assert is_dml_statement("-- note\nDELETE FROM t")
    assert not is_dml_statement("/* UPDATE t SET x=1 */ SELECT 1")
    n = execute_dml(
        spark, f"/* ticket-123 */ UPDATE {target} SET v = 0 WHERE k = 1"
    )
    assert n == 1
    assert (1, 0.0, "a") in rows(spark, target)


# ---------------------------------------------------------------------------
# Partition-bounded copy-on-write (r3): an UPDATE/DELETE whose predicate
# touches one hive partition must rewrite ONLY that partition's
# directory — the other partitions' files stay byte-identical on disk.


def _snapshot(root):
    """{relative file path: (size, mtime_ns)} for every data file."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


@pytest.fixture()
def ptarget(spark, tmp_path, request):
    """A parquet table hive-partitioned by ``status`` (3 partitions)."""
    name = f"dml_p_{request.node.name}"[:60].replace("[", "_").replace("]", "_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.createDataFrame(
        [
            Row(k=1, v=10.0, status="F"),
            Row(k=2, v=20.0, status="F"),
            Row(k=3, v=30.0, status="O"),
            Row(k=4, v=40.0, status="O"),
            Row(k=5, v=50.0, status="P"),
        ]
    ).write.partitionBy("status").parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    spark.sql(f"MSCK REPAIR TABLE {name}")
    yield name, loc
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_partitioned_update_rewrites_only_touched_partition(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    n = update_table(spark, name, {"v": "v + 1"}, "status = 'F' AND k = 1")
    assert n == 1
    after = _snapshot(loc)
    untouched = {p: s for p, s in before.items() if "status=F" not in p}
    assert untouched == {
        p: s for p, s in after.items() if "status=F" not in p
    }, "files outside the touched partition changed"
    assert {p for p in before if "status=F" in p} != {
        p for p in after if "status=F" in p
    } or before != after, "touched partition was not rewritten"
    got = {(r.k, r.v, r.status) for r in spark.table(name).collect()}
    assert got == {
        (1, 11.0, "F"), (2, 20.0, "F"), (3, 30.0, "O"),
        (4, 40.0, "O"), (5, 50.0, "P"),
    }


def test_partitioned_update_no_match_is_noop_on_disk(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    assert update_table(spark, name, {"v": "0"}, "k = 999") == 0
    assert _snapshot(loc) == before


def test_partitioned_delete_retires_empty_partition(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    n = delete_from(spark, name, "status = 'P'")
    assert n == 1
    after = _snapshot(loc)
    assert not any("status=P" in p for p in after), "emptied partition remains"
    assert {p: s for p, s in before.items() if "status=P" not in p} == {
        p: s for p, s in after.items() if "status=P" not in p
    }
    assert spark.table(name).count() == 4
    # catalog partition metadata re-synced: a full scan must not error
    assert {r.status for r in spark.table(name).select("status").distinct().collect()} == {"F", "O"}


def test_partitioned_update_of_partition_column_falls_back(spark, ptarget):
    """SET on a partition column migrates rows between partitions —
    correctness requires the full-rewrite path."""
    name, loc = ptarget
    n = update_table(spark, name, {"status": "'X'"}, "k = 5")
    assert n == 1
    got = {(r.k, r.status) for r in spark.table(name).collect()}
    assert (5, "X") in got and len(got) == 5


def test_partitioned_delete_null_safe_predicate(spark, ptarget):
    name, loc = ptarget
    # predicate NULL for every row of partition O (v IS NULL nowhere):
    # DELETE must only drop true-matching rows
    n = delete_from(spark, name, "CASE WHEN status = 'F' THEN k = 1 ELSE NULL END")
    assert n == 1
    assert spark.table(name).count() == 4


def test_partitioned_merge_rewrites_only_touched_partitions(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    src = spark.createDataFrame([Row(k=3, v=333.0, status="O")])
    n = merge_into(
        spark, name, src, "t.k = s.k AND t.status = s.status",
        target_alias="t", source_alias="s",
        matched_update={"v": "s.v"},
    )
    assert n == 1
    after = _snapshot(loc)
    assert {p: s for p, s in before.items() if "status=O" not in p} == {
        p: s for p, s in after.items() if "status=O" not in p
    }, "files outside the matched partition changed"
    got = {(r.k, r.v) for r in spark.table(name).collect()}
    assert (3, 333.0) in got and len(got) == 5


def test_partitioned_merge_insert_creates_new_partition_only(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    src = spark.createDataFrame([Row(k=9, v=90.0, status="X")])
    n = merge_into(
        spark, name, src, "t.k = s.k",
        target_alias="t", source_alias="s",
        insert_all=True,
    )
    assert n == 1
    after = _snapshot(loc)
    assert any("status=X" in p for p in after), "new partition missing"
    assert before == {p: s for p, s in after.items() if "status=X" not in p}, (
        "existing partitions must be untouched by an insert-only MERGE"
    )
    assert spark.table(name).count() == 6
    # catalog sees the new partition
    assert {r.status for r in spark.table(name).select("status").distinct().collect()} == {
        "F", "O", "P", "X",
    }


def test_partitioned_merge_no_match_no_disk_change(spark, ptarget):
    name, loc = ptarget
    before = _snapshot(loc)
    src = spark.createDataFrame([Row(k=999, v=0.0, status="F")])
    n = merge_into(
        spark, name, src, "t.k = s.k", matched_update={"v": "s.v"}
    )
    assert n == 0
    assert _snapshot(loc) == before


def test_partitioned_merge_of_partition_column_falls_back(spark, ptarget):
    """A MERGE whose UPDATE reassigns the partition column migrates rows
    between partitions — must take the full-rewrite path and stay
    correct."""
    name, loc = ptarget
    src = spark.createDataFrame([Row(k=5, status="Z")])
    n = merge_into(
        spark, name, src, "t.k = s.k",
        target_alias="t", source_alias="s",
        matched_update={"status": "s.status"},
    )
    assert n == 1
    got = {(r.k, r.status) for r in spark.table(name).collect()}
    assert (5, "Z") in got and len(got) == 5


def test_partition_value_escaping_matches_spark_writer(spark, tmp_path):
    """_escape_partition_value must reproduce EXACTLY the directory name
    Spark's writer creates — a mismatch would make the bounded commit
    rename the wrong (or no) directory.  Covers the full unsafe-char
    set, unicode, spaces, and NULL."""
    import os

    from mcp_trino_spark.sources.dml import _escape_partition_value

    values = [
        "plain", "has space", 'quo"te', "pct%20", "hash#1", "apo'x",
        "star*", "slash/es", "colon:y", "eq=z", "q?m", "back\\s",
        "brace{b", "brack[x]", "caret^v", "uni-héllo", "tab\tchar",
        "newline\nx", None, "__HIVE_DEFAULT_PARTITION__x", "dot.dot",
    ]
    loc = str(tmp_path / "esc_t")
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, p string"
    ).write.partitionBy("p").parquet(loc)
    dirs = {d for d in os.listdir(loc) if d.startswith("p=")}
    for v in values:
        # NULL also writes as p=<marker> (matches _partition_relpath)
        expect = f"p={_escape_partition_value(v)}"
        assert expect in dirs, (v, expect, sorted(dirs))


def test_partitioned_update_with_special_char_value(spark, tmp_path, request):
    """End-to-end: bounded UPDATE on a partition whose value needs
    percent-escaping must rewrite exactly that directory."""
    name = "dml_esc_upd"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.createDataFrame(
        [Row(k=1, v=1.0, status="a:b"), Row(k=2, v=2.0, status="plain")]
    ).write.partitionBy("status").parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    spark.sql(f"MSCK REPAIR TABLE {name}")
    try:
        before = _snapshot(loc)
        assert update_table(spark, name, {"v": "9.0"}, "status = 'a:b'") == 1
        after = _snapshot(loc)
        assert {p: s for p, s in before.items() if "plain" in p} == {
            p: s for p, s in after.items() if "plain" in p
        }
        got = {(r.k, r.v, r.status) for r in spark.table(name).collect()}
        assert got == {(1, 9.0, "a:b"), (2, 2.0, "plain")}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_partition_escaping_int_and_date_types(spark, tmp_path):
    """Int and date partition columns — the two most common real-world
    partition types — must also round-trip through the bounded commit's
    path builder."""
    import datetime
    import os

    from mcp_trino_spark.sources.dml import _partition_relpath

    loc = str(tmp_path / "esc_int")
    spark.createDataFrame([(1, 10), (2, 20)], "i int, p int").write.partitionBy(
        "p"
    ).parquet(loc)
    for v in (10, 20):
        assert _partition_relpath(["p"], (v,)) in os.listdir(loc)

    loc2 = str(tmp_path / "esc_date")
    spark.createDataFrame(
        [(1, datetime.date(2026, 8, 14)), (2, datetime.date(2026, 1, 2))],
        "i int, p date",
    ).write.partitionBy("p").parquet(loc2)
    for v in (datetime.date(2026, 8, 14), datetime.date(2026, 1, 2)):
        assert _partition_relpath(["p"], (v,)) in os.listdir(loc2)


# ---------------------------------------------------------------------------
# OPTIMIZE (small-file compaction as a versioned commit)


def _parquet_count(d):
    import os

    return sum(
        1
        for root, _dirs, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )


def test_optimize_unpartitioned_compacts_files(spark, tmp_path, request):
    import os
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import optimize_table
    from mcp_trino_spark.sources.timetravel import read_table_version, table_history

    name = "opt_flat"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    ).repartition(8).write.parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    try:
        before = {(r.k, r.v) for r in spark.table(name).collect()}
        assert _parquet_count(loc) == 8
        n = optimize_table(spark, name)
        assert n == 1000
        assert _parquet_count(loc) == 1
        assert {(r.k, r.v) for r in spark.table(name).collect()} == before
        # versioned: the pre-compaction state is still readable
        hist = table_history(spark, name).collect()
        assert [(r["version"], r["op"]) for r in hist] == [(1, "optimize")]
        assert {(r.k, r.v) for r in read_table_version(spark, name, 0).collect()} == before
        # idempotent: a second optimize is a no-op (no new version)
        assert optimize_table(spark, name) == 0
        assert len(table_history(spark, name).collect()) == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_optimize_partitioned_is_partition_bounded(spark, tmp_path):
    import os
    from pyspark.sql import Row, functions as F
    from mcp_trino_spark.sources.dml import optimize_table

    name = "opt_part"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    # p=0 fragmented (4 files), p=1 already compact (1 file)
    spark.createDataFrame([Row(p=0, k=i) for i in range(100)]).repartition(
        4
    ).write.partitionBy("p").parquet(loc)
    spark.createDataFrame([Row(p=1, k=i) for i in range(100)]).coalesce(
        1
    ).write.mode("append").partitionBy("p").parquet(loc)
    spark.sql(
        f"CREATE TABLE {name} (k bigint, p bigint) USING parquet "
        f"PARTITIONED BY (p) LOCATION '{loc}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")
    try:
        before = {(r.k, r.p) for r in spark.table(name).collect()}
        p1_files = sorted(os.listdir(os.path.join(loc, "p=1")))
        p1_stat = os.stat(
            os.path.join(loc, "p=1", [f for f in p1_files if f.endswith(".parquet")][0])
        )
        n = optimize_table(spark, name)
        assert n == 100  # only p=0's rows rewritten
        assert _parquet_count(os.path.join(loc, "p=0")) == 1
        # p=1 untouched — same inode/mtime, byte-identical directory
        assert sorted(os.listdir(os.path.join(loc, "p=1"))) == p1_files
        assert os.stat(
            os.path.join(loc, "p=1", [f for f in p1_files if f.endswith(".parquet")][0])
        ).st_mtime == p1_stat.st_mtime
        assert {(r.k, r.p) for r in spark.table(name).collect()} == before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_optimize_sql_front_door_and_gate(spark, tmp_path):
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import is_optimize_statement

    name = "opt_sql"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.range(0, 500).select(F.col("id").alias("k")).repartition(5).write.parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    try:
        q = f"ALTER TABLE {name} EXECUTE optimize(file_size_threshold => '64MB')"
        assert is_optimize_statement(q)
        with pytest.raises(WriteQueryNotAllowed):
            execute_query(spark, q)  # gated like every write
        r = execute_query(spark, q, WRITE)
        assert r.rows[0]["rows_rewritten"] == 500
        assert _parquet_count(loc) == 1
        # malformed EXECUTE form fails loudly
        from mcp_trino_spark.sources.dml import DmlError

        with pytest.raises(DmlError, match="EXECUTE"):
            execute_query(
                spark, f"ALTER TABLE {name} EXECUTE remove_orphan_files", WRITE
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_expire_snapshots_by_age(spark, tmp_path):
    import json
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import (
        _history_path, _table_location, update_table,
    )
    from mcp_trino_spark.sources.timetravel import read_table_version, table_history
    from mcp_trino_spark.sources.dml import DmlError as _DmlError

    name = "exp_t"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.range(0, 10).select(F.col("id").alias("k")).write.parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    try:
        update_table(spark, name, {"k": "k + 100"}, "k = 0")   # v1
        update_table(spark, name, {"k": "k + 100"}, "k = 1")   # v2
        # age commit 1 artificially: 10 days old
        tloc = _table_location(spark, name)
        with open(_history_path(tloc)) as f:
            hist = json.load(f)
        from datetime import datetime, timedelta, timezone
        old = (datetime.now(timezone.utc) - timedelta(days=10)).isoformat(
            timespec="seconds"
        )
        hist["commits"][0]["ts"] = old
        with open(_history_path(tloc), "w") as f:
            json.dump(hist, f)

        r = execute_query(
            spark,
            f"ALTER TABLE {name} EXECUTE expire_snapshots(retention_threshold => '7d')",
            WRITE,
        )
        assert r.rows[0]["floor"] == 1
        hist_rows = table_history(spark, name).collect()
        assert [h["version"] for h in hist_rows] == [2]
        with pytest.raises(_DmlError, match="vacuumed"):
            read_table_version(spark, name, 0)
        # version 1 (the floor) still reconstructible from v2's data
        assert len(read_table_version(spark, name, 1).collect()) == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_concurrent_updates_serialize(spark, tmp_path):
    """Two threads committing UPDATEs on one table must serialize: both
    versions recorded, both effects applied, both historical states
    readable (unsynchronized, both read version N and one snapshot is
    silently lost)."""
    import threading
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import update_table
    from mcp_trino_spark.sources.timetravel import read_table_version, table_history

    name = "conc_t"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(0.0).alias("a"), F.lit(0.0).alias("b")
    ).write.parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    try:
        errs = []

        def upd(col):
            try:
                update_table(spark, name, {col: "1.0"}, None)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=upd, args=(c,)) for c in ("a", "b")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        hist = table_history(spark, name).collect()
        assert [r["version"] for r in hist] == [1, 2]
        # both effects present in the live state (no lost update)
        row = spark.table(name).filter("k = 0").collect()[0]
        assert row["a"] == 1.0 and row["b"] == 1.0
        # every historical state reconstructible
        assert read_table_version(spark, name, 0).count() == 100
        assert read_table_version(spark, name, 1).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_alter_without_execute_goes_to_native_path(spark, tmp_path):
    """ALTER statements that are not EXECUTE procedures must keep
    Spark's native path — including when the word 'execute' appears in
    a literal or as an identifier."""
    from mcp_trino_spark.sources.dml import is_optimize_statement

    assert not is_optimize_statement(
        "ALTER TABLE t SET TBLPROPERTIES ('comment' = 'execute nightly')"
    )
    assert not is_optimize_statement("ALTER TABLE t ADD COLUMNS (execute INT)")
    assert is_optimize_statement("  /* c */ alter table db.t execute optimize")
    # end-to-end: a TBLPROPERTIES ALTER still works through the façade
    name = "alt_nat"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.range(3).write.parquet(str(tmp_path / name))
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{tmp_path / name}'")
    try:
        r = execute_query(
            spark,
            f"ALTER TABLE {name} SET TBLPROPERTIES ('comment' = 'execute nightly')",
            WRITE,
        )
        assert r is not None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_commit_lock_excludes_across_processes(tmp_path):
    """Two engine PROCESSES sharing a warehouse must serialize the
    commit critical section (read version → write version+1) through
    the flock sidecar — without it both read version N and record N+1,
    silently losing one commit.  Each child acquires the table commit
    lock, reads the history, sleeps inside the critical section, then
    appends version+1; with mutual exclusion the final history is
    exactly [1, 2]."""
    import subprocess
    import sys
    import textwrap

    loc = tmp_path / "xproc_table"
    loc.mkdir()
    child = textwrap.dedent(
        """
        import json, sys, time
        sys.path.insert(0, "/root/repo")
        from mcp_trino_spark.sources.dml import (
            _table_commit_lock, _load_history, _save_history,
            current_table_version,
        )
        loc = sys.argv[1]
        with _table_commit_lock(loc):
            v = current_table_version(loc)
            time.sleep(1.0)  # widen the race window
            hist = _load_history(loc)
            hist["commits"].append(
                {"version": v + 1, "op": "test", "kind": "full",
                 "ts": "2026-01-01T00:00:00+00:00"}
            )
            _save_history(loc, hist)
        """
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", child, str(loc)])
        for _ in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=60) == 0
    from mcp_trino_spark.sources.dml import _load_history

    versions = [c["version"] for c in _load_history(str(loc))["commits"]]
    assert versions == [1, 2], f"lost update across processes: {versions}"


def test_optimize_zorder_sql_front_door(spark, tmp_path):
    """ALTER TABLE t EXECUTE optimize(zorder_by => ARRAY['x','y']):
    full-table relayout through the versioned-commit path — content
    unchanged, footer bounding boxes much tighter than the row-order
    layout, pre-layout state still readable via time travel."""
    import glob as _glob
    import os
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import DmlError
    from mcp_trino_spark.sources.timetravel import read_table_version, table_history
    from tests.test_layout import _file_bboxes, _mean_bbox_area

    name = "opt_zorder"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    n = 20_000
    # row-order layout: files ordered by id → x tight per file, y full-span
    df = spark.range(0, n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % n).alias("y"),
    )
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(loc)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
    try:
        spans = {"x": (0, n - 1), "y": (0, n - 1)}
        # pre-layout: x-sorted files span ALL of y, so a y-box predicate
        # can skip nothing — the gap z-order exists to close
        # band chosen OFF the natural z-cell boundaries (mid-span): a
        # probe straddling a top-level cell edge touches both sides'
        # cells and defeats the grid regardless of layout quality
        ybox = (n * 0.30, n * 0.35)

        def _touched_by_ybox(boxes):
            return [b for b in boxes if b["y"][0] <= ybox[1] and b["y"][1] >= ybox[0]]

        pre_boxes = _file_bboxes(loc, ["x", "y"])
        assert len(_touched_by_ybox(pre_boxes)) == len(pre_boxes)  # no skipping
        before = {(r.x, r.y) for r in spark.table(name).collect()}

        total = sum(
            os.path.getsize(f) for f in _glob.glob(os.path.join(loc, "*.parquet"))
        )
        kb = max(1, total // (16 * 1024))  # aim for ~16 output files
        q = (
            f"ALTER TABLE {name} EXECUTE optimize("
            f"zorder_by => ARRAY['x','y'], file_size_threshold => '{kb}KB')"
        )
        with pytest.raises(WriteQueryNotAllowed):
            execute_query(spark, q)  # gated like every write
        r = execute_query(spark, q, WRITE)
        assert r.rows[0]["rows_rewritten"] == n

        assert {(r.x, r.y) for r in spark.table(name).collect()} == before
        boxes = _file_bboxes(loc, ["x", "y"])
        assert len(boxes) >= 8
        # z-ordered files are compact on BOTH axes: the y-box predicate
        # now skips a real fraction of files (pre-layout it skipped 0),
        # and the mean bbox area is absolutely tight (s13's bound)
        # range-boundary sampling varies per session (see
        # test_layout.py margin note) — bound clear of the variance
        # band; pre-layout touched 100% of files
        assert len(_touched_by_ybox(boxes)) <= 0.6 * len(boxes), (
            len(_touched_by_ybox(boxes)),
            len(boxes),
        )
        assert _mean_bbox_area(boxes, spans) < 0.25
        # versioned: time travel reads the pre-layout state
        hist = table_history(spark, name).collect()
        assert [(h["version"], h["op"]) for h in hist] == [(1, "optimize")]
        assert {
            (r.x, r.y) for r in read_table_version(spark, name, 0).collect()
        } == before
        # unknown params and bad arity fail loudly
        with pytest.raises(DmlError, match="optimize parameter"):
            execute_query(
                spark,
                f"ALTER TABLE {name} EXECUTE optimize(cluster => 'x')",
                WRITE,
            )
        with pytest.raises(DmlError, match="2-4"):
            execute_query(
                spark,
                f"ALTER TABLE {name} EXECUTE optimize(zorder_by => ARRAY['x'])",
                WRITE,
            )
        with pytest.raises(DmlError, match="not in table"):
            execute_query(
                spark,
                f"ALTER TABLE {name} EXECUTE optimize(zorder_by => ARRAY['x','nope'])",
                WRITE,
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_optimize_zorder_partitioned_leads_with_partition_cols(spark, tmp_path):
    """On a hive-partitioned table the z-range tasks are prefixed with
    the partition columns, so each partition ends up with contiguous
    z-range files (not |tasks| x |partitions| shards); z-ordering a
    partition column itself is rejected."""
    import os
    from pyspark.sql import functions as F
    from mcp_trino_spark.sources.dml import DmlError

    name = "opt_zpart"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = str(tmp_path / name)
    n = 8_000
    df = spark.range(0, n).select(
        (F.col("id") % 2).alias("p"),
        F.col("id").alias("x"),
        ((F.col("id") * 40503) % n).alias("y"),
    )
    df.repartition(4).write.partitionBy("p").parquet(loc)
    spark.sql(
        f"CREATE TABLE {name} (x bigint, y bigint, p bigint) USING parquet "
        f"PARTITIONED BY (p) LOCATION '{loc}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")
    try:
        before = {(r.x, r.y, r.p) for r in spark.table(name).collect()}
        with pytest.raises(DmlError, match="partition columns"):
            execute_query(
                spark,
                f"ALTER TABLE {name} EXECUTE optimize(zorder_by => ARRAY['p','x'])",
                WRITE,
            )
        r = execute_query(
            spark,
            f"ALTER TABLE {name} EXECUTE optimize("
            f"zorder_by => ARRAY['x','y'], file_size_threshold => '16KB')",
            WRITE,
        )
        assert r.rows[0]["rows_rewritten"] == n
        assert {(r.x, r.y, r.p) for r in spark.table(name).collect()} == before
        # hive layout preserved; per-partition files are z-contiguous:
        # x-ranges of a partition's files barely overlap
        for pdir in ("p=0", "p=1"):
            files = sorted(
                f
                for f in os.listdir(os.path.join(loc, pdir))
                if f.endswith(".parquet")
            )
            assert files, pdir
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
