"""Engine-level tests: execute/timeout/result shaping, explain, catalog
tools, multimodal UDF internals, registry integrity.  Uses sf0.001 for
speed; full oracle equivalence is tools/check_correctness.py."""

import json

import pytest
from pyspark.sql import functions as F

from mcp_trino_spark import catalog_api
from mcp_trino_spark.allowlist import Allowlists
from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import (
    QueryResult,
    WriteQueryNotAllowed,
    execute_query,
)
from mcp_trino_spark.plans.explain import InvalidExplainFormat, explain_query
from mcp_trino_spark.sources.catalog import register_tables


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_tables(spark, sf_dir)


def test_execute_query_shapes_rows(spark):
    res = execute_query(spark, "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    assert res.columns == ["r_regionkey", "r_name"]
    assert len(res.rows) == 5
    assert res.rows[0]["r_regionkey"] == 0
    parsed = json.loads(res.to_json())
    assert parsed[0]["r_name"] == res.rows[0]["r_name"]


def test_execute_query_trailing_semicolon(spark):
    assert len(execute_query(spark, "SELECT 1 AS x;").rows) == 1


def test_execute_query_rejects_writes(spark):
    with pytest.raises(WriteQueryNotAllowed):
        execute_query(spark, "DROP TABLE region")


def test_execute_query_write_gate_override(spark):
    cfg = EngineConfig(allow_write_queries=True)
    res = execute_query(spark, "SELECT 'CREATE' AS kw", cfg)  # still just a select
    assert res.rows == [{"kw": "CREATE"}]


def test_execute_query_max_rows(spark):
    res = execute_query(spark, "SELECT * FROM lineitem", max_rows=7)
    assert len(res.rows) == 7


def test_explain_validate_good_and_bad(spark):
    ok = explain_query(spark, "SELECT 1", "VALIDATE")
    assert ok.rows[0]["valid"] is True
    bad = explain_query(spark, "SELECT FROM FROM", "VALIDATE")
    assert bad.rows[0]["valid"] is False


def test_explain_rejects_unknown_format(spark):
    with pytest.raises(InvalidExplainFormat):
        explain_query(spark, "SELECT 1", "JSON")


def test_explain_io_lists_files(spark):
    res = explain_query(spark, "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45", "IO")
    files = [r for r in res.rows if r["kind"] == "file"]
    assert files and "lineitem" in files[0]["path"]
    # pushdown evidence must appear in the plan lines
    plan_lines = " ".join(r["path"] for r in res.rows if r["kind"] == "plan")
    assert "PushedFilters" in plan_lines


def test_catalog_listings(spark):
    cfg = EngineConfig()
    assert "spark_catalog" in catalog_api.list_catalogs(spark, cfg)
    tables = catalog_api.list_tables(spark, cfg)
    assert "lineitem" in tables and "embeddings" in tables


def test_get_table_schema_and_allowlist_gate(spark):
    cfg = EngineConfig()
    cols = {c.name: c for c in catalog_api.get_table_schema(spark, cfg, "customer")}
    assert cols["c_custkey"].type == "bigint"
    deny = EngineConfig(allowlists=Allowlists(tables=["spark_catalog.default.region"]))
    with pytest.raises(catalog_api.TableNotAllowed):
        catalog_api.get_table_schema(spark, deny, "customer")
    # allowed table passes
    assert catalog_api.get_table_schema(spark, deny, "region")


def test_registry_contract():
    from mcp_trino_spark import registry

    qs, oracles = registry.queries(), registry.oracle_sql()
    assert len(qs) >= 95
    assert set(oracles) <= set(qs)
    # every oracle is non-trivial single-statement SQL
    assert all(sql.strip().upper().startswith(("SELECT", "WITH")) for sql in oracles.values())


def test_decode_stub_deterministic():
    from mcp_trino_spark.operators.llm_multimodal import decode_stub

    a = decode_stub(b"hello")
    assert a == decode_stub(b"hello")
    assert a["n_bytes"] == 5 and a["byte_sum"] == sum(b"hello")
    # NULL payload → NULL features, matching the l9b oracle (zeros
    # would fabricate a decode of nothing and hash-mismatch)
    assert all(v is None for v in decode_stub(None).values())


def test_queryresult_json_stringifies_dates():
    import datetime

    qr = QueryResult(columns=["d"], rows=[{"d": datetime.date(2020, 1, 1)}])
    assert json.loads(qr.to_json()) == [{"d": "2020-01-01"}]


def test_attribution_properties_set_and_cleared(spark):
    """F13: user/client-tags attribution rides thread-local job
    properties during the query and is cleared afterwards."""
    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.execute import execute_query

    res = execute_query(
        spark,
        "SELECT 1 AS one",
        EngineConfig(),
        user="alice",
        client_tags=["etl", "prod"],
    )
    assert res.rows == [{"one": 1}]
    sc = spark.sparkContext
    assert sc.getLocalProperty("mcp.user") is None
    assert sc.getLocalProperty("mcp.client.tags") is None


def test_query_timeout_cancels_job(spark):
    """F10: the watchdog cancels the job group and classifies the
    failure as QueryTimeout (a deliberately huge 3-way cross join
    cannot finish in 3s)."""
    import time

    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.execute import QueryTimeout, execute_query
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    t0 = time.perf_counter()
    with pytest.raises(QueryTimeout):
        execute_query(
            spark,
            "SELECT COUNT(*) AS n FROM lineitem a CROSS JOIN lineitem b CROSS JOIN lineitem c",
            EngineConfig(query_timeout_s=3),
        )
    # cancelled promptly, not after the (hours-long) full product
    assert time.perf_counter() - t0 < 30


def test_registry_rejects_duplicate_names():
    from mcp_trino_spark import registry

    registry._ensure_loaded()
    with pytest.raises(ValueError, match="duplicate query name"):
        registry.register("q0_flagship_revenue_by_region")(lambda spark, sf: None)


def test_load_table_self_provisions_nanos_conf(spark, sf_dir):
    """Regression (round-1 driver failures j11/j12/l10b): events.parquet is
    INT64 TIMESTAMP(NANOS); load_table must normalize it on the CALLER's
    session regardless of how the reader surfaces nanos — bigint under the
    legacy nanosAsLong conf (Spark ≤4.0, which load_table self-provisions)
    or native timestamp_ntz (Spark 4.1+, conf ignored).  Either way the
    engine-facing schema is stable: ts TimestampType (µs) + ts_ns long."""
    from mcp_trino_spark.sources.catalog import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load_table(spark, sf_dir, "events")
    dt = dict(df.dtypes)
    assert dt["ts"] == "timestamp" and dt["ts_ns"] == "bigint"
    assert df.limit(1).count() == 1
    # ts_ns must agree with ts at µs resolution in both reader modes
    row = df.select(
        (F.unix_micros(F.col("ts")) * F.lit(1000) == F.col("ts_ns") - F.col("ts_ns") % 1000).alias("ok")
    ).limit(100).agg(F.min("ok").alias("ok")).first()
    assert row["ok"] is True


def test_registry_window_plus_proven_span_every_family():
    """The driver verifies only the first 50 registry entries.  Round 6
    rotated that window to the last never-driver-checked entries, so
    family coverage is a two-set invariant: the graded window must span
    the families that still HAD ungraded entries (p/a/w/o/x/t/s/f/l —
    every join was certified in rounds 2-5), and the union of window +
    the certified sets must span every SURVEY §2 family including
    flagship and façade."""
    from mcp_trino_spark import registry

    names = list(registry.queries())[:50]
    for family in ("p", "a", "w", "o", "x", "t", "s", "f", "l"):
        assert any(n.startswith(family) for n in names), (
            f"family {family} missing from driver window"
        )
    union = (
        set(names) | set(registry._PROVEN_R03) | set(registry._PROVEN_R45)
    )
    for family in ("q0", "p", "j", "a", "w", "o", "x", "t", "s", "f", "l"):
        assert any(n.startswith(family) for n in union), (
            f"family {family} has no driver evidence at all"
        )
    # oracle-backed entries lead the window; the handful without one
    # are pinned to the known no-oracle-possible set in
    # tests/test_registry_window.py (_ROWS_ONLY_OK)
    oracles = registry.oracle_sql()
    assert sum(1 for n in names if n in oracles) >= 42


def test_cache_api_surface(spark, sf_dir):
    """S4 memory catalog: create/list/read/drop + gates (write flag,
    allowlist, read-only definition) + InMemoryTableScan plan shape."""
    import pytest

    from mcp_trino_spark.allowlist import Allowlists
    from mcp_trino_spark.catalog_api import TableNotAllowed
    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.execute import WriteQueryNotAllowed
    from mcp_trino_spark.sources import cache as cache_api
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir)
    wcfg = EngineConfig(allow_write_queries=True)

    # write gate
    with pytest.raises(WriteQueryNotAllowed):
        cache_api.create_memory_table(spark, EngineConfig(), "m1", "SELECT 1 AS x")
    # read-only definition enforced
    with pytest.raises(WriteQueryNotAllowed):
        cache_api.create_memory_table(spark, wcfg, "m1", "DROP TABLE nation")
    # allowlist gate
    deny = EngineConfig(
        allow_write_queries=True,
        allowlists=Allowlists(tables=["spark_catalog.default.other"]),
    )
    with pytest.raises(TableNotAllowed):
        cache_api.create_memory_table(spark, deny, "m1", "SELECT 1 AS x")

    cache_api.create_memory_table(
        spark, wcfg, "m1", "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY 1"
    )
    try:
        assert cache_api.is_cached(spark, "m1")
        assert "m1" in cache_api.list_cached_tables(spark, wcfg)
        plan = spark.table("m1")._jdf.queryExecution().executedPlan().toString()
        assert "In-memory table" in plan or "InMemoryRelation" in plan
        assert spark.table("m1").count() == 5
    finally:
        cache_api.drop_memory_table(spark, wcfg, "m1")
    assert "m1" not in [t.name for t in spark.catalog.listTables()]

    # plain cache/uncache of an existing view
    cache_api.cache_table(spark, wcfg, "nation")
    assert cache_api.is_cached(spark, "nation")
    cache_api.uncache_table(spark, wcfg, "nation")
    assert not cache_api.is_cached(spark, "nation")


def test_ivf_ann_recall_vs_exact(spark, sf_dir):
    """IVF top-k (probing 1/8 of the corpus) must recover most of the
    exact brute-force top-10 — quality evidence the rows-only driver
    check cannot give.  Deterministic: fixed query vector, seed
    centroids, no RNG."""
    from mcp_trino_spark import registry

    exact = [r["vec_id"] for r in
             registry.queries()["l4_topk_similarity"](spark, sf_dir).collect()]
    ivf = [r["vec_id"] for r in
           registry.queries()["l4b_ivf_topk"](spark, sf_dir).collect()]
    assert len(exact) == len(ivf) == 10
    recall = len(set(exact) & set(ivf)) / 10
    assert recall >= 0.5, f"IVF recall@10 = {recall} (exact {exact}, ivf {ivf})"


def test_show_family_metadata_sql_passes_gate(spark, sf_dir):
    """The reference's classifier allows the whole SHOW family
    (client.go:284-290 incl. SHOW CREATE *); every spelling must clear
    our gate AND execute on Spark's metadata SQL."""
    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.execute import execute_query
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql(
        "CREATE TABLE IF NOT EXISTS show_family_t USING parquet AS SELECT 1 AS a"
    )
    try:
        cases = {
            "SHOW COLUMNS IN nation": lambda rows: len(rows) == 3,
            "SHOW FUNCTIONS LIKE 'array*'": lambda rows: len(rows) > 5,
            "SHOW CREATE TABLE show_family_t": lambda rows: "CREATE TABLE"
            in rows[0]["createtab_stmt"],
            "SHOW VIEWS": lambda rows: any(
                r["viewName"] == "nation" for r in rows
            ),
            "DESCRIBE FUNCTION abs": lambda rows: any(
                "abs" in str(r) for r in rows
            ),
        }
        for q, check in cases.items():
            rows = execute_query(spark, q, EngineConfig()).rows
            assert check(rows), q
    finally:
        spark.sql("DROP TABLE IF EXISTS show_family_t")


def test_sketch_reaggregation_accuracy(spark, sf_dir):
    """a20: region-level estimates from UNIONED per-nation sketches must
    track the exact distinct counts (±5%) — the reaggregation must not
    double-count customers that appear under one nation."""
    from mcp_trino_spark import registry

    got = {
        r["n_regionkey"]: r["approx_distinct_customers"]
        for r in registry.queries()["a20_sketch_reaggregate"](
            spark, sf_dir
        ).collect()
    }
    from pyspark.sql import functions as F

    from mcp_trino_spark.sources.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    exact = {
        r["n_regionkey"]: r["n"]
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, got[k], exact[k])


def test_tokenizer_regex_engine_agreement():
    """Review fix: Java, RE2 (DuckDB) and Python \\s disagree on \\x0B
    and Unicode spaces; the shared TOKEN_REGEX spells the class out so
    all three engines tokenize identically on the divergent inputs."""
    import re

    import duckdb

    from mcp_trino_spark.operators.llm_text import TOKEN_REGEX

    con = duckdb.connect()
    for text in ["a\x0bb", "a b", "plain text!", "x,y;z"]:
        py = len(re.findall(TOKEN_REGEX, text))
        duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, TOKEN_REGEX]
        ).fetchone()[0]
        assert py == duck, (text, py, duck)


def test_tokenize_udf_null_text_yields_null(spark, sf_dir):
    """Review fix: NULL text must produce a NULL count, not crash the
    Arrow worker with an int-cast-of-NaN error."""
    from pyspark.sql import Row

    from mcp_trino_spark.operators.llm_multimodal import tokenize_count_udf

    df = spark.createDataFrame(
        [Row(doc_id=1, text="two words"), Row(doc_id=2, text=None)]
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tokenize_count_udf("text").alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: None}


def test_kmeans_embeddings_properties(spark, sf_dir):
    """l11 is rows-only in the driver contract (iterative clustering
    has no SQL oracle) — these are its property checks: total
    assignment, determinism across runs, and clustering QUALITY (each
    vector is closer to its own cluster's centroid than to any other
    centroid — the Lloyd's-iteration invariant at convergence of the
    assignment step)."""
    import numpy as np
    from mcp_trino_spark import registry
    from mcp_trino_spark.sources.catalog import load_table

    fn = registry.queries()["l11_kmeans_embeddings"]
    a1 = {r["vec_id"]: r["cluster"] for r in fn(spark, sf_dir).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in fn(spark, sf_dir).collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # total and deterministic
    assert set(a1) == set(emb)
    assert a1 == a2
    assert set(a1.values()) <= set(range(1, 9))  # clusters are 1-indexed
    # the final assignment is the argmin over the final centroids: each
    # vector's own-cluster centroid is nearest (ties broken low id)
    cents = {
        c: np.mean([emb[v] for v, cl in a1.items() if cl == c], axis=0)
        for c in set(a1.values())
    }
    viol = 0
    for v, cl in a1.items():
        d_own = float(np.linalg.norm(emb[v] - cents[cl]))
        for c, cent in cents.items():
            if c != cl and float(np.linalg.norm(emb[v] - cent)) < d_own - 1e-9:
                viol += 1
                break
    # the operator runs a FIXED 3 iterations (not to convergence), so
    # the last centroid update can strand a few boundary vectors; the
    # invariant must hold for the overwhelming majority
    assert viol <= len(a1) * 0.05, f"{viol}/{len(a1)} misassigned"


def test_statement_form_parity_with_reference_gate(spark, sf_dir):
    """Round-8 statement sweep: forms the reference's own classifier
    rejects (no ^select/show/describe/explain/with prefix —
    client.go:284-291) must reject HERE with the same loud gate, and
    DESCRIBE INPUT/OUTPUT (which passes the prefix scan but can never
    be meaningful without PREPARE) gets a named error, not Spark's
    confusing table-not-found."""
    from mcp_trino_spark.execute import WriteQueryNotAllowed, execute_query
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import TrinoCompatError

    register_tables(spark, sf_dir)
    for q in (
        "SET SESSION query_max_run_time = '2h'",
        "USE default",
        "PREPARE q1 FROM SELECT 1",
        "EXECUTE q1 USING 3",
        "DEALLOCATE PREPARE q1",
        "VALUES (1, 'a')",
        "COMMENT ON TABLE nation IS 'x'",
    ):
        with pytest.raises(WriteQueryNotAllowed):
            execute_query(spark, q, dialect="trino")
    with pytest.raises(TrinoCompatError, match="PREPARE"):
        execute_query(spark, "DESCRIBE INPUT q1", dialect="trino")
    # the read-only SHOW family all serve
    for q in ("SHOW TABLES", "SHOW SCHEMAS", "SHOW CATALOGS",
              "SHOW COLUMNS FROM nation", "SHOW FUNCTIONS"):
        assert execute_query(spark, q, dialect="trino").rows


def test_column_types_cache_fingerprint_and_invalidation(spark):
    """The round-11 column-type map cache (round-12 fingerprint): warm
    hits return the cached map, a view appearing changes the listing
    and rebuilds, an IN-PLACE createOrReplaceTempView schema swap —
    listing unchanged, the r11 staleness hazard — changes the
    temp-view-schema half of the fingerprint and rebuilds, and the
    explicit invalidation hook (wired to every non-read-only query and
    to register_tables) forces a rebuild."""
    from mcp_trino_spark.execute import (
        _catalog_column_types,
        invalidate_column_types_cache,
    )

    spark.createDataFrame([(1,)], "ctc_x int").createOrReplaceTempView("ctc_t")
    try:
        m1 = _catalog_column_types(spark)
        assert m1.get("ctc_x") == "int"
        assert _catalog_column_types(spark) is m1  # warm hit, same object
        spark.createDataFrame(
            [(1.5,)], "ctc_y double"
        ).createOrReplaceTempView("ctc_t2")
        m2 = _catalog_column_types(spark)  # fingerprint changed
        assert m2 is not m1 and m2.get("ctc_y") == "double"
        # in-place schema replacement under an UNCHANGED listing: app-
        # level DDL the façade write hook never sees — a stale map here
        # changes query values (cast rounding, decimal-division scale)
        spark.createDataFrame(
            [(2.5,)], "ctc_x double"
        ).createOrReplaceTempView("ctc_t")
        m2b = _catalog_column_types(spark)
        assert m2b is not m2 and m2b.get("ctc_x") == "double"
        invalidate_column_types_cache(spark)
        m3 = _catalog_column_types(spark)
        assert m3 is not m2b and m3 == m2b
    finally:
        spark.catalog.dropTempView("ctc_t")
        spark.catalog.dropTempView("ctc_t2")


def test_concurrent_execute_query_threads(spark):
    """Façade thread-safety smoke (ADVICE r11: the translate deadline
    was a shared stack that concurrent requests popped across): four
    threads drive dialect-translated queries through execute_query
    concurrently; every result must be correct and no translation
    budget may fire spuriously."""
    import threading

    from mcp_trino_spark.execute import execute_query

    errors = []

    def work(tid):
        try:
            for i in range(8):
                res = execute_query(
                    spark,
                    f"SELECT {tid} AS tid, {i} / 1 AS i,"
                    " upper('straße') AS u, arr[1] AS e"
                    " FROM (VALUES (ARRAY[7, 8])) AS t(arr)",
                    dialect="trino",
                )
                (row,) = res.rows
                assert row["tid"] == tid and row["i"] == i
                assert row["u"] == "STRAßE" and row["e"] == 7
        except Exception as exc:  # noqa: BLE001 — surfaced in the main thread
            errors.append((tid, exc))

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_table_plan_cache_skips_directory_tables(spark, tmp_path):
    """ADVICE r15: a directory-of-parquet table has no reliable cheap
    fingerprint (rewriting a nested part file in place changes neither
    the dir's mtime_ns nor size), so load_table must NOT memoize its
    plan — every call re-lists.  Regular files keep the cache."""
    import shutil

    from mcp_trino_spark.sources.catalog import (
        _path_fingerprint,
        load_table,
        table_path,
    )

    sf = str(tmp_path)
    # a directory table: nation.parquet as a DIRECTORY of one file
    dir_table = table_path(sf, "nation")
    spark.createDataFrame([(1, "a")], "n_nationkey int, n_name string") \
        .write.mode("overwrite").parquet(dir_table)
    assert _path_fingerprint(dir_table) is None
    d1 = load_table(spark, sf, "nation")
    d2 = load_table(spark, sf, "nation")
    assert d1 is not d2  # no plan memo for directories
    # a regular-file table still caches
    shutil.copyfile(
        "/root/testdata/sf0.001/region.parquet", table_path(sf, "region")
    )
    r1 = load_table(spark, sf, "region")
    r2 = load_table(spark, sf, "region")
    assert r1 is r2


def test_analyzed_sql_cache_repoints_across_scale_factors(spark):
    """The r16 analyzed-plan cache (catalog.analyzed_sql) keyed on
    translated text + resolved FILE fingerprints: re-pointing the temp
    views at another scale factor (identical schemas, different files
    — the documented trap) must MISS and serve that SF's data, and
    returning to the first SF must serve the first SF's rows again."""
    from mcp_trino_spark import registry

    qs = registry.queries()
    fn = qs["x64_stat_agg_edge_contracts"]
    rows_small_1 = sorted(map(str, fn(spark, "/root/testdata/sf0.001").collect()))
    rows_big = sorted(map(str, fn(spark, "/root/testdata/sf0.01").collect()))
    rows_small_2 = sorted(map(str, fn(spark, "/root/testdata/sf0.001").collect()))
    assert rows_small_1 == rows_small_2
    assert rows_big != rows_small_1  # the probe is sensitive to the SF


def test_analyzed_sql_memoizes_and_invalidates_on_file_change(spark, tmp_path):
    """Identity on a warm hit; a file touch (new mtime) evicts."""
    import os
    import shutil

    from mcp_trino_spark.sources.catalog import analyzed_sql, register_tables

    sf = str(tmp_path)
    for t in ("region", "nation"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet"
        )
    register_tables(spark, sf)
    q = "SELECT count(*) AS n FROM region"
    d1 = analyzed_sql(spark, sf, q)
    d2 = analyzed_sql(spark, sf, q)
    assert d1 is d2
    os.utime(f"{sf}/region.parquet")  # fingerprint changes
    d3 = analyzed_sql(spark, sf, q)
    assert d3 is not d1
