"""Trino-dialect compatibility: a reference user's Trino SQL runs
unchanged through execute_query(dialect='trino')."""

from __future__ import annotations

import datetime

import pytest

from mcp_trino_spark.config import EngineConfig
from mcp_trino_spark.execute import execute_query
from mcp_trino_spark.sources.catalog import register_tables
from mcp_trino_spark.trino_compat import translate

SF_DIR = "/root/testdata/sf0.001"


# --- pure rewrites ----------------------------------------------------------


def test_renames_aggregates_and_signatures():
    assert (
        translate("SELECT approx_distinct(x), approx_percentile(x, 0.5) FROM t")
        == "SELECT approx_count_distinct(x), percentile_approx(x, 0.5) FROM t"
    )
    assert (
        translate("SELECT date_add('day', 3, d), date_diff('hour', a, b) FROM t")
        == "SELECT timestampadd(day, 3, d), timestampdiff(hour, a, b) FROM t"
    )


def test_rewrite_skips_literals_and_comments():
    q = "SELECT 'approx_distinct(x)', \"arbitrary\" -- approx_distinct(y)\nFROM t /* date_add('day',1,d) */"
    assert translate(q) == q


def test_case_insensitive():
    assert translate("SELECT APPROX_DISTINCT(x) FROM t") == "SELECT approx_count_distinct(x) FROM t"


# --- end-to-end through execute_query --------------------------------------


@pytest.fixture(scope="module", autouse=True)
def _tables(spark):
    register_tables(spark, SF_DIR)


def run(spark, q):
    return execute_query(spark, q, EngineConfig(), dialect="trino").rows


def test_trino_date_arithmetic(spark):
    rows = run(
        spark,
        "SELECT date_add('day', 7, DATE '2026-01-01') AS d, "
        "date_diff('day', DATE '2026-01-01', DATE '2026-02-01') AS n",
    )
    assert rows[0]["d"] == datetime.datetime(2026, 1, 8)
    assert rows[0]["n"] == 31


def test_trino_scalar_functions(spark):
    rows = run(
        spark,
        "SELECT strpos('hello', 'll') AS p, "
        "day_of_week(TIMESTAMP '2026-08-13 12:00:00') AS dow, "
        "json_extract_scalar('{\"k\": 42}', '$.k') AS j",
    )
    assert rows[0]["p"] == 3
    assert rows[0]["dow"] == 4  # 2026-08-13 is a Thursday; ISO Mon=1
    assert rows[0]["j"] == "42"


def test_trino_truncate_function_rejected_by_gate_like_reference(spark):
    """TRUNCATE is a write keyword in the reference's classifier
    (client.go:306-310), so `SELECT truncate(x)` is rejected THERE too —
    gate parity.  The compat function still works below the gate."""
    from mcp_trino_spark.execute import WriteQueryNotAllowed
    from mcp_trino_spark.trino_compat import install_compat_functions

    with pytest.raises(WriteQueryNotAllowed):
        run(spark, "SELECT truncate(-3.7) AS tr")
    install_compat_functions(spark)
    assert spark.sql("SELECT truncate(-3.7) AS tr").collect()[0]["tr"] == -3.0


def test_trino_aggregate_over_testdata(spark):
    rows = run(
        spark,
        "SELECT approx_distinct(c_nationkey) AS n FROM customer",
    )
    assert rows[0]["n"] == pytest.approx(25, abs=3)


def test_trino_query_still_gated(spark):
    from mcp_trino_spark.execute import WriteQueryNotAllowed

    with pytest.raises(WriteQueryNotAllowed):
        run(spark, "DROP TABLE customer")


def test_spark_dialect_untouched(spark):
    # default dialect must NOT rewrite: Spark's own 2-arg date_add works
    res = execute_query(
        spark, "SELECT date_add(DATE '2026-01-01', 3) AS d", EngineConfig()
    )
    assert res.rows[0]["d"] == datetime.date(2026, 1, 4)


def test_unnest_rewrite():
    q = "SELECT d.doc_id, t.w FROM documents d CROSS JOIN UNNEST(split(d.text, ' ')) AS t(w)"
    # the split delimiter also gets Trino-literal escaping ('\\ ' in the
    # SQL literal = regex `\ ` = a literal space)
    assert (
        translate(q)
        == "SELECT d.doc_id, t.w FROM documents d LATERAL VIEW "
        "explode(split(d.text, '\\\\ ')) t AS w"
    )
    # inside a literal: untouched
    lit = "SELECT 'CROSS JOIN UNNEST(x) AS t(c)' AS s"
    assert translate(lit) == lit
    # WITH ORDINALITY: rewritten to a LATERAL posexplode subquery (1-based)
    qo = "SELECT * FROM t CROSS JOIN UNNEST(arr) WITH ORDINALITY AS u(c, i)"
    assert (
        translate(qo)
        == "SELECT * FROM t JOIN LATERAL (SELECT col AS c, pos + 1 AS i "
        "FROM posexplode(arr)) u"
    )


def test_unnest_end_to_end(spark):
    rows = run(
        spark,
        "SELECT COUNT(*) AS n FROM ("
        "  SELECT d.doc_id, t.w FROM documents d"
        "  CROSS JOIN UNNEST(split(d.text, ' ')) AS t(w)"
        ") WHERE length(w) > 0",
    )
    assert rows[0]["n"] > 0


def test_show_from_and_fetch_first():
    assert translate("SHOW SCHEMAS FROM spark_catalog") == "SHOW SCHEMAS IN spark_catalog"
    assert (
        translate("SELECT * FROM t ORDER BY x FETCH FIRST 5 ROWS ONLY")
        == "SELECT * FROM t ORDER BY x NULLS LAST LIMIT 5"
    )


def test_show_and_fetch_end_to_end(spark):
    rows = run(spark, "SHOW SCHEMAS FROM spark_catalog")
    assert any("default" in str(r.values()) for r in rows)
    rows = run(
        spark,
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey FETCH FIRST 3 ROWS ONLY",
    )
    assert [r["n_nationkey"] for r in rows] == [0, 1, 2]


def test_reduce_and_levenshtein(spark):
    rows = run(
        spark,
        "SELECT reduce(sequence(1, 4), 0, (s, x) -> s + x, s -> s) AS total, "
        "levenshtein_distance('kitten', 'sitting') AS lev",
    )
    assert rows[0]["total"] == 10
    assert rows[0]["lev"] == 3


def test_bare_varchar_char_casts(spark):
    rows = run(
        spark,
        "SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer ORDER BY c_custkey LIMIT 1",
    )
    assert rows[0]["k"] == "0"
    # sized VARCHAR(n) passes through untouched
    assert translate("CAST(x AS VARCHAR(10))") == "CAST(x AS VARCHAR(10))"
    # bare CHAR is NOT rewritten (Trino means CHAR(1)); it fails
    # analysis loudly instead of silently returning the full string
    assert "AS CHAR)" in translate("SELECT CAST(x AS CHAR) FROM t")
    with pytest.raises(Exception):
        run(spark, "SELECT CAST(c_mktsegment AS CHAR) AS seg FROM customer LIMIT 1")


# --- round-2 dialect additions: try(), WITH ORDINALITY, Joda tokens,
# contains() -----------------------------------------------------------------


def test_try_rewrites():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    assert translate("SELECT try(a / b)") == "SELECT try_divide(a, b)"
    assert translate("SELECT try(CAST(x AS INT))") == "SELECT try_cast(x AS INT)"
    assert translate("SELECT try(element_at(arr, 5))") == "SELECT try_element_at(arr, 5)"
    assert (
        translate("SELECT try(x + 1) + try(y - 2)")
        == "SELECT try_add(x, 1) + try_subtract(y, 2)"
    )
    # unary minus is not a split point
    assert translate("SELECT try(-x / y)") == "SELECT try_divide(-x, y)"
    # literals containing try( are untouched
    assert translate("SELECT 'try(a/b)'") == "SELECT 'try(a/b)'"
    with pytest.raises(TrinoCompatError):
        translate("SELECT try(json_parse(x))")


def test_try_end_to_end(spark):
    rows = run(
        spark,
        "SELECT try(1 / 0) AS a, try(CAST('nope' AS INTEGER)) AS b, "
        "try(2 + 2) AS c, try(element_at(ARRAY(1, 2), 99)) AS d",
    )
    assert rows[0] == {"a": None, "b": None, "c": 4, "d": None}


def test_with_ordinality_rewrite():
    q = translate(
        "SELECT t.w, t.nr FROM documents CROSS JOIN "
        "UNNEST(split(text, ' ')) WITH ORDINALITY AS t(w, nr)"
    )
    assert "JOIN LATERAL" in q and "posexplode" in q and "pos + 1 AS nr" in q


def test_with_ordinality_end_to_end(spark):
    rows = run(
        spark,
        "SELECT t.w, t.nr FROM (SELECT 'a b c' AS s) v "
        "CROSS JOIN UNNEST(split(v.s, ' ')) WITH ORDINALITY AS t(w, nr) "
        "ORDER BY t.nr",
    )
    assert rows == [
        {"w": "a", "nr": 1},
        {"w": "b", "nr": 2},
        {"w": "c", "nr": 3},
    ]


def test_format_datetime_joda_tokens(spark):
    # Joda YYYY = year-of-era; Spark YYYY = week-based-year.  2027-01-01
    # falls in ISO week-year 2026 — the untranslated pattern would print
    # 2026 for Joda's 2027.
    rows = run(
        spark,
        "SELECT format_datetime(TIMESTAMP '2027-01-01 10:30:00', "
        "'YYYY-MM-dd HH:mm') AS s",
    )
    assert rows[0]["s"] == "2027-01-01 10:30"


def test_format_datetime_rejects_untranslatable():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError):
        translate("SELECT format_datetime(ts, 'e')")  # Joda day-of-week number
    with pytest.raises(TrinoCompatError):
        translate("SELECT format_datetime(ts, some_col)")  # non-literal pattern


def test_contains_end_to_end(spark):
    rows = run(spark, "SELECT contains(ARRAY(1, 2, 3), 2) AS a, "
                      "contains(ARRAY(1, 2, 3), 9) AS b")
    assert rows[0] == {"a": True, "b": False}


def test_split_literal_delimiter(spark):
    """Trino split() is literal; Spark's is regex — '.' must not split
    on every character."""
    rows = run(spark, "SELECT split('a.b.c', '.') AS x, split('a b', ' ') AS y")
    assert rows[0]["x"] == ["a", "b", "c"]
    assert rows[0]["y"] == ["a", "b"]
    # nested split calls both get escaped; subscripts are Trino
    # 1-based ([2] = the second element, via element_at)
    rows = run(spark, "SELECT split(split('a.b|c.d', '|')[2], '.') AS x")
    assert rows[0]["x"] == ["c", "d"]
    rows = run(spark, "SELECT split(split('a.b|c.d', '|')[1], '.') AS x")
    assert rows[0]["x"] == ["a", "b"]
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError):
        translate("SELECT split(s, some_col) FROM t")  # non-literal delim


def test_parse_datetime_and_iso8601(spark):
    rows = run(
        spark,
        "SELECT parse_datetime('2027/01/05 08:30', 'YYYY/MM/dd HH:mm') AS t, "
        "to_iso8601(TIMESTAMP '2026-03-04 05:06:07.890') AS s",
    )
    assert rows[0]["t"] == datetime.datetime(2027, 1, 5, 8, 30)
    assert rows[0]["s"] == "2026-03-04T05:06:07.890"


def test_map_agg_and_json_roundtrip(spark):
    rows = run(
        spark,
        "SELECT map_agg(k, v) AS m FROM (VALUES (1, 'a'), (2, 'b')) AS t(k, v)",
    )
    assert rows[0]["m"] == {1: "a", 2: "b"}
    rows = run(
        spark,
        "SELECT json_extract_scalar(json_parse('{\"k\": 5}'), '$.k') AS x, "
        "json_format(json_parse('[1,2]')) AS y",
    )
    assert rows[0] == {"x": "5", "y": "[1,2]"}


def test_nan_infinity(spark):
    rows = run(spark, "SELECT is_nan(nan()) AS a, infinity() AS b")
    assert rows[0]["a"] is True
    assert rows[0]["b"] == float("inf")


def test_batch3_renames():
    assert (
        translate("SELECT any_match(a, x -> x > 1), all_match(a, x -> x > 1) FROM t")
        == "SELECT exists(a, x -> x > 1), forall(a, x -> x > 1) FROM t"
    )
    assert (
        translate("SELECT format('%s=%d', k, v), repeat(k, 3) FROM t")
        == "SELECT format_string('%s=%d', k, v), array_repeat(k, 3) FROM t"
    )
    # format_datetime / json_format must NOT be caught by the format() rename
    assert "format_string" not in translate("SELECT format_datetime(d, 'yyyy') FROM t")
    assert "format_string" not in translate("SELECT json_format(j) FROM t")


def test_batch3_end_to_end(spark):
    rows = run(
        spark,
        "SELECT any_match(ARRAY[1, 5], x -> x > 4) AS a,"
        " all_match(ARRAY[1, 5], x -> x > 0) AS b,"
        " format('%s-%d', 'v', 7) AS c,"
        " repeat(2, 3) AS d,"
        " codepoint('A') AS e,"
        " last_day_of_month(TIMESTAMP '2024-02-05 10:00:00') AS f,"
        " split_to_map('a=1,b=2', ',', '=') AS g,"
        " regexp_split('a1b2c', '[0-9]') AS h",
    )
    r = rows[0]
    assert r["a"] is True and r["b"] is True
    assert r["c"] == "v-7"
    assert r["d"] == [2, 2, 2]
    assert r["e"] == 65
    assert str(r["f"]) == "2024-02-29"
    assert r["g"] == {"a": "1", "b": "2"}
    assert r["h"] == ["a", "b", "c"]


def test_batch3_time_and_binary(spark):
    rows = run(
        spark,
        "SELECT from_unixtime(0) AS t0,"
        " at_timezone(TIMESTAMP '2024-01-01 00:00:00', 'America/New_York') AS tz,"
        " to_base(255, 16) AS tb, from_base('ff', 16) AS fb,"
        " to_hex(sha256(CAST('' AS VARBINARY))) AS sh,"
        " year_of_week(TIMESTAMP '2024-12-30 00:00:00') AS yw,"
        " millisecond(TIMESTAMP '2024-01-01 00:00:00.123') AS ms,"
        " hamming_distance('abcde', 'abzde') AS hd",
    )
    r = rows[0]
    assert str(r["t0"]) == "1970-01-01 00:00:00"
    assert str(r["tz"]).startswith("2023-12-31 19:00:00")
    assert r["tb"] == "ff" and r["fb"] == 255
    # sha256 of empty input, uppercase hex (Trino to_hex is uppercase)
    assert r["sh"] == "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855"
    assert r["yw"] == 2025  # ISO week-year: 2024-12-30 is week 1 of 2025
    assert r["ms"] == 123
    assert r["hd"] == 1


def test_hamming_distance_unequal_lengths_errors(spark):
    with pytest.raises(Exception, match="different lengths"):
        run(spark, "SELECT hamming_distance('ab', 'abc') AS x")


def test_bitwise_aggs_end_to_end(spark):
    rows = run(
        spark,
        "SELECT bitwise_and_agg(v) AS a, bitwise_or_agg(v) AS o"
        " FROM (VALUES (12), (10)) AS t(v)",
    )
    assert rows[0] == {"a": 8, "o": 14}


def test_array_literal_rewrite():
    assert translate("SELECT ARRAY[1, 2, 3] FROM t") == "SELECT array(1, 2, 3) FROM t"
    assert (
        translate("SELECT ARRAY[ARRAY[1], ARRAY[2, x[1]]] FROM t")
        == "SELECT array(array(1), array(2, element_at(x, 1))) FROM t"
    )
    # inside literals/comments: untouched
    q = "SELECT 'ARRAY[1]' -- ARRAY[2]\nFROM t"
    assert translate(q) == q


def test_varbinary_type_rewrite(spark):
    rows = run(spark, "SELECT length(CAST('ab' AS VARBINARY)) AS n")
    assert rows[0]["n"] == 2


def test_tablesample_rewrite_and_execution(spark):
    assert (
        translate("SELECT * FROM t TABLESAMPLE BERNOULLI(10)")
        == "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    )
    register_tables(spark, SF_DIR)
    rows = run(spark, "SELECT COUNT(*) AS n FROM (SELECT * FROM nation TABLESAMPLE SYSTEM(100))")
    assert rows[0]["n"] == 25  # 100% sample keeps everything


def test_try_compound_body_guards_both_sides():
    # greedy CAST regex must not swallow `CAST(..) + CAST(..)` as one
    got = translate("SELECT try(CAST(a AS INT) + CAST(b AS INT)) FROM t")
    assert got == "SELECT try_add(try_cast(a AS INT), try_cast(b AS INT)) FROM t"


def test_try_compound_end_to_end(spark):
    rows = run(
        spark,
        "SELECT try(CAST(a AS INT) + CAST(b AS INT)) AS x"
        " FROM (VALUES ('1', '2'), ('1', 'oops')) AS t(a, b)",
    )
    assert sorted((r["x"] is None, r["x"]) for r in rows) == [(False, 3), (True, None)]


def test_escape_free_literals_respelled():
    # Trino literals are escape-free: the pre-pass re-spells them for
    # Spark's lexer so the engine sees the same string VALUE, and no
    # rename pass edits inside them
    q = "SELECT contains(a, x), 'don''t repeat(y)' FROM t"
    got = translate(q)
    assert "array_repeat" not in got
    assert "don''t repeat(y)" in got
    assert got.startswith("SELECT array_contains(a, x)")
    # a backslash in a Trino literal is an ordinary char — doubled so
    # Spark reads the identical value (the old "write '\\d'" gap)
    assert translate(r"SELECT regexp_like(s, '\d+') FROM t") == (
        r"SELECT regexp_like(s, '\\d+') FROM t"
    )
    assert translate(r"SELECT x FROM t WHERE s LIKE 'a\%' ESCAPE '\'") == (
        r"SELECT x FROM t WHERE s LIKE 'a\\%' ESCAPE '\\'"
    )
    # '' doubling is preserved verbatim; comments/identifiers untouched
    assert translate("SELECT 'it''s \\a' FROM `t\\x`") == (
        "SELECT 'it''s \\\\a' FROM `t\\x`"
    )
    assert translate("SELECT 1 -- don't \\d\nFROM t") == (
        "SELECT 1 -- don't \\d\nFROM t"
    )
    # U&'...' literals and their UESCAPE clause are the decoder's to
    # re-escape — the pre-pass must not double their decode-time escapes
    assert translate(r"SELECT U&'a\0041' FROM t") == "SELECT 'aA' FROM t"
    assert translate(r"SELECT U&'a\' UESCAPE '#' FROM t") == r"SELECT 'a\\' FROM t"


def test_escape_free_literals_loud_errors():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    # Spark's backslash lexing would read both of these with SHIFTED
    # literal boundaries (the gate lexes with Spark rules) — they are
    # syntax errors in Trino and must fail loudly here, not run
    # differently
    with pytest.raises(TrinoCompatError, match="unterminated string"):
        # Trino: literal `don` + code `t repeat...` + unterminated tail
        translate("SELECT 'don\\'t repeat(y)' FROM t")
    with pytest.raises(TrinoCompatError, match="multiple SQL statements"):
        translate("SELECT 'a\\' || x FROM t; DROP TABLE t --'")
    # trailing semicolon alone is fine
    assert translate("SELECT 1;  \n") == "SELECT 1;  \n"


def test_map_constructor_rewrite(spark):
    assert (
        translate("SELECT MAP(ARRAY['a','b'], ARRAY[1,2]) FROM t")
        == "SELECT map_from_arrays(array('a','b'), array(1,2)) FROM t"
    )
    # empty MAP() stays Spark's map(); CAST type position untouched
    assert translate("SELECT MAP() FROM t") == "SELECT MAP() FROM t"
    assert "map_from_arrays" not in translate("SELECT CAST(m AS MAP(VARCHAR, INT)) FROM t")
    rows = run(spark, "SELECT MAP(ARRAY['a','b'], ARRAY[1,2]) AS m")
    assert rows[0]["m"] == {"a": 1, "b": 2}


def test_array_literal_subscript_is_one_based(spark):
    assert (
        translate("SELECT ARRAY[10, 20][1] FROM t")
        == "SELECT element_at(array(10, 20), 1) FROM t"
    )
    rows = run(spark, "SELECT ARRAY[10, 20][1] AS x")
    assert rows[0]["x"] == 10  # Trino semantics: 1-based


# --- dialect batch 4: CAST types, chr, bitwise, cosine, normalize ----------


def test_cast_type_constructors(spark):
    assert (
        translate("SELECT CAST(x AS ARRAY(BIGINT)) FROM t")
        == "SELECT CAST(x AS ARRAY<BIGINT>) FROM t"
    )
    assert (
        translate("SELECT CAST(m AS MAP(VARCHAR, BIGINT)) FROM t")
        == "SELECT CAST(m AS MAP<STRING, BIGINT>) FROM t"
    )
    # recursive + ROW → STRUCT with name: type
    assert (
        translate("SELECT CAST(r AS ROW(a BIGINT, b ARRAY(VARCHAR))) FROM t")
        == "SELECT CAST(r AS STRUCT<a: BIGINT, b: ARRAY<STRING>>) FROM t"
    )
    # parameterized scalars untouched; literals untouched
    assert "DECIMAL(10,2)" in translate("SELECT CAST(x AS DECIMAL(10,2)) FROM t")
    assert "'CAST(x AS ARRAY(INT))'" in translate(
        "SELECT 'CAST(x AS ARRAY(INT))' FROM t"
    )
    rows = run(spark, "SELECT CAST(ROW(1,'x') AS ROW(a BIGINT, b VARCHAR)).a AS r")
    assert rows[0]["r"] == 1
    rows = run(spark, "SELECT CAST(MAP(ARRAY['a'], ARRAY[1]) AS MAP(VARCHAR, BIGINT)) AS r")
    assert rows[0]["r"] == {"a": 1}


def test_chr_true_codepoint(spark):
    # Spark's builtin chr wraps at 256 (chr(955) = '»') — silent wrong
    # answer; the dialect must route to the true-codepoint UDF
    rows = run(spark, "SELECT chr(955) AS hi, chr(65) AS lo")
    assert rows[0] == {"hi": "λ", "lo": "A"}


def test_bitwise_functions(spark):
    rows = run(
        spark,
        "SELECT bitwise_and(5,3) AS a, bitwise_or(5,3) AS o,"
        " bitwise_xor(5,3) AS x, bitwise_not(5) AS n,"
        " bitwise_left_shift(1,4) AS l,"
        " bitwise_right_shift(-8, 1) AS rs,"
        " bitwise_right_shift_arithmetic(-8, 1) AS ra",
    )
    assert rows[0] == {"a": 1, "o": 7, "x": 6, "n": -6, "l": 16,
                       "rs": 9223372036854775804, "ra": -4}


def test_cosine_similarity_sparse_maps(spark):
    rows = run(
        spark,
        "SELECT round(cosine_similarity(MAP(ARRAY['a','b'], ARRAY[1.0,2.0]),"
        " MAP(ARRAY['a','c'], ARRAY[2.0,1.0])), 2) AS r",
    )
    assert rows[0]["r"] == 0.4  # dot=2, |a|=|b|=sqrt(5)


def test_normalize_forms(spark):
    rows = run(spark, "SELECT normalize('á') AS nfc")
    assert rows[0]["nfc"] == "á"
    rows = run(spark, "SELECT normalize('á', NFD) AS nfd")
    assert rows[0]["nfd"] == "á"
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="normalize"):
        translate("SELECT normalize(s, BOGUS) FROM t")


def test_from_unixtime_zone_form(spark):
    assert (
        translate("SELECT from_unixtime(0, 'UTC') FROM t")
        == "SELECT from_utc_timestamp(timestamp_seconds(0), 'UTC') FROM t"
    )
    rows = run(spark, "SELECT from_unixtime(0, 'America/New_York') AS r")
    assert rows[0]["r"] == datetime.datetime(1969, 12, 31, 19, 0)
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="offset form"):
        translate("SELECT from_unixtime(0, 5, 30) FROM t")


def test_row_constructor(spark):
    rows = run(spark, "SELECT ROW(1, 'don''t (x)') AS r")
    assert rows[0]["r"] == {"col1": 1, "col2": "don't (x)"}


# --- dialect batch 5: aggregate compositions, date_parse, ngrams -----------


def test_geometric_mean(spark):
    rows = run(spark, "SELECT round(geometric_mean(x), 6) AS r"
                      " FROM (VALUES (1.0), (2.0), (4.0)) t(x)")
    assert rows[0]["r"] == 2.0


def test_checksum_order_independent(spark):
    rows = run(
        spark,
        "SELECT (SELECT checksum(x) FROM (VALUES (1), (2), (3)) a(x))"
        " = (SELECT checksum(x) FROM (VALUES (3), (1), (2)) b(x)) AS r",
    )
    assert rows[0]["r"] is True


def test_histogram_and_multimap_agg(spark):
    V = " FROM (VALUES (1.0, 'a'), (2.0, 'b'), (4.0, 'a')) t(x, k)"
    rows = run(spark, "SELECT histogram(k) AS r" + V)
    assert rows[0]["r"] == {"a": 2, "b": 1}
    rows = run(spark, "SELECT multimap_agg(k, CAST(x AS DOUBLE)) AS r" + V)
    assert rows[0]["r"] == {"a": [1.0, 4.0], "b": [2.0]}
    # generated lambda vars must not capture same-named user columns
    rows = run(spark, "SELECT histogram(e) AS r FROM (VALUES ('z'), ('z')) t(e)")
    assert rows[0]["r"] == {"z": 2}


def test_min_max_by_topn(spark):
    V = " FROM (VALUES (1.0, 'a'), (2.0, 'b'), (4.0, 'c')) t(x, k)"
    rows = run(spark, "SELECT max_by(k, x, 2) AS r" + V)
    assert rows[0]["r"] == ["c", "b"]
    rows = run(spark, "SELECT min_by(k, x, 2) AS r" + V)
    assert rows[0]["r"] == ["a", "b"]
    # 2-arg stays native
    rows = run(spark, "SELECT max_by(k, x) AS r" + V)
    assert rows[0]["r"] == "c"


def test_ngrams_and_bit_count(spark):
    rows = run(spark, "SELECT ngrams(ARRAY['a','b','c'], 2) AS r")
    assert rows[0]["r"] == [["a", "b"], ["b", "c"]]
    rows = run(spark, "SELECT ngrams(ARRAY['a'], 3) AS r")
    assert rows[0]["r"] == [["a"]]
    rows = run(spark, "SELECT bit_count(7, 64) AS r")
    assert rows[0]["r"] == 3
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="bit width"):
        translate("SELECT bit_count(x, 32) FROM t")


def test_date_parse_mysql_tokens(spark):
    # parse direction uses the LENIENT (unpadded) token map: Java 'mm'
    # requires exactly two digits on parse where MySQL %i takes 1-2
    assert (
        translate("SELECT date_parse(s, '%Y-%m-%d %H:%i:%s') FROM t")
        == "SELECT to_timestamp(s, 'yyyy-M-d H:m:s') FROM t"
    )
    rows = run(spark, "SELECT date_parse('2024-01-02 03:04:05', '%Y-%m-%d %H:%i:%s') AS r")
    assert rows[0]["r"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="token"):
        translate("SELECT date_parse(s, '%Q') FROM t")


def test_starts_with_rename(spark):
    rows = run(spark, "SELECT starts_with('hello', 'he') AS r")
    assert rows[0]["r"] is True


# --- dialect batch 6: typed literals, AT TIME ZONE, epoch, array_agg -------


def test_decimal_typed_literal(spark):
    import decimal
    assert (
        translate("SELECT DECIMAL '1.23' FROM t")
        == "SELECT CAST('1.23' AS DECIMAL(3,2)) FROM t"
    )
    rows = run(spark, "SELECT DECIMAL '-45' AS r")
    assert rows[0]["r"] == decimal.Decimal("-45")
    # inside a string literal: untouched
    assert "DECIMAL ''1.2''" in translate("SELECT 'DECIMAL ''1.2''' FROM t")


def test_at_time_zone_operator(spark):
    rows = run(
        spark,
        "SELECT TIMESTAMP '2024-01-01 12:00:00' AT TIME ZONE"
        " 'America/New_York' AS r",
    )
    assert rows[0]["r"] == datetime.datetime(2024, 1, 1, 7, 0)
    # parenthesized-call operand
    assert "from_utc_timestamp(from_iso8601_timestamp('x'), 'UTC')" in translate(
        "SELECT from_iso8601_timestamp('x') AT TIME ZONE 'UTC' FROM t"
    )


def test_extract_epoch(spark):
    rows = run(
        spark,
        "SELECT extract(epoch FROM TIMESTAMP '2024-01-01 00:00:10.5') AS r",
    )
    assert rows[0]["r"] == 1704067210.5


def test_regexp_extract_all_two_arg(spark):
    rows = run(spark, "SELECT regexp_extract_all('a1b22', '[0-9]+') AS r")
    assert rows[0]["r"] == ["1", "22"]


def test_array_agg_order_by(spark):
    rows = run(
        spark,
        "SELECT array_agg(x ORDER BY x DESC) AS r FROM (VALUES (1),(3),(2)) t(x)",
    )
    assert rows[0]["r"] == [3, 2, 1]
    # plain array_agg untouched
    rows = run(spark, "SELECT size(array_agg(x)) AS r FROM (VALUES (1),(3)) t(x)")
    assert rows[0]["r"] == 2


def test_utf8_json_array_udfs(spark):
    rows = run(
        spark,
        "SELECT from_utf8(to_utf8('héllo')) AS s,"
        " json_size('{\"a\":[1,2]}', '$.a') AS jsz,"
        " json_array_get('[10,20]', 1) AS jag,"
        " array_sum(ARRAY[1.0, 2.0, NULL]) AS asum,"
        " array_average(ARRAY[1.0, 3.0, NULL]) AS aavg,"
        " regexp_position('ab1', '[0-9]') AS rpos,"
        " regexp_position('ab', '[0-9]') AS rmiss",
    )
    assert rows[0] == {"s": "héllo", "jsz": 2, "jag": "20", "asum": 3.0,
                       "aavg": 2.0, "rpos": 3, "rmiss": -1}


def test_localtimestamp_bare(spark):
    rows = run(spark, "SELECT localtimestamp IS NOT NULL AS r")
    assert rows[0]["r"] is True


# --- review fixes: null ordering, chr range, AT TIME ZONE capture ----------


def test_array_agg_order_by_null_keys_last(spark):
    """Trino default null ordering: ASC → nulls last, DESC → nulls first."""
    V = " FROM (VALUES (1, 10), (NULL, 20), (2, 30)) t(k, x)"
    rows = run(spark, "SELECT array_agg(x ORDER BY k) AS r" + V)
    assert rows[0]["r"] == [10, 30, 20]
    rows = run(spark, "SELECT array_agg(x ORDER BY k DESC) AS r" + V)
    assert rows[0]["r"] == [20, 30, 10]


def test_chr_invalid_codepoints_raise(spark):
    import pytest as _pytest

    for bad in ("-1", "1114112", "55296"):
        with pytest.raises(Exception, match="invalid code point"):
            run(spark, f"SELECT chr({bad}) AS r")


def test_at_time_zone_compound_operands(spark):
    # call-then-field-access must capture the whole chain
    assert (
        translate("SELECT f(x).g AT TIME ZONE 'UTC' FROM t")
        == "SELECT from_utc_timestamp(f(x).g, 'UTC') FROM t"
    )
    # un-capturable operand (CASE ... END) fails loudly, not as garbage SQL
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="parenthesize"):
        translate("SELECT CASE WHEN a THEN b ELSE c END AT TIME ZONE 'UTC' FROM t")
    # ...and the parenthesized form works
    assert "from_utc_timestamp((CASE WHEN a THEN b ELSE c END), 'UTC')" in translate(
        "SELECT (CASE WHEN a THEN b ELSE c END) AT TIME ZONE 'UTC' FROM t"
    )


def test_offset_limit_order_swap(spark):
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (2), (3)) t(i) ORDER BY i OFFSET 1 LIMIT 1",
    )
    assert rows == [{"i": 2}]


def test_with_ties_rewrites_to_threshold_filter(spark):
    # the scale-safe plan: top-n threshold scalar subquery + filter,
    # never a global RANK() window (single-partition at scale)
    q = translate("SELECT i FROM t ORDER BY i FETCH FIRST 2 ROWS WITH TIES")
    assert "LIMIT 2" in q and "__ties_top" in q
    assert "RANK()" not in q.upper()
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (1), (2), (3)) t(i) "
        "ORDER BY i FETCH FIRST 2 ROWS WITH TIES",
    )
    # the 2nd row's peer (the duplicate 1) is kept: WITH TIES semantics
    assert sorted(r["i"] for r in rows) == [1, 1]
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (2), (2), (3)) t(i) "
        "ORDER BY i FETCH FIRST 2 ROWS WITH TIES",
    )
    assert sorted(r["i"] for r in rows) == [1, 2, 2]


def test_with_ties_sort_key_not_in_select_list(spark):
    # valid ANSI: the ties key need not be projected — the rank pushes
    # under the projection for simple bodies
    rows = run(
        spark,
        "SELECT n FROM (VALUES ('a', 1), ('b', 1), ('c', 2), ('d', 3)) t(n, i) "
        "ORDER BY i FETCH FIRST 2 ROWS WITH TIES",
    )
    assert sorted(r["n"] for r in rows) == ["a", "b"]


def test_with_ties_alias_sort_key(spark):
    # the sort key is a select-list ALIAS: the inner rank must use the
    # underlying expression (the alias does not exist under the project)
    rows = run(
        spark,
        "SELECT i * 10 AS tens FROM (VALUES (1), (1), (2), (3)) t(i) "
        "ORDER BY tens FETCH FIRST 2 ROWS WITH TIES",
    )
    assert sorted(r["tens"] for r in rows) == [10, 10]


def test_with_ties_star_body_keeps_schema(spark):
    rows = run(
        spark,
        "SELECT * FROM (VALUES (1, 'x'), (2, 'y'), (2, 'z')) t(i, s) "
        "ORDER BY i DESC FETCH FIRST 1 ROWS WITH TIES",
    )
    # no helper column may leak through SELECT *
    assert sorted(rows[0]) == ["i", "s"]
    assert sorted(r["i"] for r in rows) == [2, 2]


def test_with_ties_window_in_select_list_fetches_last(spark):
    # Trino applies FETCH *after* window functions: COUNT(*) OVER ()
    # must see all 4 rows, not just the fetched ones.  The pushdown
    # path must bail to the wrap form here (filtering the base relation
    # first would make c = 2).
    rows = run(
        spark,
        "SELECT COUNT(*) OVER () AS c, i FROM (VALUES (1), (1), (2), (3)) t(i) "
        "ORDER BY i FETCH FIRST 2 ROWS WITH TIES",
    )
    assert sorted((r["c"], r["i"]) for r in rows) == [(4, 1), (4, 1)]


def test_with_ties_qualified_identifiers(spark):
    # table-alias-qualified select items and sort keys must survive the
    # rewrite (the old outer-projection form lost the alias scope)
    rows = run(
        spark,
        "SELECT c.n FROM (VALUES ('a', 1), ('b', 2), ('c', 2)) c(n, i) "
        "ORDER BY c.i DESC FETCH FIRST 1 ROWS WITH TIES",
    )
    assert sorted(r["n"] for r in rows) == ["b", "c"]


def test_with_ties_null_keys_are_peers(spark):
    # Trino's ASC default is NULLS LAST (made explicit by the round-8
    # null-default pass): the threshold never reaches the NULLs
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (2), (NULL), (NULL)) t(i) "
        "ORDER BY i FETCH FIRST 1 ROWS WITH TIES",
    )
    assert [r["i"] for r in rows] == [1]
    # explicit NULLS FIRST: NULL sort keys are peers — both NULLs rank
    # 1 and FETCH FIRST 1 keeps exactly them
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (2), (NULL), (NULL)) t(i) "
        "ORDER BY i NULLS FIRST FETCH FIRST 1 ROWS WITH TIES",
    )
    assert [r["i"] for r in rows] == [None, None]


def test_with_ties_multikey_mixed_directions(spark):
    rows = run(
        spark,
        "SELECT a, b FROM (VALUES (1, 1), (1, 2), (2, 1), (2, 1), (2, 2)) "
        "t(a, b) ORDER BY a DESC, b ASC FETCH FIRST 2 ROWS WITH TIES",
    )
    assert sorted((r["a"], r["b"]) for r in rows) == [(2, 1), (2, 1)]


def test_with_ties_or_in_where(spark):
    # the appended threshold filter must bind to the WHOLE existing
    # predicate: `WHERE a OR b AND (cond)` parses as `a OR (b AND
    # cond)`, letting rows matching the first disjunct bypass the
    # ties filter — the original predicate must be parenthesized
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (3)) t(i) WHERE i = 3 OR i = 1 "
        "ORDER BY i FETCH FIRST 1 ROWS WITH TIES",
    )
    assert sorted(r["i"] for r in rows) == [1]


def test_with_ties_zero_rows_or_in_where(spark):
    # the n<1 branch has the same precedence hazard: FETCH FIRST 0
    # ROWS must return nothing even when the WHERE has a top-level OR
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (3)) t(i) WHERE i = 3 OR i = 1 "
        "ORDER BY i FETCH FIRST 0 ROWS WITH TIES",
    )
    assert rows == []


def test_with_ties_trailing_line_comment_in_where(spark):
    # a trailing `--` comment on the WHERE predicate must not swallow
    # the generated closing paren / AND (the rewrite emits newlines to
    # terminate the comment before its own tokens)
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (3)) t(i) WHERE i = 3 OR i = 1 -- note\n"
        "ORDER BY i FETCH FIRST 1 ROWS WITH TIES",
    )
    assert sorted(r["i"] for r in rows) == [1]
    # same hazard on the n<1 branch and on a comment-terminated body
    # with no WHERE at all
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (3)) t(i) WHERE i = 3 -- note\n"
        "ORDER BY i FETCH FIRST 0 ROWS WITH TIES",
    )
    assert rows == []
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (3)) t(i) -- note\n"
        "ORDER BY i FETCH FIRST 1 ROWS WITH TIES",
    )
    assert sorted(r["i"] for r in rows) == [1]


def test_with_ties_plans_without_global_window(spark):
    # the 100 TB guarantee: the rewrite must never produce a
    # no-partition WindowExec (every row through one task); the top-n
    # side must be TakeOrderedAndProject
    df = spark.sql(
        translate(
            "SELECT i FROM (VALUES (1), (1), (2), (3)) t(i) "
            "ORDER BY i DESC FETCH FIRST 2 ROWS WITH TIES"
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_groups_frame_select_star_keeps_schema(spark):
    # a bare * must not pick up the injected __grp dense-rank column
    rows = run(
        spark,
        "SELECT *, sum(x) OVER (ORDER BY i GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) AS s FROM (VALUES (1, 10), (1, 20), (2, 5)) t(i, x)",
    )
    assert sorted(rows[0]) == ["i", "s", "x"]
    got = {(r["i"], r["x"], r["s"]) for r in rows}
    assert got == {(1, 10, 30), (1, 20, 30), (2, 5, 35)}


def test_groups_frame_qualified_star_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="qualified star"):
        translate(
            "SELECT e.*, sum(x) OVER (ORDER BY i GROUPS 1 PRECEDING) "
            "FROM events e"
        )


def test_merge_over_digest_sketches_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="qdigest/tdigest"):
        translate("SELECT value_at_quantile(merge(qd), 0.5) FROM t")
    # HLL merge still rewrites
    assert "hll_union_agg" in translate("SELECT merge(h) FROM t")


def test_groups_frame_rewrites_to_range_over_dense_rank(spark):
    q = translate(
        "SELECT sum(x) OVER (ORDER BY i GROUPS BETWEEN 1 PRECEDING"
        " AND CURRENT ROW) AS s FROM t"
    )
    assert "DENSE_RANK() OVER (ORDER BY i NULLS LAST)" in q
    assert "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW" in q
    rows = run(
        spark,
        "SELECT i, sum(x) OVER (ORDER BY i GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) AS s "
        "FROM (VALUES (1, 10), (1, 20), (2, 5), (3, 1)) t(i, x)",
    )
    # peer group {i=1} sums both rows; i=2's frame spans groups 1+2
    got = {(r["i"], r["s"]) for r in rows}
    assert got == {(1, 30), (2, 35), (3, 6)}


def test_with_ties_and_groups_unsupported_shapes_fail_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    # FETCH ... WITH TIES inside a subquery (not the final clause)
    with pytest.raises(TrinoCompatError, match="WITH TIES"):
        translate(
            "SELECT * FROM (SELECT i FROM t ORDER BY i "
            "FETCH FIRST 2 ROWS WITH TIES) q JOIN u ON q.i = u.i"
        )
    # positional ORDER BY: rank() over a constant would be wrong
    with pytest.raises(TrinoCompatError, match="positional"):
        translate("SELECT i FROM t ORDER BY 1 FETCH FIRST 2 ROWS WITH TIES")
    # no ORDER BY → ties undefined
    with pytest.raises(TrinoCompatError, match="ORDER BY"):
        translate("SELECT i FROM t FETCH FIRST 2 ROWS WITH TIES")
    # GROUPS window over an aggregated query needs restructuring we
    # refuse to guess at
    with pytest.raises(TrinoCompatError, match="GROUPS"):
        translate(
            "SELECT k, sum(sum(x)) OVER (ORDER BY k GROUPS 1 PRECEDING) "
            "FROM t GROUP BY k"
        )
    # GROUPS inside a subquery/CTE: the FROM-wrap would attach the
    # dense_rank to the wrong relation — must refuse, never mis-rewrite
    with pytest.raises(TrinoCompatError, match="GROUPS"):
        translate(
            "SELECT (SELECT sum(x) OVER (ORDER BY k GROUPS 1 PRECEDING) "
            "FROM u) AS s FROM t"
        )
    with pytest.raises(TrinoCompatError, match="GROUPS"):
        translate(
            "WITH c AS (SELECT sum(x) OVER (ORDER BY k GROUPS 1 PRECEDING)"
            " AS s FROM u) SELECT * FROM c"
        )


# --- Trino statement forms: SHOW STATS, EXPLAIN (TYPE ...) -----------------


def test_show_stats_statement(spark):
    """SHOW STATS FOR t (Trino statement): per-column ndv/nulls/min/max
    rows plus the row_count summary row, computed in one aggregate."""
    res = execute_query(spark, "SHOW STATS FOR nation", dialect="trino")
    assert res.columns[0] == "column_name" and "row_count" in res.columns
    by_col = {r["column_name"]: r for r in res.rows}
    assert by_col[None]["row_count"] == 25.0
    assert by_col["n_regionkey"]["distinct_values_count"] == 5.0
    assert by_col["n_regionkey"]["low_value"] == "0"
    assert by_col["n_regionkey"]["high_value"] == "4"
    assert by_col["n_name"]["data_size"] is not None  # string byte size


def test_explain_type_statement(spark):
    """EXPLAIN (TYPE fmt) — the exact text the reference generates
    (client.go:783) — routes through the explain façade."""
    res = execute_query(
        spark,
        "EXPLAIN (TYPE DISTRIBUTED) SELECT n_regionkey, count(*) AS n"
        " FROM nation GROUP BY n_regionkey",
        dialect="trino",
    )
    assert "Exchange" in res.rows[0]["plan"]
    res = execute_query(spark, "EXPLAIN (TYPE VALIDATE) SELECT 1", dialect="trino")
    assert res.rows[0]["valid"] is True
    res = execute_query(
        spark,
        "EXPLAIN (TYPE IO) SELECT n_name FROM nation WHERE n_regionkey = 1",
        dialect="trino",
    )
    assert any(r.get("kind") == "file" for r in res.rows)
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="EXPLAIN option"):
        execute_query(spark, "EXPLAIN (TYPE COST) SELECT 1", dialect="trino")


def test_explain_type_of_dml_never_executes(spark, tmp_path):
    """EXPLAIN (TYPE ...) of a DML statement must explain (or reject),
    NEVER execute — regression for the branch-order bug where the
    stripped inner UPDATE hit the DML router first and mutated the
    table."""
    import os

    from mcp_trino_spark.config import EngineConfig

    base = "/root/repo/.tmp/explain_dml"
    os.makedirs(base, exist_ok=True)
    src = spark.createDataFrame([(1, 10), (2, 20)], "id bigint, x bigint")
    path = f"{base}/t_explain_dml"
    src.write.mode("overwrite").parquet(path)
    spark.sql("DROP TABLE IF EXISTS t_explain_dml")
    spark.sql(f"CREATE TABLE t_explain_dml USING parquet LOCATION '{path}'")
    cfg = EngineConfig(allow_write_queries=True)
    try:
        before = sorted(tuple(r) for r in spark.table("t_explain_dml").collect())
        try:
            execute_query(
                spark,
                "EXPLAIN (TYPE VALIDATE) UPDATE t_explain_dml SET x = 99",
                cfg,
                dialect="trino",
            )
        except Exception:
            pass  # rejecting is acceptable; executing is not
        after = sorted(tuple(r) for r in spark.table("t_explain_dml").collect())
        assert after == before, "EXPLAIN executed the DML it was asked to explain"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_explain_dml")


def test_show_stats_unsupported_forms_fail_loudly(spark):
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="SHOW STATS"):
        execute_query(spark, 'SHOW STATS FOR "quoted name"', dialect="trino")


def test_with_ties_countless_and_single_bound_groups_translate():
    # FETCH FIRST ROW WITH TIES: count defaults to 1 (Trino grammar)
    q = translate("SELECT i FROM t ORDER BY i FETCH FIRST ROW WITH TIES")
    assert "LIMIT 1" in q and "__ties_top" in q
    # single-bound GROUPS frame normalizes to BETWEEN ... AND CURRENT ROW
    q = translate("SELECT sum(x) OVER (ORDER BY i GROUPS 2 PRECEDING) AS s FROM t")
    assert "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW" in q


def test_date_format_mysql_tokens(spark):
    """Trino date_format uses MySQL %-tokens; Spark's same-named builtin
    reads Java patterns where %d is literal-% + day — silent divergence
    without translation.  Bare literal letters come out Java-quoted."""
    rows = run(
        spark,
        "SELECT date_format(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%dT%H:%i') AS r",
    )
    assert rows[0]["r"] == "2024-03-05T07:08"
    rows = run(
        spark,
        "SELECT date_format(TIMESTAMP '2024-03-05 07:08:09', '%W %d %b') AS r",
    )
    assert rows[0]["r"] == "Tuesday 05 Mar"
    from mcp_trino_spark.trino_compat import TrinoCompatError
    with pytest.raises(TrinoCompatError, match="token"):
        translate("SELECT date_format(ts, '%Q') FROM t")


def test_from_iso8601_date(spark):
    rows = run(spark, "SELECT from_iso8601_date('2024-03-05') AS r")
    assert rows[0]["r"] == datetime.date(2024, 3, 5)


def test_show_stats_query_form(spark):
    res = execute_query(
        spark,
        "SHOW STATS FOR (SELECT n_regionkey FROM nation WHERE n_regionkey < 2)",
        dialect="trino",
    )
    by_col = {r["column_name"]: r for r in res.rows}
    assert by_col[None]["row_count"] == 10.0
    assert by_col["n_regionkey"]["distinct_values_count"] == 2.0
    # the throwaway view is dropped
    assert not [t.name for t in spark.catalog.listTables()
                if t.name.startswith("__stats_")]
    from mcp_trino_spark.execute import WriteQueryNotAllowed
    with pytest.raises(WriteQueryNotAllowed):
        execute_query(spark, "SHOW STATS FOR (DROP TABLE nation)", dialect="trino")


def test_week_and_url_extract_family(spark):
    rows = run(
        spark,
        "SELECT week(DATE '2024-01-15') AS w,"
        " url_extract_parameter('http://x.com/p?a=1&b=2', 'b') AS p,"
        " url_extract_path('http://x.com/p/q?a=1') AS pa,"
        " url_extract_host('http://x.com/p') AS h,"
        " url_extract_protocol('https://x.com') AS pr,"
        " url_extract_query('http://x.com/p?a=1') AS q,"
        " url_extract_fragment('http://x.com/p#frag') AS f",
    )
    assert rows[0] == {"w": 3, "p": "2", "pa": "/p/q", "h": "x.com",
                       "pr": "https", "q": "a=1", "f": "frag"}
    # parse_url reads the key as a regex; Trino matches literally —
    # dots must not wildcard, metachars must not throw
    rows = run(
        spark,
        "SELECT url_extract_parameter('http://x.com/p?axb=1&a.b=2', 'a.b') AS d,"
        " url_extract_parameter('http://x.com/p?a(=9', 'a(') AS m",
    )
    assert rows[0] == {"d": "2", "m": "9"}


def test_groups_frame_trailing_clauses_stay_outside_subquery(spark):
    """Review fix: a trailing top-level ORDER BY/LIMIT must NOT fold
    into the dense_rank subquery — a LIMIT under the window would
    truncate frames and silently change values."""
    q = translate(
        "SELECT i, sum(x) OVER (ORDER BY i GROUPS BETWEEN CURRENT ROW "
        "AND 1 FOLLOWING) AS s FROM t ORDER BY i LIMIT 5"
    )
    inner = q.split("__gsrc")[0]
    assert "LIMIT" not in inner and q.rstrip().endswith("LIMIT 5")
    # executable proof: the last selected row's frame still sees the
    # row BEYOND the limit (6th row), so LIMIT ran after the window
    rows = run(
        spark,
        "SELECT i, sum(x) OVER (ORDER BY i GROUPS BETWEEN CURRENT ROW "
        "AND 1 FOLLOWING) AS s "
        "FROM (VALUES (1,1),(2,2),(3,3),(4,4),(5,5),(6,6)) t(i,x) "
        "ORDER BY i LIMIT 5",
    )
    by_i = {r["i"]: r["s"] for r in rows}
    assert len(rows) == 5 and by_i[5] == 11  # 5 + the 6th row's 6


def test_groups_frame_over_set_operation_rejected():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="set operation"):
        translate(
            "SELECT sum(x) OVER (ORDER BY i GROUPS 1 PRECEDING) AS s "
            "FROM t UNION ALL SELECT y FROM u"
        )


def test_zip_index_parse_duration(spark):
    """Dialect batch 6 (gap-hunt probes): zip → arrays_zip, index →
    instr, parse_duration literal → day-time interval."""
    assert translate("SELECT zip(a, b) FROM t") == "SELECT arrays_zip(a, b) FROM t"
    # zip_with is its own (identical) function — must stay untouched
    q = "SELECT zip_with(a, b, (x, y) -> x + y) FROM t"
    assert translate(q) == q
    rows = run(
        spark,
        "SELECT zip(ARRAY[1,2], ARRAY['a','b']) AS z, "
        "index('hello', 'll') AS p, "
        "parse_duration('5m') AS d, "
        "TIMESTAMP '2026-01-01 00:00:00' + parse_duration('1.5h') AS t2",
    )
    import datetime as _dt

    assert rows[0]["p"] == 3
    assert rows[0]["d"] == _dt.timedelta(minutes=5)
    assert rows[0]["t2"] == _dt.datetime(2026, 1, 1, 1, 30)
    assert [tuple(e.values()) for e in rows[0]["z"]] == [(1, "a"), (2, "b")]


def test_parse_duration_non_literal_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="parse_duration"):
        translate("SELECT parse_duration(colx) FROM t")
    # inside a literal: untouched
    lit = "SELECT 'parse_duration(colx)' AS s"
    assert translate(lit) == lit


def test_hll_sketch_dialect(spark):
    """Trino approx_set / merge / cardinality → Spark Datasketches HLL;
    array/map cardinality stays native."""
    assert (
        translate("SELECT cardinality(approx_set(x)) FROM t")
        == "SELECT CAST(hll_sketch_estimate(hll_sketch_agg(x)) AS BIGINT) FROM t"
    )
    assert (
        translate("SELECT cardinality(merge(s)) FROM g")
        == "SELECT CAST(hll_sketch_estimate(hll_union_agg(s)) AS BIGINT) FROM g"
    )
    q = "SELECT cardinality(arr) FROM t"
    assert translate(q) == q
    lit = "SELECT 'cardinality(approx_set(x))' AS s"
    assert translate(lit) == lit
    rows = run(
        spark,
        "SELECT cardinality(merge(s)) AS n FROM "
        "(SELECT c_nationkey, approx_set(c_custkey) AS s "
        "FROM customer GROUP BY c_nationkey)",
    )
    n_exact = run(spark, "SELECT COUNT(DISTINCT c_custkey) AS n FROM customer")[0]["n"]
    assert abs(rows[0]["n"] - n_exact) <= max(2, 0.05 * n_exact)


# --- round-3 review fixes: precedence, literal delimiters, exact edge
# semantics ------------------------------------------------------------------


def test_try_mixed_operator_precedence(spark):
    """try() must split at the ROOT (lowest-precedence) operator —
    splitting at '/' first turned 1 + 4/2 into (1+4)/2."""
    assert (
        translate("SELECT try(1 + 4 / 2)")
        == "SELECT try_add(1, try_cast(try_divide(4, 2) AS BIGINT))"
    )
    assert (
        translate("SELECT try(a / b % c)")
        == "SELECT try_mod(try_divide(a, b), c)"
    )
    # literal integer division now truncates INSIDE try() too: Trino's
    # 1 + 4/2 is the integer 3, not 3.0
    rows = run(spark, "SELECT try(1 + 4 / 2) AS v, try(10 - 2 * 3) AS w")
    assert rows[0] == {"v": 3, "w": 4}
    assert isinstance(rows[0]["v"], int)


def test_try_scientific_notation_not_split(spark):
    assert translate("SELECT try(x - 1e-3)") == "SELECT try_subtract(x, 1e-3)"
    rows = run(spark, "SELECT try(1.0 - 1e-3) AS v")
    assert rows[0]["v"] == pytest.approx(0.999)


def test_split_to_map_literal_delimiters(spark):
    """Trino's delimiters are literal; '|' as a Spark regex would match
    the empty string and explode every character."""
    rows = run(spark, "SELECT split_to_map('a=1|b=2', '|', '=') AS v")
    assert rows[0]["v"] == {"a": "1", "b": "2"}
    rows = run(spark, "SELECT split_to_map('a.1,b.2', ',', '.') AS v")
    assert rows[0]["v"] == {"a": "1", "b": "2"}
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="literal"):
        translate("SELECT split_to_map(s, d1, d2) FROM t")


def test_bitwise_shift_ge_64(spark):
    """Trino: shifts >= 64 collapse; Java masks the shift to s & 63."""
    rows = run(
        spark,
        "SELECT bitwise_left_shift(1, 64) AS a, "
        "bitwise_right_shift(-8, 64) AS b, "
        "bitwise_right_shift_arithmetic(-8, 64) AS c, "
        "bitwise_right_shift_arithmetic(8, 64) AS d",
    )
    assert rows[0] == {"a": 0, "b": 0, "c": -1, "d": 0}


def test_to_base_from_base_signed(spark):
    rows = run(
        spark,
        "SELECT to_base(-255, 16) AS a, to_base(255, 16) AS b, "
        "from_base('-ff', 16) AS c, from_base('ff', 16) AS d",
    )
    assert rows[0] == {"a": "-ff", "b": "ff", "c": -255, "d": 255}


def test_to_unixtime_subsecond(spark):
    rows = run(
        spark, "SELECT to_unixtime(TIMESTAMP '2024-01-01 00:00:00.123') AS v"
    )
    assert rows[0]["v"] == pytest.approx(1704067200.123, abs=1e-6)


def test_json_extract_scalar_exact_semantics(spark):
    """Trino: _scalar is NULL for object/array matches; json_extract
    returns JSON text (strings quoted); malformed docs yield NULL."""
    rows = run(
        spark,
        'SELECT json_extract_scalar(\'{"a":{"b":1}}\', \'$.a\') AS nonscalar, '
        'json_extract_scalar(\'{"a":{"b":1}}\', \'$.a.b\') AS scalar, '
        'json_extract(\'{"a":"x"}\', \'$.a\') AS quoted, '
        'json_extract_scalar(\'{"arr":[10,20]}\', \'$.arr[1]\') AS idx, '
        "json_extract_scalar('not json', '$.a') AS bad, "
        'json_extract_scalar(\'{"t":true}\', \'$.t\') AS boolean'
    )
    assert rows[0] == {
        "nonscalar": None, "scalar": "1", "quoted": '"x"',
        "idx": "20", "bad": None, "boolean": "true",
    }


def test_fetch_first_row_only_countless(spark):
    rows = run(
        spark,
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey FETCH FIRST ROW ONLY",
    )
    assert [r["n_nationkey"] for r in rows] == [0]


def test_joda_week_year_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError, _translate_joda

    with pytest.raises(TrinoCompatError, match="week-year"):
        _translate_joda("xxxx-ww")


# --- dialect batch 7 (gap-hunt round 2: 40 idioms probed, 29 already
# passing; none_match / wilson intervals / numeric_histogram closed) ---


def test_none_match_is_negated_exists(spark):
    rows = run(
        spark,
        "SELECT none_match(ARRAY[1,2], x -> x > 5) AS a, "
        "none_match(ARRAY[1,2], x -> x > 1) AS b",
    )
    assert rows[0] == {"a": True, "b": False}


def test_wilson_interval_bounds(spark):
    rows = run(
        spark,
        "SELECT round(wilson_interval_lower(100, 200, 1.96), 6) AS lo, "
        "round(wilson_interval_upper(100, 200, 1.96), 6) AS hi",
    )
    # closed-form Wilson score interval at p̂=0.5, n=200, z=1.96
    assert rows[0] == {"lo": 0.43136, "hi": 0.56864}
    # bounds bracket the point estimate and stay in [0, 1]
    rows = run(
        spark,
        "SELECT wilson_interval_lower(1, 10, 1.96) AS lo, "
        "wilson_interval_upper(1, 10, 1.96) AS hi",
    )
    assert 0.0 <= rows[0]["lo"] <= 0.1 <= rows[0]["hi"] <= 1.0


def test_numeric_histogram_maps_to_histogram_numeric(spark):
    q = translate("SELECT numeric_histogram(4, x) FROM t")
    assert "histogram_numeric(x, 4)" in q and "map_from_entries" in q
    rows = run(
        spark,
        "SELECT numeric_histogram(2, x) AS h "
        "FROM (VALUES (1.0),(1.0),(9.0)) t(x)",
    )
    h = rows[0]["h"]
    # weights conserved; Trino-shaped map<double,double> return
    assert sum(h.values()) == 3.0 and all(isinstance(k, float) for k in h)
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="numeric_histogram"):
        translate("SELECT numeric_histogram(4, x, w) FROM t")


def test_none_match_parenthesized_under_postfix_operators(spark):
    q = translate("SELECT none_match(arr, x -> x > 5) IS NULL FROM t")
    assert "(NOT exists(arr, x -> x > 5)) IS NULL" in q
    # NULL array: none_match is NULL, so IS NULL must be true (a bare
    # NOT-prefix would invert this to false)
    rows = run(
        spark,
        "SELECT none_match(CAST(NULL AS ARRAY<INT>), x -> x > 5) IS NULL AS a",
    )
    assert rows[0]["a"] is True


def test_wilson_interval_domain_validation(spark):
    import pytest as _pytest

    for bad in (
        "wilson_interval_lower(5, 0, 1.96)",    # trials = 0
        "wilson_interval_lower(-1, 10, 1.96)",  # negative successes
        "wilson_interval_upper(11, 10, 1.96)",  # successes > trials
        "wilson_interval_upper(1, 10, -0.5)",   # negative z
    ):
        with pytest.raises(Exception, match="wilson_interval"):
            run(spark, f"SELECT {bad}")


def test_show_create_table_on_view_backed_tables(spark):
    # Trino's SHOW CREATE TABLE works on every table; the testdata
    # tables are parquet-backed temp views, so the DDL is synthesized
    rows = run(spark, "SHOW CREATE TABLE nation")
    ddl = rows[0]["createtab_stmt"]
    assert ddl.startswith("CREATE TABLE nation (")
    assert "n_nationkey INT" in ddl and "n_name STRING" in ddl
    # a permanent table keeps Spark's native statement
    spark.sql("DROP TABLE IF EXISTS sct_perm")
    spark.sql("CREATE TABLE sct_perm (x INT) USING parquet")
    try:
        rows = run(spark, "SHOW CREATE TABLE sct_perm")
        assert "CREATE TABLE" in list(rows[0].values())[0]
    finally:
        spark.sql("DROP TABLE sct_perm")


def test_ansi_offset_rows_and_fetch_next(spark):
    rows = run(
        spark,
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey "
        "OFFSET 2 ROWS FETCH NEXT 3 ROWS ONLY",
    )
    assert [r["n_nationkey"] for r in rows] == [2, 3, 4]
    rows = run(
        spark,
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 23 ROWS",
    )
    assert [r["n_nationkey"] for r in rows] == [23, 24]


def test_show_session(spark):
    rows = run(spark, "SHOW SESSION")
    assert len(rows) > 10  # session property listing (Spark SET -v)


def test_show_functions_like_percent(spark):
    """Trino's SHOW ... LIKE uses SQL % wildcards; Spark's uses globs —
    a '%' pattern silently returned zero rows on every listing form
    until round 9."""
    rows = run(spark, "SHOW FUNCTIONS LIKE 'split%'")
    names = {list(r.values())[0] for r in rows}
    assert {"split", "split_part"} <= names
    assert len(run(spark, "SHOW FUNCTIONS")) > 300
    assert [r["namespace"] for r in run(spark, "SHOW SCHEMAS LIKE 'def%'")] == [
        "default"
    ]
    assert [
        r["tableName"] for r in run(spark, "SHOW TABLES LIKE 'nat%'")
    ] == ["nation"]
    assert [
        r["catalog"] for r in run(spark, "SHOW CATALOGS LIKE 'spark%'")
    ] == ["spark_catalog"]


def test_show_like_glob_metacharacters_rejected(spark):
    """A LIKE pattern containing '*' or '|' is LITERAL in SQL LIKE but
    a metacharacter in Spark's glob listing match — the %→* swap would
    silently change its meaning, so those patterns (and ESCAPE
    clauses, which Spark globs cannot express) are rejected loudly."""
    from mcp_trino_spark.trino_compat import TrinoCompatError

    for bad in (
        "SHOW TABLES LIKE 'a*b'",
        "SHOW FUNCTIONS LIKE 'x|y'",
        "SHOW SCHEMAS LIKE 'd__f%' ESCAPE '\\'",
        # ADVICE r10: Spark compiles the swapped pattern as a JAVA
        # REGEX, so every regex metacharacter silently diverges — a
        # literal '.' over-matches any char; an unbalanced '(' makes
        # Spark swallow PatternSyntaxException and return zero rows
        "SHOW TABLES LIKE 'a.b'",
        "SHOW TABLES LIKE 'a(b'",
        "SHOW FUNCTIONS LIKE 'x+y'",
        "SHOW SCHEMAS LIKE 'd[ef]%'",
        "SHOW TABLES LIKE 'a$'",
    ):
        with pytest.raises(TrinoCompatError, match="LIKE"):
            run(spark, bad)


def test_orderless_offset_window_with_explicit_frame(spark):
    """Trino-legal: an orderless window spec that still carries an
    explicit frame (nth_value/lead/lag respect frames).  The injected
    constant ORDER BY must land BEFORE the frame clause — until round
    10 it was appended after, producing malformed SQL and a confusing
    parse error."""
    from mcp_trino_spark.trino_compat import translate

    out = translate(
        "SELECT nth_value(x, 2) OVER (PARTITION BY p ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) FROM t"
    )
    assert "ORDER BY 1 ROWS BETWEEN" in out
    # live execution: with every row a peer the frame is well-defined;
    # value is order-arbitrary on both engines, so assert shape only
    rows = run(
        spark,
        "SELECT count(*) OVER (PARTITION BY n_regionkey) AS n, "
        "nth_value(n_nationkey, 2) OVER (PARTITION BY n_regionkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v "
        "FROM nation",
    )
    assert len(rows) == 25 and all(r["n"] == 5 for r in rows)
    assert all(r["v"] is not None for r in rows)


# ---------------------------------------------------------------------------
# round-4 dialect batch: approx_most_frequent, word_stem,
# human_readable_seconds, to_milliseconds


def test_approx_most_frequent_grouped(spark):
    rows = run(
        spark,
        "SELECT g, approx_most_frequent(2, v, 100) AS hh FROM "
        "(VALUES (1,'a'),(1,'a'),(1,'b'),(1,'c'),(2,'x'),(2,'x'),(2,'y'),"
        "(1,NULL)) t(g, v) GROUP BY g ORDER BY g",
    )
    # exact heavy hitters; NULL values ignored; ties broken by value asc
    assert rows[0]["g"] == 1 and rows[0]["hh"] == {"a": 2, "b": 1}
    assert rows[1]["g"] == 2 and rows[1]["hh"] == {"x": 2, "y": 1}


def test_approx_most_frequent_grand(spark):
    rows = run(
        spark,
        "SELECT approx_most_frequent(1, v, 10) AS hh FROM "
        "(VALUES ('a'),('a'),('b')) t(v)",
    )
    assert rows == [{"hh": {"a": 2}}]


def test_approx_most_frequent_unsupported_shapes_fail_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="other aggregates"):
        translate("SELECT g, COUNT(*) AS n, approx_most_frequent(2, v, 10) "
                  "FROM t GROUP BY g")
    with pytest.raises(TrinoCompatError, match="integer literal"):
        translate("SELECT approx_most_frequent(k, v, 10) FROM t")
    with pytest.raises(TrinoCompatError, match="3 arguments"):
        translate("SELECT approx_most_frequent(2, v) FROM t")
    with pytest.raises(TrinoCompatError, match="HAVING"):
        translate("SELECT g, approx_most_frequent(2, v, 10) FROM t "
                  "GROUP BY g HAVING g > 1")


def test_word_stem_canonical_porter_pairs(spark):
    # the published algorithm's own example pairs (Porter 1980) — the
    # sandbox's DuckDB cannot load its fts stemmer, so these pin
    # correctness instead of a SQL oracle
    pairs = {
        "caresses": "caress", "ponies": "poni", "relational": "relat",
        "generalization": "gener", "oscillators": "oscil",
        "hopefulness": "hope", "adjustable": "adjust", "Running": "run",
        "sky": "sky", "rate": "rate", "electrical": "electr",
    }
    sel = ", ".join(
        f"word_stem('{w}') AS s{i}" for i, w in enumerate(pairs)
    )
    row = run(spark, f"SELECT {sel}")[0]
    got = [row[f"s{i}"] for i in range(len(pairs))]
    assert got == list(pairs.values())


def test_human_readable_seconds_and_to_milliseconds(spark):
    row = run(
        spark,
        "SELECT human_readable_seconds(3762) AS a,"
        " human_readable_seconds(0) AS b,"
        " human_readable_seconds(96.4) AS c,"
        " human_readable_seconds(694861) AS d,"
        " to_milliseconds(INTERVAL '1 2:03:04.5' DAY TO SECOND) AS e,"
        " to_milliseconds(INTERVAL '2' SECOND) AS f",
    )[0]
    assert row["a"] == "1 hour, 2 minutes, 42 seconds"
    assert row["b"] == "0 seconds"
    assert row["c"] == "1 minute, 36 seconds"
    assert row["d"] == "1 week, 1 day, 1 hour, 1 minute, 1 second"
    assert row["e"] == 93784500
    assert row["f"] == 2000


def test_explain_analyze_reports_actual_rows(spark):
    register_tables(spark, "/root/testdata/sf0.001")
    r = execute_query(
        spark,
        "EXPLAIN ANALYZE SELECT c_nationkey, COUNT(*) AS n FROM customer "
        "WHERE c_acctbal > 0 GROUP BY c_nationkey",
        dialect="trino",
    )
    plan = r.rows[0]["plan"]
    # actual runtime metrics, not estimates: the filtered scan's real
    # output row count must appear on the Filter and Scan nodes
    assert "numOutputRows" in plan
    assert "Scan parquet" in plan and "numFiles" in plan
    assert "HashAggregate" in plan


def test_explain_analyze_write_is_rejected(spark):
    from mcp_trino_spark.execute import WriteQueryNotAllowed

    with pytest.raises(WriteQueryNotAllowed):
        execute_query(
            spark,
            "EXPLAIN ANALYZE DELETE FROM customer",
            dialect="trino",
        )


def test_combinations(spark):
    rows = run(
        spark,
        "SELECT combinations(array(1, 2, 3, 4), 2) AS c2,"
        " combinations(array('a', 'b', 'c'), 3) AS c3,"
        " combinations(array(1, 2), 5) AS small,"
        " combinations(array(1, 2), 0) AS zero,"
        " combinations(CAST(NULL AS ARRAY<INT>), 2) AS n",
    )
    r = rows[0]
    assert r["c2"] == [[1, 2], [1, 3], [1, 4], [2, 3], [2, 4], [3, 4]]
    assert r["c3"] == [["a", "b", "c"]]
    assert r["small"] == []
    assert r["zero"] == [[]]
    assert r["n"] is None


def test_combinations_limits_fail_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="<= 5"):
        translate("SELECT combinations(a, 6) FROM t")
    with pytest.raises(TrinoCompatError, match="literal"):
        translate("SELECT combinations(a, k) FROM t")


def test_gaphunt3_batch(spark):
    # strrpos: last-occurrence position, 1-based, 0 when absent
    r = run(spark, "SELECT strrpos('hello-world-x', '-') AS a,"
                   " strrpos('abc', 'z') AS b, strrpos('abcabc', 'bc') AS c")[0]
    assert (r["a"], r["b"], r["c"]) == (12, 0, 5)
    # split_to_multimap: literal delimiters, repeated keys aggregate
    r = run(spark, "SELECT split_to_multimap('a=1;a=2;b=3', ';', '=') AS m")[0]
    assert r["m"] == {"a": ["1", "2"], "b": ["3"]}
    r = run(spark, "SELECT split_to_multimap('x.1|y.2', '|', '.') AS m")[0]
    assert r["m"] == {"x": ["1"], "y": ["2"]}  # regex metachars stay literal
    # json_array_contains over scalar JSON arrays
    r = run(spark, "SELECT json_array_contains('[1,2,3]', 2) AS a,"
                   " json_array_contains('[\"a\",\"b\"]', 'a') AS b,"
                   " json_array_contains('[1,2]', 5) AS c,"
                   " json_array_contains('[true]', true) AS d")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, True, False, True)


def test_json_array_contains_typed_matching(spark):
    # Trino matches by JSON type: string probes see only JSON strings,
    # numeric probes only JSON numbers (numeric equality, 1 == 1.0),
    # boolean probes only JSON booleans.
    r = run(spark, "SELECT json_array_contains('[\"1\"]', 1) AS a,"
                   " json_array_contains('[1.0]', '1') AS b,"
                   " json_array_contains('[1.0]', 1) AS c,"
                   " json_array_contains('[1]', 1.0) AS d,"
                   " json_array_contains('[1, \"a\", true]', 'a') AS e,"
                   " json_array_contains('[1]', true) AS f,"
                   " json_array_contains('[true]', 1) AS g")[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"], r["g"]) == (
        False, False, True, True, True, False, False)
    # edges: null elements never match; empty/non-array/malformed JSON
    # → false; NULL json or NULL probe → NULL; nested values never
    # match a scalar probe
    r = run(spark, "SELECT json_array_contains('[null]', 1) AS a,"
                   " json_array_contains('[]', 1) AS b,"
                   " json_array_contains('{}', 1) AS c,"
                   " json_array_contains('notjson', 1) AS d,"
                   " json_array_contains(NULL, 1) AS e,"
                   " json_array_contains('[1]', NULL) AS f,"
                   " json_array_contains('[[1]]', 1) AS g,"
                   " json_array_contains('[{\"a\":1}]', 1) AS h")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (False, False, False, False)
    assert r["e"] is None and r["f"] is None
    assert (r["g"], r["h"]) == (False, False)


def test_array_agg_distinct_order_by(spark):
    r = run(spark, "SELECT array_agg(DISTINCT x ORDER BY x) AS a "
                   "FROM (VALUES (2),(1),(2),(NULL)) t(x)")[0]
    assert r["a"] == [1, 2, None]  # dedup + ASC NULLS LAST (Trino default)
    r = run(spark, "SELECT array_agg(DISTINCT x ORDER BY x DESC) AS a "
                   "FROM (VALUES (2),(1),(2)) t(x)")[0]
    assert r["a"] == [2, 1]
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="k must be x"):
        translate("SELECT array_agg(DISTINCT x ORDER BY y) FROM t")


def test_reduce_agg_folds_small_groups(spark):
    # sum of squares through the fold; integer state widens to the
    # element type (Trino coerces the int literal 0, Spark's aggregate()
    # HOF does not — the rewrite bridges that)
    rows = run(
        spark,
        "SELECT g, reduce_agg(k, 0, (s, v) -> s + v * v, (a, b) -> a + b)"
        " AS ssq FROM (SELECT id % 3 AS g, id AS k FROM range(10))"
        " GROUP BY g ORDER BY g",
    )
    assert [(r["g"], r["ssq"]) for r in rows] == [(0, 126), (1, 66), (2, 93)]
    # string state; all-null group folds to the init
    r = run(
        spark,
        "SELECT reduce_agg(CAST(k AS STRING), '', (s, v) -> concat(s, v),"
        " (a, b) -> concat(a, b)) AS c,"
        " reduce_agg(CAST(NULL AS BIGINT), 0, (s, v) -> s + v,"
        " (a, b) -> a + b) AS z"
        " FROM (SELECT id AS k FROM range(3))",
    )[0]
    assert r["c"] == "012" and r["z"] == 0


def test_reduce_agg_group_size_cap_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as ei:
        run(
            spark,
            "SELECT reduce_agg(k, 0, (s, v) -> s + 1, (a, b) -> a + b) AS n"
            " FROM (SELECT id AS k FROM range(10001))",
        )
    assert "reduce_agg: a group exceeded" in str(ei.value)
    # exactly at the cap still folds
    r = run(
        spark,
        "SELECT reduce_agg(k, 0, (s, v) -> s + 1, (a, b) -> a + b) AS n"
        " FROM (SELECT id AS k FROM range(10000))",
    )[0]
    assert r["n"] == 10000


def test_reduce_agg_malformed_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="reduce_agg requires"):
        translate("SELECT reduce_agg(x, 0, (a, b) -> a + b) FROM t")
    with pytest.raises(TrinoCompatError, match="DISTINCT"):
        translate(
            "SELECT reduce_agg(DISTINCT x, 0, (a, b) -> a + b,"
            " (a, b) -> a + b) FROM t"
        )


# ---------------------------------------------------------------------------
# round-4 review fixes


def test_with_ties_zero_rows_with_where_tail(spark):
    rows = run(
        spark,
        "SELECT i FROM (VALUES (1), (2)) t(i) WHERE i > 0 "
        "ORDER BY i FETCH FIRST 0 ROWS WITH TIES",
    )
    assert rows == []


def test_with_ties_multikey_single_threshold_subquery(spark):
    # one struct-typed threshold subquery shared across all key
    # references: the physical plan must reuse it, not rescan per key
    df = spark.sql(
        translate(
            "SELECT a, b FROM (VALUES (1, 1), (1, 2), (2, 1)) t(a, b) "
            "ORDER BY a DESC, b ASC FETCH FIRST 2 ROWS WITH TIES"
        )
    )
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, 1), (2, 1)]
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "ReusedSubquery" in buf.getvalue()


def test_approx_most_frequent_wrapped_call_fails_loudly():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="bare select item"):
        translate(
            "SELECT g, map_keys(approx_most_frequent(2, v, 10)) AS ks "
            "FROM t GROUP BY g"
        )


def test_human_readable_seconds_rounds_half_up(spark):
    row = run(
        spark,
        "SELECT human_readable_seconds(0.5) AS a,"
        " human_readable_seconds(2.5) AS b",
    )[0]
    assert row["a"] == "1 second"  # Math.round semantics, not half-even
    assert row["b"] == "3 seconds"


def test_explain_analyze_composes_with_time_travel(spark, tmp_path):
    from pyspark.sql import Row
    from mcp_trino_spark.config import EngineConfig

    W = EngineConfig(allow_write_queries=True)
    spark.sql("DROP TABLE IF EXISTS ea_tt")
    spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)]).write.parquet(
        str(tmp_path / "ea_tt")
    )
    spark.sql(f"CREATE TABLE ea_tt USING parquet LOCATION '{tmp_path / 'ea_tt'}'")
    try:
        execute_query(spark, "UPDATE ea_tt SET v = 9.0 WHERE k = 1", config=W)
        r = execute_query(
            spark,
            "EXPLAIN ANALYZE SELECT * FROM ea_tt FOR VERSION AS OF 0",
            dialect="trino",
        )
        assert "numOutputRows" in r.rows[0]["plan"]
        # and the profiled write must NOT have executed anything: an
        # EXPLAIN ANALYZE UPDATE is rejected even with writes enabled
        from mcp_trino_spark.execute import WriteQueryNotAllowed

        with pytest.raises(WriteQueryNotAllowed):
            execute_query(
                spark,
                "EXPLAIN ANALYZE UPDATE ea_tt SET v = 0.0",
                config=W,
                dialect="trino",
            )
        assert {(r2.k, r2.v) for r2 in spark.table("ea_tt").collect()} == {
            (1, 9.0), (2, 2.0),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS ea_tt")


def test_with_ties_randomized_equivalence_vs_rank(spark):
    """The threshold plan must equal the standard's defining rank()
    form on randomized inputs: random key counts, directions, NULLS
    placements, duplicates, and n — 20 seeded configurations."""
    import random

    rng = random.Random(42)
    for case in range(20):
        n_keys = rng.choice([1, 1, 2, 3])
        n_rows = rng.randrange(0, 30)
        rows = [
            tuple(
                rng.choice([None, 0, 1, 2, 3]) for _ in range(n_keys)
            ) + (i,)
            for i in range(n_rows)
        ]
        cols = [f"k{j}" for j in range(n_keys)] + ["rid"]
        schema = ", ".join(f"{c} int" for c in cols)
        view = f"__ties_rand_{case}"
        spark.createDataFrame(rows, schema).createOrReplaceTempView(view)
        keyspec = ", ".join(
            f"k{j} {rng.choice(['ASC', 'DESC'])} "
            f"{rng.choice(['', 'NULLS FIRST', 'NULLS LAST'])}".strip()
            for j in range(n_keys)
        )
        n = rng.randrange(1, 6)
        got = sorted(
            tuple(r) for r in spark.sql(
                translate(
                    f"SELECT rid FROM {view} ORDER BY {keyspec} "
                    f"FETCH FIRST {n} ROWS WITH TIES"
                )
            ).collect()
        )
        # the defining rank() form goes through translate too, so both
        # sides see the same (Trino-default) null placements
        want = sorted(
            tuple(r) for r in spark.sql(
                translate(
                    f"SELECT rid FROM (SELECT rid, RANK() OVER (ORDER BY "
                    f"{keyspec}) AS rk FROM {view}) WHERE rk <= {n}"
                )
            ).collect()
        )
        assert got == want, (case, keyspec, n, got, want)
        spark.catalog.dropTempView(view)


# ---------------------------------------------------------------------------
# dialect batch 9 (gap-hunt round 3)


def test_finiteness_predicates(spark):
    r = run(spark, "SELECT is_finite(1.0E0) AS a, is_finite(infinity()) AS b,"
                   " is_finite(nan()) AS c, is_infinite(infinity()) AS d,"
                   " is_infinite(2.0E0) AS e, is_finite(NULL) AS f")[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"]) == (
        True, False, False, True, False, None)


def test_normal_cdf_and_inverse(spark):
    # A&S-erf forward CDF (|err| <= 1.5e-7) and Acklam probit
    # (rel err ~1e-9) — checked against the standard table values
    r = run(spark, "SELECT normal_cdf(0.0E0, 1.0E0, 1.96E0) AS a,"
                   " normal_cdf(10.0E0, 2.0E0, 10.0E0) AS b,"
                   " inverse_normal_cdf(0.0E0, 1.0E0, 0.975E0) AS c,"
                   " inverse_normal_cdf(5.0E0, 2.0E0, 0.5E0) AS d,"
                   " inverse_normal_cdf(0.0E0, 1.0E0, 0.01E0) AS e")[0]
    assert abs(r["a"] - 0.9750021) < 1e-4
    assert abs(r["b"] - 0.5) < 1e-9
    assert abs(r["c"] - 1.959964) < 1e-4
    assert abs(r["d"] - 5.0) < 1e-9
    assert abs(r["e"] + 2.326348) < 1e-4
    # round-trip: probit(cdf(x)) == x across the tails and center
    r = run(spark, "SELECT max(abs(inverse_normal_cdf(0.0E0, 1.0E0,"
                   " normal_cdf(0.0E0, 1.0E0, x)) - x)) AS mx FROM"
                   " (SELECT (id - 15) / 5.0E0 AS x FROM"
                   " (SELECT * FROM range(31)))")[0]
    assert r["mx"] < 2e-3  # limited by the 1.5e-7 erf error in the tails
    import pytest as _pytest

    with pytest.raises(Exception, match="standardDeviation"):
        run(spark, "SELECT normal_cdf(0.0E0, 0.0E0, 1.0E0)")
    with pytest.raises(Exception, match="in \\(0, 1\\)"):
        run(spark, "SELECT inverse_normal_cdf(0.0E0, 1.0E0, 1.5E0)")


def test_beta_cdf(spark):
    # closed-form checks: I_x(1,1) = x; I_0.5(2,5) = 57/64 = 0.890625
    # (finite binomial sum); boundaries exact
    r = run(spark, "SELECT beta_cdf(1.0E0, 1.0E0, 0.3E0) AS a,"
                   " beta_cdf(2.0E0, 5.0E0, 0.5E0) AS b,"
                   " beta_cdf(2.0E0, 5.0E0, 0.0E0) AS c,"
                   " beta_cdf(2.0E0, 5.0E0, 1.0E0) AS d,"
                   " beta_cdf(5.0E0, 2.0E0, 0.5E0) AS e")[0]
    assert abs(r["a"] - 0.3) < 1e-12
    assert abs(r["b"] - 0.890625) < 1e-12
    assert r["c"] == 0.0 and r["d"] == 1.0
    assert abs(r["e"] - (1.0 - 0.890625)) < 1e-12  # symmetry branch
    import pytest as _pytest

    with pytest.raises(Exception, match="beta_cdf"):
        run(spark, "SELECT beta_cdf(-1.0E0, 1.0E0, 0.5E0)")


def test_timezone_offset_extractors(spark):
    # session.py pins UTC, so every timestamp evaluates at offset zero
    r = run(spark, "SELECT timezone_hour(TIMESTAMP '2026-01-01 00:00:00') AS h,"
                   " timezone_minute(TIMESTAMP '2026-06-01 12:00:00') AS m,"
                   " timezone_hour(CAST(NULL AS TIMESTAMP)) AS n")[0]
    assert (r["h"], r["m"], r["n"]) == (0, 0, None)


def test_is_json_scalar(spark):
    r = run(spark, "SELECT is_json_scalar('1') AS a,"
                   " is_json_scalar('\"abc\"') AS b,"
                   " is_json_scalar('null') AS c,"
                   " is_json_scalar('true') AS d,"
                   " is_json_scalar('[1,2]') AS e,"
                   " is_json_scalar('{\"a\":1}') AS f,"
                   " is_json_scalar(NULL) AS g")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, True, True, True)
    assert (r["e"], r["f"], r["g"]) == (False, False, None)


def test_multimap_from_entries(spark):
    r = run(spark, "SELECT multimap_from_entries("
                   "ARRAY[ROW('a','1'), ROW('b','2'), ROW('a','3')]) AS m")[0]
    assert r["m"] == {"a": ["1", "3"], "b": ["2"]}


def test_entropy_aggregate(spark):
    # counts (1,1,2): H = 1.5 bits; zero counts contribute 0
    r = run(spark, "SELECT entropy(x) AS e FROM (VALUES (1),(1),(2)) t(x)")[0]
    assert abs(r["e"] - 1.5) < 1e-12
    r = run(spark, "SELECT entropy(c) AS e FROM (VALUES (0),(4)) t(c)")[0]
    assert abs(r["e"]) < 1e-12
    r = run(spark, "SELECT g, entropy(c) AS e FROM (VALUES (1,2),(1,2),(2,4))"
                   " t(g,c) GROUP BY g ORDER BY g")
    assert abs(r[0]["e"] - 1.0) < 1e-12 and abs(r[1]["e"]) < 1e-12


def test_map_union_and_bitwise_xor_agg(spark):
    r = run(spark, "SELECT map_union(m) AS r FROM (VALUES"
                   " (MAP(ARRAY['a'], ARRAY[1])),"
                   " (MAP(ARRAY['b'], ARRAY[2]))) t(m)")[0]
    assert r["r"] == {"a": 1, "b": 2}
    # duplicate key: one of the values wins (Trino: arbitrary)
    r = run(spark, "SELECT map_union(m) AS r FROM (VALUES"
                   " (MAP(ARRAY['a'], ARRAY[1])),"
                   " (MAP(ARRAY['a'], ARRAY[9]))) t(m)")[0]
    assert set(r["r"]) == {"a"} and r["r"]["a"] in (1, 9)
    r = run(spark, "SELECT bitwise_xor_agg(x) AS r FROM (VALUES (5),(3)) t(x)")[0]
    assert r["r"] == 6


# ---------------------------------------------------------------------------
# dialect batch 10 (gap-hunt round 4)


def test_quantile_sketch_sql_composition(spark):
    # value_at_quantile(qdigest_agg(x), q) IS the approximate-quantile
    # contract — rewrites to percentile_approx (same mergeable-sketch
    # family); stored-sketch reads fail loudly
    r = run(spark, "SELECT value_at_quantile(qdigest_agg(CAST(x AS DOUBLE)),"
                   " 0.5E0) AS a, value_at_quantile(tdigest_agg("
                   "CAST(x AS DOUBLE)), 0.5E0) AS b,"
                   " values_at_quantiles(qdigest_agg(CAST(x AS DOUBLE)),"
                   " ARRAY[0.0E0, 1.0E0]) AS c"
                   " FROM (VALUES (1),(2),(3)) t(x)")[0]
    assert (r["a"], r["b"], r["c"]) == (2.0, 2.0, [1.0, 3.0])
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="stored/merged"):
        translate("SELECT value_at_quantile(sk, 0.5) FROM t")


def test_sql_json_standard_functions(spark):
    r = run(spark, "SELECT json_value('{\"a\":1}', 'strict $.a') AS a,"
                   " json_query('{\"a\":[1,2]}', 'strict $.a') AS b,"
                   " json_exists('{\"a\":1}', 'strict $.a') AS c,"
                   " json_exists('{\"a\":1}', 'lax $.b') AS d")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == ("1", "[1,2]", True, False)
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="literal"):
        translate("SELECT json_value(j, p) FROM t")
    with pytest.raises(TrinoCompatError, match="two-argument"):
        translate("SELECT json_value(j, 'lax $.a', 1) FROM t")


def test_array_batch10(spark):
    r = run(spark, "SELECT trim_array(ARRAY[1,2,3], 1) AS a,"
                   " array_cum_sum(ARRAY[1,2,3]) AS b,"
                   " array_cum_sum(ARRAY[1,NULL,3]) AS c,"
                   " array_histogram(ARRAY['a','a','b',NULL]) AS d")[0]
    assert r["a"] == [1, 2]
    assert r["b"] == [1, 3, 6]
    assert r["c"] == [1, None, None]  # NULL poisons the rest (Trino)
    assert r["d"] == {"a": 2, "b": 1}
    with pytest.raises(Exception, match="trim_array"):
        run(spark, "SELECT trim_array(ARRAY[1], 5)")


def test_word_stem_language_and_row_fieldn(spark):
    r = run(spark, "SELECT word_stem('running', 'en') AS a,"
                   " (ROW(1, 'x')).field0 AS b, (ROW(1, 'x')).field1 AS c")[0]
    assert (r["a"], r["b"], r["c"]) == ("run", 1, "x")
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="English"):
        translate("SELECT word_stem('x', 'de')")


# ---------------------------------------------------------------------------
# dialect batch 11 (quantified comparisons + small syntax forms)


def test_quantified_comparisons(spark):
    sub = "(SELECT x FROM (VALUES (1),(2)) t(x))"
    r = run(spark, f"SELECT 2 = ANY {sub} AS a, 5 = SOME {sub} AS b,"
                   f" 3 <> ALL {sub} AS c, 2 <> ALL {sub} AS d,"
                   f" 3 > ALL {sub} AS e, 2 > ALL {sub} AS f,"
                   f" 2 > ANY {sub} AS g, 1 > ANY {sub} AS h,"
                   f" 0 < ALL {sub} AS i, 1 <= ALL {sub} AS j")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, False, True, False)
    assert (r["e"], r["f"], r["g"], r["h"]) == (True, False, True, False)
    assert (r["i"], r["j"]) == (True, True)
    # in a WHERE clause
    rows = run(spark, "SELECT x FROM (VALUES (1),(2),(3)) t(x)"
                      " WHERE x >= ALL (SELECT y FROM (VALUES (2),(3)) s(y))")
    assert [r["x"] for r in rows] == [3]
    # r15: the equality quantifiers complete the matrix (= ALL was a
    # loud TrinoCompatError through r14; x79 certifies vs DuckDB)
    r = run(spark, f"SELECT 1 = ALL (SELECT x FROM (VALUES (1),(1)) t(x)) AS a,"
                   f" 1 = ALL {sub} AS b,"
                   f" 2 <> ANY {sub} AS c,"
                   f" 1 <> ANY (SELECT x FROM (VALUES (1),(1)) t(x)) AS d")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, False, True, False)


def test_extract_yow_and_two_arg_if(spark):
    r = run(spark, "SELECT extract(YOW FROM DATE '2026-01-01') AS y,"
                   " if(2 > 1, 'big') AS a, if(1 > 2, 'big') AS b,"
                   " if(1 > 2, 'big', 'small') AS c")[0]
    assert (r["y"], r["a"], r["b"], r["c"]) == (2026, "big", None, "small")


# ---------------------------------------------------------------------------
# dialect batch 12 (map/array/binary/HMAC surface)


def test_map_top_n_family(spark):
    r = run(spark, "SELECT map_top_n(MAP(ARRAY['a','b','c'], ARRAY[3,1,2]), 2) AS a,"
                   " map_top_n_keys(MAP(ARRAY['a','b','c'], ARRAY[3,1,2]), 2) AS b,"
                   " map_top_n_values(MAP(ARRAY['a','b','c'], ARRAY[3,1,2]), 2) AS c,"
                   " map_remove_null_values(MAP(ARRAY['a','b'], ARRAY[1,NULL])) AS d,"
                   " map_normalize(MAP(ARRAY['a','b'], ARRAY[1.0E0, 3.0E0])) AS e")[0]
    assert r["a"] == {"a": 3, "c": 2}
    assert r["b"] == ["a", "c"]
    assert r["c"] == [3, 2]
    assert r["d"] == {"a": 1}
    assert r["e"] == {"a": 0.25, "b": 0.75}


def test_array_batch12(spark):
    r = run(spark, "SELECT remove_nulls(ARRAY[1,NULL,2]) AS a,"
                   " array_top_n(ARRAY[3,1,NULL,2], 3) AS b,"
                   " array_top_n(ARRAY[3,1,NULL,2], 4) AS b2,"
                   " array_least_frequent(ARRAY[1,1,2]) AS c,"
                   " array_least_frequent(ARRAY[1,1,2,3,3], 2) AS d,"
                   " array_split_into_chunks(ARRAY[1,2,3,4,5], 2) AS e,"
                   " array_min_by(ARRAY['ab','c'], x -> length(x)) AS f,"
                   " array_max_by(ARRAY['ab','c'], x -> length(x)) AS g")[0]
    assert r["a"] == [1, 2]
    assert r["b"] == [3, 2, 1]  # NULL ranks smallest (Trino)
    assert r["b2"] == [3, 2, 1, None]
    assert r["c"] == [2]
    assert r["d"] == [2, 1]  # count asc, then smaller value
    assert r["e"] == [[1, 2], [3, 4], [5]]
    assert (r["f"], r["g"]) == ("c", "ab")


def test_strpos_nth_occurrence(spark):
    r = run(spark, "SELECT strpos('hello', 'l') AS a, strpos('hello', 'l', 2) AS b,"
                   " strpos('hello', 'l', -1) AS c, strpos('hello', 'z', 1) AS d")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 4, 4, 0)
    with pytest.raises(Exception, match="instance must not be 0"):
        run(spark, "SELECT strpos('a', 'a', 0)")


def test_binary_codecs_and_hmac(spark):
    import hashlib
    import hmac as hmac_mod

    r = run(spark, "SELECT to_hex(to_utf8('A')) AS a, from_hex('41') AS b,"
                   " to_base64(to_utf8('x')) AS c, from_base64('eA==') AS d,"
                   " to_base64url(to_utf8('x')) AS e,"
                   " from_big_endian_64(to_big_endian_64(-7)) AS f,"
                   " from_big_endian_32(to_big_endian_32(-5)) AS g,"
                   " length(sha512(to_utf8('x'))) AS h,"
                   " hmac_sha256(to_utf8('m'), to_utf8('k')) AS i")[0]
    assert (r["a"], bytes(r["b"]), r["c"], bytes(r["d"])) == ("41", b"A", "eA==", b"x")
    assert r["e"] == "eA=="
    assert (r["f"], r["g"], r["h"]) == (-7, -5, 64)
    assert bytes(r["i"]) == hmac_mod.new(b"k", b"m", hashlib.sha256).digest()


# ---------------------------------------------------------------------------
# dialect batch 13 (vector math, array predicates, SQL/JSON constructors)


def test_vector_math(spark):
    r = run(spark, "SELECT dot_product(ARRAY[1.0E0,2.0E0], ARRAY[3.0E0,4.0E0]) AS a,"
                   " l2_norm(ARRAY[3.0E0,4.0E0]) AS b,"
                   " euclidean_distance(ARRAY[0.0E0,0.0E0], ARRAY[3.0E0,4.0E0]) AS c,"
                   " cosine_distance(ARRAY[1.0E0,0.0E0], ARRAY[0.0E0,1.0E0]) AS d")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (11.0, 5.0, 5.0, 1.0)


def test_array_predicates_batch13(spark):
    r = run(spark, "SELECT array_sort_desc(ARRAY[1,3,NULL,2]) AS a,"
                   " array_duplicates(ARRAY[1,1,2]) AS b,"
                   " array_has_duplicates(ARRAY[1,1]) AS c,"
                   " array_has_duplicates(ARRAY[1,2]) AS d,"
                   " array_frequency(ARRAY[1,1,2]) AS e,"
                   " array_intersect(ARRAY[ARRAY[1,2],ARRAY[2,3]]) AS f,"
                   " array_intersect(ARRAY[1,2], ARRAY[2,3]) AS g")[0]
    assert r["a"] == [3, 2, 1, None]
    assert (r["b"], r["c"], r["d"]) == ([1], True, False)
    assert r["e"] == {1: 2, 2: 1}
    assert (r["f"], r["g"]) == ([2], [2])


def test_session_context_keywords(spark):
    r = run(spark, "SELECT current_catalog AS a, current_schema AS b")[0]
    assert r["a"] == "spark_catalog" and isinstance(r["b"], str)


def test_sql_json_constructors(spark):
    r = run(spark, "SELECT JSON_ARRAY(1, 2) AS a,"
                   " JSON_ARRAY(1, NULL, 2) AS b,"  # ABSENT ON NULL default
                   " JSON_ARRAY(1, NULL, 2 NULL ON NULL) AS c,"
                   " JSON_OBJECT('a' VALUE 1) AS d,"
                   " JSON_OBJECT(KEY 'a' VALUE 1, KEY 'b' VALUE 'x') AS e")[0]
    assert (r["a"], r["b"], r["c"]) == ("[1,2]", "[1,2]", "[1,null,2]")
    assert (r["d"], r["e"]) == ('{"a":1}', '{"a":1,"b":"x"}')
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="VALUE"):
        translate("SELECT JSON_OBJECT(k VALUE 1) FROM t")


def test_murmur3_x64_128(spark):
    # published MurmurHash3 x64_128 seed-0 vectors (digest = little-
    # endian h1 || h2)
    r = run(spark, "SELECT to_hex(murmur3(to_utf8('hello'))) AS a,"
                   " to_hex(murmur3(to_utf8(''))) AS b,"
                   " to_hex(murmur3(to_utf8("
                   "'The quick brown fox jumps over the lazy dog'))) AS c")[0]
    assert r["a"] == "029BBD41B3A7D8CB191DAE486A901E5B"
    assert r["b"] == "00000000000000000000000000000000"
    assert r["c"] == "6C1B07BC7BBC4BE347939AC4A93C437A"


# ---------------------------------------------------------------------------
# review fixes (round 6): nested rewrites, literal-safe lambda subst


def test_minmax_by_literal_in_lambda_body(spark):
    # the lambda variable must NOT be substituted inside string
    # literals: coalesce(x, 'x') keeps its 'x' literal on both
    # comparator sides (a bare regex sub produced asymmetric keys)
    r = run(spark, "SELECT array_max_by(ARRAY['a', NULL],"
                   " x -> coalesce(x, 'x')) AS a,"
                   " array_min_by(ARRAY['ab', NULL],"
                   " x -> coalesce(x, 'zz')) AS b")[0]
    assert r["a"] is None  # NULL element's key 'x' > 'a'
    assert r["b"] == "ab"


def test_weighted_sketch_agg_refused(spark):
    from mcp_trino_spark.trino_compat import TrinoCompatError

    # a weighted/parameterized qdigest_agg would land its extra argument
    # in percentile_approx's percentage slot — must refuse loudly
    with pytest.raises(TrinoCompatError, match="argument shape"):
        translate("SELECT value_at_quantile(qdigest_agg(x, 5), 0.9) FROM t")


def test_nested_json_rewrites(spark):
    r = run(spark, "SELECT json_value(json_query('{\"a\":{\"b\":7}}',"
                   " 'lax $.a'), 'lax $.b') AS a,"
                   " json_value('{\"a\":1}', '$.a') AS b,"  # bare = lax
                   " JSON_OBJECT('a' VALUE JSON_OBJECT('b' VALUE 1)) AS c,"
                   " if(true, if(false, 1)) AS d,"
                   " if(true, if(true, 5)) AS e")[0]
    assert r["a"] == "7"
    assert r["b"] == "1"
    assert '{\\"b\\":1}' in r["c"] or '{"b":1}' in r["c"]
    assert r["d"] is None and r["e"] == 5


# ---------------------------------------------------------------------------
# dialect batch 15 (data sizes, humanized numbers, timezone helpers)


def test_parse_data_size(spark):
    r = run(spark, "SELECT parse_data_size('2.3MB') AS a,"
                   " parse_data_size('1kB') AS b,"
                   " parse_data_size('77') AS c,"
                   " parse_data_size('1.5GB') AS d")[0]
    assert (int(r["a"]), int(r["b"]), int(r["c"]), int(r["d"])) == (
        2411724, 1024, 77, 1610612736)  # Trino's doc examples (floored)
    with pytest.raises(Exception, match="Invalid data size"):
        run(spark, "SELECT parse_data_size('xMB')")


def test_format_number_humanized(spark):
    r = run(spark, "SELECT format_number(123456) AS a,"
                   " format_number(1234567) AS b,"
                   " format_number(999) AS c,"
                   " format_number(-123456) AS d,"
                   " format_number(12345, 0) AS e")[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == ("123K", "1.23M", "999", "-123K")
    assert r["e"] == "12,345"  # 2-arg stays Spark's separator form


def test_with_timezone_and_precision_args(spark):
    r = run(spark, "SELECT with_timezone(TIMESTAMP '2026-01-01 12:00:00',"
                   " 'America/New_York') AS a,"
                   " current_timestamp(3) IS NOT NULL AS b,"
                   " localtimestamp(3) IS NOT NULL AS c")[0]
    # noon wall-clock in New York = 17:00 UTC (EST, January)
    assert r["a"].strftime("%H:%M") == "17:00"
    assert r["b"] is True and r["c"] is True


def test_parse_data_size_zb_yb_and_nested_templates(spark):
    r = run(spark, "SELECT parse_data_size('1ZB') AS a,"
                   " parse_data_size('1YB') AS b,"
                   " format_number(length(format_number(1234567))) AS c,"
                   " strpos(substr('hello', strpos('hello', 'l', 1)),"
                   " 'l', 2) AS d")[0]
    assert int(r["a"]) == 1024 ** 7 and int(r["b"]) == 1024 ** 8
    assert r["c"] == "5"  # nested same-head template calls both rewrite
    assert r["d"] == 2


def test_quantified_all_null_elements_never_true(spark):
    # a NULL element makes `op ALL` at best UNKNOWN — min/max ignoring
    # NULLs must not let a row through the filter
    r = run(spark, "SELECT 9 > ALL (SELECT x FROM (VALUES (1),(NULL)) t(x)) AS a,"
                   " 9 > ANY (SELECT x FROM (VALUES (1),(NULL)) t(x)) AS b")[0]
    assert r["a"] is None and r["b"] is True
    rows = run(spark, "SELECT x FROM (VALUES (9)) t(x)"
                      " WHERE x > ALL (SELECT y FROM (VALUES (1),(NULL)) s(y))")
    assert rows == []


def test_quantified_any_null_elements_never_true(spark):
    # the symmetric ANY hazard: with a NULL element and NO satisfying
    # witness the standard answer is UNKNOWN, not FALSE — so NOT (...)
    # must not wrongly keep the row.  TRUE witnesses stay TRUE.
    sub_null = "(SELECT x FROM (VALUES (5),(NULL)) t(x))"
    r = run(spark, f"SELECT 3 > ANY {sub_null} AS a,"
                   f" 7 > ANY {sub_null} AS b,"
                   f" 3 < ANY {sub_null} AS c,"
                   f" NULL > ANY (SELECT x FROM (VALUES (1)) t(x)) AS d,"
                   f" 3 > ANY (SELECT x FROM (VALUES (5)) t(x)) AS e")[0]
    assert r["a"] is None     # no witness + NULL element → UNKNOWN
    assert r["b"] is True     # witness wins regardless of the NULL
    assert r["c"] is True
    assert r["d"] is None     # NULL left operand → UNKNOWN
    assert r["e"] is False    # no witness, no NULLs → plain FALSE
    # the wrongly-kept case from the r6 advice: NOT(FALSE)=TRUE leaked
    # rows; NOT(UNKNOWN)=UNKNOWN must filter them
    rows = run(spark, "SELECT x FROM (VALUES (3)) t(x)"
                      f" WHERE NOT (x > ANY {sub_null})")
    assert rows == []
    # and precedence survives the OR-guard: the AND's right arm is the
    # whole parenthesized quantified predicate
    rows = run(spark, "SELECT x FROM (VALUES (3),(9)) t(x)"
                      " WHERE x > 0 AND x - 1 > ANY"
                      " (SELECT y FROM (VALUES (5),(NULL)) s(y))")
    assert [r["x"] for r in rows] == [9]


def test_quantified_any_arithmetic_and_call_left_operands(spark):
    # the left-operand backscan must capture arithmetic chains and
    # call/paren groups, not just bare identifiers
    r = run(spark, "SELECT 2 + 2 > ANY (SELECT x FROM (VALUES (3)) t(x)) AS a,"
                   " abs(-9) > ANY (SELECT x FROM (VALUES (10),(NULL)) t(x)) AS b,"
                   " -1 > ANY (SELECT x FROM (VALUES (0)) t(x)) AS c")[0]
    assert r["a"] is True
    assert r["b"] is None
    assert r["c"] is False
    # unary sign directly after a keyword: the sign belongs to the
    # operand (`WHEN -3 > ANY ...`), it is not a binary minus
    r = run(spark, "SELECT CASE WHEN -3 > ANY (SELECT x FROM (VALUES (1)) t(x))"
                   " THEN 1 ELSE 0 END AS a,"
                   " CASE WHEN -3 < ANY (SELECT x FROM (VALUES (1)) t(x))"
                   " THEN 1 ELSE 0 END AS b")[0]
    assert r["a"] == 0 and r["b"] == 1
    rows = run(spark, "SELECT x FROM (VALUES (1),(2)) t(x)"
                      " WHERE x > 0 AND -x < ANY (SELECT y FROM (VALUES (0)) s(y))")
    assert [r["x"] for r in rows] == [1, 2]


def test_comma_join_unnest(spark):
    # Trino's comma-join UNNEST spelling is sugar for CROSS JOIN UNNEST
    r = run(spark, "SELECT x.id, u.n FROM (VALUES (1, ARRAY[10, 20])) x(id, arr),"
                   " UNNEST(x.arr) AS u(n) ORDER BY u.n")
    assert [(row["id"], row["n"]) for row in r] == [(1, 10), (1, 20)]
    # WITH ORDINALITY through the same comma form
    r = run(spark, "SELECT u.n, u.o FROM (VALUES (ARRAY[7, 8])) x(arr),"
                   " UNNEST(x.arr) WITH ORDINALITY AS u(n, o) ORDER BY u.o")
    assert [(row["n"], row["o"]) for row in r] == [(7, 1), (8, 2)]
    # multiple comma sources before the UNNEST
    r = run(spark, "SELECT a.i, b.j, u.n FROM (VALUES (1)) a(i), (VALUES (2)) b(j),"
                   " UNNEST(ARRAY[5]) AS u(n)")
    assert [(row["i"], row["j"], row["n"]) for row in r] == [(1, 2, 5)]
    # a comma NOT followed by the table-function shape is untouched
    from mcp_trino_spark.trino_compat import translate

    assert "CROSS JOIN" not in translate("SELECT a, UNNEST FROM t")


def test_cast_as_json(spark):
    # Trino's CAST(x AS JSON): JSON text out, SQL NULL stays NULL
    r = run(spark, "SELECT CAST(5 AS JSON) AS a, CAST('ab c' AS JSON) AS b,"
                   " CAST(true AS JSON) AS c, CAST(1.5 AS JSON) AS d,"
                   " CAST(ARRAY[1, 2] AS JSON) AS e,"
                   " CAST(MAP(ARRAY['k'], ARRAY[7]) AS JSON) AS f,"
                   " TRY_CAST(9 AS JSON) AS g,"
                   " CAST(CAST(NULL AS INTEGER) AS JSON) AS h")[0]
    assert r["a"] == "5"
    assert r["b"] == '"ab c"'
    assert r["c"] == "true"
    assert r["d"] == "1.5"
    assert r["e"] == "[1,2]"
    assert r["f"] == '{"k":7}'
    assert r["g"] == "9"
    assert r["h"] is None
    # ordinary casts (incl. constructor types) are untouched by the pass
    r = run(spark, "SELECT CAST('3' AS INTEGER) AS i,"
                   " CAST(ARRAY[1] AS ARRAY(VARCHAR)) AS j")[0]
    assert r["i"] == 3 and list(r["j"]) == ["1"]


def test_md5_sha1_return_varbinary(spark):
    # Trino md5/sha1 return VARBINARY (16/20 bytes), not the hex string
    # Spark's builtins produce — the dialect wraps them in unhex()
    r = run(spark, "SELECT length(md5(to_utf8('abc'))) AS lm,"
                   " length(sha1(to_utf8('abc'))) AS ls,"
                   " to_hex(md5(to_utf8('abc'))) AS hm,"
                   " md5(md5(to_utf8('abc'))) AS nested")[0]
    assert r["lm"] == 16 and r["ls"] == 20
    assert r["hm"] == "900150983CD24FB0D6963F7D28E17F72"
    import hashlib

    inner = hashlib.md5(b"abc").digest()
    assert bytes(r["nested"]) == hashlib.md5(inner).digest()


def test_unicode_literals(spark):
    r = run(spark, r"SELECT U&'Hello' AS a, U&'\0041\0042' AS b,"
                   r" U&'\+01F600' AS c, U&'#0041##' UESCAPE '#' AS d,"
                   r" U&'don''t \00E9' AS e")[0]
    assert r["a"] == "Hello"
    assert r["b"] == "AB"
    assert r["c"] == "\U0001F600"
    assert r["d"] == "A#"
    assert r["e"] == "don't é"
    from mcp_trino_spark.trino_compat import TrinoCompatError, translate

    with pytest.raises(TrinoCompatError, match="escape"):
        translate(r"SELECT U&'\00ZZ'")
    # doubled backslash is the literal escape char itself
    assert translate(r"SELECT U&'a\\b'") == r"SELECT 'a\\b'"
    # the literal ends at the first un-doubled quote even when the body
    # ends with a backslash that is NOT the escape char (UESCAPE '#'):
    # lexing must not let a backslash swallow the closing quote
    r2 = run(spark, r"SELECT U&'a\' UESCAPE '#' AS x")[0]
    assert r2["x"] == "a\\"


# ---------------------------------------------------------------------------
# standalone FROM UNNEST (literal-table idiom)


def test_unnest_as_sole_from_source(spark):
    r = run(spark, "SELECT n FROM UNNEST(sequence(1, 3)) AS t(n) ORDER BY n")
    assert [x["n"] for x in r] == [1, 2, 3]
    r = run(spark, "SELECT n, o FROM UNNEST(ARRAY[7,8]) WITH ORDINALITY"
                   " AS t(n, o) ORDER BY o")
    assert [(x["n"], x["o"]) for x in r] == [(7, 1), (8, 2)]
    r = run(spark, "SELECT k, v FROM UNNEST(MAP(ARRAY['a','b'], ARRAY[1,2]))"
                   " AS t(k, v) ORDER BY k")
    assert [(x["k"], x["v"]) for x in r] == [("a", 1), ("b", 2)]


def test_unnest_multi_array_zip_with_padding(spark):
    # Trino zips multiple arrays, padding the shorter with NULLs
    r = run(spark, "SELECT n, s FROM UNNEST(ARRAY[1,2,3], ARRAY['a','b'])"
                   " AS t(n, s) ORDER BY n NULLS LAST")
    assert [(x["n"], x["s"]) for x in r] == [(1, "a"), (2, "b"), (3, None)]
    r = run(spark, "SELECT count(*) AS c FROM UNNEST("
                   "CAST(ARRAY[] AS ARRAY<INTEGER>),"
                   " CAST(ARRAY[] AS ARRAY<INTEGER>)) AS t(a, b)")
    assert r[0]["c"] == 0
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="counts must match"):
        translate("SELECT a FROM UNNEST(ARRAY[1], ARRAY[2], ARRAY[3])"
                  " AS t(a, b)")


def test_nth_from_last_translation():
    """FROM LAST ≡ nth-from-start of the SAME frame under the reversed
    ordering: directions and null placements flip explicitly, frame
    bounds mirror, the implicit default frame mirrors to an explicit
    RANGE CURRENT ROW .. UNBOUNDED FOLLOWING."""
    out = translate(
        "SELECT nth_value(x, 2) FROM LAST OVER "
        "(PARTITION BY g ORDER BY k) FROM t"
    )
    assert "FROM LAST" not in out
    assert (
        "OVER (PARTITION BY g ORDER BY k DESC NULLS FIRST "
        "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)" in out
    )
    out = translate(
        "SELECT nth_value(x, 2) FROM LAST OVER (ORDER BY k DESC NULLS LAST "
        "ROWS BETWEEN 1 PRECEDING AND 3 FOLLOWING) FROM t"
    )
    assert (
        "OVER (ORDER BY k ASC NULLS FIRST "
        "ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)" in out
    )
    # FROM FIRST is the default: dropped, window untouched
    out = translate(
        "SELECT nth_value(x, 1) FROM FIRST IGNORE NULLS OVER (ORDER BY k) FROM t"
    )
    assert out == (
        "SELECT nth_value(x, 1) IGNORE NULLS OVER (ORDER BY k NULLS LAST) "
        "FROM t"
    )
    # single-bound frame normalizes to BETWEEN ... AND CURRENT ROW first
    out = translate(
        "SELECT nth_value(x, 2) FROM LAST OVER "
        "(ORDER BY k ROWS UNBOUNDED PRECEDING) FROM t"
    )
    assert (
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING" in out
    )
    # multiple keys each flip independently
    out = translate(
        "SELECT nth_value(x, 2) FROM LAST OVER "
        "(ORDER BY a ASC, b DESC NULLS LAST ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) FROM t"
    )
    # a's implicit placement is Trino's ASC NULLS LAST -> flips to
    # DESC NULLS FIRST; b's explicit DESC NULLS LAST -> ASC NULLS FIRST
    assert "ORDER BY a DESC NULLS FIRST, b ASC NULLS FIRST" in out


def test_nth_from_last_rejections_are_loud():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="ORDER BY"):
        translate("SELECT nth_value(x,2) FROM LAST OVER (PARTITION BY g) FROM t")
    with pytest.raises(TrinoCompatError, match="inline"):
        translate(
            "SELECT nth_value(x,2) FROM LAST OVER w FROM t WINDOW w AS (ORDER BY k)"
        )
    with pytest.raises(TrinoCompatError, match="GROUPS"):
        translate(
            "SELECT nth_value(x,2) FROM LAST OVER (ORDER BY k "
            "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM t"
        )


def test_nth_from_last_inside_string_literal_untouched():
    q = "SELECT 'nth_value(x,1) FROM LAST OVER (ORDER BY k)' AS s FROM t"
    assert translate(q) == q


def test_advice_r7_comment_and_subscript_operands():
    """A block/line comment adjacent to a quantified comparison is not
    an operand; array subscripts are valid left operands."""
    out = translate("SELECT * FROM t WHERE x /* c */ > ANY (SELECT a FROM s)")
    # x is the operand, comment inert (r15: the witness term now leads
    # with the thr IS-NOT-NULL empty-set backstop, so the operand sits
    # mid-predicate rather than opening it)
    assert "x /* c */ > (SELECT min(__v)" in out
    # subscripts respell to element_at (1-based) and stay valid operands
    out = translate("SELECT * FROM t WHERE arr[1] > ANY (SELECT a FROM s)")
    assert "element_at(arr, 1) > (SELECT min(__v)" in out
    out = translate("SELECT * FROM t WHERE m.f[1][2] > ANY (SELECT a FROM s)")
    assert "element_at(element_at(m.f, 1), 2) > (SELECT min(__v)" in out


def test_advice_r7_nested_cast_json():
    """Nested CAST(... AS JSON) in the operand is rewritten too, and
    the JSON type inside constructors maps to STRING."""
    out = translate("SELECT CAST(CAST(a AS JSON) AS JSON) FROM t")
    assert "AS JSON" not in out.upper()
    assert out.count("to_json") == 2
    out = translate("SELECT CAST(a AS ARRAY(JSON)) FROM t")
    assert out == "SELECT CAST(a AS ARRAY<STRING>) FROM t"


def test_advice_r7_unicode_surrogate_pairs():
    from mcp_trino_spark.trino_compat import TrinoCompatError

    # U+1F600 spelled as a UTF-16 surrogate pair combines to one char
    out = translate(r"SELECT U&'\D83D\DE00' AS e")
    assert "\U0001F600" in out
    # and the direct 6-digit spelling agrees
    assert translate(r"SELECT U&'\+01F600' AS e") == out
    with pytest.raises(TrinoCompatError, match="surrogate"):
        translate(r"SELECT U&'\D83D' AS e")
    with pytest.raises(TrinoCompatError, match="surrogate"):
        translate(r"SELECT U&'\DE00' AS e")


def test_lambda_regexp_replace(spark):
    """Trino regexp_replace(s, pat, x -> body): per-match lambda over
    the 1-indexed capturing-groups array, rewritten onto split +
    regexp_extract_all + transform (no UDF)."""
    r = spark.sql(
        translate(
            r"SELECT regexp_replace(lower('NEW YORK'), '([a-z])([a-z]*)',"
            r" x -> upper(x[1]) || x[2]) AS t"
        )
    ).first()
    assert r["t"] == "New York"
    # no capturing groups: constant replacement
    r = spark.sql(
        translate(r"SELECT regexp_replace('banana', 'a', x -> 'X') AS t")
    ).first()
    assert r["t"] == "bXnXnX"
    # no match: string unchanged; NULL input: NULL out
    r = spark.sql(
        translate(
            r"SELECT regexp_replace('zzz', 'a+', x -> 'X') AS a,"
            r" regexp_replace(CAST(NULL AS STRING), 'a', x -> 'X') AS b"
        )
    ).first()
    assert r["a"] == "zzz" and r["b"] is None
    # adjacent matches and match-at-both-ends alignment
    r = spark.sql(
        translate(
            r"SELECT regexp_replace('abab', '(a)(b)', x -> x[2] || x[1]) AS t"
        )
    ).first()
    assert r["t"] == "baba"


def test_lambda_regexp_replace_rejections_and_guard(spark):
    from mcp_trino_spark.trino_compat import TrinoCompatError

    with pytest.raises(TrinoCompatError, match="LITERAL"):
        translate("SELECT regexp_replace(s, p, x -> 'X') FROM t")
    with pytest.raises(TrinoCompatError, match="plain"):
        translate(r"SELECT regexp_replace(s, '(?<g>a)', x -> 'X') FROM t")
    # the 3-arg STRING replacement form must stay untouched
    q = "SELECT regexp_replace(s, 'a', 'b') FROM t"
    assert translate(q) == q
    # zero-width match: loud runtime error, never silent misalignment
    import py4j.protocol

    with pytest.raises(
        (py4j.protocol.Py4JJavaError, Exception), match="zero-width"
    ):
        spark.sql(
            translate(r"SELECT regexp_replace('abc', 'x*', x -> 'X') AS t")
        ).collect()


def test_dow_doy_aliases_iso_numbering(spark):
    """Trino's dow()/doy() short aliases (gap-hunt round 8): dow is ISO
    (Mon=1..Sun=7) — Spark's dayofweek(Sun=1) must never leak through."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    r = spark.sql(
        "SELECT dow(DATE '2024-02-10') AS a, doy(DATE '2024-02-10') AS b, "
        "day_of_week(DATE '2024-02-12') AS mon"
    ).first()
    assert r["a"] == 6  # Saturday
    assert r["b"] == 41
    assert r["mon"] == 1  # Monday


def test_nth_from_last_nulls_clause_either_order():
    a = translate(
        "SELECT nth_value(x, 1) IGNORE NULLS FROM LAST OVER (ORDER BY k) FROM t"
    )
    b = translate(
        "SELECT nth_value(x, 1) FROM LAST IGNORE NULLS OVER (ORDER BY k) FROM t"
    )
    assert a == b
    assert "IGNORE NULLS OVER (ORDER BY k DESC NULLS FIRST" in a


def test_extract_dow_yow_iso_fields(spark):
    """extract(dow/yow ...) must land on Spark's ISO spellings — the
    bare pass-through evaluates Spark's Sunday=1 DOW, a silent VALUE
    divergence (round-8 gap-hunt find)."""
    out = translate("SELECT extract(dow FROM d), extract(YOW FROM d) FROM t")
    assert "DAYOFWEEK_ISO" in out and "YEAROFWEEK" in out
    # inside a string literal: untouched
    q = "SELECT 'extract(dow FROM d)' AS s"
    assert translate(q) == q
    r = spark.sql(
        translate(
            "SELECT extract(dow FROM DATE '2024-02-10') AS sat, "
            "extract(day_of_week FROM DATE '2024-02-12') AS mon, "
            "extract(year_of_week FROM DATE '2021-01-01') AS yw"
        )
    ).first()
    assert r["sat"] == 6 and r["mon"] == 1
    assert r["yw"] == 2020  # 2021-01-01 is ISO week 53 of 2020


def test_gap_hunt_r8_value_checks(spark):
    """Value-level follow-up to the round-8 execute-only sweep (the
    extract(dow) lesson: 'it parses' is not 'it is right').  Expected
    values computed from Trino's documented semantics."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    r = spark.sql(
        translate(
            "SELECT luhn_check('79927398713') AS luhn,"
            " soundex('Robert') AS sdx,"
            " width_bucket(3.14, 0, 10, 5) AS wb,"
            " slice(ARRAY[1,2,3,4], 2, 2) AS sl,"
            " array_join(ARRAY['a', CAST(NULL AS VARCHAR), 'b'], ',', '?') AS aj,"
            " split_part('a,b,c', ',', 2) AS sp,"
            " trim(BOTH 'x' FROM 'xxhixx') AS tr,"
            " cosine_similarity(MAP(ARRAY['a','b'], ARRAY[1.0,2.0]),"
            "                   MAP(ARRAY['a','b'], ARRAY[2.0,1.0])) AS cs"
        )
    ).first()
    assert r["luhn"] is True
    assert r["sdx"] == "R163"
    assert r["wb"] == 2
    assert r["sl"] == [2, 3]
    assert r["aj"] == "a,?,b"
    assert r["sp"] == "b"
    assert r["tr"] == "hi"
    assert abs(r["cs"] - 0.8) < 1e-12  # 4 / (sqrt5 * sqrt5)


def test_nth_from_last_equals_native_last_value_with_ties(spark):
    """Property check on the reversal math: nth_value(x, 1) FROM LAST
    over frame F equals Spark's native last_value(x) over the SAME
    (unreversed) frame — for RANGE frames with duplicate order keys
    (peer groups) and for value-offset RANGE frames, the shapes the
    x26 oracle doesn't cover."""
    import pandas as pd

    # x is a FUNCTION of the order key: with duplicate keys the frame's
    # "last row" is an arbitrary peer (nondeterministic in Trino and
    # Spark alike), so the property is only well-defined when all peers
    # carry the same value — which still exercises the frame-boundary
    # math (which peer GROUP is in frame) that the mirror must get right
    ks = [1, 2, 2, 3, 3, 5, 1, 1, 2, 9]
    pdf = pd.DataFrame(
        {
            "g": [1] * 6 + [2] * 4,
            "k": ks,
            "x": [k * 10 for k in ks],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("tie_t")
    for frame in (
        "",  # implicit default: RANGE UNBOUNDED PRECEDING .. CURRENT ROW
        " RANGE BETWEEN 1 PRECEDING AND CURRENT ROW",
        " RANGE BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING",
        " ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING",
    ):
        got = spark.sql(
            translate(
                f"SELECT g, k, x, nth_value(x, 1) FROM LAST OVER "
                f"(PARTITION BY g ORDER BY k{frame}) AS v FROM tie_t"
            )
        )
        want = spark.sql(
            f"SELECT g, k, x, last_value(x) OVER "
            f"(PARTITION BY g ORDER BY k{frame}) AS v FROM tie_t"
        )
        g = {tuple(r) for r in got.collect()}
        w = {tuple(r) for r in want.collect()}
        assert g == w, (frame, g ^ w)


def test_window_exclude_current_row(spark):
    """EXCLUDE CURRENT ROW on ROWS frames decomposes into split
    sub-frames; NO OTHERS strips; GROUP/TIES and RANGE frames reject."""
    import pandas as pd
    from mcp_trino_spark.trino_compat import TrinoCompatError

    spark.createDataFrame(
        pd.DataFrame({"i": [1, 2, 3, 4, 5], "x": [10.0, 20.0, None, 40.0, 50.0]})
    ).createOrReplaceTempView("excl_t")
    r = spark.sql(
        translate(
            "SELECT i,"
            " sum(x) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING"
            "   EXCLUDE CURRENT ROW) AS s,"
            " avg(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"
            "   EXCLUDE CURRENT ROW) AS a,"
            " count(*) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING"
            "   EXCLUDE CURRENT ROW) AS c,"
            " sum(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND"
            "   CURRENT ROW EXCLUDE CURRENT ROW) AS run,"
            " sum(x) OVER (ORDER BY i ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING"
            "   EXCLUDE CURRENT ROW) AS noop,"
            " sum(x) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING"
            "   EXCLUDE NO OTHERS) AS fullw"
            " FROM excl_t ORDER BY i"
        )
    ).collect()
    got = [tuple(row) for row in r]
    assert got == [
        (1, 20.0, 20.0, 2, None, 60.0, 30.0),
        (2, 50.0, 10.0, 3, 10.0, 90.0, 70.0),
        (3, 120.0, 30.0, 4, 30.0, 90.0, 120.0),
        (4, 70.0, 50.0, 3, 30.0, 50.0, 110.0),
        (5, 40.0, 40.0, 2, 70.0, None, 90.0),
    ]
    # GROUP/TIES on ROWS frames: a row-counted frame edge can straddle
    # the peer group — loudly rejected (the peer-subtraction path needs
    # RANGE/GROUPS/implicit frames)
    for bad, msg in (
        ("EXCLUDE GROUP", "GROUP"),
        ("EXCLUDE TIES", "TIES"),
    ):
        with pytest.raises(TrinoCompatError, match=msg):
            translate(
                f"SELECT sum(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING "
                f"AND 1 FOLLOWING {bad}) FROM t"
            )
    with pytest.raises(TrinoCompatError, match="SUM/COUNT"):
        translate(
            "SELECT first_value(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
        )


def test_window_exclude_peer_subtraction(spark):
    """EXCLUDE GROUP/TIES (and CURRENT ROW on RANGE/implicit/GROUPS
    frames) via frame-minus-peer-group subtraction — values verified
    against DuckDB's native EXCLUDE during development (48-variant
    differential, incl. NULL aggregands); the x31 oracle entry pins
    the differential in the graded window."""
    import pandas as pd
    from mcp_trino_spark.trino_compat import TrinoCompatError

    spark.createDataFrame(
        pd.DataFrame(
            {"i": [1, 2, 3, 4, 5],
             "k": [1, 1, 2, 2, 3],
             "x": [10.0, 20.0, None, 40.0, 50.0]}
        )
    ).createOrReplaceTempView("exclp_t")
    r = spark.sql(
        translate(
            "SELECT i,"
            " sum(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE GROUP) AS sg,"
            " sum(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE TIES) AS st,"
            " sum(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS sc,"
            " count(*) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE GROUP) AS cg,"
            " avg(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE GROUP) AS ag,"
            " sum(x) OVER (ORDER BY k EXCLUDE GROUP) AS sg_run,"
            " sum(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND"
            "   CURRENT ROW EXCLUDE GROUP) AS sg_grp"
            " FROM exclp_t ORDER BY i"
        )
    ).collect()
    got = [
        tuple(None if v is None else round(float(v), 6) for v in row[1:])
        for row in r
    ]
    third = round(80.0 / 3.0, 6)
    sev3 = round(70.0 / 3.0, 6)
    assert got == [
        (90.0, 100.0, 110.0, 3, 45.0, None, None),
        (90.0, 110.0, 100.0, 3, 45.0, None, None),
        (80.0, 80.0, 120.0, 3, third, 30.0, 30.0),
        (80.0, 120.0, 80.0, 3, third, 30.0, 30.0),
        (70.0, 120.0, 70.0, 4, sev3, 70.0, 40.0),
    ]
    # a frame strictly ahead of the current row contains none of its
    # peers either — EXCLUDE GROUP is a no-op (clause stripped)
    assert translate(
        "SELECT sum(x) OVER (ORDER BY k RANGE BETWEEN 1 FOLLOWING AND "
        "2 FOLLOWING EXCLUDE GROUP) FROM t"
    ) == (
        "SELECT sum(x) OVER (ORDER BY k NULLS LAST RANGE BETWEEN "
        "1 FOLLOWING AND 2 FOLLOWING) FROM t"
    )
    # min/max under GROUP/TIES route through peer-aligned GROUPS
    # sub-windows (test_window_exclude_minmax); a numeric-valued RANGE
    # bound is NOT group-aligned and stays loud
    with pytest.raises(TrinoCompatError, match="peer-group-aligned"):
        translate(
            "SELECT min(x) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING "
            "AND CURRENT ROW EXCLUDE GROUP) FROM t"
        )
    with pytest.raises(TrinoCompatError, match="ORDER BY"):
        translate("SELECT sum(x) OVER (PARTITION BY k EXCLUDE GROUP) FROM t")
    with pytest.raises(TrinoCompatError, match="DISTINCT"):
        translate(
            "SELECT sum(DISTINCT x) OVER (ORDER BY k EXCLUDE GROUP) FROM t"
        )


def test_window_exclude_minmax(spark):
    """MIN/MAX under EXCLUDE GROUP/TIES on peer-aligned frames: two
    offset-bound GROUPS sub-windows (prefix to 1 group PRECEDING,
    suffix from 1 FOLLOWING) combined with least/greatest; TIES adds
    the current row's own value.  The x35 oracle entry pins the
    differential vs DuckDB's native EXCLUDE in the graded window."""
    import pandas as pd
    from mcp_trino_spark.trino_compat import TrinoCompatError

    spark.createDataFrame(
        pd.DataFrame(
            {"i": [1, 2, 3, 4, 5],
             "k": [1, 1, 2, 2, 3],
             "x": [10.0, 20.0, None, 40.0, 50.0]}
        )
    ).createOrReplaceTempView("exclm_t")
    r = spark.sql(
        translate(
            "SELECT i,"
            " min(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE GROUP) AS ming,"
            " max(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE TIES) AS maxt,"
            " min(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE TIES) AS mint,"
            " min(x) OVER (ORDER BY k EXCLUDE GROUP) AS run_min,"
            " max(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND"
            "   1 FOLLOWING EXCLUDE GROUP) AS nbr_max"
            " FROM exclm_t ORDER BY i"
        )
    ).collect()
    got = [tuple(row)[1:] for row in r]
    assert got == [
        (40.0, 50.0, 10.0, None, 40.0),
        (40.0, 50.0, 20.0, None, 40.0),
        (10.0, 50.0, 10.0, 10.0, 50.0),
        (10.0, 50.0, 10.0, 10.0, 50.0),
        (10.0, 50.0, 10.0, 10.0, 40.0),
    ]
    # both sub-windows of each column share ONE dense_rank group
    # column (one Window sort, one exchange)
    out = translate(
        "SELECT min(x) OVER (ORDER BY k EXCLUDE GROUP),"
        " max(x) OVER (ORDER BY k EXCLUDE TIES) FROM t"
    )
    assert out.upper().count("DENSE_RANK") == 1
    # frame exactly the peer group: empty after EXCLUDE GROUP -> typed
    # NULL; after EXCLUDE TIES -> the row's own value
    assert "if(false" in translate(
        "SELECT min(x) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW AND "
        "CURRENT ROW EXCLUDE GROUP) FROM t"
    )
    assert translate(
        "SELECT max(x) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW AND "
        "CURRENT ROW EXCLUDE TIES) AS m FROM t"
    ) == "SELECT ((x)) AS m FROM t"
    # GROUPS frames with numeric offsets convert directly; a fractional
    # or value-typed RANGE offset cannot
    with pytest.raises(TrinoCompatError, match="peer-group-aligned"):
        translate(
            "SELECT max(x) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW "
            "AND 2.5 FOLLOWING EXCLUDE TIES) FROM t"
        )


def test_bare_subscripts_rewritten(spark):
    """Trino subscripts are 1-based on arrays and key-exact on maps;
    the rewrite respells every bare subscript to element_at (the
    former documented silent-divergence gap)."""
    from mcp_trino_spark.trino_compat import TrinoCompatError

    assert translate("SELECT arr[1] FROM t") == (
        "SELECT element_at(arr, 1) FROM t"
    )
    assert translate("SELECT a[1][i+1], f(x)[2] FROM t") == (
        "SELECT element_at(element_at(a, 1), i+1), "
        "element_at(f(x), 2) FROM t"
    )
    # 1-based end-to-end: [1] is the FIRST element; dynamic index via
    # cardinality lands on the LAST; map access is key-exact
    rows = run(
        spark,
        "SELECT split('a b c', ' ')[1] AS w1, "
        "split('a b c', ' ')[cardinality(split('a b c', ' '))] AS wl, "
        "MAP(ARRAY['k'], ARRAY[7])['k'] AS mv",
    )
    assert rows[0] == {"w1": "a", "wl": "c", "mv": 7}
    # index 0 errors (ANSI element_at), exactly as Trino's 1-based
    # arrays reject it
    import pytest as _pt
    with _pt.raises(Exception, match="INVALID_INDEX_OF_ZERO|index 0 is invalid"):
        run(spark, "SELECT split('a b', ' ')[0]")
    # literals/comments untouched; keyword bases never attach
    q = "SELECT '[1]' AS s -- arr[2]\nFROM t"
    assert translate(q) == q
    with _pt.raises(TrinoCompatError, match="empty subscript"):
        translate("SELECT arr[] FROM t")


def test_least_greatest_null_poison_and_literal_div(spark):
    """Trino least/greatest return NULL on ANY NULL argument (Spark
    skips NULLs); Trino integer-literal division truncates toward
    zero (Spark's / is fractional)."""
    rows = run(
        spark,
        "SELECT 5/2 AS d, -7/2 AS n, 5/2.0 AS f, "
        "least(1, NULL) AS l, greatest(2, NULL) AS g, "
        "least(3, 1, 2) AS ok, least(least(4, NULL), 9) AS nested",
    )
    assert rows[0] == {
        "d": 2, "n": -3, "f": 2.5, "l": None, "g": None, "ok": 1,
        "nested": None,
    }
    # generated least/greatest keep Spark's skip-NULL semantics: the
    # EXCLUDE split's min combine must still ignore the empty side
    assert translate("SELECT 5/2 AS d FROM t") == (
        "SELECT (5 div 2) AS d FROM t"
    )
    out = translate(
        "SELECT min(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND "
        "1 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
    )
    assert "least(min(x) OVER" in out  # un-guarded, by design


def test_order_by_null_placement_defaults(spark):
    """Trino sorts NULLs as LARGEST by default (ASC -> NULLS LAST,
    DESC -> NULLS FIRST); Spark defaults the exact opposite.  The
    rewrite makes the placement explicit on every sort item it finds
    — statement-level, window, WITHIN GROUP — leaving explicit
    clauses alone."""
    assert translate("SELECT x FROM t ORDER BY x") == (
        "SELECT x FROM t ORDER BY x NULLS LAST"
    )
    assert translate(
        "SELECT x FROM t ORDER BY x DESC, y ASC LIMIT 5"
    ) == "SELECT x FROM t ORDER BY x DESC NULLS FIRST, y ASC NULLS LAST LIMIT 5"
    assert translate("SELECT x FROM t ORDER BY x NULLS FIRST") == (
        "SELECT x FROM t ORDER BY x NULLS FIRST"
    )
    assert translate(
        "SELECT row_number() OVER (PARTITION BY p ORDER BY k) FROM t"
    ) == (
        "SELECT row_number() OVER (PARTITION BY p ORDER BY k NULLS LAST) "
        "FROM t"
    )
    # frame keywords terminate the sort list
    assert translate(
        "SELECT sum(x) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW) FROM t"
    ) == (
        "SELECT sum(x) OVER (ORDER BY k NULLS LAST ROWS BETWEEN "
        "1 PRECEDING AND CURRENT ROW) FROM t"
    )
    # nested subquery ORDER BY inside a sort item: both rewritten
    out = translate(
        "SELECT x FROM t ORDER BY (SELECT max(z) FROM v ORDER BY z "
        "LIMIT 1) DESC"
    )
    assert "ORDER BY z NULLS LAST LIMIT 1) DESC NULLS FIRST" in out
    # literals untouched
    q = "SELECT 'ORDER BY x' AS s FROM t"
    assert translate(q) == q
    # end-to-end: Trino places NULLs last ascending, first descending
    rows = run(
        spark,
        "SELECT i FROM (VALUES (2), (NULL), (1)) t(i) ORDER BY i",
    )
    assert [r["i"] for r in rows] == [1, 2, None]
    rows = run(
        spark,
        "SELECT i FROM (VALUES (2), (NULL), (1)) t(i) ORDER BY i DESC",
    )
    assert [r["i"] for r in rows] == [None, 2, 1]
    # array_agg picks up explicit non-default placements too
    rows = run(
        spark,
        "SELECT array_agg(i ORDER BY i NULLS FIRST) AS a "
        "FROM (VALUES (2), (NULL), (1)) t(i)",
    )
    assert rows[0]["a"] == [None, 1, 2]
    rows = run(
        spark,
        "SELECT array_agg(i ORDER BY i) AS a "
        "FROM (VALUES (2), (NULL), (1)) t(i)",
    )
    assert rows[0]["a"] == [1, 2, None]


def test_element_at_nullsafe_respell(spark):
    """User-spelled element_at -> try_element_at (Trino is NULL out of
    bounds; ANSI Spark's element_at throws); generated element_at from
    the subscript pass stays STRICT (Trino subscripts also throw)."""
    assert translate("SELECT element_at(arr, 5) FROM t") == (
        "SELECT try_element_at(arr, 5) FROM t"
    )
    assert translate("SELECT ELEMENT_AT(m, 'k') FROM t") == (
        "SELECT try_element_at(m, 'k') FROM t"
    )
    # already-lenient spelling and literals untouched
    assert translate("SELECT try_element_at(arr, 5) FROM t") == (
        "SELECT try_element_at(arr, 5) FROM t"
    )
    assert translate("SELECT 'element_at(x,1)' FROM t") == (
        "SELECT 'element_at(x,1)' FROM t"
    )
    # subscript spelling keeps the throwing parity
    assert translate("SELECT arr[5] FROM t") == (
        "SELECT element_at(arr, 5) FROM t"
    )
    # end-to-end values: OOB/missing-key NULL, negative from-end,
    # in-range hit — matching Trino's element_at on every edge
    row = spark.sql(
        translate(
            "SELECT element_at(ARRAY[10, 20], 5) AS oob,"
            " element_at(ARRAY[10, 20], -1) AS last,"
            " element_at(ARRAY[10, 20], -7) AS negoob,"
            " element_at(MAP(ARRAY['a'], ARRAY[1]), 'z') AS miss,"
            " element_at(MAP(ARRAY['a'], ARRAY[1]), 'a') AS hit"
        )
    ).collect()[0]
    assert tuple(row) == (None, 20, None, None, 1)


def test_regexp_extract_nullsafe_rewrite(spark):
    """Trino regexp_extract: NULL on no-match, whole match (group 0)
    in the 2-arg form — Spark's '' and default-group-1 semantics (and
    its error on groupless 2-arg patterns) are rewritten away."""
    assert translate("SELECT regexp_extract(s, 'p') FROM t") == (
        "SELECT (CASE WHEN regexp_like(s, 'p') "
        "THEN regexp_extract(s, 'p', 0) END) FROM t"
    )
    assert translate("SELECT regexp_extract(s, 'p', 2) FROM t") == (
        "SELECT (CASE WHEN regexp_like(s, 'p') "
        "THEN regexp_extract(s, 'p', 2) END) FROM t"
    )
    # regexp_extract_all untouched by this pass
    assert "regexp_extract_all" in translate(
        "SELECT regexp_extract_all(s, 'p') FROM t"
    )
    row = spark.sql(
        translate(
            r"SELECT regexp_extract('abc', 'x(y)') AS nomatch,"
            r" regexp_extract('abc', 'a') AS whole,"
            r" regexp_extract('a1b2', '([a-z])(\d)', 2) AS grp,"
            r" regexp_extract('abc', 'x*') AS emptymatch,"
            r" regexp_extract(CAST(NULL AS VARCHAR), 'a') AS nullin"
        )
    ).collect()[0]
    assert tuple(row) == (None, "a", "1", "", None)


def test_split_part_trino_semantics(spark):
    """Trino split_part: NULL past the field count, error on index < 1
    — Spark's ''-out-of-range and negative-from-the-end are rewritten
    away (field count via literal replace, non-overlapping)."""
    from mcp_trino_spark.trino_compat import TrinoCompatError

    row = spark.sql(
        translate(
            "SELECT split_part('a,b,c', ',', 2) AS ok,"
            " split_part('a,b,c', ',', 9) AS oob,"
            " split_part('a,,c', ',', 2) AS emptyfield,"
            " split_part('abc', 'x', 1) AS whole,"
            " split_part('aaa', 'aa', 2) AS overlap,"
            " split_part(CAST(NULL AS VARCHAR), ',', 1) AS nullin"
        )
    ).collect()[0]
    assert tuple(row) == ("b", None, "", "abc", "a", None)
    import pytest as _pytest

    with _pytest.raises(Exception, match="greater than zero"):
        spark.sql(
            translate("SELECT split_part('a,b', ',', -1) AS v")
        ).collect()
    # review-caught: a NULL string short-circuits BEFORE the index
    # guard (Trino is RETURNS-NULL-ON-NULL-INPUT)
    assert spark.sql(
        translate(
            "SELECT split_part(CAST(NULL AS VARCHAR), ',', -1) AS v"
        )
    ).collect()[0]["v"] is None
    with _pytest.raises(TrinoCompatError, match="string, delimiter, index"):
        translate("SELECT split_part('a,b', ',') FROM t")


def test_trim_chars_arg_order(spark):
    """Two-arg trim/ltrim/rtrim: Trino is (string, chars); Spark's
    two-arg forms are (trimStr, str) — rewritten via btrim / swapped
    args.  One-arg and FROM-grammar forms pass through."""
    assert translate("SELECT trim(s, 'x') FROM t") == (
        "SELECT btrim(s, 'x') FROM t"
    )
    assert translate("SELECT ltrim(s, 'x'), rtrim(s, 'y') FROM t") == (
        "SELECT TRIM(LEADING 'x' FROM s), TRIM(TRAILING 'y' FROM s) FROM t"
    )
    assert translate("SELECT trim(s), trim(BOTH 'x' FROM s) FROM t") == (
        "SELECT trim(s), trim(BOTH 'x' FROM s) FROM t"
    )
    row = spark.sql(
        translate(
            "SELECT trim('xhellox', 'x') AS t2,"
            " ltrim('xhellox', 'x') AS l2,"
            " rtrim('xhellox', 'x') AS r2,"
            " ltrim(rtrim('aheya', 'a'), 'a') AS nested"
        )
    ).collect()[0]
    assert tuple(row) == ("hello", "hellox", "xhello", "hey")


def test_ieee_constant_constructors(spark):
    """Trino nan()/infinity() — Spark has no equivalents; served by
    zero-arg SQL UDFs (present since dialect batch 2 — pinned here
    because no test covered them)."""
    from mcp_trino_spark.trino_compat import install_compat_functions
    import math

    install_compat_functions(spark)
    row = spark.sql(
        translate(
            "SELECT nan() AS n, infinity() AS i, -infinity() AS ni,"
            " is_nan(nan()) AS isn, is_infinite(infinity()) AS isi,"
            " is_finite(infinity()) AS isf"
        )
    ).collect()[0]
    assert math.isnan(row["n"]) and row["i"] == math.inf
    assert row["ni"] == -math.inf
    assert (row["isn"], row["isi"], row["isf"]) == (True, True, False)


def test_log_family_ieee(spark):
    """Trino's log family is pure Math.log: 0 -> -Infinity, negative ->
    NaN; Spark's builtins return NULL for non-positives.  Positive
    inputs keep the builtin (bit-exact); 2-arg log divides two IEEE
    trees under a zero-divisor guard."""
    import math

    from mcp_trino_spark.trino_compat import (
        TrinoCompatError,
        install_compat_functions,
    )

    install_compat_functions(spark)
    row = spark.sql(
        translate(
            "SELECT ln(0e0) AS ln0, ln(-1e0) AS lnneg, ln(1e0) AS ln1,"
            " log10(0e0) AS l10z, log10(100e0) AS l10h,"
            " log2(8e0) AS l2e, log(2e0, 8e0) AS lb,"
            " log(2e0, 0e0) AS lbz, log(1e0, 2e0) AS base1,"
            " log(1e0, 1e0) AS b1one, ln(CAST(NULL AS DOUBLE)) AS lnull,"
            " ln(nan()) AS lnan"
        )
    ).collect()[0]
    assert row["ln0"] == -math.inf and math.isnan(row["lnneg"])
    assert row["ln1"] == 0.0 and row["l10z"] == -math.inf
    assert (row["l10h"], row["l2e"], row["lb"]) == (2.0, 3.0, 3.0)
    assert row["lbz"] == -math.inf and row["base1"] == math.inf
    assert math.isnan(row["b1one"]) and row["lnull"] is None
    assert math.isnan(row["lnan"])
    # review-caught: NULL numerator with base 1 must be NULL, not
    # -Infinity (Trino is RETURNS-NULL-ON-NULL-INPUT)
    assert spark.sql(
        translate("SELECT log(1e0, CAST(NULL AS DOUBLE)) AS v")
    ).collect()[0]["v"] is None
    # Trino has NO 1-arg log
    import pytest as _pytest

    with _pytest.raises(TrinoCompatError, match="base, x"):
        translate("SELECT log(x) FROM t")
    # generated Spark-semantics ln (geometric_mean) is NOT rewrapped
    assert "CASE WHEN" not in translate(
        "SELECT geometric_mean(x) FROM t"
    ).split("exp(")[-1]


def test_orderless_ranking_windows(spark):
    """Ranking/offset windows without ORDER BY are Trino-legal (all
    rows peers); Spark refuses them — the injected constant ORDER BY 1
    reproduces the all-peers semantics."""
    assert translate("SELECT row_number() OVER () FROM t") == (
        "SELECT row_number() OVER (ORDER BY 1) FROM t"
    )
    assert translate("SELECT rank() OVER (PARTITION BY p) FROM t") == (
        "SELECT rank() OVER (PARTITION BY p ORDER BY 1) FROM t"
    )
    # ordered specs and aggregate windows untouched
    assert "ORDER BY x NULLS LAST" in translate(
        "SELECT rank() OVER (ORDER BY x) FROM t"
    )
    assert translate("SELECT count(*) OVER () FROM t") == (
        "SELECT count(*) OVER () FROM t"
    )
    rows = spark.sql(
        translate(
            "SELECT rank() OVER () AS rk, percent_rank() OVER () AS pr,"
            " cume_dist() OVER () AS cd,"
            " row_number() OVER () AS rn"
            " FROM (VALUES (1),(2),(3)) t(x)"
        )
    ).collect()
    assert all((r["rk"], r["pr"], r["cd"]) == (1, 0.0, 1.0) for r in rows)
    assert sorted(r["rn"] for r in rows) == [1, 2, 3]


def test_multiarg_grouping(spark):
    """Trino's multi-arg grouping(c1..cn) bitmask == Spark's
    grouping_id (leftmost = MSB, bit set when aggregated away);
    1-arg grouping and GROUPING SETS clauses pass through."""
    assert translate(
        "SELECT grouping(a, b) FROM t GROUP BY GROUPING SETS ((a), (a, b))"
    ) == (
        "SELECT grouping_id(a, b) FROM t GROUP BY GROUPING SETS ((a), (a, b))"
    )
    assert "grouping(a)" in translate(
        "SELECT grouping(a) FROM t GROUP BY ROLLUP (a)"
    )
    rows = spark.sql(
        translate(
            "SELECT grouping(x, y) AS g, x, y"
            " FROM (VALUES (1, 2)) t(x, y)"
            " GROUP BY GROUPING SETS ((x), (x, y), ())"
        )
    ).collect()
    got = sorted((r["g"], r["x"], r["y"]) for r in rows)
    # (x,y) kept -> 0; (x) only -> y aggregated -> 0b01 = 1; () -> 0b11 = 3
    assert got == [(0, 1, 2), (1, 1, None), (3, None, None)]


def test_window_exclude_current_row_minmax(spark):
    """MIN/MAX under EXCLUDE CURRENT ROW on peer-defined frames (x42):
    the x35 sub-windows cover the beyond-group region, and peers-minus-
    self comes from the two ROWS half-frames of a window re-partitioned
    by (partition + order keys) — whose union is peers-minus-self under
    any physical order.  Hand-computed over real multi-row peer groups
    including a NULL peer and a peerless row."""
    import pandas as pd
    from mcp_trino_spark.trino_compat import TrinoCompatError

    spark.createDataFrame(
        pd.DataFrame(
            {"i": [1, 2, 3, 4, 5],
             "k": [1, 1, 2, 2, 3],
             "x": [10.0, 20.0, None, 40.0, 50.0]}
        )
    ).createOrReplaceTempView("exclcr_t")
    r = spark.sql(
        translate(
            "SELECT i,"
            " min(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND"
            "   UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS all_min,"
            " max(x) OVER (ORDER BY k EXCLUDE CURRENT ROW) AS run_max,"
            " min(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND"
            "   1 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_min,"
            " max(x) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW AND"
            "   CURRENT ROW EXCLUDE CURRENT ROW) AS peer_max"
            " FROM exclcr_t ORDER BY i"
        )
    ).collect()
    got = [tuple(row)[1:] for row in r]
    assert got == [
        (20.0, 20.0, 20.0, 20.0),
        (10.0, 10.0, 10.0, 10.0),
        (10.0, 40.0, 10.0, 40.0),
        (10.0, 20.0, 10.0, None),   # row 4's only peer carries NULL
        (10.0, 40.0, 40.0, None),   # row 5 has no peers at all
    ]
    # a numeric RANGE bound is not peer-group-aligned — stays loud
    with pytest.raises(TrinoCompatError, match="peer-group-aligned"):
        translate(
            "SELECT min(x) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING "
            "AND CURRENT ROW EXCLUDE CURRENT ROW) FROM t"
        )
    # ROWS frames keep using the x29 row split, not the peer path
    out = translate(
        "SELECT min(x) OVER (ORDER BY k ROWS BETWEEN 2 PRECEDING AND "
        "2 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
    )
    assert "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING" in out


def test_substr_start_semantics(spark):
    """Trino substr: start 0 and out-of-range negative starts return
    EMPTY; Spark treats 0 as 1 and clamps negatives to the beginning.
    The guard must fix those two regimes, leave every agreeing regime
    untouched, preserve binary typing, and cover the ANSI FROM/FOR
    spelling (x43 pins the differential on real data)."""
    r = run(
        spark,
        "SELECT substr('abcde', 0) AS z0, substring('abcde', 0, 2) AS z02,"
        " substr('abcde', -2) AS m2, substr('abcde', -7) AS m7,"
        " substring('abcde' FROM -7 FOR 3) AS m73,"
        " substr('abcde', 2, 2) AS p22, substr('abcde', 6) AS p6,"
        " substr('abcde', -5) AS m5, substr('abcde', 2, -1) AS negl,"
        " substr(CAST(NULL AS VARCHAR), 2) AS nl,"
        " substr(X'0A0B0C', 0) AS bin0, substr(X'0A0B0C', 2) AS bin2",
    )[0]
    assert r == {
        "z0": "", "z02": "", "m2": "de", "m7": "", "m73": "",
        "p22": "bc", "p6": "", "m5": "abcde", "negl": "", "nl": None,
        "bin0": b"", "bin2": b"\x0b\x0c",
    }


def test_window_exclude_current_row_minmax_desc_nulls(spark):
    """x42 with a DESC NULLS FIRST order key and NULL keys: the
    refined-window split partitions by the STRIPPED key expression
    (_split_window_head drops direction/placement), and NULL order
    keys form their own peer group on both engines."""
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame(
            {"i": [1, 2, 3, 4, 5],
             "k": [1.0, 1.0, 2.0, None, None],
             "x": [10.0, 20.0, 30.0, 40.0, 50.0]}
        )
    ).createOrReplaceTempView("exclcrd_t")
    r = spark.sql(
        translate(
            "SELECT i, min(x) OVER (ORDER BY k DESC NULLS FIRST"
            " RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
            " EXCLUDE CURRENT ROW) AS m FROM exclcrd_t ORDER BY i"
        )
    ).collect()
    assert [(row["i"], row["m"]) for row in r] == [
        (1, 20.0), (2, 10.0), (3, 10.0), (4, 10.0), (5, 10.0)
    ]


def test_map_concat_duplicate_keys_last_win(spark):
    """Trino map_concat: last map wins a duplicate key; Spark throws
    under mapKeyDedupPolicy=EXCEPTION.  The per-call rewrite keeps the
    global policy (so map()/map_from_entries duplicates still throw,
    Trino parity) while making map_concat last-wins (x44 pins the
    differential on real data)."""
    r = run(
        spark,
        "SELECT map_concat(MAP(ARRAY['a','b'], ARRAY[1,2]),"
        " MAP(ARRAY['a'], ARRAY[9])) AS m1,"
        " map_concat(MAP(ARRAY['a'], ARRAY[1]), MAP(ARRAY['b'], ARRAY[2]),"
        " MAP(ARRAY['a'], ARRAY[3])) AS m2,"
        " map_concat(MAP(ARRAY['a'], ARRAY[1]),"
        " CAST(NULL AS MAP<STRING,INT>)) AS m3",
    )[0]
    assert r["m1"] == {"a": 9, "b": 2}
    assert r["m2"] == {"a": 3, "b": 2}
    assert r["m3"] is None
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        run(spark, "SELECT map_from_entries(ARRAY[ROW('a',1),ROW('a',2)])")


def test_weighted_approx_percentile(spark):
    """Trino approx_percentile(x, w, p[, acc]) → Spark's exact
    percentile(x, p, w): frequency == per-row weight; accuracy drops
    (exact satisfies any bound); scalar and array percentages; the
    unweighted forms keep the percentile_approx rename (x45 pins the
    differential on real data)."""
    r = run(
        spark,
        "SELECT approx_percentile(x, w, 0.5) AS p,"
        " approx_percentile(x, w, ARRAY[0.25, 0.75]) AS pa,"
        " approx_percentile(x, w, 0.5, 0.01) AS pacc,"
        " approx_percentile(x, 0.5) AS pu"
        " FROM (VALUES (1.0, 1), (2.0, 1), (3.0, 10)) t(x, w)",
    )[0]
    assert r["p"] == 3.0          # weight-10 value dominates the median
    assert r["pa"] == [3.0, 3.0]
    assert r["pacc"] == 3.0
    assert r["pu"] == 2.0         # unweighted: plain median


def test_kurtosis_unbiased_and_minmax_n(spark):
    """Trino's kurtosis is the unbiased sample excess estimator
    (Spark's is population g2 — silently different values); min(x, n)/
    max(x, n) return the n extremes as arrays (Spark's are 1-arg).
    x46 pins the differential on real data; here: known values, the
    n<=3 NULL contract, and the window form of the n-extremes."""
    r = run(
        spark,
        "SELECT round(kurtosis(x), 6) AS k, round(skewness(x), 6) AS s,"
        " min(x, 2) AS mn, max(x, 2) AS mx"
        " FROM (VALUES (1.0),(2.0),(3.0),(4.0),(10.0)) t(x)",
    )[0]
    assert r["k"] == 3.152      # unbiased G2 (population g2 is -0.212)
    assert r["s"] == 1.13842    # population g1 on both engines
    assert [float(v) for v in r["mn"]] == [1.0, 2.0]
    assert [float(v) for v in r["mx"]] == [10.0, 4.0]
    assert run(
        spark, "SELECT kurtosis(x) AS k FROM (VALUES (1.0),(2.0),(3.0)) t(x)"
    )[0]["k"] is None           # estimator undefined below n=4
    rows = run(
        spark,
        "SELECT max(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS w"
        " FROM (VALUES (1.0),(2.0),(3.0)) t(x) ORDER BY x",
    )
    assert [[float(v) for v in row["w"]] for row in rows] == [
        [1.0], [2.0, 1.0], [3.0, 2.0]
    ]


def test_width_bucket_bins_array(spark):
    """Trino's 2-arg width_bucket(x, bins) — the bucket number against
    an explicit boundary array (count of boundaries <= x) — died on
    arity under Spark's strictly 4-arg width_bucket.  Boundary-equal,
    below-first, above-last, and NULL-input cases pinned; the 4-arg
    equal-width form stays native."""
    r = run(
        spark,
        "SELECT width_bucket(5.3, ARRAY[1.0, 4.0, 7.0]) AS b1,"
        " width_bucket(0.5, ARRAY[1.0, 4.0, 7.0]) AS b2,"
        " width_bucket(9.0, ARRAY[1.0, 4.0, 7.0]) AS b3,"
        " width_bucket(4.0, ARRAY[1.0, 4.0, 7.0]) AS b4,"
        " width_bucket(CAST(NULL AS DOUBLE), ARRAY[1.0]) AS b5,"
        " width_bucket(5.3, 0, 10, 5) AS b6",
    )[0]
    assert r == {"b1": 2, "b2": 0, "b3": 3, "b4": 2, "b5": None, "b6": 3}


def test_year_month_interval_collects_as_string(spark):
    """PySpark cannot move year-month interval VALUES into Python
    (YearMonthIntervalType.fromInternal is NOT_IMPLEMENTED), so a
    Trino-valid `SELECT INTERVAL '1-2' YEAR TO MONTH` crashed the
    façade at collect until round 10 — the shaping layer now
    stringifies those columns (day-time intervals pass through as
    timedeltas, and interval ARITHMETIC is unaffected either way)."""
    from mcp_trino_spark.execute import execute_query

    r = execute_query(
        spark,
        "SELECT INTERVAL '1-2' YEAR TO MONTH AS ym,"
        " INTERVAL '1 02:03:04' DAY TO SECOND AS ds,"
        " DATE '2024-01-31' + INTERVAL '1' MONTH AS plus_m",
        dialect="trino",
    )
    row = r.rows[0]
    assert "1-2" in row["ym"]            # stringified, value visible
    import datetime

    assert row["ds"] == datetime.timedelta(days=1, hours=2, minutes=3,
                                           seconds=4)
    assert str(row["plus_m"]) == "2024-02-29"


# ---------------------------------------------------------------------------
# column-typed integer division (round 11, x47): schema-aware rewrite


_DIV_TYPES = {
    "a": "bigint", "b": "int", "c": "smallint", "d": "double",
    "amb": "ambiguous",
}


def _tdiv(q):
    return translate(q, column_types=_DIV_TYPES)


def test_column_int_division_plain_and_literal():
    assert _tdiv("SELECT a / b FROM t") == "SELECT (a div b) FROM t"
    assert _tdiv("SELECT a / 3 FROM t") == "SELECT (a div 3) FROM t"
    assert _tdiv("SELECT 100 / b FROM t") == "SELECT (100 div b) FROM t"
    assert _tdiv("SELECT t1.a / t2.b FROM t") == "SELECT (t1.a div t2.b) FROM t"


def test_column_int_division_skips_unknowable():
    # double column, ambiguous name, function result, parenthesized
    # arithmetic, subquery alias: all stay fractional (documented residue)
    for q in (
        "SELECT d / b FROM t",
        "SELECT amb / 3 FROM t",
        "SELECT sum(a) / count(*) FROM t",
        "SELECT (a + 1) / 2 FROM t",
        "SELECT unknown_col / b FROM t",
    ):
        assert " div " not in _tdiv(q), q


def test_column_int_division_cast_operands():
    # d is a DOUBLE column, so the r11 cast-rounding pass first
    # rewrites CAST(d AS BIGINT) to Trino's Math.round form; the
    # resulting CAST(... AS BIGINT) is still an integral operand and
    # the division pass composes `div` on top of it
    out = _tdiv("SELECT CAST(d AS BIGINT) / b FROM t")
    assert out == (
        "SELECT (CAST(IF(isnan(CAST((d) AS DOUBLE)),"
        " raise_error('Cannot cast double NaN to bigint'),"
        " IF((d) < 0, IF(CAST((d) AS DOUBLE) = -9.223372036854776E18,"
        " CAST('-9223372036854775808' AS BIGINT),"
        " -floor((-(d)) + 0.5D)), floor((d) + 0.5D)))"
        " AS BIGINT) div b) FROM t"
    )
    # an integral column needs no rounding — the bare CAST survives
    assert (
        _tdiv("SELECT CAST(a AS BIGINT) / b FROM t")
        == "SELECT (CAST(a AS BIGINT) div b) FROM t"
    )
    assert " div " not in _tdiv("SELECT CAST(a AS DOUBLE) / b FROM t")


def test_column_int_division_chains_reenter():
    assert _tdiv("SELECT a / b / c FROM t") == "SELECT ((a div b) div c) FROM t"
    # the double tail stays FRACTIONAL — the int-division pass emits
    # (a div b) and leaves `/ d` alone; since r15 the x81 IEEE
    # zero-divisor dispatch additionally guards the knowably-double
    # division, keeping the plain `((a div b)) / (d)` on the hot path
    out = _tdiv("SELECT a / b / d FROM t")
    assert "((a div b)) / (d)" in out
    assert " div d" not in out and " div (d)" not in out


def test_column_int_division_respects_literals_and_comments():
    assert _tdiv("SELECT '/x/y', a / b FROM t") == "SELECT '/x/y', (a div b) FROM t"
    out = _tdiv("SELECT a /* a/b */ / b FROM t")
    assert out.endswith("/ b FROM t") or " div " in out  # comment body untouched


def test_column_int_division_without_map_is_unchanged():
    # no column_types → the pass never runs (the pre-r11 behavior)
    assert translate("SELECT a / b FROM t") == "SELECT a / b FROM t"


def test_kurtosis_window_form_relocates_over(spark):
    """ADVICE r10: `kurtosis(x) OVER (...)` used to rewrite to
    `(CASE ... END) OVER (...)` — a parse error on a Trino-valid query.
    The OVER clause now moves inside onto every generated aggregate
    (count + kurtosis), and the windowed value matches the grouped
    aggregate on a single-group input."""
    out = translate("SELECT kurtosis(x) OVER (PARTITION BY g) FROM t")
    assert "END) OVER" not in out
    assert "count(x) OVER (PARTITION BY g)" in out
    assert "kurtosis(x) OVER (PARTITION BY g)" in out

    spark.createDataFrame(
        [(1, float(i * i)) for i in range(8)], "g int, x double"
    ).createOrReplaceTempView("kurt_w")
    try:
        win = spark.sql(
            translate("SELECT kurtosis(x) OVER (PARTITION BY g) AS k FROM kurt_w")
        ).collect()
        agg = spark.sql(
            translate("SELECT kurtosis(x) AS k FROM kurt_w GROUP BY g")
        ).collect()
        assert win[0].k == pytest.approx(agg[0].k)
    finally:
        spark.catalog.dropTempView("kurt_w")


def test_parse_datetime_lenient_digits_and_joda_pivot(spark):
    """Round-11 sweep-class catches on the Joda twin of date_parse:
    (1) padded numeric runs ('MM', 'dd', 'HH', 'mm', 'ss') become
    lenient single letters in the PARSE direction — Joda's number
    parser accepts 1-2 digits, Java's padded letters don't, so
    '2026-1-2 3:4:5' crashed on a Trino-valid call; (2) two-digit
    years pivot on Joda's appendTwoDigitYear(currentYear - 30) window
    [currentYear-80, currentYear+19] where Spark's 'yy' bases at
    2000 — '85' silently became 2085."""
    import datetime as dt

    rows = run(
        spark,
        "SELECT parse_datetime('85/3/7', 'yy/M/d') AS a,"
        " parse_datetime('30/1/2', 'yy/M/d') AS b,"
        " parse_datetime('2026-1-2 3:4:5', 'yyyy-MM-dd HH:mm:ss') AS c",
    )
    year_now = dt.date.today().year
    hi = year_now + 19
    a = rows[0]["a"]
    assert a.month == 3 and a.day == 7
    assert a.year == (1985 if 1985 <= hi else 2085)  # 85 → 19xx until 2066
    assert rows[0]["b"].year == 2030
    assert rows[0]["c"] == dt.datetime(2026, 1, 2, 3, 4, 5)
    # format direction is untouched: padded output stays padded
    out = translate("SELECT format_datetime(ts, 'yyyy-MM-dd HH:mm') FROM t")
    assert "'yyyy-MM-dd HH:mm'" in out


def test_double_round_binary_scaling(spark):
    """Round-11 catch: Trino round(double, n) is binary-scaled
    Math.floor(x*10^n + 0.5)/10^n (sign-mirrored) while Spark rounds
    the shortest DECIMAL spelling HALF_UP — round(1.005E0, 2) is 1.0
    in Trino (the IEEE product 100.4999999999999893 floors), 1.01 in
    stock Spark.  2.675E0 agrees at 2.68 in BOTH (that product rounds
    up to 267.5 exactly) — the sweep in test_differential_semantics
    pins the per-value split.  NaN/Infinity/huge inputs pass through
    (the double-domain floor guard: above 2^53 every double is
    integral) instead of ANSI-crashing in Spark's BIGINT floor."""
    rows = run(
        spark,
        "SELECT round(1.005E0, 2) AS a, round(2.675E0, 2) AS b,"
        " round(-1.005E0, 2) AS c, round(1.0E300, 2) AS d,"
        " round(123.456E0, -2) AS e, round(CAST(NULL AS DOUBLE), 2) AS f",
    )
    r = rows[0]
    assert r["a"] == 1.0 and r["c"] == -1.0  # Spark native says 1.01
    assert r["b"] == 2.68
    assert r["d"] == 1.0e300 and r["e"] == 100.0 and r["f"] is None
    # decimal operands keep Spark's exact HALF_UP (it IS Trino's)
    out = translate("SELECT round(2.5, 1) FROM t")
    assert out == "SELECT round(2.5, 1) FROM t"
    # unknowable operand type: untouched (documented residue)
    out = translate("SELECT round(sum(x), 2) FROM t")
    assert out == "SELECT round(sum(x), 2) FROM t"
    # nondeterministic operand or scale: untouched — the rewrite
    # duplicates both across sign branches, so each copy would draw
    # rand() independently and mix values/scales within one row
    out = translate("SELECT round(CAST(rand() AS DOUBLE), 2) FROM t")
    assert out == "SELECT round(CAST(rand() AS DOUBLE), 2) FROM t"
    out = translate(
        "SELECT round(x, CAST(rand()*3 AS INT)) FROM t",
        column_types={"x": "double"},
    )
    assert out == "SELECT round(x, CAST(rand()*3 AS INT)) FROM t"


def test_cast_rounding_trino_semantics(spark):
    """Round-11 catch, round-12 correction: Trino CAST(double AS
    integral) is DoubleMath.roundToLong(HALF_UP) — ties away from
    zero (CAST(-2.5E0 AS BIGINT) = -3, CAST(-0.5E0 AS INT) = -1),
    NaN an error under CAST and NULL under TRY_CAST — and
    CAST(decimal AS integral) is the same HALF_UP; Spark's ANSI cast
    truncates toward zero in both cases."""
    rows = run(
        spark,
        "SELECT CAST(2.5E0 AS BIGINT) AS a, CAST(-2.5E0 AS BIGINT) AS b,"
        " CAST(-2.7E0 AS INT) AS c, CAST(-0.5E0 AS INT) AS d,"
        " CAST(2.5 AS INT) AS e, CAST(-2.5 AS INT) AS f,"
        " TRY_CAST(2.5E0 AS TINYINT) AS g,"
        " TRY_CAST(CAST('NaN' AS DOUBLE) AS BIGINT) AS h",
    )
    r = rows[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, -3, -3, -1)
    assert (r["e"], r["f"], r["g"]) == (3, -3, 3)
    assert r["h"] is None
    # CAST of NaN raises like Trino (not a silent 0)
    import pytest as _pytest

    with _pytest.raises(Exception, match="Cannot cast double NaN to bigint"):
        run(spark, "SELECT CAST(CAST('NaN' AS DOUBLE) AS BIGINT) AS d")
    # unknowable operand (function result): Spark truncation stays
    out = translate("SELECT CAST(sum(x) AS BIGINT) FROM t")
    assert out == "SELECT CAST(sum(x) AS BIGINT) FROM t"
    # nondeterministic operand: untouched (the guard duplicates x)
    out = translate("SELECT CAST(CAST(rand() AS DOUBLE) AS BIGINT) FROM t")
    assert out == "SELECT CAST(CAST(rand() AS DOUBLE) AS BIGINT) FROM t"
    # non-integral target: untouched
    out = translate("SELECT CAST(2.5E0 AS DOUBLE) FROM t")
    assert out == "SELECT CAST(2.5E0 AS DOUBLE) FROM t"


def test_array_minmax_null_semantics(spark):
    """Round-11 catch: Trino array_max/array_min return NULL when the
    array CONTAINS a null element; Spark's builtins silently skip
    nulls (array_max(ARRAY[1, NULL]) was 1)."""
    rows = run(
        spark,
        "SELECT array_max(ARRAY[1, NULL]) AS a, array_min(ARRAY[2, 3]) AS b,"
        " array_max(CAST(NULL AS ARRAY(INTEGER))) AS c,"
        " array_min(ARRAY[NULL]) AS d, array_max(ARRAY[1.5E0, 0.5E0]) AS e",
    )
    r = rows[0]
    assert r["a"] is None and r["d"] is None and r["c"] is None
    assert r["b"] == 2 and r["e"] == 1.5
    # array_max_by keeps its lambda rewrite (regex requires '(' after name)
    out = translate("SELECT array_max_by(a, x -> x.k) FROM t")
    assert "array_max_by" not in out and "array_sort" in out


def test_typeof_trino_spellings(spark):
    rows = run(
        spark,
        "SELECT typeof(1) AS a, typeof('x') AS b, typeof(ARRAY[1]) AS c,"
        " typeof(MAP(ARRAY['k'], ARRAY[1])) AS d,"
        " typeof(CAST(ROW(1, 'x') AS ROW(a INTEGER, b VARCHAR))) AS e,"
        " typeof(NULL) AS f, typeof(CAST(1 AS DECIMAL(10,2))) AS g,"
        " typeof(INTERVAL '3' MONTH) AS h, typeof(1.5E0) AS i,"
        " typeof(DATE '2020-01-01') AS j,"
        " typeof(TIMESTAMP '2020-01-01') AS k,"
        " typeof(TIMESTAMP '2020-01-01 10:30:00.123456') AS l,"
        " typeof('don''t') AS m",
    )
    r = rows[0]
    # string literals constant-fold to Trino's per-literal varchar(n)
    # (round 13); non-literal varchar stays unparameterized
    assert r["a"] == "integer" and r["b"] == "varchar(1)"
    assert r["c"] == "array(integer)"
    assert r["d"] == "map(varchar, integer)"          # ', ' in complex types
    assert r["e"] == "row(a integer, b varchar)"
    assert r["f"] == "unknown"
    assert r["g"] == "decimal(10,2)"                  # no space in decimal
    assert r["h"] == "interval year to month"
    assert r["i"] == "double" and r["j"] == "date"
    assert r["k"] == "timestamp(0)"   # per-literal precision (round 13)
    assert r["l"] == "timestamp(6)"
    assert r["m"] == "varchar(5)"     # doubled-quote escape counts once


def test_array_subscript_negative_guard(spark):
    """Round-11: with the catalog column-type map, a subscript on a
    KNOWN array column raises on a negative index like Trino ("Array
    subscript is negative") instead of silently reading from the end;
    map columns (negative keys legal) and unknown bases keep the
    documented residue."""
    import pytest as _pytest

    spark.createDataFrame(
        [(1, [10, 20, 30])], "id bigint, arr array<int>"
    ).createOrReplaceTempView("subg_t")
    try:
        rows = run(spark, "SELECT arr[2] AS v, arr[id + 1] AS w FROM subg_t")
        assert rows[0]["v"] == 20 and rows[0]["w"] == 20
        with _pytest.raises(Exception, match="subscript is negative"):
            run(spark, "SELECT arr[0 - id] AS v FROM subg_t")
        # unknown base (function result): no guard text emitted
        out = translate("SELECT f(x)[i] FROM t", {"arr": "array<int>"})
        assert "subscript is negative" not in out
        # map column with the same index shape: untouched
        out = translate("SELECT m[i] FROM t", {"m": "map<int,string>"})
        assert "subscript is negative" not in out
    finally:
        spark.catalog.dropTempView("subg_t")


def test_cast_double_to_varchar_scientific(spark):
    """Round-11 residue closure: Trino renders CAST(double AS VARCHAR)
    in always-scientific shortest-roundtrip form since Trino 373
    ('1.5E0', '1E2', '0E0') where Spark renders '1.5'/'100.0' — a
    silent text divergence on every stringified double.  NULL stays
    NULL (Arrow conflates NULL and NaN inside the UDF; the JVM-side
    isnan guard splits them); decimal operands keep Spark's plain
    rendering (it matches Trino's decimal cast)."""
    rows = run(
        spark,
        "SELECT CAST(1.5E0 AS VARCHAR) AS a,"
        " CAST(CAST(100 AS DOUBLE) AS VARCHAR) AS b,"
        " CAST(0.0E0 AS VARCHAR) AS c,"
        " CAST(CAST('NaN' AS DOUBLE) AS VARCHAR) AS d,"
        " CAST(1.0E-3 AS VARCHAR) AS e,"
        " CAST(123.456E0 AS VARCHAR) AS f,"
        " CAST(CAST('-Infinity' AS DOUBLE) AS VARCHAR) AS g,"
        " CAST(CAST(NULL AS DOUBLE) AS VARCHAR) AS h,"
        " CAST(2.5 AS VARCHAR) AS i",
    )
    r = rows[0]
    assert (r["a"], r["b"], r["c"]) == ("1.5E0", "1E2", "0E0")
    assert (r["d"], r["e"], r["f"]) == ("NaN", "1E-3", "1.23456E2")
    assert r["g"] == "-Infinity" and r["h"] is None
    assert r["i"] == "2.5"  # decimal rendering is already parity
    # unknowable operand: untouched (documented residue)
    out = translate("SELECT CAST(f(x) AS VARCHAR) FROM t")
    assert "trino_double_to_varchar" not in out
    # varchar(n) target: untouched (Trino length-checks those)
    out = translate("SELECT CAST(1.5E0 AS VARCHAR(10)) FROM t")
    assert "trino_double_to_varchar" not in out


def test_recursive_cte_through_facade(spark):
    """Round-11 coverage: WITH RECURSIVE passes the read-only
    classifier and translate() intact, and Spark 4.1 executes the
    iterative plan natively — recursion depth bounded by the anchor
    predicate."""
    rows = run(
        spark,
        "WITH RECURSIVE f(n, v) AS (SELECT 1, CAST(1 AS BIGINT)"
        " UNION ALL SELECT n + 1, v * (n + 1) FROM f WHERE n < 10)"
        " SELECT max(v) AS fact10, count(*) AS depth FROM f",
    )
    assert rows[0] == {"fact10": 3628800, "depth": 10}


def test_rounding_passes_know_always_double_functions(spark):
    """Round-11 widening: functions that return DOUBLE for every
    argument type (sqrt/ln/exp/stddev/...) are knowable operands for
    the Trino-rounding passes even though their arguments are not —
    round(sqrt(x), n), CAST(exp(x) AS BIGINT) and CAST(sqrt(x) AS
    VARCHAR) all take Trino semantics.  Polymorphic functions
    (sum/avg/abs) and compound expressions stay untouched; an ln()
    operand composes with the log-IEEE pass (rounding wraps first,
    the CASE rewrite lands inside the guard copies)."""
    rows = run(
        spark,
        "SELECT CAST(exp(1.0E0) AS BIGINT) AS a, round(sqrt(2.0E0), 2) AS b,"
        " CAST(sqrt(4.0E0) AS VARCHAR) AS c,"
        " CAST(ln(CAST(20 AS DOUBLE)) AS BIGINT) AS d",
    )
    r = rows[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 1.41, "2E0", 3)
    # polymorphic / compound operands: untouched
    out = translate("SELECT round(sum(x), 2), CAST(abs(x) AS BIGINT) FROM t")
    assert "round(sum(x), 2)" in out and "CAST(abs(x) AS BIGINT)" in out
    # rand() is never treated as knowable: the guard would duplicate a
    # nondeterministic operand
    out = translate("SELECT CAST(rand() AS BIGINT) FROM t")
    assert out == "SELECT CAST(rand() AS BIGINT) FROM t"


def test_translate_text_growth_circuit_breaker():
    """Round-11 safeguard for the documented guard-growth hazard:
    nested guard-rewritten calls multiply the rewritten text ~10× per
    level (measured: substr∘split_part depth 1/2/3 → 0.9/12/142 KB
    with superlinear translate time), and the façade timeout only
    covers execution — depth 5 used to be a multi-minute
    pre-execution hang.  Text past MAX_TRANSLATED_BYTES now raises a
    named TrinoCompatError promptly instead."""
    import time

    import pytest as _pytest

    from mcp_trino_spark.trino_compat import TrinoCompatError

    q = "x"
    for _ in range(5):
        q = f"substr(split_part({q}, ',', 2), 2, 3)"
    t0 = time.time()
    with _pytest.raises(TrinoCompatError, match="exceed"):
        translate(f"SELECT {q} FROM t")
    assert time.time() - t0 < 60  # raises at the budget, never hangs
    # realistic nesting stays well under the cap
    out = translate(
        "SELECT substr(split_part(s, ',', 2), 2, 3) FROM t"
    )
    assert len(out) < 100_000


def test_decimal_division_trino_scale(spark):
    """Round-11 catch: Trino's decimal division keeps scale =
    max(s1, s2) with HALF_UP rounding (DECIMAL '1.00' / DECIMAL
    '3.00' = 0.33 — the documented decimal type calculus) while
    Spark widens the result scale (decimal(23,13) = 0.3333333333333)
    — a silent VALUE divergence on every Trino-valid decimal
    division.  Knowable operands only; integer/integer stays with
    the x47 ``div`` rewrite; double operands stay fractional (IEEE
    division agrees in both engines)."""
    from decimal import Decimal

    rows = run(
        spark,
        "SELECT CAST(1.00 AS DECIMAL(10,2)) / CAST(3.00 AS DECIMAL(10,2))"
        " AS d, 1.00 / 3 AS e, 7 / 2.00 AS f, -1.00 / 3.00 AS neg,"
        " 2.0 / 3.00 AS g",
    )
    r = rows[0]
    assert r["d"] == Decimal("0.33") and r["e"] == Decimal("0.33")
    assert r["f"] == Decimal("3.50") and r["neg"] == Decimal("-0.33")
    assert r["g"] == Decimal("0.67")
    # integer/integer keeps div; double division stays fractional —
    # since x81 the knowably-double division carries the IEEE /0
    # dispatch, with the raw quotient as the nonzero-denominator arm
    out = translate("SELECT 7 / 2, CAST(x AS DOUBLE) / 3 FROM t")
    assert "(7 div 2)" in out and "(CAST(x AS DOUBLE)) / (3)" in out
    assert "CAST(x AS DOUBLE) div" not in out
    # unparameterized DECIMAL target: defaults to Trino's decimal(38,0)
    # (round 12 — previously skipped as residue), so the division
    # calculus engages: scale = max(0, 1) = 1 at the precision cap
    out = translate("SELECT CAST(a AS DECIMAL) / 2.0 FROM t")
    assert "CAST(a AS DECIMAL(38,0))" in out and "AS DECIMAL(38,1))" in out


def test_xxhash64_trino_semantics(spark):
    """Round-11 catch: Trino's xxhash64 is STANDARD XXH64 (seed 0)
    over raw bytes returning VARBINARY; Spark's builtin of the same
    name is a seed-42 hash of Spark's internal format returning
    BIGINT — every digest silently differed.  Pinned against the
    published XXH64 reference vectors ('', 'a', 'abc'), plus a
    46-byte input exercising the 32-byte lane accumulator path."""
    rows = run(
        spark,
        "SELECT hex(xxhash64(to_utf8(''))) AS a,"
        " hex(xxhash64(to_utf8('a'))) AS b,"
        " hex(xxhash64(to_utf8('abc'))) AS c,"
        " xxhash64(CAST(NULL AS VARBINARY)) AS n",
    )
    r = rows[0]
    assert r["a"] == "EF46DB3751D8E999"
    assert r["b"] == "D24EC4F1A98C6E5B"
    assert r["c"] == "44BC2CF5AD770999"
    assert r["n"] is None
    # the engine-local checksum() keeps Spark's builtin (generated
    # after this pass) — only USER-spelled calls are rewritten
    out = translate("SELECT checksum(x) FROM t")
    assert "trino_xxhash64" not in out


def test_simple_case_mapping_trino_semantics(spark):
    """Round-12 catch: Trino upper()/lower() map each code point 1:1
    (airlift SliceUtf8 → Character.toUpperCase/toLowerCase) where
    Spark applies Java's FULL Unicode mapping — upper('straße') was
    silently 'STRASSE' (Trino: 'STRAßE'), lower('İ') was 'i'+COMBINING
    DOT (Trino: bare 'i'), upper('ﬁle') was 'FILE' (Trino: 'ﬁLE')."""
    rows = run(
        spark,
        "SELECT upper('straße') AS a, lower('İstanbul') AS b,"
        " upper('ﬁle') AS c, lower('STRASSE') AS d, upper('hello') AS e,"
        " lower(CAST(NULL AS VARCHAR)) AS f, upper(lower('ẞtraße')) AS g,"
        " length(lower('İ')) AS h, lower('ΒΑΣ') AS i, upper('ᾳ') AS j",
    )
    r = rows[0]
    assert r["a"] == "STRAßE" and r["b"] == "istanbul" and r["c"] == "ﬁLE"
    assert r["d"] == "strasse" and r["e"] == "HELLO" and r["f"] is None
    assert r["g"] == "ßTRAßE" and r["h"] == 1
    # Final_Sigma: Java's conditional rule gives word-final ς; Trino's
    # per-code-point mapping always gives σ
    assert r["i"] == "βασ"
    # ypogegrammeni: simple uppercase IS the titlecase capital, not
    # identity (Character.toUpperCase(ᾳ) = ᾼ)
    assert r["j"] == "ᾼ"
    # the rewrite is pure JVM (translate/ucase composition): a single
    # copy of the operand — safe for nondeterministic operands and
    # legal inside higher-order-function lambdas
    out = translate("SELECT upper(CAST(rand() AS VARCHAR)) FROM t")
    assert out.count("rand()") == 1 and "ucase(translate(" in out
    out = translate("SELECT transform(a, x -> upper(x)) FROM t")
    assert "ucase(translate(" in out


def test_date_interval_trino_semantics(spark):
    """Round-12 catch: Trino DATE ± day-time interval keeps DATE and
    rejects sub-day components; Spark silently promoted to TIMESTAMP
    ('2020-01-31' + 36 hours was '2020-02-01 12:00:00')."""
    rows = run(
        spark,
        "SELECT DATE '2020-01-31' + INTERVAL '24' HOUR AS a,"
        " DATE '2020-01-31' - INTERVAL '1440' MINUTE AS b,"
        " DATE '2020-01-31' + INTERVAL '2 00:00:00' DAY TO SECOND AS c,"
        " DATE '2020-01-31' + INTERVAL '1' MONTH AS d,"
        " DATE '2020-01-31' + INTERVAL '3' DAY AS e",
    )
    r = rows[0]
    assert r["a"] == datetime.date(2020, 2, 1)
    assert r["b"] == datetime.date(2020, 1, 30)
    assert r["c"] == datetime.date(2020, 2, 2)
    assert r["d"] == datetime.date(2020, 2, 29)  # month-end clamp
    assert r["e"] == datetime.date(2020, 2, 3)
    import pytest as _pytest

    with _pytest.raises(Exception, match="Cannot add hour"):
        run(spark, "SELECT DATE '2020-01-31' + INTERVAL '36' HOUR AS v")
    with _pytest.raises(Exception, match="Cannot subtract hour"):
        run(spark, "SELECT DATE '2020-01-31' - INTERVAL '90' MINUTE AS v")
    # whole-day spelling is pure epoch-day arithmetic (DST-immune)
    out = translate("SELECT DATE '2020-01-31' + INTERVAL '24' HOUR")
    assert "date_add(DATE '2020-01-31', 1)" in out
    out = translate("SELECT DATE '2020-01-31' - INTERVAL '48' HOUR")
    assert "date_add(DATE '2020-01-31', -2)" in out
    # timestamps and unknowable operands keep Spark arithmetic
    out = translate("SELECT TIMESTAMP '2020-01-31 01:00:00' + INTERVAL '36' HOUR")
    assert "raise_error" not in out
    out = translate("SELECT some_expr(x) + INTERVAL '36' HOUR FROM t")
    assert "raise_error" not in out


def test_bare_decimal_default_trino_semantics(spark):
    """Round-12 residue closure: unparameterized CAST(x AS DECIMAL)
    defaults to decimal(38,0) in Trino (DecimalType.createDecimalType)
    but decimal(10,0) in Spark — an 11-digit value Trino casts fine
    was an ANSI overflow error here."""
    rows = run(
        spark,
        "SELECT CAST(12345678901 AS DECIMAL) AS a,"
        " TRY_CAST('99999999999' AS DECIMAL) AS b,"
        " CAST(2.6 AS DECIMAL) AS c",
    )
    r = rows[0]
    assert r["a"] == 12345678901 and r["b"] == 99999999999
    assert r["c"] == 3  # HALF_UP via the decimal rounding pass
    out = translate("SELECT CAST(x AS DECIMAL) FROM t")
    assert "DECIMAL(38,0)" in out
    # parameterized targets and non-CAST uses of the word stay put
    out = translate("SELECT CAST(x AS DECIMAL(12,2)), y AS decimal FROM t")
    assert "DECIMAL(12,2)" in out and "y AS decimal" in out


def test_real_varchar_and_fp_typed_literals(spark):
    """Round-12 residue closures: (a) DOUBLE '1.5' / REAL '0.1' typed
    literals respell to CASTs (Spark's parser rejects fractional
    typed literals — these previously failed loudly); (b) CAST(real
    AS VARCHAR) renders over FLOAT32 shortest-roundtrip digits
    (numpy Dragon4 — REAL '0.1' is '1E-1', not the float64-widened
    '1.0000000149011612E-1')."""
    rows = run(
        spark,
        "SELECT CAST(REAL '0.1' AS VARCHAR) AS a,"
        " CAST(REAL '123.456' AS VARCHAR) AS b,"
        " CAST(CAST('NaN' AS REAL) AS VARCHAR) AS c,"
        " CAST(CAST(NULL AS REAL) AS VARCHAR) AS d,"
        " CAST(REAL '-2.675' AS VARCHAR) AS e,"
        " DOUBLE '1.5' + 1 AS f, REAL '2.5' AS g,"
        " CAST(REAL '100' AS VARCHAR) AS h",
    )
    r = rows[0]
    assert r["a"] == "1E-1" and r["b"] == "1.23456E2"
    assert r["c"] == "NaN" and r["d"] is None
    assert r["e"] == "-2.675E0" and r["h"] == "1E2"
    assert r["f"] == 2.5 and r["g"] == 2.5
    out = translate("SELECT DOUBLE '1.5', REAL '2.5'")
    assert out == "SELECT CAST('1.5' AS DOUBLE), CAST('2.5' AS FLOAT)"


def test_xxhash64_vectorized_matches_reference():
    """The numpy-batched kernel (VERDICT r11 #3) must agree with the
    per-row reference implementation on every length class: empty,
    sub-4, sub-8, sub-32 tails, exact stripe boundaries, multi-stripe
    bodies, and None interleaving."""
    import random

    from mcp_trino_spark.trino_compat import _xxh64_batch, _xxh64_one

    rng = random.Random(1207)
    vals = [b"", None]
    for n in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 65,
              100, 255, 1024):
        for _ in range(25):
            vals.append(bytes(rng.getrandbits(8) for _ in range(n)))
            if rng.random() < 0.1:
                vals.append(None)
    got = _xxh64_batch(vals)
    want = [None if v is None else _xxh64_one(v) for v in vals]
    assert got == want


def test_xxhash64_vectorized_throughput():
    """The batched kernel exists to remove the ~µs/row Python cost on
    a 100 TB corpus hash: min-of-5 on a 100k-row batch must beat the
    per-row reference by ≥10× rows/s (measured 13.5× on 64-byte rows;
    the ratio is load-robust because both sides share the machine)."""
    import random
    import timeit

    from mcp_trino_spark.trino_compat import _xxh64_batch, _xxh64_one

    rng = random.Random(7)
    batch = [bytes(rng.getrandbits(8) for _ in range(64)) for _ in range(100_000)]
    _xxh64_batch(batch[:100])  # warm numpy import
    t_vec = min(timeit.repeat(lambda: _xxh64_batch(batch), number=1, repeat=5))
    sample = batch[:5_000]
    t_row = min(timeit.repeat(
        lambda: [_xxh64_one(v) for v in sample], number=1, repeat=3
    ))
    ratio = (len(batch) / t_vec) / (len(sample) / t_row)
    assert ratio >= 10, f"vectorized speedup only {ratio:.1f}x"


def test_map_subscript_missing_key_raises(spark):
    """Round-12: Trino's map SUBSCRIPT raises 'Key not present in map'
    on a miss where Spark 4's element_at returns NULL; schema-known
    map columns get the throwing lookup, the element_at() FUNCTION
    spelling keeps Trino's NULL-returning contract, NULL keys stay
    NULL (residue: Trino rejects them)."""
    from mcp_trino_spark.trino_compat import translate as _tr

    spark.sql(
        "SELECT MAP('a', 1, 'b', 2) AS m, 'a' AS k"
        " UNION ALL SELECT CAST(NULL AS MAP<STRING, INT>), 'a'"
    ).createOrReplaceTempView("mapsub_t")
    ct = {"m": "map<string,int>", "k": "string"}
    try:
        rows = spark.sql(
            _tr(
                "SELECT m['a'] AS hit, m[k] AS hit2,"
                " m[CAST(NULL AS VARCHAR)] AS nk,"
                " element_at(m, 'zz') AS fn_miss"
                " FROM mapsub_t WHERE m IS NOT NULL",
                column_types=ct,
            )
        ).collect()
        r = rows[0]
        assert r["hit"] == 1 and r["hit2"] == 1
        assert r["nk"] is None and r["fn_miss"] is None
        # a NULL map row must yield NULL, not a phantom missing-key
        # error (map_contains_key(NULL, k) is NULL — falsy — so
        # without the IS NULL short-circuit the raise branch fired)
        nm = spark.sql(
            _tr("SELECT m['a'] AS v FROM mapsub_t WHERE k = 'a'",
                column_types=ct)
        ).collect()
        assert sorted([r["v"] for r in nm], key=lambda x: (x is None, x)) == [1, None]
        with pytest.raises(Exception, match="Key not present in map: zz"):
            spark.sql(
                _tr("SELECT m['zz'] FROM mapsub_t", column_types=ct)
            ).collect()
        # unknowable base: plain element_at stays (documented residue)
        out = _tr("SELECT f(x)['k'] FROM t", column_types=ct)
        assert "map_contains_key" not in out and "element_at(f(x), 'k')" in out
    finally:
        spark.catalog.dropTempView("mapsub_t")


def test_simple_case_shield_exhaustive(spark):
    """Every one of the 102 divergent code points must uppercase to its
    SIMPLE mapping through the translated SQL — one query over the
    whole class, compared against the shield's own back-map (which the
    randomized sweep independently cross-checks via str.title)."""
    from mcp_trino_spark.trino_compat import _case_shield

    div, pua, back = _case_shield()
    # invariants, not a Unicode-table-version pin: equal lengths and a
    # single-char back-map per shielded code point (the count is 102
    # under Unicode 14; a different host table may shift it)
    assert len(div) == len(pua) == len(back) >= 90
    assert all(len(c) == 1 for c in back)
    got = run(spark, f"SELECT upper('{div}') AS u")[0]["u"]
    assert got == back
    # and the full round-trip keeps non-divergent chars on ucase
    got2 = run(spark, "SELECT upper('aßbᾳc') AS u")[0]["u"]
    assert got2 == "AßBᾼC"


def test_case_shield_backmap_matches_jvm_simple_mapping(spark):
    """Fidelity of the 102 back-map entries against the ACTUAL target
    semantics (ADVICE r12): Trino's upper() is Java
    Character.toUpperCase per code point, so each shielded code
    point's back-map entry must equal the JVM's simple uppercase —
    asked of the driver JVM directly via py4j, not of the pipeline's
    own output (test_simple_case_shield_exhaustive validates the
    translate plumbing; THIS pins the table the plumbing applies)."""
    from mcp_trino_spark.trino_compat import _case_shield

    div, pua, back = _case_shield()
    Character = spark.sparkContext._jvm.java.lang.Character
    bad = []
    for d, b in zip(div, back):
        jvm_simple = chr(Character.toUpperCase(ord(d)))
        if b != jvm_simple:
            bad.append((hex(ord(d)), hex(ord(b)), hex(ord(jvm_simple))))
    assert not bad, (
        f"back-map entries diverging from JVM Character.toUpperCase "
        f"(cp, back, jvm): {bad}"
    )


def test_case_shield_tables_match_runtime_jvm(spark):
    """Unicode-version skew alarm (ADVICE r12): the shield's divergent
    set is derived from the HOST PYTHON's Unicode tables, but the
    runtime full mapping comes from the JVM's ucase/lcase.  One Spark
    job sweeps every BMP code point (surrogates excluded) and asserts:

    - every Python/JVM full-mapping skew is 1:1-on-both-sides (new
      simple case pairs the other side's Unicode version lacks — e.g.
      U+019B/U+A7CD under Python 16 vs Java 17 tables; harmless: they
      feed NO shield table, and the emulated target is itself a JVM);
      a skew where EITHER side is multi-char would change shield
      membership and fails loudly;
    - the JVM's multi-char-uppercase set == the shield's divergent set
      (completeness: a new SpecialCasing expansion in a future JVM
      cannot silently bypass the shield);
    - the lower() pre-translate set is exactly {İ, Σ}: U+0130 is the
      only multi-char full lowercase, and Σ the only CONDITIONAL
      mapping — probed with context ('ΑΣ'), since Final_Sigma needs a
      preceding cased letter and is invisible to a per-char sweep.
    """
    from mcp_trino_spark.trino_compat import _case_shield

    div, _, _ = _case_shield()
    cps = [cp for cp in range(0x10000) if not 0xD800 <= cp <= 0xDFFF]
    df = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp INT, c STRING"
    )
    rows = df.selectExpr("cp", "ucase(c) AS u", "lcase(c) AS l").collect()
    assert len(rows) == len(cps)

    upper_skew = [
        r for r in rows if r["u"] != chr(r["cp"]).upper()
    ]
    lower_skew = [
        r for r in rows if r["l"] != chr(r["cp"]).lower()
    ]
    bad_upper = [
        hex(r["cp"])
        for r in upper_skew
        if len(r["u"]) > 1 or len(chr(r["cp"]).upper()) > 1
    ]
    bad_lower = [
        hex(r["cp"])
        for r in lower_skew
        if len(r["l"]) > 1 or len(chr(r["cp"]).lower()) > 1
    ]
    assert not bad_upper, (
        f"multi-char uppercase skew between Python tables and the "
        f"runtime JVM — shield membership is wrong at: {bad_upper[:20]}"
    )
    assert not bad_lower, (
        f"multi-char lowercase skew between Python tables and the "
        f"runtime JVM at: {bad_lower[:20]}"
    )

    jvm_multi_upper = {r["cp"] for r in rows if len(r["u"]) > 1}
    assert jvm_multi_upper == {ord(c) for c in div}, (
        "divergent-set mismatch vs the runtime JVM's multi-char expansions"
    )

    Character = spark.sparkContext._jvm.java.lang.Character
    jvm_multi_lower = {r["cp"] for r in rows if len(r["l"]) > 1}
    assert jvm_multi_lower == {0x0130}
    cond_lower = {
        r["cp"]
        for r in rows
        if len(r["l"]) == 1 and ord(r["l"]) != Character.toLowerCase(r["cp"])
    }
    # Final_Sigma is invisible to a single-char sweep (it needs a
    # PRECEDING cased letter), so probe it with context: the raw
    # runtime lowering of 'ΑΣ' ends in word-final ς — exactly why the
    # lower() rewrite pre-translates Σ→σ
    assert run(spark, "SELECT lcase('ΑΣ') AS l")[0]["l"] == "ας"
    assert run(spark, "SELECT lower('ΑΣ') AS l")[0]["l"] == "ασ"
    # in the per-char sweep, the only tolerated divergence is the new-
    # case-pair signature: the runtime's case tables (ICU-backed in
    # Spark 4) know a pair java.lang.Character's Unicode version
    # doesn't — Character leaves the char UNCHANGED.  A cp where
    # Character maps somewhere else than the full mapping would be a
    # real conditional divergence the lower() pre-translate misses →
    # fail loudly.
    real_cond = {
        cp for cp in cond_lower if Character.toLowerCase(cp) != cp
    }
    assert not real_cond, (
        f"single-char full-lowercase diverging from a DIFFERENT simple "
        f"mapping beyond Final_Sigma: {sorted(hex(c) for c in real_cond)}"
    )


class TestDecimalAvg:
    """r14: avg over a knowable decimal keeps Trino's INPUT type
    (HALF_UP at scale s) — Spark widens to (p+4, s+4).  r15: the
    emission is the EXACT integer sum/count protocol (no intermediate
    s+4 rounding, so the double-rounding band is closed for any group
    size); p > 28 or s > 6 falls back to the CAST wrap."""

    def test_cast_operand_exact_protocol(self):
        out = translate("SELECT avg(CAST(x AS DECIMAL(10,2))) FROM t")
        # integer protocol: unscaled decimal sum, count, exact mod/div
        assert "sum(CAST(x AS DECIMAL(10,2)))" in out
        assert "count(CAST(x AS DECIMAL(10,2)))" in out
        assert "AS DECIMAL(10, 2))" in out
        assert "avg(" not in out

    def test_catalog_column_exact_protocol(self):
        out = translate(
            "SELECT avg(price) FROM t", column_types={"price": "decimal(12,2)"}
        )
        assert "sum(price)" in out and "count(price)" in out
        assert "AS DECIMAL(12, 2))" in out

    def test_integral_and_double_operands_untouched(self):
        assert translate("SELECT avg(x) FROM t") == "SELECT avg(x) FROM t"
        out = translate(
            "SELECT avg(price) FROM t", column_types={"price": "double"}
        )
        assert "CAST(avg" not in out and "sum(price)" not in out
        out = translate("SELECT avg(CAST(x AS BIGINT)) FROM t")
        assert "CAST(avg" not in out

    def test_over_and_filter_attach_to_every_aggregate(self):
        out = translate(
            "SELECT avg(CAST(x AS DECIMAL(8,3))) OVER (PARTITION BY k) FROM t"
        )
        # every generated sum/count carries the window clause
        assert out.count("OVER (PARTITION BY k)") >= 4
        assert "AS DECIMAL(8, 3))" in out
        out = translate(
            "SELECT avg(CAST(x AS DECIMAL(8,3))) FILTER (WHERE x > 0) FROM t"
        )
        assert out.count("FILTER (WHERE x > 0)") >= 4
        assert "AS DECIMAL(8, 3))" in out

    def test_distinct_and_decimal_literal(self):
        out = translate("SELECT avg(DISTINCT CAST(x AS DECIMAL(6,1))) FROM t")
        assert "sum(DISTINCT CAST(x AS DECIMAL(6,1)))" in out
        assert "AS DECIMAL(6, 1))" in out
        out = translate("SELECT avg(DECIMAL '1.50') FROM t")
        assert "AS DECIMAL(3, 2))" in out

    def test_wide_types_keep_cast_wrap(self):
        # outside the exact-protocol gate the CAST wrap (with its
        # documented double-rounding band) remains
        out = translate("SELECT avg(CAST(x AS DECIMAL(33,2))) FROM t")
        assert "CAST(avg(CAST(x AS DECIMAL(33,2))) AS DECIMAL(33, 2))" in out
        out = translate("SELECT avg(CAST(x AS DECIMAL(20,8))) FROM t")
        assert "CAST(avg(CAST(x AS DECIMAL(20,8))) AS DECIMAL(20, 8))" in out


# ---------------------------------------------------------------------------
# x77: NaN through subqueries, quantified thresholds, IN-subqueries, BETWEEN
# (the analyzer-typed residue class — VERDICT r14 #3)


class TestNanSubqueryResidue:
    """Trino's DoubleOperators are IEEE through EVERY operand position:
    a NaN flowing into a comparison via a scalar subquery, a quantified
    threshold, an IN-subquery membership, or a BETWEEN bound is still
    never equal and never ordered.  The x73 pass types operands
    lexically and skipped these; the r15 closure types subquery
    operands with the session analyzer (execute._make_subquery_type)
    and desugars BETWEEN into the guarded comparison pair."""

    S_NAN = "(SELECT nan() AS x UNION ALL SELECT 1.0E0)"
    S_NAN3 = "(SELECT nan() AS x UNION ALL SELECT 3.0E0)"
    S_NULL = "(SELECT CAST(NULL AS DOUBLE) AS x UNION ALL SELECT 1.0E0)"

    def test_between_nan_bounds(self, spark):
        r = run(spark,
                "SELECT CAST(1.0E0 BETWEEN 0.0E0 AND nan() AS VARCHAR) AS a,"
                " CAST(1.0E0 NOT BETWEEN 0.0E0 AND nan() AS VARCHAR) AS b,"
                " CAST(nan() BETWEEN 0.0E0 AND nan() AS VARCHAR) AS c,"
                " CAST(CAST(NULL AS DOUBLE) BETWEEN 0.0E0 AND nan()"
                "      AS VARCHAR) AS d,"
                " CAST(nan() BETWEEN nan() AND 2.0E0 AS VARCHAR) AS e,"
                " CAST(nan() BETWEEN 0.0E0 AND 2.0E0 AS VARCHAR) AS f,"
                " CAST(1.0E0 BETWEEN nan() AND 2.0E0 AS VARCHAR) AS g")[0]
        assert (r["a"], r["b"], r["c"]) == ("false", "true", "false")
        assert r["d"] is None  # NULL probe: Trino null-propagates first
        assert (r["e"], r["f"], r["g"]) == ("false", "false", "false")

    def test_between_non_nan_untouched(self):
        # the ubiquitous scan shape keeps its bare form: a NaN probe
        # against FINITE bounds is false in both engines (the <=
        # conjunct decides), so no guard overhead is ever paid there
        out = translate(
            "SELECT * FROM t WHERE price BETWEEN 1.0E0 AND 24.0E0",
            column_types={"price": "double"},
        )
        assert "isnan" not in out
        assert "BETWEEN" in out
        # frame specs are never comparisons
        out = translate(
            "SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING"
            " AND CURRENT ROW) FROM t"
        )
        assert "isnan" not in out

    def test_in_subquery_nan_probe(self, spark):
        r = run(spark,
                f"SELECT CAST(nan() IN (SELECT x FROM {self.S_NAN} t)"
                f"      AS VARCHAR) AS a,"
                f" CAST(nan() NOT IN (SELECT x FROM {self.S_NAN} t)"
                f"      AS VARCHAR) AS b,"
                f" CAST(nan() IN (SELECT x FROM {self.S_NULL} t)"
                f"      AS VARCHAR) AS c,"
                f" CAST(2.0E0 IN (SELECT x FROM {self.S_NAN} t)"
                f"      AS VARCHAR) AS d,"
                f" CAST(1.0E0 IN (SELECT x FROM {self.S_NAN} t)"
                f"      AS VARCHAR) AS e")[0]
        assert (r["a"], r["b"]) == ("false", "true")
        assert r["c"] is None  # NaN probe + NULL element: unknown
        assert (r["d"], r["e"]) == ("false", "true")

    def test_scalar_subquery_comparison(self, spark):
        r = run(spark,
                "SELECT CAST(nan() > (SELECT max(x) FROM"
                " (SELECT 1.0E0 AS x UNION ALL SELECT 2.0E0) t)"
                " AS VARCHAR) AS a,"
                " CAST((SELECT max(x) FROM (SELECT nan() AS x"
                " UNION ALL SELECT 3.0E0) t) = nan() AS VARCHAR) AS b")[0]
        # Spark said true for both (NaN largest / NaN = NaN)
        assert (r["a"], r["b"]) == ("false", "false")

    def test_quantified_nan_sets(self, spark):
        r = run(spark,
                f"SELECT CAST(nan() > ALL (SELECT x FROM"
                f" (SELECT 1.0E0 AS x) t) AS VARCHAR) AS a,"
                f" CAST(1.0E0 < ALL (SELECT x FROM {self.S_NAN3} t)"
                f"      AS VARCHAR) AS b,"
                f" CAST(1.0E0 < ANY (SELECT x FROM {self.S_NAN3} t)"
                f"      AS VARCHAR) AS c,"
                f" CAST(1.0E0 < ANY (SELECT x FROM (SELECT nan() AS x) t)"
                f"      AS VARCHAR) AS d,"
                f" CAST(nan() >= ANY (SELECT x FROM {self.S_NAN3} t)"
                f"      AS VARCHAR) AS e")[0]
        # a: NaN probe never clears ALL; b: a NaN element makes every
        # ordering false (Spark's min swallowed it); c: the finite
        # element still witnesses; d: an all-NaN set has no witness;
        # e: NaN probe never witnesses
        assert (r["a"], r["b"], r["c"]) == ("false", "false", "true")
        assert (r["d"], r["e"]) == ("false", "false")

    def test_quantified_empty_sets(self, spark):
        # the standard's vacuous cases, closed r15: ALL over EMPTY is
        # TRUE (was UNKNOWN), ANY over EMPTY is FALSE (was UNKNOWN)
        r = run(spark,
                "SELECT CAST(1.0E0 < ALL (SELECT x FROM (VALUES 2.0E0)"
                " t(x) WHERE false) AS VARCHAR) AS a,"
                " CAST(1 < ANY (SELECT x FROM (VALUES (2)) t(x)"
                " WHERE false) AS VARCHAR) AS b,"
                " CAST(NULL > ALL (SELECT x FROM (VALUES (2)) t(x)"
                " WHERE false) AS VARCHAR) AS c")[0]
        assert (r["a"], r["b"], r["c"]) == ("true", "false", "true")

    def test_correlated_subquery_stays_residue(self, spark):
        # a correlated subquery does not analyze standalone — the
        # callback returns None and the comparison keeps Spark
        # semantics (documented residue), but the query still RUNS
        rows = run(spark,
                   "SELECT r_regionkey FROM region r"
                   " WHERE CAST(r_regionkey AS DOUBLE) >"
                   " (SELECT avg(CAST(n_regionkey AS DOUBLE))"
                   "  FROM nation n WHERE n.n_regionkey = r.r_regionkey)"
                   " ORDER BY r_regionkey")
        assert [r["r_regionkey"] for r in rows] == []


class TestInSubqueryNullSemantics:
    """x78 (r15): projected IN/NOT IN over subqueries are three-valued
    like the standard — Spark's existence join said FALSE on a
    no-match over a NULL-bearing set, and Catalyst's boolean
    simplification broke the naive NOT(…OR…) spelling, hence the CASE
    dispatch (_rewrite_in_subquery_null_semantics)."""

    S = "(SELECT CAST(NULL AS INT) AS x UNION ALL SELECT 1)"

    def test_projected_in_three_valued(self, spark):
        r = run(spark,
                f"SELECT CAST(2 IN (SELECT x FROM {self.S} t) AS VARCHAR) AS a,"
                f" CAST(1 IN (SELECT x FROM {self.S} t) AS VARCHAR) AS b,"
                f" CAST(2 NOT IN (SELECT x FROM {self.S} t) AS VARCHAR) AS c,"
                f" CAST(1 NOT IN (SELECT x FROM {self.S} t) AS VARCHAR) AS d,"
                " CAST(CAST(NULL AS INT) IN (SELECT x FROM (SELECT 1 AS x) t)"
                "      AS VARCHAR) AS e,"
                " CAST(CAST(NULL AS INT) NOT IN (SELECT x FROM"
                " (SELECT 1 AS x) t WHERE false) AS VARCHAR) AS f")[0]
        assert r["a"] is None and r["b"] == "true"
        assert r["c"] is None and r["d"] == "false"
        assert r["e"] is None and r["f"] == "true"

    def test_where_context_keeps_semi_join(self, spark):
        # unobservable under WHERE: the efficient spelling stays (no
        # CASE dispatch), and rows drop identically
        out = translate(
            "SELECT y FROM t WHERE y IN (SELECT x FROM s)"
        )
        assert "CASE WHEN" not in out
        rows = run(spark,
                   f"SELECT y FROM (SELECT 2 AS y)"
                   f" WHERE y IN (SELECT x FROM {self.S} t)")
        assert rows == []

    def test_row_tuple_probe_untouched(self, spark):
        # ((a, b)) IN … would break analysis and Trino's row-IN null
        # algebra is per-field — tuple probes keep Spark semantics
        out = translate("SELECT (a, b) IN (SELECT x, y FROM s) AS r FROM t")
        assert "CASE WHEN" not in out
        r = run(spark, "SELECT CAST((1, 2) IN (SELECT 1, 2) AS VARCHAR) AS r")
        assert r[0]["r"] == "true"


class TestDoubleZeroDivision:
    """x81 (r15): double /0 and %0 are IEEE in Trino (±Infinity/NaN,
    no error) where Spark ANSI threw — a hard-error divergence.  The
    dispatch only fires on knowably-double operands; integer division
    by zero still errors in both engines."""

    def test_ieee_values(self, spark):
        r = run(spark,
                "SELECT CAST(5.0E0 / 0.0E0 AS VARCHAR) AS a,"
                " CAST(-5.0E0 / 0.0E0 AS VARCHAR) AS b,"
                " CAST(5.0E0 / -0.0E0 AS VARCHAR) AS c,"
                " CAST(0.0E0 / 0.0E0 AS VARCHAR) AS d,"
                " CAST(mod(5.0E0, 0.0E0) AS VARCHAR) AS e,"
                " CAST(5.0E0 % 0.0E0 AS VARCHAR) AS f,"
                " CAST(CAST(NULL AS DOUBLE) / 0.0E0 AS VARCHAR) AS g")[0]
        assert (r["a"], r["b"], r["c"]) == ("Infinity", "-Infinity", "-Infinity")
        assert (r["d"], r["e"], r["f"]) == ("NaN", "NaN", "NaN")
        assert r["g"] is None

    def test_nonzero_and_integer_paths_untouched(self, spark):
        r = run(spark, "SELECT CAST(5.0E0 / 2.0E0 AS VARCHAR) AS a,"
                       " 10 / 2 AS b, CAST(mod(7, 3) AS VARCHAR) AS c")[0]
        assert (r["a"], r["b"], r["c"]) == ("2.5", 5, "1")
        out = translate("SELECT a / b FROM t",
                        column_types={"a": "int", "b": "int"})
        assert "Infinity" not in out

    def test_double_column_division_guarded(self, spark):
        # CATALOG-typed double columns qualify (the x47 contract —
        # derived-subquery aliases stay unknowable residue); values
        # agree on the nonzero path and the zero divisor no longer
        # errors
        spark.createDataFrame(
            [(4.0, 0.0), (4.0, 2.0)], "xd double, yd double"
        ).createOrReplaceTempView("x81_div_t")
        try:
            rows = run(spark,
                       "SELECT CAST(xd / yd AS VARCHAR) AS r FROM x81_div_t")
            assert sorted(r["r"] for r in rows) == ["2.0", "Infinity"]
        finally:
            spark.catalog.dropTempView("x81_div_t")
