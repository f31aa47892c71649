"""Totality fuzz for the dialect translator.

translate() runs ~30 regex/scan passes with rescan loops over
user-controlled SQL text.  The contract: for ANY input it either
returns a string or raises TrinoCompatError — never a different
exception, never a hang.  Hypothesis drives SQL-ish token soup through
every rewrite head to keep the passes exercised.
"""

import pytest
from hypothesis import given, settings, strategies as st

from mcp_trino_spark.trino_compat import TrinoCompatError, translate

# token soup biased toward the rewrite triggers: heads, quotes, parens,
# lambdas, comments, keywords — the shapes the scan loops dispatch on
_TOKENS = st.sampled_from(
    [
        "SELECT ", "FROM t ", "WHERE ", "(", ")", ",", "'", "''", '"',
        "`", " ", "\n", "--", "/*", "*/", "->", "=", "<>", ">", "<=",
        "ANY", "ALL", "SOME", "x", "1", "0.5", "NULL",
        "if(", "strpos(", "format_number(", "json_value(", "json_query(",
        "JSON_OBJECT(", "JSON_ARRAY(", "KEY ", "VALUE ", "ON NULL",
        "reduce_agg(", "approx_most_frequent(", "combinations(",
        "array_min_by(", "array_intersect(", "map_top_n(", "trim_array(",
        "value_at_quantile(", "qdigest_agg(", "word_stem(", "split(",
        "entropy(", "map_union(", "UNNEST", "WITH ORDINALITY",
        "FETCH FIRST ", "ROWS WITH TIES", "ORDER BY ", "GROUPS BETWEEN ",
        "table_changes(", "FOR VERSION AS OF ", "extract(YOW ",
        "current_timestamp(", ".field0", "array[", "]", "TRY(", "CAST(",
        "AS VARCHAR", "date_add(", "'day'", "format_datetime(",
        # round-7 additions: unicode literals, comma-join UNNEST, CAST
        # AS JSON, binary-hash wraps, quantified left-operand backscan
        "U&'", r"\0041", r"\+01F600", "UESCAPE ", "AS JSON", "md5(",
        "sha1(", "+ ", "- ", "|| ", "abs(",
        # round-8 additions: FROM FIRST/LAST windows, lambda
        # regexp_replace, surrogate escapes, subscripted operands
        "nth_value(", "FROM LAST ", "FROM FIRST ", "IGNORE NULLS ",
        "OVER (", "PARTITION BY ", "RANGE ", "PRECEDING", "FOLLOWING",
        "regexp_replace(", r"\D83D", r"\DE00", "[1]", "EXCLUDE ",
        "CURRENT ROW", "TIES", "NO OTHERS",
        # round-13 additions: complex-type comparisons / IN lists /
        # simple CASE (array/row/map equality arms), stat-agg edges,
        # typed-literal folds
        "ARRAY[1, NULL]", "ROW(1, NULL)", "MAP(ARRAY[1], ARRAY['a'])",
        "named_struct(", "IN (", "NOT IN ", "CASE ", "WHEN ", "THEN ",
        "ELSE ", "END", "corr(", "regr_slope(", "regr_intercept(",
        "<=>", "!=", ">=", "JOIN b ON ", "typeof(", "TIMESTAMP '",
        "2020-01-01", "0.0E0", "-0.0E0", "DOUBLE '", "REAL '",
        "TRY_CAST(", "AS BIGINT", "INTERVAL '", "' HOUR", "SET ",
        "UPDATE t ", "upper(", "lower(",
    ]
)


@given(st.lists(_TOKENS, max_size=40).map("".join))
@settings(max_examples=400, deadline=2000)
def test_translate_is_total(q):
    try:
        out = translate(q)
    except TrinoCompatError:
        return
    assert isinstance(out, str)


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=2000)
def test_translate_total_on_arbitrary_text(q):
    try:
        out = translate(q)
    except TrinoCompatError:
        return
    assert isinstance(out, str)


def test_translate_rejects_nothing_spuriously():
    # a plain query must never trip the fuzz-hardened paths
    assert "SELECT" in translate("SELECT 1")
