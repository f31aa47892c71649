"""Property tests for the Trino-dialect translator: whatever the
rewrites do to code, the string VALUE each literal denotes under
Trino's escape-free lexing must survive into the Spark spelling
byte-identical (a rewrite that edits inside a literal — or a respell
that changes the value — silently changes query results)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_trino_spark.trino_compat import _segments, translate

# payloads deliberately stuffed with rewrite triggers + escape chars
payload = st.lists(
    st.sampled_from(list("abc()[]\\'`\" -/*") + ["repeat(", "format(", "ARRAY[", "MAP("]),
    min_size=0,
    max_size=25,
).map("".join)


def _literals(q: str):
    """Single-quoted literal segments (the ones queries return as data)."""
    return [seg for is_code, seg in _segments(q) if not is_code and seg.startswith("'")]


@settings(max_examples=300, deadline=None)
@given(payload)
def test_translate_never_edits_literal_value(body):
    # embed the payload as a Trino-spelled literal (escape-free:
    # quotes doubled, backslash an ordinary char) — translate must
    # emit the SAME string value in Spark spelling (backslashes
    # doubled) and never rewrite code-looking text inside it
    lit = "'" + body.replace("'", "''") + "'"
    expected = "'" + body.replace("\\", "\\\\").replace("'", "''") + "'"
    q = f"SELECT repeat(x, 2), {lit} AS s, format('%s', y) FROM t"
    out = translate(q)
    assert _literals(out).count(expected) == 1, (q, out)
    # code rewrites still happened outside the literal
    assert "array_repeat(x, 2)" in out
    assert "format_string('%s', y)" in out


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_translate_total(q):
    """translate() never crashes on arbitrary input — it either rewrites
    or returns the text for Spark to reject (TrinoCompatError is a
    legitimate loud outcome for inexpressible try() bodies)."""
    from mcp_trino_spark.trino_compat import TrinoCompatError

    try:
        translate(q)
    except TrinoCompatError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=24))
def test_unicode_literal_decode_roundtrip(s):
    """U&'...' decode is exact for every code point: encode each char
    as a 6-digit escape, translate, and the emitted plain literal must
    carry the original text re-escaped for Spark's lexer."""
    encoded = "".join(rf"\+{ord(c):06X}" for c in s)
    out = translate(f"SELECT U&'{encoded}' AS x")
    expected = s.replace("\\", "\\\\").replace("'", "''")
    assert out == f"SELECT '{expected}' AS x"


_OPERANDS = st.sampled_from(
    [
        "x", "t.c", "-x", "3", "1.5", "abs(x)", "(x + 1)", "x - y",
        "f(x, y)", "x || 'a'", "CAST(x AS INTEGER)", "x * 2 + 1",
        "coalesce(x, 0)", "-abs(x)",
    ]
)


@settings(max_examples=300, deadline=None)
@given(_OPERANDS, st.sampled_from(["<", "<=", ">", ">="]),
       st.sampled_from(["ANY", "SOME"]))
def test_quantified_any_rewrite_is_balanced(left, op, quant):
    """For every operand shape the backscan handles, the ANY rewrite
    must (a) produce balanced parentheses, (b) contain the threshold
    and null-degrade subqueries, and (c) keep the full left operand
    inside the parenthesized predicate."""
    q = f"SELECT * FROM t WHERE {left} {op} {quant} (SELECT v FROM s)"
    out = translate(q)
    assert out.count("(") == out.count(")")
    # threshold (twice: IS-NOT-NULL empty/all-NaN backstop + witness)
    # + guard each wrap the original subquery; Catalyst's ReuseSubquery
    # collapses the identical threshold copies into one execution
    assert out.count("FROM (SELECT v FROM s) __q(__v)") == 3
    # the comparison itself keeps the full left operand text
    assert f"{left} {op} " in out, out
