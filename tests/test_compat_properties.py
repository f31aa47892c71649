"""Property tests for the Trino-dialect translator: whatever the
rewrites do to code, string-literal CONTENT must survive byte-identical
(a rewrite that edits inside a literal silently changes query results —
the exact bug class the backslash-escape fix closed)."""

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
def test_translate_never_edits_literal_content(body):
    # embed the payload as a correctly-escaped Spark literal
    lit = "'" + body.replace("\\", "\\\\").replace("'", "\\'") + "'"
    q = f"SELECT repeat(x, 2), {lit} AS s, format('%s', y) FROM t"
    out = translate(q)
    assert _literals(out).count(lit) == _literals(q).count(lit), (q, out)
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
