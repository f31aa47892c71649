"""Property-based tests (hypothesis) for the classifier + sanitizer —
the security-critical path, fuzzed beyond the reference's table-driven
corpus (reference client_test.go:395-446, comment_test.go:7-272)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_trino_spark.validate import (
    WRITE_KEYWORDS,
    is_read_only_query,
    sanitize,
    strip_trailing_semicolon,
)

# token soup: quotes, comment markers, keywords, separators — joined
# into adversarial pseudo-SQL
_TOKENS = (
    list("abcdefgh ;'\"-/*\n\r()=0123_")
    + ["drop", "select", "insert", "--", "/*", "*/", "''", "show", "with"]
)
sql_chunks = st.lists(st.sampled_from(_TOKENS), max_size=25).map("".join)


@given(sql_chunks)
@settings(max_examples=300, deadline=None)
def test_sanitize_total_and_idempotent(q):
    """sanitize never raises, and sanitizing twice == once (markers
    contain quotes, so idempotence means the marker forms are stable)."""
    s1 = sanitize(q)
    s2 = sanitize(s1)
    assert sanitize(s2) == s2


@given(st.text(alphabet=st.characters(blacklist_characters="'\""), max_size=40))
@settings(max_examples=300, deadline=None)
def test_write_keyword_inside_literal_never_rejects_select(payload):
    """Any payload with quotes escaped into a literal can never flip the
    classifier: SELECT '<payload>' must always be read-only."""
    lit = payload.replace("'", "''")
    assert is_read_only_query(f"SELECT '{lit}' AS c") is True


@given(st.sampled_from(WRITE_KEYWORDS), sql_chunks)
@settings(max_examples=300, deadline=None)
def test_write_keyword_in_code_always_rejected(kw, suffix):
    """A write keyword in actual code position is always rejected, no
    matter what follows."""
    assert is_read_only_query(f"SELECT 1 FROM t WHERE {kw} {suffix}") is False


@given(sql_chunks)
@settings(max_examples=300, deadline=None)
def test_classifier_total(q):
    """Classifier never raises on arbitrary input; default-deny means
    non-read-only-prefixed garbage is rejected."""
    result = is_read_only_query(q)
    assert isinstance(result, bool)
    stripped = sanitize(q).lower().lstrip()
    if not any(
        stripped.startswith(v) for v in ("select", "show", "describe", "explain", "with")
    ):
        assert result is False


@given(sql_chunks)
@settings(max_examples=300, deadline=None)
def test_multi_statement_always_rejected(q):
    """A semicolon surviving sanitization (i.e. in code position) always
    rejects — regardless of surrounding content."""
    query = f"SELECT 1; {q}"
    if ";" in sanitize(strip_trailing_semicolon(query)):
        assert is_read_only_query(strip_trailing_semicolon(query)) is False


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_strip_trailing_semicolon_strips_at_most_one(q):
    out = strip_trailing_semicolon(q)
    assert not out.endswith(";") or q.strip().endswith(";;")
