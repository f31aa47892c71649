"""Totality + default-deny fuzz for the read-only classifier.

The classifier sees raw, attacker-controlled SQL before anything else;
it must never crash, and on quote/comment-free inputs (where
sanitization is the identity and the semantics are plainly readable)
it must enforce the prefix and write-keyword rules exactly.
"""

import re

from hypothesis import given, settings, strategies as st

from mcp_trino_spark.validate import (
    WRITE_KEYWORDS,
    is_read_only_query,
    sanitize,
    strip_trailing_semicolon,
)

_TOKENS = st.sampled_from(
    [
        "SELECT", "INSERT", "DROP", "SHOW", "WITH", "EXPLAIN", "describe",
        "update", "t", "x", "1", "*", ",", "(", ")", ";", " ", "\n",
        "'", "''", '"', "--", "/*", "*/", "\\", "FROM", "WHERE", "CREATE",
        "table", "'DROP'", "-- DROP\n",
    ]
)


@given(st.lists(_TOKENS, max_size=30).map(" ".join))
@settings(max_examples=400, deadline=2000)
def test_classifier_is_total(q):
    assert isinstance(is_read_only_query(q), bool)
    assert isinstance(sanitize(q), str)
    assert isinstance(strip_trailing_semicolon(q), str)


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=2000)
def test_classifier_total_on_arbitrary_text(q):
    assert isinstance(is_read_only_query(q), bool)


_PLAIN_WORDS = st.sampled_from(
    ["SELECT", "SHOW", "WITH", "t", "x", "1", "FROM", "WHERE", "count",
     "DROP", "insert", "Update", "grant", "order", "by"]
)


@given(st.lists(_PLAIN_WORDS, min_size=1, max_size=12).map(" ".join))
@settings(max_examples=300, deadline=2000)
def test_plain_text_rules_exact(q):
    # no quotes/comments/semicolons: the classifier's answer must equal
    # the spelled-out rule — read-only prefix AND no write keyword
    ql = q.lower()
    starts_ok = any(
        re.match(rf"^\s*{v}\b", ql)
        for v in ("select", "show", "describe", "explain", "with")
    )
    has_write = any(re.search(rf"\b{kw}\b", ql) for kw in WRITE_KEYWORDS)
    expected = starts_ok and not has_write
    assert is_read_only_query(q) is expected
