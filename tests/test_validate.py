"""Read-only classifier + sanitizer tests.

Ports the reference's test corpus (reference
internal/trino/client_test.go:395-446 — TestImprovedIsReadOnlyQuery —
and internal/trino/comment_test.go:7-272) to pytest.  No Spark needed.
"""

import pytest

from mcp_trino_spark.validate import (
    is_read_only_query,
    sanitize,
    strip_trailing_semicolon,
)

# (query, expected) — from client_test.go:395-446
CLASSIFIER_CASES = [
    ("SELECT * FROM users", True),
    ("  SELECT * FROM users", True),
    ("\n SELECT * FROM users\n", True),
    ("SHOW TABLES", True),
    ("DESCRIBE users", True),
    ("EXPLAIN SELECT * FROM users", True),
    ("WITH cte AS (SELECT 1) SELECT * FROM cte", True),
    # SHOW CREATE family: read-only despite the 'create' keyword
    ("SHOW CREATE TABLE users", True),
    ("SHOW CREATE TABLE myschema.users", True),
    ("SHOW CREATE TABLE catalog.schema.table", True),
    ("  SHOW CREATE TABLE users  ", True),
    ("SHOW CREATE VIEW my_view", True),
    ("SHOW CREATE SCHEMA myschema", True),
    ("SHOW CREATE MATERIALIZED VIEW my_mat_view", True),
    # word boundaries
    ("SELECT*FROM users", True),
    ("SHOWTABLES", False),
    # write ops
    ("INSERT INTO users VALUES (1)", False),
    ("UPDATE users SET name = 'test'", False),
    ("DELETE FROM users", False),
    ("CREATE TABLE test (id INT)", False),
    ("CREATE VIEW myview AS SELECT 1", False),
    ("DROP TABLE users", False),
    ("ALTER TABLE users ADD COLUMN age INT", False),
    # literals/comments/multi-statement
    ("SELECT 'INSERT INTO' FROM dual", True),
    ("SELECT 1 -- INSERT INTO users", True),
    ("SELECT 1; INSERT INTO users VALUES (1)", False),
]

# from comment_test.go — comments/apostrophes/quotes interplay
COMMENT_CASES = [
    ("-- This is a comment\nSELECT * FROM table", True),
    ("-- Comment 1\n-- Comment 2\nSELECT 1", True),
    ("/* This is a\nmultiline comment */\nSELECT 1", True),
    ("SELECT /* inline comment */ * FROM table", True),
    ("-- This is dangerous\nDROP TABLE users", False),
    ("-- It's important that we don't break when there's multiple apostrophes\nSELECT 1", True),
    ('-- Use "double quotes" in identifiers\nSELECT * FROM "table"', True),
    ("-- This ends with a quote'\nSELECT 1", True),
    ("-- What if we DON'T do this?\nSELECT 1", True),
    ("-- We could INSERT here but we won't\nSELECT 1", True),
    ("SELECT * FROM table WHERE msg = '-- test' OR id = 1", True),
    ("SELECT * FROM table WHERE msg = '/* comment */'", True),
    ("SELECT * FROM table WHERE msg = 'INSERT INTO test'", True),
    ("-- comment\nSELECT * FROM table", True),
    ("/* comment */SELECT * FROM table", True),
    ("-- first\n/* second */SELECT * FROM table", True),
    ("-- DON'T panic\nSELECT * FROM table WHERE name = 'John'", True),
    ("/* Here's a comment that won't break */\nSELECT 1", True),
    ("SELECT 'value' FROM table", True),
    ("-- We won't filter bots\nWITH cte AS (SELECT 'xp' as exp) SELECT * FROM cte", True),
    ("SELECT '-- /* nested */ --' FROM t", True),
    ("SELECT '--starts with dash' FROM t", True),
    ("-- real comment\nSELECT '-- fake comment' FROM t", True),
    # unclosed comments: rest of input dropped
    ("/* unclosed comment", False),  # nothing left → no read-only prefix
    ("SELECT 1 /* unclosed", True),
    ("SELECT 1 /* unclosed XYZ", True),
]


@pytest.mark.parametrize("query,expected", CLASSIFIER_CASES)
def test_classifier(query, expected):
    assert is_read_only_query(query) is expected


@pytest.mark.parametrize("query,expected", COMMENT_CASES)
def test_classifier_comments(query, expected):
    assert is_read_only_query(query) is expected


def test_sanitize_literals():
    assert sanitize("SELECT 'a''b' FROM t") == "SELECT 'LITERAL' FROM t"
    assert sanitize('SELECT "my col" FROM t') == 'SELECT "IDENTIFIER" FROM t'
    assert sanitize("SELECT 1 -- trailing") == "SELECT 1"
    assert sanitize("/* x */SELECT 1") == "SELECT 1"
    assert sanitize("SELECT 1 /* unclosed") == "SELECT 1"


def test_strip_trailing_semicolon():
    assert strip_trailing_semicolon("SELECT 1;") == "SELECT 1"
    assert strip_trailing_semicolon("SELECT 1 ; ") == "SELECT 1"
    # only one is stripped — ';;' still trips the multi-statement guard
    assert strip_trailing_semicolon("SELECT 1;;").endswith(";")
    assert not is_read_only_query(strip_trailing_semicolon("SELECT 1;;"))


def test_sanitize_backtick_identifiers():
    # backticks are Spark identifier quotes; a quote character inside one
    # must NOT open a string literal (verified round-1 write-gate bypass:
    # WITH `a'b` AS (...) INSERT INTO ... slipped past the classifier)
    assert sanitize("SELECT `my col` FROM t") == "SELECT `IDENTIFIER` FROM t"
    assert sanitize("SELECT `a``b` FROM t") == "SELECT `IDENTIFIER` FROM t"
    bypass = "WITH `a'b` AS (SELECT 1 AS v) INSERT INTO tgt SELECT v FROM `a'b`"
    assert not is_read_only_query(bypass)
    # and the mirror image: backtick inside a string stays a string
    assert sanitize("SELECT '`' FROM t") == "SELECT 'LITERAL' FROM t"


def test_sanitize_backslash_escapes():
    # Spark's lexer treats \' as an escaped quote inside a literal — the
    # classifier must see the same literal extent the executor does
    assert sanitize(r"SELECT 'it\'s an INSERT' FROM t") == "SELECT 'LITERAL' FROM t"
    assert is_read_only_query(r"SELECT 'it\'s an INSERT' FROM t")
    assert sanitize(r'SELECT "a\" DROP" FROM t') == 'SELECT "IDENTIFIER" FROM t'
    # write verbs outside quotes still rejected
    assert not is_read_only_query(r"SELECT 'x\'' ; DROP TABLE t")
