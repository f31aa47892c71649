"""Read-only SQL classifier + literal/comment sanitizer.

Re-implements the behavioral contract of the reference's query gate
(SURVEY §2.1 F7/F8; reference internal/trino/client.go:262-471, test
corpus internal/trino/client_test.go:395-446 and comment_test.go:7-272):

1. Sanitize: strip ``--`` line comments, ``/* */`` block comments
   (unclosed comment ⇒ drop the rest), collapse single-quoted literals
   to ``'LITERAL'`` (with ``''`` escapes), double-quoted segments to
   ``"IDENTIFIER"`` and backtick-quoted identifiers to ```IDENTIFIER```
   (with ``` `` ``` doubling) — so write keywords hiding inside strings
   or comments can't cause false accepts/rejects.  Because the gated
   string is executed by **Spark**, the sanitizer follows Spark's
   lexical rules, not Trino's: backticks quote identifiers (a quote
   character inside a backtick identifier must not open a string — that
   was a verified write-gate bypass), and backslash escapes are active
   inside quoted strings (``'it\'s'`` is one literal).
2. Normalize: lowercase, newlines → spaces, trim.
3. Reject any remaining ``;`` (multi-statement injection guard).
4. Accept only queries starting with a read-only verb (``select``,
   ``show``, ``describe``, ``explain``, ``with`` — word-boundary, so
   ``SELECT*FROM`` passes but ``SHOWTABLES`` doesn't), and then only if
   no write keyword appears anywhere — except the ``SHOW CREATE
   TABLE|VIEW|SCHEMA|MATERIALIZED VIEW`` family, which is read-only DDL
   display.
5. Everything else is rejected (default-deny).
"""

from __future__ import annotations

import re

#: Write/DDL keywords rejected anywhere in a sanitized query
#: (reference client.go:306-310, which cites the Trino SQL reference).
WRITE_KEYWORDS = (
    "insert", "update", "delete", "drop", "create", "alter", "truncate",
    "merge", "copy", "grant", "revoke", "commit", "rollback",
    "call", "execute", "refresh", "set", "reset",
)

READ_ONLY_VERBS = ("select", "show", "describe", "explain", "with")

_SHOW_CREATE_RE = re.compile(
    r"^\s*show\s+create\s+(table|view|schema|materialized\s+view)\b"
)


def sanitize(query: str) -> str:
    """Strip comments; collapse quoted literals/identifiers to markers."""
    out: list[str] = []
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        nxt = query[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":  # line comment → eat to EOL
            while i < n and query[i] not in "\r\n":
                i += 1
            if i < n and query[i] == "\r":
                i += 1
            if i < n and query[i] == "\n":
                i += 1
            continue
        if ch == "/" and nxt == "*":  # block comment (unclosed ⇒ eat rest)
            end = query.find("*/", i + 2)
            i = n if end < 0 else end + 2
            continue
        if ch == "'":  # string literal, '' and \' escapes (Spark lexer)
            out.append("'LITERAL'")
            i += 1
            while i < n:
                if query[i] == "\\":
                    i += 2  # backslash escape — skip the escaped char
                    continue
                if query[i] == "'":
                    i += 1
                    if i < n and query[i] == "'":
                        i += 1  # escaped quote — stay inside the literal
                        continue
                    break
                i += 1
            continue
        if ch == '"':  # double-quoted (string in Spark), "" and \" escapes
            out.append('"IDENTIFIER"')
            i += 1
            while i < n:
                if query[i] == "\\":
                    i += 2
                    continue
                if query[i] == '"':
                    i += 1
                    if i < n and query[i] == '"':
                        i += 1
                        continue
                    break
                i += 1
            continue
        if ch == "`":  # backtick identifier (Spark), `` doubling escapes
            out.append("`IDENTIFIER`")
            i += 1
            while i < n:
                if query[i] == "`":
                    i += 1
                    if i < n and query[i] == "`":
                        i += 1  # doubled backtick — stay inside
                        continue
                    break
                i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out).strip()


def _normalize(query: str) -> str:
    q = sanitize(query).lower()
    q = q.replace("\n", " ").replace("\r", " ")
    return q.strip()


def _has_any_keyword(q: str, keywords: tuple[str, ...]) -> bool:
    return any(re.search(rf"\b{kw}\b", q) for kw in keywords)


def is_read_only_query(query: str) -> bool:
    """True iff ``query`` is a single read-only statement."""
    q = _normalize(query)
    if ";" in q:
        return False
    if not any(re.match(rf"^\s*{verb}\b", q) for verb in READ_ONLY_VERBS):
        return False  # default-deny: must start with a read-only verb
    if _SHOW_CREATE_RE.match(q):
        return True  # SHOW CREATE … displays DDL, never executes it
    if re.match(r"^\s*show\b", q):
        # any write keyword except the SHOW CREATE case (handled above)
        others = tuple(kw for kw in WRITE_KEYWORDS if kw != "create")
        return not _has_any_keyword(q, others)
    return not _has_any_keyword(q, WRITE_KEYWORDS)


def strip_trailing_semicolon(query: str) -> str:
    """The reference trims exactly one trailing ``;`` before validating
    (client.go:516) so a conventionally-terminated statement passes but
    ``…;;`` still trips the multi-statement guard."""
    q = query.strip()
    return q[:-1].strip() if q.endswith(";") else q
