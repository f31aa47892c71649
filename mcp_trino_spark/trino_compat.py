"""Trino-dialect compatibility layer.

The reference's front door IS Trino SQL (reference
internal/trino/client.go:501-617 passes queries through verbatim).  Our
engine's front door is Spark SQL; this module closes the gap for the
common Trino idioms so a reference user's existing queries run
unchanged via ``execute_query(..., dialect="trino")``.

Two mechanisms:

1. **Compat SQL UDFs** (`install_compat_functions`) for Trino scalar
   functions Spark lacks under that name — declared once per session as
   native SQL functions (Spark 4 SQL UDFs, fully Catalyst-optimizable:
   they inline into the plan, no Python round-trip).
2. **Literal-aware rewrites** (`translate`) for the cases a rename
   can't express: aggregate names (SQL UDFs cannot wrap aggregates) and
   signature reorders like Trino's 3-arg ``date_add('day', n, x)`` →
   ``timestampadd(day, n, x)``.  Rewrites never touch string literals,
   quoted identifiers, or comments.

Deliberately out of scope (documented, not silently wrong): Joda vs
SimpleDateFormat pattern tokens inside ``format_datetime``, Trino's
``try(...)``, and type-parametric functions needing overloads
(``contains(array<T>, T)`` — use Spark's ``array_contains``).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

#: name → (args DDL, return type, body) — installed as Spark SQL UDFs.
_COMPAT_SQL_UDFS = {
    # Trino strpos(string, substring) == Spark instr(str, substr)
    "strpos": ("(a STRING, b STRING)", "INT", "instr(a, b)"),
    # Trino day_of_week is ISO (Mon=1..Sun=7); Spark dayofweek is Sun=1
    "day_of_week": ("(d TIMESTAMP)", "INT", "((dayofweek(d) + 5) % 7) + 1"),
    "day_of_year": ("(d TIMESTAMP)", "INT", "dayofyear(d)"),
    "day_of_month": ("(d TIMESTAMP)", "INT", "dayofmonth(d)"),
    "week_of_year": ("(d TIMESTAMP)", "INT", "weekofyear(d)"),
    "json_extract_scalar": ("(j STRING, p STRING)", "STRING", "get_json_object(j, p)"),
    "json_extract": ("(j STRING, p STRING)", "STRING", "get_json_object(j, p)"),
    "to_unixtime": ("(t TIMESTAMP)", "DOUBLE", "CAST(unix_timestamp(t) AS DOUBLE)"),
    "from_iso8601_timestamp": ("(s STRING)", "TIMESTAMP", "to_timestamp(s)"),
    # Trino truncate(x): round toward zero
    "truncate": ("(x DOUBLE)", "DOUBLE", "sign(x) * floor(abs(x))"),
    "to_hex": ("(x BINARY)", "STRING", "upper(hex(x))"),
}

#: plain renames applied outside literals (aggregates and exact-arity
#: synonyms a SQL UDF cannot express)
_RENAMES = [
    (re.compile(r"\bapprox_distinct\s*\(", re.IGNORECASE), "approx_count_distinct("),
    (re.compile(r"\bapprox_percentile\s*\(", re.IGNORECASE), "percentile_approx("),
    (re.compile(r"\barbitrary\s*\(", re.IGNORECASE), "any_value("),
    (re.compile(r"\bformat_datetime\s*\(", re.IGNORECASE), "date_format("),
    # bare CAST(x AS VARCHAR) — ubiquitous in Trino, and length-less
    # VARCHAR is unbounded there, so STRING is the faithful mapping
    # (VARCHAR(n) stays untouched).  Bare CHAR is NOT rewritten: Trino
    # reads it as CHAR(1), so a STRING rename would silently change
    # results — it fails Spark analysis loudly instead.
    (re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE), "STRING"),
    # Trino reduce(arr, init, merge, finish) == Spark aggregate(...)
    (re.compile(r"\breduce\s*\(", re.IGNORECASE), "aggregate("),
    (re.compile(r"\blevenshtein_distance\s*\(", re.IGNORECASE), "levenshtein("),
    # Trino SHOW … FROM catalog ↔ Spark SHOW … IN catalog
    (
        re.compile(r"\b(SHOW\s+(?:SCHEMAS|TABLES|COLUMNS))\s+FROM\b", re.IGNORECASE),
        r"\1 IN",
    ),
    # ANSI FETCH FIRST n ROWS ONLY → LIMIT n
    (
        re.compile(r"\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b", re.IGNORECASE),
        r"LIMIT \1",
    ),
]

#: Trino 3-arg date arith spans a literal: ``date_add('day', n, x)`` →
#: ``timestampadd(day, n, x)``.  The function name sits in a code
#: segment and the unit in the following literal segment, so these are
#: rewritten across the segment boundary in ``translate``.
_UNIT_FNS = {
    re.compile(r"\bdate_add\s*\(\s*$", re.IGNORECASE): "timestampadd(",
    re.compile(r"\bdate_diff\s*\(\s*$", re.IGNORECASE): "timestampdiff(",
}
_UNIT_LITERAL = re.compile(r"^'(\w+)'$")


#: marker attribute set on the SparkSession instance itself — id(spark)
#: can be recycled after GC, which would silently skip installation on a
#: fresh session; an instance attribute dies with the session object.
_INSTALLED_ATTR = "_mcp_trino_compat_installed"


def install_compat_functions(spark) -> None:
    """Install the Trino-name scalar functions as Spark SQL UDFs, once
    per SparkSession (12 DDL round-trips would otherwise tax every
    dialect='trino' call)."""
    if getattr(spark, _INSTALLED_ATTR, False):
        return
    for name, (args, rtype, body) in _COMPAT_SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{args} RETURNS {rtype} RETURN {body}"
        )
    setattr(spark, _INSTALLED_ATTR, True)


def _segments(q: str) -> Iterator[Tuple[bool, str]]:
    """Yield (is_code, text) segments: string literals, quoted
    identifiers, and comments are non-code (same lexical rules as the
    read-only classifier's sanitizer, reference client.go:386-471)."""
    i, n = 0, len(q)
    start = 0
    while i < n:
        ch = q[i]
        if ch == "'" or ch == '"' or ch == "`":
            if start < i:
                yield True, q[start:i]
            quote = ch
            j = i + 1
            while j < n:
                if q[j] == quote:
                    # doubled-quote escapes: '' in literals, "" in quoted
                    # identifiers AND `` in backtick identifiers (Spark
                    # executes the output — same rules as sanitize())
                    if j + 1 < n and q[j + 1] == quote:
                        j += 2
                        continue
                    break
                j += 1
            j = min(j + 1, n)
            yield False, q[i:j]
            i = start = j
        elif ch == "-" and i + 1 < n and q[i + 1] == "-":
            if start < i:
                yield True, q[start:i]
            j = q.find("\n", i)
            j = n if j == -1 else j
            yield False, q[i:j]
            i = start = j
        elif ch == "/" and i + 1 < n and q[i + 1] == "*":
            if start < i:
                yield True, q[start:i]
            j = q.find("*/", i + 2)
            j = n if j == -1 else j + 2
            yield False, q[i:j]
            i = start = j
        else:
            i += 1
    if start < n:
        yield True, q[start:n]


_UNNEST_HEAD = re.compile(r"\bCROSS\s+JOIN\s+UNNEST\s*\(", re.IGNORECASE)
_UNNEST_TAIL = re.compile(r"\s*(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)")


def _rewrite_unnest(q: str, code_at: List[bool]) -> str:
    """``CROSS JOIN UNNEST(expr) AS t(c)`` → ``LATERAL VIEW explode(expr)
    t AS c``.  Balanced-paren scan over code positions only (the expr
    itself may contain string literals, e.g. split(text, ' ')).
    ``WITH ORDINALITY`` is NOT rewritten (posexplode is 0-based where
    Trino ordinality is 1-based) — such queries fail analysis loudly
    rather than silently shifting indexes.
    """
    while True:
        m = None
        for cand in _UNNEST_HEAD.finditer(q):
            if code_at[cand.start()]:
                m = cand
                break
        if m is None:
            return q
        depth, i = 1, m.end()
        while i < len(q) and depth:
            if code_at[i]:
                if q[i] == "(":
                    depth += 1
                elif q[i] == ")":
                    depth -= 1
            i += 1
        if depth:
            return q  # unbalanced — leave untouched
        expr = q[m.end() : i - 1]
        tail = _UNNEST_TAIL.match(q, i)
        if not tail or "ordinality" in q[i : tail.end()].lower():
            return q
        alias, col = tail.group(1), tail.group(2)
        replacement = f"LATERAL VIEW explode({expr}) {alias} AS {col}"
        q = q[: m.start()] + replacement + q[tail.end() :]
        # rebuild the code mask for the rewritten region (expr keeps its
        # own literal spans; the scaffolding we injected is code)
        code_at = _code_mask(q)


def _code_mask(q: str) -> List[bool]:
    mask = [False] * len(q)
    pos = 0
    for is_code, seg in _segments(q):
        for j in range(len(seg)):
            mask[pos + j] = is_code
        pos += len(seg)
    return mask


def translate(query: str) -> str:
    """Rewrite Trino-only idioms to Spark SQL, outside literals/comments."""
    query = _rewrite_unnest(query, _code_mask(query))
    segs = list(_segments(query))
    out: List[str] = []
    i = 0
    while i < len(segs):
        is_code, seg = segs[i]
        if is_code:
            for pat, repl in _RENAMES:
                seg = pat.sub(repl, seg)
            # date_add('unit', …): fn name in this code segment, unit in
            # the next (literal) segment — rewrite the pair
            if i + 1 < len(segs) and not segs[i + 1][0]:
                unit = _UNIT_LITERAL.match(segs[i + 1][1])
                if unit:
                    for fn_pat, fn_repl in _UNIT_FNS.items():
                        new_seg, n_sub = fn_pat.subn(fn_repl, seg)
                        if n_sub:
                            seg = new_seg
                            segs[i + 1] = (True, unit.group(1))
                            break
        out.append(seg)
        i += 1
    return "".join(out)
