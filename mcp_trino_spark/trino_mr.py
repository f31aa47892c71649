"""MATCH_RECOGNIZE SQL front-end: parse the Trino/SQL:2016 clause and
route it through the distributed pattern operator.

The reference passes MATCH_RECOGNIZE text through to Trino verbatim
(internal/trino/client.go:501-617); Spark SQL has no row-pattern
clause, so ``expand_match_recognize`` lifts the clause out of the query:
the base table is run through ``operators.pattern.match_recognize``
(one shuffle, JVM-side DEFINE evaluation — see that module for the
scale posture), the result is registered as a temp view, and the
``<table> MATCH_RECOGNIZE (...)`` span is replaced by the view name so
the surrounding SQL (projection, WHERE, ORDER BY, joins against other
tables) still runs through Catalyst unchanged.

Supported clause subset (everything else raises ``TrinoCompatError``
loudly — silent divergence from Trino is worse than an error):

- ``PARTITION BY`` simple columns (required — global-order matching
  does not scale out and Trino itself warns on it)
- ``ORDER BY col [ASC|DESC], ...``
- ``MEASURES``: ``MATCH_NUMBER()``, ``FIRST/LAST(col)``,
  ``FIRST/LAST(S.col)``, ``COUNT(*)``, ``COUNT(S.*)``,
  ``COUNT/MIN/MAX/SUM/AVG([S.]col)`` — each ``AS name``
- ``ONE ROW PER MATCH`` (default) and ``ALL ROWS PER MATCH`` (one
  output row per matched input row; measures RUNNING by default,
  ``FINAL agg(...)`` for whole-match values, ``CLASSIFIER()`` for the
  row's symbol); empty-match/unmatched-row modifiers rejected
- ``AFTER MATCH SKIP PAST LAST ROW`` (default) and ``SKIP TO NEXT
  ROW`` (overlapping matches); SKIP TO FIRST/LAST <symbol> rejected
- ``PATTERN (...)`` — the grammar of ``compile_pattern``
- ``DEFINE S AS predicate`` where the predicate is any Spark-SQL
  boolean over the row, plus ``PREV(col[, k])`` / ``NEXT(col[, k])``
  physical navigation (rewritten to lag/lead columns over the same
  partition/order window before matching — how Trino pipelines it too)
"""

from __future__ import annotations

import re
import uuid
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_trino_spark.trino_compat import TrinoCompatError, _code_mask

_MR_KW = re.compile(r"\bMATCH_RECOGNIZE\b", re.IGNORECASE)
#: table reference immediately before the keyword: 1-3 dotted identifiers
_TABLE_REF = re.compile(r"([A-Za-z_][\w$]*(?:\s*\.\s*[A-Za-z_][\w$]*){0,2})\s*$")
_ALIAS = re.compile(r"^\s*(?:AS\s+)?([A-Za-z_][\w$]*)", re.IGNORECASE)
_RESERVED_AFTER = {"WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION",
                   "EXCEPT", "INTERSECT", "JOIN", "INNER", "LEFT", "RIGHT",
                   "FULL", "CROSS", "ON", "QUALIFY", "WINDOW"}

_NAV = re.compile(r"\b(PREV|NEXT)\s*\(", re.IGNORECASE)
_MEASURE = re.compile(
    r"^(?:(MATCH_NUMBER)\s*\(\s*\)"
    r"|(CLASSIFIER)\s*\(\s*\)"
    r"|(?:(RUNNING|FINAL)\s+)?"
    r"(FIRST|LAST|COUNT|MIN|MAX|SUM|AVG)\s*\((.*)\))\s+AS\s+([A-Za-z_][\w$]*)$",
    re.IGNORECASE | re.DOTALL,
)


def has_match_recognize(query: str) -> bool:
    mask = _code_mask(query)
    return any(mask[m.start()] for m in _MR_KW.finditer(query))


def _find_clause(query: str) -> Tuple[int, int, str, int, int]:
    """Locate ``<table> MATCH_RECOGNIZE ( body )`` → (span_start,
    span_end, table, body_start, body_end) using the literal-aware mask."""
    mask = _code_mask(query)
    for m in _MR_KW.finditer(query):
        if not mask[m.start()]:
            continue
        tbl = _TABLE_REF.search(query[: m.start()])
        if not tbl:
            raise TrinoCompatError(
                "MATCH_RECOGNIZE is only supported directly on a table or "
                "view reference (not a subquery) — register the input as a "
                "temp view first"
            )
        # opening paren
        i = m.end()
        while i < len(query) and query[i].isspace():
            i += 1
        if i >= len(query) or query[i] != "(":
            raise TrinoCompatError("MATCH_RECOGNIZE must be followed by (...)")
        depth, j = 0, i
        while j < len(query):
            if mask[j]:
                if query[j] == "(":
                    depth += 1
                elif query[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            j += 1
        if depth != 0:
            raise TrinoCompatError("unbalanced parens in MATCH_RECOGNIZE")
        return tbl.start(1), j + 1, re.sub(r"\s", "", tbl.group(1)), i + 1, j
    raise TrinoCompatError("no MATCH_RECOGNIZE clause found")


_SECTION = re.compile(
    r"\b(PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW\s+PER\s+MATCH|"
    r"ALL\s+ROWS\s+PER\s+MATCH|AFTER\s+MATCH|PATTERN|SUBSET|DEFINE)\b",
    re.IGNORECASE,
)


def _split_sections(body: str) -> Dict[str, str]:
    """Split the clause body into its keyword sections (literal-aware)."""
    mask = _code_mask(body)
    marks = [(m.start(), m.end(), re.sub(r"\s+", " ", m.group(1).upper()))
             for m in _SECTION.finditer(body) if mask[m.start()]]
    # PATTERN's (...) may itself contain nothing section-like; DEFINE
    # predicates may contain parens but no section keywords — safe split.
    out: Dict[str, str] = {}
    lead = body[: marks[0][0]].strip() if marks else body.strip()
    if lead:
        # text before the first recognized keyword would otherwise be
        # silently dropped (e.g. a typo'd clause) — loud beats lossy
        raise TrinoCompatError(
            f"unrecognized MATCH_RECOGNIZE content before first clause: "
            f"{lead[:60]!r}"
        )
    for k, (start, end, name) in enumerate(marks):
        nxt = marks[k + 1][0] if k + 1 < len(marks) else len(body)
        if name in out:
            raise TrinoCompatError(f"duplicate {name} in MATCH_RECOGNIZE")
        out[name] = body[end:nxt].strip()
    # keyword-only sections must be EMPTY: Trino modifiers like SEEK or
    # WITH UNMATCHED ROWS would otherwise be dropped without error,
    # silently running INITIAL/default semantics
    for kw in ("ONE ROW PER MATCH",):
        if out.get(kw):
            raise TrinoCompatError(
                f"unsupported modifier after {kw}: {out[kw][:40]!r} "
                "(SEEK / unmatched-row modes are not supported)"
            )
    return out


def _split_top_commas(s: str) -> List[str]:
    """Split on commas not nested in parens/brackets (literal-aware)."""
    mask = _code_mask(s)
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(s):
        if not mask[i]:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[last:i].strip())
            last = i + 1
    parts.append(s[last:].strip())
    return [p for p in parts if p]


def _parse_measures(text: str, symbols: List[str]):
    """→ (measures, match_no alias or None, declared output-name order).
    The declared order matters: SELECT * over the rewritten view must
    present MEASURES columns in their declared positions — including
    MATCH_NUMBER() wherever the user put it."""
    measures, match_no_alias, declared = [], None, []
    sym_upper = {s.upper(): s for s in symbols}
    for item in _split_top_commas(text):
        m = _MEASURE.match(item.strip())
        if not m:
            raise TrinoCompatError(
                f"unsupported MEASURES entry {item!r} (supported: "
                "MATCH_NUMBER(), CLASSIFIER(), [RUNNING|FINAL] "
                "FIRST/LAST/COUNT/MIN/MAX/SUM/AVG over "
                "[symbol.]column, each AS name)"
            )
        if m.group(1):  # MATCH_NUMBER()
            match_no_alias = m.group(6)
            declared.append(m.group(6))
            continue
        if m.group(2):  # CLASSIFIER()
            measures.append((m.group(6), "classifier", None, None, None))
            declared.append(m.group(6))
            continue
        mode = m.group(3).lower() if m.group(3) else None
        agg, arg, name = m.group(4).lower(), m.group(5).strip(), m.group(6)
        sym = None
        if arg == "*":
            col = None
        else:
            dm = re.fullmatch(
                r"([A-Za-z_][\w$]*)\s*\.\s*([A-Za-z_][\w$]*|\*)", arg
            )
            if dm and dm.group(1).upper() in sym_upper:
                sym = sym_upper[dm.group(1).upper()]
                col = None if dm.group(2) == "*" else dm.group(2)
            elif re.fullmatch(r"[A-Za-z_][\w$]*", arg):
                col = arg
            else:
                raise TrinoCompatError(
                    f"unsupported measure argument {arg!r} — use a plain "
                    "column or symbol.column (expressions inside measures "
                    "are not supported; compute them in an outer SELECT)"
                )
        if col is None and agg != "count":
            raise TrinoCompatError(f"{agg.upper()}(*) requires a column")
        if agg in ("first", "last") and col is None:
            raise TrinoCompatError(f"{agg.upper()} requires a column")
        measures.append((name, agg, sym, col, mode))
        declared.append(name)
    return measures, match_no_alias, declared


def _rewrite_navigation(pred: str) -> Tuple[str, Dict[str, Tuple[str, str, int]]]:
    """Replace PREV/NEXT(col[, k]) with generated lag/lead column refs.

    Returns (rewritten predicate, {gen_col: (fn, col, k)}).
    """
    needed: Dict[str, Tuple[str, str, int]] = {}

    mask = _code_mask(pred)  # PREV( inside a string literal is content, not nav
    out, i = [], 0
    while True:
        m = next((c for c in _NAV.finditer(pred, i) if mask[c.start()]), None)
        if not m:
            out.append(pred[i:])
            break
        out.append(pred[i : m.start()])
        # find matching close paren (code positions only)
        depth, j = 1, m.end()
        while j < len(pred) and depth:
            if mask[j]:
                if pred[j] == "(":
                    depth += 1
                elif pred[j] == ")":
                    depth -= 1
            j += 1
        if depth:
            raise TrinoCompatError(f"unbalanced parens in DEFINE: {pred!r}")
        args = [a.strip() for a in pred[m.end() : j - 1].split(",")]
        fn = m.group(1).lower()
        if not re.fullmatch(r"[A-Za-z_][\w$]*", args[0]):
            raise TrinoCompatError(
                f"{fn.upper()}() supports only a plain column argument, "
                f"got {args[0]!r}"
            )
        k = 1
        if len(args) == 2:
            if not args[1].isdigit():
                raise TrinoCompatError(f"{fn.upper()} offset must be a literal")
            k = int(args[1])
        elif len(args) > 2:
            raise TrinoCompatError(f"too many arguments to {fn.upper()}()")
        gen = f"__{fn}_{args[0]}_{k}"
        needed[gen] = (fn, args[0], k)
        out.append(gen)
        i = j
    return "".join(out), needed


def expand_match_recognize(
    spark: SparkSession, query: str, created_views: Optional[List[str]] = None
) -> str:
    """Replace every ``<table> MATCH_RECOGNIZE (...)`` span with a temp
    view holding the operator's output; return the rewritten query.

    Pass ``created_views`` to collect the generated view names — the
    caller should drop them once the rewritten query has executed, or
    a long-running session leaks one catalog entry (and its retained
    analyzed plan) per MATCH_RECOGNIZE clause ever run."""
    while has_match_recognize(query):
        start, end, table, bstart, bend = _find_clause(query)
        body = query[bstart:bend]
        sections = _split_sections(body)

        subsets: Dict[str, List[str]] = {}
        if "SUBSET" in sections:
            # SUBSET X = (A, B), Y = (C): union variables usable in
            # MEASURES (aggregate over rows matched by ANY member)
            for entry in _split_top_commas(sections["SUBSET"]):
                sm = re.fullmatch(
                    r"([A-Za-z_][\w$]*)\s*=\s*\(([^()]*)\)", entry.strip()
                )
                if not sm:
                    raise TrinoCompatError(
                        f"unsupported SUBSET entry {entry!r} — expected "
                        "NAME = (SYM, SYM, ...)"
                    )
                subsets[sm.group(1)] = [
                    m.strip() for m in sm.group(2).split(",") if m.strip()
                ]
        all_rows = "ALL ROWS PER MATCH" in sections
        unmatched = False
        if all_rows and sections["ALL ROWS PER MATCH"]:
            mod = re.sub(
                r"\s+", " ", sections["ALL ROWS PER MATCH"].upper()
            ).strip()
            if mod == "OMIT EMPTY MATCHES":
                # this engine's scanner already omits zero-width
                # (empty) matches — the modifier states the behavior
                pass
            elif mod == "WITH UNMATCHED ROWS":
                unmatched = True
            else:
                raise TrinoCompatError(
                    "unsupported modifier after ALL ROWS PER MATCH: "
                    f"{mod[:40]!r} (OMIT EMPTY MATCHES and WITH "
                    "UNMATCHED ROWS are supported; SHOW EMPTY MATCHES "
                    "is not — this engine's scanner never emits empty "
                    "matches)"
                )
        after_match = "past last row"
        if "AFTER MATCH" in sections:
            raw_skip = re.sub(r"\s+", " ", sections["AFTER MATCH"]).strip()
            skip = raw_skip.upper()
            sm2 = re.match(
                r"(?i)^SKIP TO (?:(FIRST|LAST) )?([A-Za-z_][\w$]*)$",
                raw_skip,
            )
            if skip == "SKIP TO NEXT ROW":
                after_match = "to next row"  # overlapping matches
            elif sm2:
                # SKIP TO <sym> is the standard's shorthand for LAST
                which = (sm2.group(1) or "LAST").lower()
                after_match = f"to {which} {sm2.group(2)}"
            elif skip != "SKIP PAST LAST ROW":
                raise TrinoCompatError(
                    f"AFTER MATCH {skip} is not supported (SKIP PAST LAST "
                    "ROW, SKIP TO NEXT ROW, and SKIP TO [FIRST|LAST] "
                    "<symbol> are)"
                )
        for req in ("PARTITION BY", "ORDER BY", "PATTERN", "DEFINE"):
            if req not in sections:
                raise TrinoCompatError(f"MATCH_RECOGNIZE requires {req}")

        part_cols = [c.strip() for c in sections["PARTITION BY"].split(",")]
        order_items = [re.sub(r"\s+", " ", c.strip())
                       for c in sections["ORDER BY"].split(",")]
        pattern = sections["PATTERN"].strip()
        if not (pattern.startswith("(") and pattern.endswith(")")):
            raise TrinoCompatError("PATTERN must be parenthesized")
        pattern = pattern[1:-1]

        define: Dict[str, str] = {}
        nav_cols: Dict[str, Tuple[str, str, int]] = {}
        for item in _split_top_commas(sections["DEFINE"]):
            dm = re.match(r"([A-Za-z_][\w$]*)\s+AS\s+(.*)$", item.strip(),
                          re.IGNORECASE | re.DOTALL)
            if not dm:
                raise TrinoCompatError(f"malformed DEFINE entry {item!r}")
            pred, needed = _rewrite_navigation(dm.group(2).strip())
            nav_cols.update(needed)
            define[dm.group(1)] = pred

        # fold SUBSET member case to the DEFINE spellings (unquoted SQL
        # identifiers are case-insensitive) and validate membership
        def_upper = {d.upper(): d for d in define}
        for sub_name, members in subsets.items():
            folded = []
            for mref in members:
                if mref.upper() not in def_upper:
                    raise TrinoCompatError(
                        f"SUBSET {sub_name!r} member {mref!r} has no "
                        f"DEFINE entry (defined: {sorted(define)})"
                    )
                folded.append(def_upper[mref.upper()])
            subsets[sub_name] = folded
        measures, match_no_alias, declared = (
            _parse_measures(
                sections["MEASURES"], list(define) + list(subsets)
            )
            if "MEASURES" in sections
            else ([], None, [])
        )
        if not measures and match_no_alias is None:
            raise TrinoCompatError(
                "MATCH_RECOGNIZE without MEASURES produces no useful "
                "ONE-ROW-PER-MATCH output; add a MEASURES clause"
            )

        df: DataFrame = spark.table(table)
        if nav_cols:
            # parse col [ASC|DESC] [NULLS FIRST|LAST] exactly like the
            # operator does, so the lag/lead window and the matcher's
            # pandas sort see the SAME ordering
            from mcp_trino_spark.operators.pattern import parse_order_item

            order_exprs = []
            for item in order_items:
                try:
                    key, asc, na = parse_order_item(item)
                except ValueError as exc:
                    raise TrinoCompatError(
                        f"unsupported ORDER BY item {item!r} in MATCH_RECOGNIZE"
                    ) from exc
                nulls_first = na == "first"
                c = F.col(key)
                order_exprs.append(
                    (c.asc_nulls_first() if nulls_first else c.asc_nulls_last())
                    if asc
                    else (c.desc_nulls_first() if nulls_first else c.desc_nulls_last())
                )
            w = Window.partitionBy(*part_cols).orderBy(*order_exprs)
            for gen, (fn, col, k) in nav_cols.items():
                nav = F.lag(col, k) if fn == "prev" else F.lead(col, k)
                df = df.withColumn(gen, nav.over(w))

        from mcp_trino_spark.operators.pattern import match_recognize

        # Trino's default measure semantics: FINAL in ONE ROW PER MATCH,
        # RUNNING in ALL ROWS PER MATCH; an explicit RUNNING/FINAL wins
        default_mode = "running" if all_rows else "final"
        measures = [
            (n, a, sy, c, (mo or default_mode)) for (n, a, sy, c, mo) in measures
        ]
        out = match_recognize(
            df,
            partition_by=part_cols,
            order_by=order_items,
            define=define,
            pattern=pattern,
            measures=measures,
            match_no_col=match_no_alias or "__match_no",
            # arbitrary passthrough SQL: fail loudly at execution if the
            # DEFINEs overlap (first-match-wins could silently diverge
            # from Trino's per-row symbol alternatives)
            enforce_exclusive=True,
            after_match=after_match,
            rows_per_match="all" if all_rows else "one",
            subsets=subsets or None,
            unmatched_rows=unmatched,
        )
        if match_no_alias is None:
            out = out.drop("__match_no")
        if declared:
            # present MEASURES columns in their DECLARED order (incl.
            # MATCH_NUMBER() at its declared slot).  Trino's SELECT *
            # ordering: partition cols, order cols, measures, remaining
            # input columns (ALL ROWS mode) / partition cols + measures
            # (ONE ROW mode) — the operator emits match_no and measures
            # after the passthrough block, so reorder here
            if all_rows:
                order_cols = []
                for item in order_items:
                    k = item.split()[0]
                    if k not in part_cols and k not in order_cols:
                        order_cols.append(k)
                lead = [*part_cols, *order_cols, *declared]
                rest = [c for c in out.columns if c not in lead]
                out = out.select(*lead, *rest)
            else:
                out = out.select(*part_cols, *declared)

        view = f"__mr_{uuid.uuid4().hex[:10]}"
        out.createOrReplaceTempView(view)
        if created_views is not None:
            created_views.append(view)

        # swallow a trailing alias if present (keep it on the view)
        rest = query[end:]
        alias = ""
        am = _ALIAS.match(rest)
        if am and am.group(1).upper() not in _RESERVED_AFTER:
            alias = f" {am.group(1)}"
            rest = rest[am.end():]
        query = f"{query[:start]}{view}{alias}{rest}"
    return query
