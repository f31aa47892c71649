"""Row-pattern matching (Trino ``MATCH_RECOGNIZE``) as a first-class operator.

The reference passes MATCH_RECOGNIZE through to Trino verbatim
(internal/trino/client.go:501-617 runs any SQL text); Trino implements the
SQL:2016 row-pattern-recognition spec.  Spark has no built-in equivalent,
so this module implements the scale-out rewrite:

1. DEFINE predicates are evaluated **JVM-side** as boolean columns
   (whole-stage codegen'd) — Python never sees the raw predicate inputs.
   ``PREV``/``NEXT`` navigation in a DEFINE is expressed by the caller as
   ``lag``/``lead`` columns over the same (partition, order) window, which
   is exactly how Trino's own engine pipelines it.
2. Each row is classified to a single pattern symbol (first DEFINE that
   matches, in declaration order — symbols are expected to be mutually
   exclusive, as in every practical MATCH_RECOGNIZE query; Trino's full
   spec additionally explores per-row symbol *alternatives*, which no
   scale-out rewrite preserves — documented restriction).
3. One shuffle on the PARTITION BY key; per key the ordered symbol string
   is scanned with a compiled regex (leftmost, greedy, non-overlapping ==
   ``AFTER MATCH SKIP PAST LAST ROW`` with greedy quantifiers), and
   MEASURES are computed from the matched row span on per-group numpy
   arrays inside ``mapInPandas`` (Arrow-batched; no per-match pandas
   slicing — that overhead dominated match-dense inputs).

Scale posture (100 TB): the only shuffle is the PARTITION BY hash; the
projected payload is pruned to partition keys + order keys + measure
inputs + one classification char BEFORE the shuffle.  The Python crossing
is per PARTITION (repartition → sortWithinPartitions → mapInPandas with a
pandas groupby inside), not per key — with millions of small keys the
per-group Arrow/Python round-trip of applyInPandas dominates wall clock
(measured 3.7 s → 1.3 s at sf0.1 / 46k keys); the per-key work itself is
an O(rows-in-key) regex scan, not quadratic.  Memory per task is the
partition's pruned payload in pandas — governed by partition sizing, the
same knob every mapInPandas operator answers to.  Skewed keys behave like
any other aggregation skew (AQE handles moderate skew).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from mcp_trino_spark.registry import register
from mcp_trino_spark.operators._util import T

__all__ = ["match_recognize", "compile_pattern", "parse_order_item"]

#: safe single-char alphabet assigned to symbols in declaration order
_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
#: classification char for rows matching no DEFINE (never in the alphabet,
#: never a regex metacharacter)
_UNMATCHED = "0"

#: measure aggregates → (pandas reduction, result type policy)
_AGGS = {"first", "last", "count", "min", "max", "sum", "avg"}

Measure = Tuple[str, str, Optional[str], Optional[str]]
# (output_name, agg, symbol or None == whole match, input column or None)


def compile_pattern(pattern: str, symbol_chars: Dict[str, str]) -> "re.Pattern[str]":
    """Compile a MATCH_RECOGNIZE PATTERN body to a Python regex.

    Supported grammar (the practical subset): symbol names, concatenation
    (whitespace), alternation ``|``, grouping ``( )``, quantifiers ``+ * ?``
    and ``{m}`` / ``{m,n}`` / ``{m,}``.  Anchors ``^ $``, exclusion
    ``{- -}``, ``PERMUTE`` and reluctant quantifiers are rejected loudly —
    silent divergence from Trino semantics is worse than an error.
    """
    # unquoted SQL identifiers are case-insensitive: PATTERN (DOWN+) must
    # find DEFINE down (the MEASURES parser already folds case — the two
    # lookup paths in one pipeline cannot disagree)
    by_ci: Dict[str, str] = {}
    for k, v in symbol_chars.items():
        if k.upper() in by_ci:
            raise ValueError(
                f"DEFINE symbols {k!r} and its case-variant collide — "
                "unquoted identifiers are case-insensitive"
            )
        by_ci[k.upper()] = v
    out: List[str] = []
    prev_quant = False  # last emitted token was a quantifier
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch.isspace():
            i += 1
            continue
        if ch in "()|+*?":
            if ch in "+*?" and prev_quant:
                raise ValueError(
                    f"quantifier sequence {pattern[i-1]}{ch!s} in "
                    f"{pattern!r}: reluctant (+?) and possessive (++) "
                    "quantifiers are not supported — Python-regex "
                    "semantics would silently diverge from Trino's"
                )
            prev_quant = ch in "+*?"
            out.append(ch)
            i += 1
            continue
        if ch == "{":
            if prev_quant:
                raise ValueError(
                    f"quantifier after quantifier in {pattern!r}"
                )
            j = pattern.find("}", i)
            if j < 0:
                raise ValueError(f"unclosed quantifier in pattern: {pattern!r}")
            body = pattern[i + 1 : j].replace(" ", "")
            if body.startswith("-"):
                raise ValueError("pattern exclusion {- -} is not supported")
            if not re.fullmatch(r"\d+(,\d*)?", body):
                raise ValueError(f"unsupported quantifier {{{body}}}")
            if "," in body:
                lo, _, hi = body.partition(",")
                if hi and int(lo) > int(hi):
                    raise ValueError(f"inverted quantifier range {{{body}}}")
            out.append("{" + body + "}")
            prev_quant = True
            i = j + 1
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (pattern[j].isalnum() or pattern[j] == "_"):
                j += 1
            name = pattern[i:j]
            if name.upper() == "PERMUTE":
                # PERMUTE(A, B, C) -> alternation of every ordering, in
                # itertools order == lexicographic preference over the
                # ARGUMENT order, which is exactly Trino's tie-break
                # (alternation tries alternatives left to right).
                # Symbols only (no nested quantifiers/groups): rejected
                # loudly rather than silently mis-permuted.
                k = j
                while k < n and pattern[k].isspace():
                    k += 1
                if k >= n or pattern[k] != "(":
                    raise ValueError("PERMUTE needs a parenthesized list")
                close = pattern.find(")", k)
                if close < 0:
                    raise ValueError("unclosed PERMUTE(...)")
                args = [a.strip() for a in pattern[k + 1 : close].split(",")]
                if not 2 <= len(args) <= 6:
                    raise ValueError(
                        "PERMUTE takes 2-6 symbols (the expansion is "
                        "factorial; Trino itself warns beyond this)"
                    )
                chars = []
                for a in args:
                    if not re.fullmatch(r"[A-Za-z_]\w*", a) or a.upper() not in by_ci:
                        raise ValueError(
                            f"PERMUTE argument {a!r} must be a defined "
                            "symbol (nested patterns are not supported)"
                        )
                    chars.append(by_ci[a.upper()])
                import itertools

                alts = "|".join("".join(p_) for p_ in itertools.permutations(chars))
                out.append(f"(?:{alts})")
                prev_quant = False
                i = close + 1
                continue
            if name.upper() not in by_ci:
                raise ValueError(
                    f"pattern symbol {name!r} has no DEFINE entry "
                    f"(defined: {sorted(symbol_chars)})"
                )
            out.append(by_ci[name.upper()])
            prev_quant = False
            i = j
            continue
        raise ValueError(f"unsupported pattern construct {ch!r} in {pattern!r}")
    try:
        rx = re.compile("".join(out))
    except re.error as exc:
        # surface malformed-but-lexable patterns as the module's typed
        # error, not an internal sre exception
        raise ValueError(f"invalid pattern {pattern!r}: {exc}") from exc
    if rx.match("") is not None:
        # SQL:2016 emits an output row for every EMPTY match and counts
        # it in MATCH_NUMBER; this engine's scanner skips zero-width
        # matches — rejecting the pattern is honest, silently dropping
        # rows is not
        raise ValueError(
            f"pattern {pattern!r} can match zero rows (e.g. A*) — "
            "empty-match semantics are not supported; anchor with a "
            "one-or-more element (A+, A B*, ...)"
        )
    return rx


def parse_order_item(o: str) -> Tuple[str, bool, str]:
    """Parse ``col [ASC|DESC] [NULLS FIRST|LAST]`` → (key, asc,
    na_position).  Default null placement follows Trino (NULL sorts as
    the LARGEST value: ASC → last, DESC → first).  ONE parser shared by
    the matcher's sort and trino_mr's lag/lead window — two copies of
    this rule once had to carry a stay-in-lockstep comment."""
    parts = o.split()
    key, rest = parts[0], [p.upper() for p in parts[1:]]
    asc = True
    if rest and rest[0] in ("ASC", "DESC"):
        asc = rest[0] == "ASC"
        rest = rest[1:]
    if rest == ["NULLS", "FIRST"]:
        na = "first"
    elif rest == ["NULLS", "LAST"]:
        na = "last"
    elif not rest:
        na = "last" if asc else "first"
    else:
        raise ValueError(f"unsupported ORDER BY item {o!r} (expected "
                         "col [ASC|DESC] [NULLS FIRST|LAST])")
    return key, asc, na


def _measure_dtype(agg: str, in_type: Optional[SQLT.DataType]) -> SQLT.DataType:
    if agg == "count":
        return SQLT.LongType()
    if agg in ("sum", "avg") and isinstance(in_type, SQLT.DecimalType):
        # the pandas reduction yields decimal.Decimal objects that the
        # declared double field rejects at Arrow serialization — fail at
        # plan time with an actionable message, not mid-job
        raise ValueError(
            f"{agg.upper()} over a DECIMAL measure column is not "
            "supported — CAST the column to DOUBLE in the query"
        )
    if agg == "avg":
        return SQLT.DoubleType()
    if agg == "sum":
        if isinstance(in_type, (SQLT.ByteType, SQLT.ShortType, SQLT.IntegerType,
                                SQLT.LongType)):
            return SQLT.LongType()
        return SQLT.DoubleType()
    assert in_type is not None
    return in_type


def match_recognize(
    df: DataFrame,
    *,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    define: Dict[str, Union[Column, str]],
    pattern: str,
    measures: Sequence[Measure],
    match_no_col: str = "match_no",
    enforce_exclusive: bool = False,
    after_match: str = "past last row",
    rows_per_match: str = "one",
    subsets: Optional[Dict[str, Sequence[str]]] = None,
    unmatched_rows: bool = False,
) -> DataFrame:
    """Run SQL:2016 row-pattern recognition.

    ``rows_per_match``: ``"one"`` (default — one output row per match:
    partition keys + match_no + measures) or ``"all"`` (one output row
    per INPUT ROW of each match: ALL input columns + match_no +
    measures; with ``after_match="to next row"`` a row can appear in
    several matches).  Measures may be 5-tuples ``(name, agg, sym,
    col, mode)`` with mode ``"running"`` (value over the match prefix
    ending at the output row — Trino's ALL-ROWS default) or
    ``"final"`` (whole-match value on every row); 4-tuples default to
    final, which equals running at the last row, so one-row-per-match
    semantics are unchanged.  The extra agg ``"classifier"``
    (sym=None, col=None) yields the row's matched symbol name (in
    one-row mode: the LAST row's symbol).

    ``after_match`` selects the skip mode: ``"past last row"`` (the
    default — non-overlapping matches, scanning resumes after the
    match end), ``"to next row"`` (overlapping matches — scanning
    resumes at the row after the match START, so every row that begins
    a match yields one; Trino's AFTER MATCH SKIP TO NEXT ROW), or
    ``"to first <SYM>"`` / ``"to last <SYM>"`` (scanning resumes AT
    the first/last row the finished match mapped to the symbol or
    SUBSET variable — that row can start the next match).  The SQL
    standard's two SKIP TO runtime errors are reproduced as loud
    per-group errors, exactly where Trino raises: a match that maps no
    row to the symbol, and a resume that lands on the match's own
    first row (which would loop forever).

    ``define`` maps symbol → boolean predicate (Column or SQL string)
    evaluated per row; express PREV/NEXT navigation as lag/lead columns
    on ``df`` first.  ``order_by`` entries may carry an ``ASC``/``DESC``
    suffix (``"ts DESC"``).  ``measures`` is a list of
    ``(name, agg, symbol|None, column|None)``:
    agg in first/last/count/min/max/sum/avg, symbol=None aggregates the
    whole match, column=None is only valid for count.
    Output: partition keys + ``match_no`` (1-based per partition) +
    measures, one row per match.

    ``order_by`` items accept ``col [ASC|DESC] [NULLS FIRST|LAST]``
    per key (null placement defaults to LAST); the ordering runs
    Spark-side (sortWithinPartitions), so each key carries its own
    direction and null placement.

    ``enforce_exclusive=True`` adds a per-row check that no row
    satisfies two DEFINE predicates (one extra small int column through
    the shuffle).  Classification is first-DEFINE-wins; Trino's full
    spec explores per-row symbol alternatives, so overlapping DEFINEs
    can silently diverge — the SQL passthrough front-end turns this on.
    """
    if not partition_by:
        raise ValueError("partition_by must be non-empty (global-order "
                         "pattern matching does not scale out)")
    skip_to = None  # (is_first, target name) for "to first/last <SYM>"
    am_skip = re.match(r"^to (first|last) ([A-Za-z_][\w$]*)$", after_match)
    if am_skip:
        skip_to = (am_skip.group(1) == "first", am_skip.group(2))
    elif after_match not in ("past last row", "to next row"):
        raise ValueError(
            f"after_match {after_match!r} not supported — 'past last "
            "row', 'to next row', or 'to first/last <symbol>'"
        )
    syms = list(define)
    if len(syms) > len(_ALPHABET):
        raise ValueError("too many pattern symbols")
    sym_char = {s: _ALPHABET[i] for i, s in enumerate(syms)}
    rx = compile_pattern(pattern, sym_char)
    # SUBSET union variables: name -> the union of its members' chars;
    # measures referencing the name aggregate rows matched by ANY member
    ref_chars: Dict[str, str] = {k: v for k, v in sym_char.items()}
    for sub_name, members in (subsets or {}).items():
        if sub_name in sym_char:
            raise ValueError(
                f"SUBSET name {sub_name!r} collides with a DEFINE symbol"
            )
        bad = [m for m in members if m not in sym_char]
        if bad:
            raise ValueError(f"SUBSET {sub_name!r} members not defined: {bad}")
        if not members:
            raise ValueError(f"SUBSET {sub_name!r} is empty")
        ref_chars[sub_name] = "".join(sym_char[m] for m in members)

    order_keys, ascending, na_positions = [], [], []
    for o in order_by:
        key, asc, na = parse_order_item(o)
        order_keys.append(key)
        ascending.append(asc)
        na_positions.append(na)

    # classify: first matching DEFINE wins, else the unmatched char
    cls: Column = F.lit(_UNMATCHED)
    for s in reversed(syms):
        pred = define[s]
        if isinstance(pred, str):
            pred = F.expr(pred)
        cls = F.when(pred, F.lit(sym_char[s])).otherwise(cls)

    if rows_per_match not in ("one", "all"):
        raise ValueError(f"rows_per_match {rows_per_match!r}: 'one' or 'all'")
    all_rows = rows_per_match == "all"
    if unmatched_rows and not all_rows:
        raise ValueError(
            "unmatched_rows requires rows_per_match='all' (SQL spells it "
            "ALL ROWS PER MATCH WITH UNMATCHED ROWS)"
        )
    # normalize measures to 5-tuples (mode defaults to final)
    norm_meas = []
    for m_item in measures:
        if len(m_item) == 4:
            name, agg, sym, col = m_item
            mode = "final"
        else:
            name, agg, sym, col, mode = m_item
        if mode not in ("running", "final"):
            raise ValueError(f"measure {name!r}: mode must be running/final")
        norm_meas.append((name, agg, sym, col, mode))
    # prune to what the matcher needs BEFORE the shuffle
    measure_cols = sorted({c for (_, _, _, c, _) in norm_meas if c is not None})
    for name, agg, sym, col, _mode in norm_meas:
        if agg not in _AGGS and agg != "classifier":
            raise ValueError(f"unknown measure aggregate {agg!r}")
        if col is None and agg not in ("count", "classifier"):
            raise ValueError(f"measure {name!r}: column required for {agg}")
        if agg == "classifier" and (col is not None or sym is not None):
            raise ValueError(f"measure {name!r}: classifier takes no args")
        if sym is not None and sym not in ref_chars:
            raise ValueError(f"measure {name!r} references undefined symbol {sym!r}")
    if all_rows:
        keep = list(df.columns)  # every input column passes through
    else:
        keep = list(dict.fromkeys([*partition_by, *order_keys, *measure_cols]))
    extra: List[Column] = [cls.alias("__sym")]
    if enforce_exclusive:
        nmatch: Column = F.lit(0)
        for s in syms:
            pred = define[s]
            if isinstance(pred, str):
                pred = F.expr(pred)
            nmatch = nmatch + F.when(pred, 1).otherwise(0)
        extra.append(nmatch.alias("__nmatch"))
    slim = df.select(*keep, *extra)

    in_types = {f.name: f.dataType for f in slim.schema.fields}
    if all_rows:
        out_fields = [SQLT.StructField(k, in_types[k]) for k in keep]
    else:
        out_fields = [SQLT.StructField(k, in_types[k]) for k in partition_by]
    out_fields.append(SQLT.StructField(match_no_col, SQLT.LongType()))
    for name, agg, _sym, col, _mode in norm_meas:
        out_fields.append(
            SQLT.StructField(
                name,
                SQLT.StringType()
                if agg == "classifier"
                else _measure_dtype(agg, in_types.get(col)),
            )
        )
    out_schema = SQLT.StructType(out_fields)
    out_names = [f.name for f in out_fields]

    part_keys = list(partition_by)
    pass_cols = list(keep)
    meas = list(norm_meas)
    char_of = dict(ref_chars)  # symbol OR subset -> its char(s)
    name_of_char = {v: k for k, v in sym_char.items()}

    check_exclusive = bool(enforce_exclusive)
    emit_unmatched = bool(unmatched_rows)
    overlap_scan = after_match == "to next row"
    if skip_to is not None:
        if skip_to[1] not in char_of:
            raise ValueError(
                f"AFTER MATCH SKIP TO {'FIRST' if skip_to[0] else 'LAST'} "
                f"{skip_to[1]}: unknown pattern symbol or SUBSET variable"
            )
        skip_chars = char_of[skip_to[1]]
        skip_first, skip_name = skip_to[0], skip_to[1]
    emit_all = all_rows

    def _sel(arr, chars):
        """Boolean mask of rows matched by the symbol (1 char) or any
        member of a SUBSET union variable (several chars)."""
        if len(chars) == 1:
            return arr == chars
        import numpy as np

        return np.isin(arr, list(chars))

    def run_group(keys: tuple, pdf: pd.DataFrame, rows: List[list]) -> None:
        """Match ONE partition-key group (already ordered).

        The match loop works on per-group numpy arrays, not pandas
        slices: a match span is a handful of rows, and per-match
        ``pdf.iloc`` + boolean-Series filtering costs ~100 µs each —
        with one measure row per (match × measure) that overhead WAS
        the wall time on match-dense inputs (t10's V-dips: ~40k
        matches at sf0.1, measured 12 s → ~2 s from this change).
        Semantics are unchanged: count = non-null count, first/last =
        positional value (NULL if that row's value is null), min/max/
        sum/avg skip nulls and yield NULL on empty/all-null input."""
        seq = "".join(pdf["__sym"])
        sym_np = pdf["__sym"].to_numpy()
        col_np = {c: pdf[c].to_numpy() for c in measure_cols}
        ok_np = {c: pd.notna(col_np[c]) for c in measure_cols}
        if overlap_scan:
            # SKIP TO NEXT ROW: leftmost match starting at each resume
            # point; resume one row past the match START (overlaps ok)
            def _matches(sq):
                pos = 0
                while pos <= len(sq):
                    mm = rx.search(sq, pos)
                    if mm is None:
                        return
                    ms, me = mm.span()
                    if ms == me:  # zero-width: advance, keep scanning
                        pos = ms + 1
                        continue
                    yield mm
                    pos = ms + 1
        elif skip_to is not None:
            # SKIP TO FIRST/LAST <symbol>: resume AT the first/last row
            # the finished match mapped to the symbol (that row may
            # start the next match).  Trino's two runtime errors are
            # reproduced: the symbol absent from the match, and a
            # resume at the match's own first row (infinite loop).
            def _matches(sq):
                pos = 0
                while pos <= len(sq):
                    mm = rx.search(sq, pos)
                    if mm is None:
                        return
                    ms, me = mm.span()
                    if ms == me:
                        pos = ms + 1
                        continue
                    yield mm
                    seg = sq[ms:me]
                    if len(skip_chars) == 1:
                        idx = (
                            seg.find(skip_chars)
                            if skip_first
                            else seg.rfind(skip_chars)
                        )
                    else:  # SUBSET union variable: any member's rows
                        hits = [
                            i for i, c in enumerate(seg) if c in skip_chars
                        ]
                        idx = (
                            (hits[0] if skip_first else hits[-1])
                            if hits
                            else -1
                        )
                    word = "FIRST" if skip_first else "LAST"
                    if idx < 0:
                        raise ValueError(
                            f"AFTER MATCH SKIP TO {word} {skip_name} "
                            f"failed: the match maps no row to "
                            f"{skip_name} (Trino raises here too)"
                        )
                    if idx == 0:
                        raise ValueError(
                            f"AFTER MATCH SKIP TO {word} {skip_name} "
                            f"would resume at the first row of the match "
                            f"— infinite loop (Trino raises here too)"
                        )
                    pos = ms + idx
        else:
            def _matches(sq):
                for mm in rx.finditer(sq):
                    if mm.span()[0] != mm.span()[1]:  # skip zero-width
                        yield mm
        def span_value(agg, sym, col, s, e):
            """Whole-span (FINAL) measure value — the one-row semantics:
            count = non-null count, first/last = positional value (NULL
            if that row's value is null), min/max/sum/avg skip nulls
            and yield NULL on empty/all-null input."""
            if agg == "classifier":
                return name_of_char.get(sym_np[e - 1])
            if col is None:  # count of whole match / of a symbol/subset
                if sym is None:
                    return e - s
                return int(_sel(sym_np[s:e], char_of[sym]).sum())
            vals = col_np[col][s:e]
            ok = ok_np[col][s:e]
            if sym is not None:
                picked = _sel(sym_np[s:e], char_of[sym])
                vals = vals[picked]
                ok = ok[picked]
            if agg == "count":
                return int(ok.sum())
            if len(vals) == 0:
                return None
            if agg == "first":
                return vals[0] if ok[0] else None
            if agg == "last":
                return vals[-1] if ok[-1] else None
            nn = vals[ok]
            if len(nn) == 0:
                return None
            if agg == "min":
                return nn.min()
            if agg == "max":
                return nn.max()
            if agg == "sum":
                return nn.sum()
            return nn.mean()  # avg

        if emit_all:
            pass_np = {c: pdf[c].to_numpy() for c in pass_cols}
            covered = bytearray(len(seq)) if emit_unmatched else None
        mno = 0
        for m in _matches(seq):
            s, e = m.span()
            mno += 1
            if not emit_all:
                row = list(keys)
                row.append(mno)
                for _name, agg, sym, col, _mode in meas:
                    row.append(span_value(agg, sym, col, s, e))
                rows.append(row)
                continue
            # ALL ROWS PER MATCH: one output row per span row; RUNNING
            # measures aggregate the prefix ending at the row, FINAL
            # ones repeat the whole-span value.  Per-row Python loop:
            # cost is proportional to the OUTPUT (unlike the one-row
            # path, where per-row work would dominate tiny measures).
            finals = [
                span_value(agg, sym, col, s, e) if mode == "final" else None
                for (_n, agg, sym, col, mode) in meas
            ]
            for j in range(s, e):
                if covered is not None:
                    covered[j] = 1
                row = [pass_np[c][j] for c in pass_cols]
                row.append(mno)
                for fi, (_n, agg, sym, col, mode) in enumerate(meas):
                    if mode == "final":
                        row.append(finals[fi])
                    elif agg == "classifier":
                        row.append(name_of_char.get(sym_np[j]))
                    else:
                        row.append(span_value(agg, sym, col, s, j + 1))
                rows.append(row)
        if emit_all and emit_unmatched:
            # WITH UNMATCHED ROWS: every row in no match passes through
            # with NULL match number, NULL measures, NULL CLASSIFIER()
            # (the SQL-standard semantics Trino implements)
            nulls = [None] * (len(meas) + 1)
            for j in range(len(seq)):
                if not covered[j]:
                    rows.append([pass_np[c][j] for c in pass_cols] + nulls)

    def run_partition(batches) -> "pd.DataFrame":
        """One call per PARTITION (mapInPandas), not per key: rows arrive
        hash-partitioned on the keys and sorted (keys, order); pandas
        groupby at C speed replaces one Python call per key — at
        key-heavy workloads (millions of small groups) the per-group
        Arrow/Python round-trip is the dominant cost, not the matching.
        """
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        if check_exclusive and (pdf["__nmatch"] > 1).any():
            bad = pdf.loc[pdf["__nmatch"] > 1].iloc[0]
            raise ValueError(
                "MATCH_RECOGNIZE DEFINE predicates are not mutually "
                "exclusive (a row satisfies several symbols; e.g. "
                f"partition {[bad[k] for k in part_keys]!r}).  This "
                "engine classifies each row to the first matching DEFINE, "
                "which can diverge from Trino's per-row symbol "
                "alternatives — rewrite the DEFINEs to be disjoint."
            )
        rows: List[list] = []
        grouped = pdf.groupby(part_keys, sort=False, dropna=False)
        for keys, g in grouped:
            if not isinstance(keys, tuple):
                keys = (keys,)
            run_group(keys, g.reset_index(drop=True), rows)
        yield pd.DataFrame(rows, columns=out_names)

    # Spark-side ordering replaces the per-group pandas sort: partition
    # keys lead so groups are contiguous, then the ORDER BY keys with
    # the parsed direction/null placement
    sort_cols = [F.col(k).asc() for k in part_keys]
    for k, asc, na in zip(order_keys, ascending, na_positions):
        c = F.col(k)
        if asc:
            sort_cols.append(c.asc_nulls_first() if na == "first" else c.asc_nulls_last())
        else:
            sort_cols.append(c.desc_nulls_first() if na == "first" else c.desc_nulls_last())

    return (
        slim.repartition(*[F.col(k) for k in part_keys])
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(run_partition, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# Registry entries


@register(
    "t10_match_recognize_vshape",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             lag(o_totalprice) OVER w AS prev_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    coded AS (
      SELECT *, CASE WHEN prev_price IS NULL THEN '0'
                     WHEN o_totalprice < prev_price THEN 'A'
                     WHEN o_totalprice > prev_price THEN 'B'
                     ELSE '0' END AS sym
      FROM base
    ),
    flagged AS (
      SELECT *, CASE WHEN sym = lag(sym) OVER w THEN 0 ELSE 1 END AS chg
      FROM coded
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER w AS run_id
      FROM flagged
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    run_agg AS (
      SELECT o_custkey, run_id, any_value(sym) AS sym,
             CAST(COUNT(*) AS BIGINT) AS n,
             MIN(o_totalprice) AS min_price,
             FIRST(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_key,
             LAST(o_orderkey ORDER BY o_orderdate, o_orderkey) AS last_key
      FROM runs GROUP BY o_custkey, run_id
    ),
    pairs AS (
      SELECT d.o_custkey, d.run_id,
             d.n AS n_down, u.n AS n_up,
             LEAST(d.min_price, u.min_price) AS bottom_price,
             d.first_key AS start_key, u.last_key AS end_key
      FROM run_agg d JOIN run_agg u
        ON u.o_custkey = d.o_custkey AND u.run_id = d.run_id + 1
      WHERE d.sym = 'A' AND u.sym = 'B'
    )
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY run_id)
                AS BIGINT) AS match_no,
           n_down, n_up, bottom_price, start_key, end_key
    FROM pairs
    """,
)
def t10_match_recognize_vshape(spark, sf_dir):
    """Full MATCH_RECOGNIZE with MEASURES: V-shaped spend dips per
    customer — ``PATTERN (D+ U+)`` where D = price strictly below the
    previous order, U = strictly above (Trino spelling:
    ``DEFINE D AS o_totalprice < PREV(o_totalprice), ...``).  PREV
    navigation becomes a lag column over the same window; the oracle is
    the islands rewrite (maximal-run pairing), which is provably the
    same match set for maximal-greedy run patterns under SKIP PAST LAST
    ROW.  One shuffle for the lag window, reused by the matcher's
    groupBy (same key).  Reference surface: client.go:501-617 passes
    MATCH_RECOGNIZE SQL through to Trino verbatim.
    """
    (orders,) = T(spark, sf_dir, "orders")
    from pyspark.sql import Window

    # no spread(): the lag window's hash exchange on o_custkey is the
    # first operator and already provides full parallelism downstream
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    with_prev = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).withColumn("prev_price", F.lag("o_totalprice").over(w))
    return match_recognize(
        with_prev,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        define={
            "D": F.col("o_totalprice") < F.col("prev_price"),
            "U": F.col("o_totalprice") > F.col("prev_price"),
        },
        pattern="D+ U+",
        measures=[
            ("n_down", "count", "D", None),
            ("n_up", "count", "U", None),
            ("bottom_price", "min", None, "o_totalprice"),
            ("start_key", "first", None, "o_orderkey"),
            ("end_key", "last", None, "o_orderkey"),
        ],
    )


@register(
    "t10b_match_recognize_funnel",
    oracle="""
    WITH coded AS (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'view' THEN 'A' WHEN 'click' THEN 'B'
                  WHEN 'purchase' THEN 'C' ELSE '0' END AS sym
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN sym = lag(sym) OVER w THEN 0 ELSE 1 END AS chg
      FROM coded WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER w AS run_id
      FROM flagged WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    run_agg AS (
      SELECT user_id, run_id, any_value(sym) AS sym,
             CAST(COUNT(*) AS BIGINT) AS n,
             FIRST(event_id ORDER BY ts, event_id) AS first_eid
      FROM runs GROUP BY user_id, run_id
    ),
    triples AS (
      SELECT v.user_id, v.run_id,
             v.n AS n_views, c.n AS n_clicks,
             v.first_eid AS first_view_eid, p.first_eid AS purchase_eid
      FROM run_agg v
      JOIN run_agg c ON c.user_id = v.user_id AND c.run_id = v.run_id + 1
      JOIN run_agg p ON p.user_id = v.user_id AND p.run_id = v.run_id + 2
      WHERE v.sym = 'A' AND c.sym = 'B' AND p.sym = 'C'
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY run_id)
                AS BIGINT) AS match_no,
           n_views, n_clicks, first_view_eid, purchase_eid
    FROM triples
    """,
)
def t10b_match_recognize_funnel(spark, sf_dir):
    """MATCH_RECOGNIZE funnel with measures: ``PATTERN (V+ C+ P)`` —
    a burst of views, then clicks, then the first purchase; MEASURES
    count each stage and pin the first-view / purchase event ids.  The
    pattern consumes exactly one ``P`` row, so the oracle's islands
    rewrite takes the FIRST event of the purchase run (remaining
    purchases cannot start a new match — the pattern begins with V —
    matching regex SKIP PAST LAST ROW semantics exactly).
    """
    (events,) = T(spark, sf_dir, "events")
    # no spread(): the matcher's hash exchange on user_id comes first and
    # the pre-shuffle classify projection is trivial column math
    return match_recognize(
        events.select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        define={
            "V": F.col("event_type") == "view",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        pattern="V+ C+ P",
        measures=[
            ("n_views", "count", "V", None),
            ("n_clicks", "count", "C", None),
            ("first_view_eid", "first", "V", "event_id"),
            ("purchase_eid", "first", "P", "event_id"),
        ],
    )


@register(
    "t11_mr_skip_to_next",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, value,
             (value > 50) AS h,
             lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS nval,
             lead(value > 50) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS nh
      FROM events
    )
    SELECT user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS match_no,
           CAST(2 AS BIGINT) AS n_rows,
           event_id AS start_id,
           value + nval AS pair_sum
    FROM c WHERE h AND nh IS NOT NULL AND NOT nh
    """,
)
def t11_mr_skip_to_next(spark, sf_dir):
    """AFTER MATCH SKIP TO NEXT ROW, certified end-to-end through the
    SQL front-end: high→low value transitions per user with OVERLAPS
    ALLOWED — pattern ``(H L)`` resuming one row past each match start,
    so every H immediately followed by an L yields a match even when
    the L is itself the start of the next candidate window.

    The oracle is INDEPENDENT of the matcher: for a fixed-length
    2-symbol pattern, TO-NEXT-ROW matches are exactly the rows where
    the classification is H and the lead() classification is L, with
    match_no the rank of the start row in scan order — a pure window
    query DuckDB evaluates natively.  A PAST-LAST-ROW scan would drop
    every overlapping second match and hash-mismatch immediately.

    Exactness: pair_sum is a single two-operand double add (identical
    IEEE result both engines); everything else is integers.

    Reference surface: client.go:501-617 passes MATCH_RECOGNIZE SQL
    (including the AFTER MATCH clause) through to Trino verbatim.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_mr import expand_match_recognize

    register_tables(spark, sf_dir)
    views: list = []
    rewritten = expand_match_recognize(
        spark,
        """
        SELECT user_id, match_no, n_rows, start_id, pair_sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS match_no,
                   COUNT(*) AS n_rows,
                   FIRST(event_id) AS start_id,
                   SUM(value) AS pair_sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (H L)
          DEFINE H AS value > 50,
                 L AS value <= 50
        )
        """,
        views,
    )
    return spark.sql(rewritten)


@register(
    "t12_mr_all_rows",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, value,
             (value > 50) AS h,
             lead(value) OVER w AS nval,
             lead(event_id) OVER w AS nid,
             lead(value > 50) OVER w AS nh
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, event_id, value, nval, nid,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS mn
      FROM c WHERE h AND nh IS NOT NULL AND NOT nh
    )
    SELECT user_id, event_id, mn, 'H' AS cls, CAST(1 AS BIGINT) AS rc,
           value + nval AS tot
    FROM m
    UNION ALL
    SELECT user_id, nid AS event_id, mn, 'L' AS cls, CAST(2 AS BIGINT) AS rc,
           value + nval AS tot
    FROM m
    """,
)
def t12_mr_all_rows(spark, sf_dir):
    """ALL ROWS PER MATCH, certified end-to-end through the SQL
    front-end: each matched high→low transition emits BOTH of its rows,
    with RUNNING count (1 then 2), per-row CLASSIFIER(), MATCH_NUMBER()
    and a FINAL whole-match sum repeated on every row — the four
    measure semantics the mode introduces, in one hash-gated entry.

    The oracle is INDEPENDENT of the matcher: for the fixed-length
    2-symbol pattern the per-row output is exactly two UNION ALL arms
    over the lead()-window match set (start row: rc=1, cls='H'; second
    row: rc=2, cls='L'), with tot a single two-operand double add
    (identical IEEE result both engines).

    Reference surface: client.go:501-617 passes MATCH_RECOGNIZE SQL
    (including ALL ROWS PER MATCH and RUNNING/FINAL measure modifiers)
    through to Trino verbatim.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_mr import expand_match_recognize

    register_tables(spark, sf_dir)
    rewritten = expand_match_recognize(
        spark,
        """
        SELECT user_id, event_id, mn, cls, rc, tot
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mn,
                   CLASSIFIER() AS cls,
                   count(*) AS rc,
                   FINAL sum(value) AS tot
          ALL ROWS PER MATCH
          PATTERN (H L)
          DEFINE H AS value > 50,
                 L AS value <= 50
        )
        """,
        [],
    )
    return spark.sql(rewritten)


@register(
    "t13_mr_permute_subset",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, value,
             (value > 50) AS h,
             lead(value) OVER w AS nval,
             lead(value > 50) OVER w AS nh
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, event_id, value, nval,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS mn
      FROM c WHERE nh IS NOT NULL AND h <> nh
    )
    SELECT user_id, mn, event_id AS sid,
           value + nval AS pair_sum,
           CAST(1 AS BIGINT) AS n_h
    FROM m
    """,
)
def t13_mr_permute_subset(spark, sf_dir):
    """PERMUTE patterns + SUBSET union variables, certified end-to-end:
    ``PATTERN (PERMUTE(H, L))`` matches a high/low pair in EITHER
    order; ``SUBSET B = (H, L)`` lets a measure aggregate over the
    union (SUM(B.value) = the pair sum) while COUNT(H.*) counts one
    symbol.  AFTER MATCH SKIP TO NEXT ROW makes the match set purely
    positional — every row whose classification differs from the next
    row's — so the oracle is an engine-independent lead() window query
    (h <> nh), with no greedy-scan state to replicate.

    Reference surface: client.go:501-617 passes MATCH_RECOGNIZE SQL
    (PERMUTE and SUBSET included) through to Trino verbatim.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_mr import expand_match_recognize

    register_tables(spark, sf_dir)
    rewritten = expand_match_recognize(
        spark,
        """
        SELECT user_id, mn, sid, pair_sum, n_h
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mn,
                   FIRST(event_id) AS sid,
                   SUM(B.value) AS pair_sum,
                   COUNT(H.*) AS n_h
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (PERMUTE(H, L))
          SUBSET B = (H, L)
          DEFINE H AS value > 50,
                 L AS value <= 50
        )
        """,
        [],
    )
    return spark.sql(rewritten)


@register(
    "t14_mr_skip_to_symbol",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER w AS rn,
             lead(event_id, 2) OVER w AS eid3,
             value + lead(value, 1) OVER w + lead(value, 2) OVER w AS v3
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    x AS (
      SELECT user_id, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
               AS grp
      FROM base WHERE value > 50
    ),
    spans AS (
      SELECT user_id, grp, min(rn) AS r0, count(*) AS len
      FROM x GROUP BY user_id, grp HAVING count(*) >= 3
    ),
    starts AS (
      SELECT user_id, r0 + 2 * t.k AS srn
      FROM spans,
           UNNEST(generate_series(0, CAST((len - 3) // 2 AS BIGINT)))
             AS t(k)
    )
    SELECT b.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY b.user_id ORDER BY b.rn)
                AS BIGINT) AS match_no,
           b.event_id AS start_id,
           b.eid3 AS end_id,
           b.v3 AS v3sum
    FROM base b JOIN starts s ON s.user_id = b.user_id AND s.srn = b.rn
    """,
)
def t14_mr_skip_to_symbol(spark, sf_dir):
    """AFTER MATCH SKIP TO LAST <symbol>, certified end-to-end through
    the SQL front-end: ``PATTERN (X X X)`` over runs of value>50 rows,
    resuming AT the last X of each match (that row starts the next
    candidate), so a run of length L yields matches at run offsets
    0, 2, 4, … ≤ L-3.

    The oracle is INDEPENDENT of the matcher — gaps-and-islands runs +
    a generate_series over the arithmetic progression of start
    offsets, all native DuckDB.  The three skip modes give three
    DIFFERENT match sets on any run of length ≥ 5 (PAST LAST ROW:
    offsets 0,3,…; TO NEXT ROW: every offset ≤ L-3; TO LAST X: even
    offsets) — a mode mix-up hash-mismatches on both match_no and the
    start/end ids.

    Exactness: v3sum is the same three-operand left-assoc double add
    in both engines (numpy's pairwise summation is sequential below 8
    elements); ids/counts are integers.

    Reference surface: client.go:501-617 passes MATCH_RECOGNIZE SQL
    (including AFTER MATCH SKIP TO [FIRST|LAST] <symbol>) through to
    Trino verbatim; the two SQL-standard runtime errors (symbol absent
    from match, resume at match start) raise loudly where Trino
    raises — unit-tested in tests/test_pattern.py.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_mr import expand_match_recognize

    register_tables(spark, sf_dir)
    rewritten = expand_match_recognize(
        spark,
        """
        SELECT user_id, match_no, start_id, end_id, v3sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS match_no,
                   FIRST(event_id) AS start_id,
                   LAST(event_id) AS end_id,
                   SUM(value) AS v3sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO LAST X
          PATTERN (X X X)
          DEFINE X AS value > 50
        )
        """,
        [],
    )
    return spark.sql(rewritten)


@register(
    "t15_mr_unmatched_rows",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, value,
             (value > 50) AS h,
             lag(value > 50) OVER w AS ph,
             lead(value) OVER w AS nval,
             lead(event_id) OVER w AS nid,
             lead(value > 50) OVER w AS nh
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, event_id, value, nval, nid,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS mn
      FROM c WHERE h AND nh IS NOT NULL AND NOT nh
    )
    SELECT user_id, event_id, mn, 'H' AS cls, CAST(1 AS BIGINT) AS rc,
           value + nval AS tot
    FROM m
    UNION ALL
    SELECT user_id, nid AS event_id, mn, 'L' AS cls, CAST(2 AS BIGINT) AS rc,
           value + nval AS tot
    FROM m
    UNION ALL
    SELECT user_id, event_id, CAST(NULL AS BIGINT) AS mn,
           CAST(NULL AS VARCHAR) AS cls, CAST(NULL AS BIGINT) AS rc,
           CAST(NULL AS DOUBLE) AS tot
    FROM c
    WHERE NOT (h AND nh IS NOT NULL AND NOT nh)
      AND NOT (coalesce(ph, FALSE) AND NOT h)
    """,
)
def t15_mr_unmatched_rows(spark, sf_dir):
    """ALL ROWS PER MATCH WITH UNMATCHED ROWS, certified end-to-end
    through the SQL front-end: every input row in no match passes
    through with NULL MATCH_NUMBER(), NULL CLASSIFIER() and NULL
    measures (the SQL-standard semantics Trino implements), alongside
    t12's matched-row output.

    The oracle is INDEPENDENT of the matcher: with disjoint H/L
    symbols a row is matched iff it starts an H→L pair or its
    predecessor does, so the unmatched arm is the lag()-window
    complement — a wrong coverage set (e.g. marking only match starts)
    changes the NULL-row population and hash-mismatches.

    Reference surface: client.go:501-617 passes MATCH_RECOGNIZE SQL
    (including the WITH UNMATCHED ROWS modifier) through to Trino
    verbatim; SURVEY carried the modifier as rejected-loudly through
    mid round 8.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_mr import expand_match_recognize

    register_tables(spark, sf_dir)
    rewritten = expand_match_recognize(
        spark,
        """
        SELECT user_id, event_id, mn, cls, rc, tot
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mn,
                   CLASSIFIER() AS cls,
                   count(*) AS rc,
                   FINAL sum(value) AS tot
          ALL ROWS PER MATCH WITH UNMATCHED ROWS
          PATTERN (H L)
          DEFINE H AS value > 50,
                 L AS value <= 50
        )
        """,
        [],
    )
    return spark.sql(rewritten)
