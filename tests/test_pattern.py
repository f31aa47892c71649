"""Unit tests for the MATCH_RECOGNIZE operator (operators/pattern.py).

Hand-built sequences with known match sets — the registry entries
(t10/t10b) cover oracle parity; these cover the matcher's semantics:
greedy quantifiers, SKIP PAST LAST ROW non-overlap, unmatched rows
breaking adjacency, alternation, bounded quantifiers, measure aggs,
and loud rejection of unsupported pattern constructs.
"""

import pytest

from mcp_trino_spark.operators.pattern import compile_pattern, match_recognize


def _events(spark, rows):
    """rows: (key, seq, kind, val)"""
    return spark.createDataFrame(rows, "key int, seq int, kind string, val double")


DEFINE = {
    "A": "kind = 'a'",
    "B": "kind = 'b'",
    "C": "kind = 'c'",
}


def _run(spark, rows, pattern, measures):
    out = match_recognize(
        _events(spark, rows),
        partition_by=["key"],
        order_by=["seq"],
        define=DEFINE,
        pattern=pattern,
        measures=measures,
    )
    return sorted(tuple(r) for r in out.collect())


def test_greedy_non_overlapping(spark):
    # a a b b a b  ->  (AABB), (AB): two matches, greedy, skip past last row
    rows = [(1, i, k, float(i)) for i, k in enumerate("aabbab")]
    got = _run(spark, rows, "A+ B+", [("n", "count", None, None),
                                      ("first_seq", "first", None, "seq"),
                                      ("last_seq", "last", None, "seq")])
    assert got == [(1, 1, 4, 0, 3), (1, 2, 2, 4, 5)]


def test_unmatched_breaks_adjacency(spark):
    # a X b: the unclassified row between a and b prevents A+ B+ matching
    rows = [(1, 0, "a", 0.0), (1, 1, "x", 0.0), (1, 2, "b", 0.0)]
    got = _run(spark, rows, "A+ B+", [("n", "count", None, None)])
    assert got == []


def test_alternation_and_bounded_quantifier(spark):
    # (A|B){2,3} C over "abac": greedy takes aba then c
    rows = [(1, i, k, 0.0) for i, k in enumerate("abac")]
    got = _run(spark, rows, "(A | B){2,3} C",
               [("n", "count", None, None),
                ("n_a", "count", "A", None)])
    assert got == [(1, 1, 4, 2)]


def test_per_symbol_measures_and_sums(spark):
    rows = [(1, 0, "a", 1.5), (1, 1, "a", 2.5), (1, 2, "b", 10.0)]
    got = _run(spark, rows, "A+ B",
               [("sum_a", "sum", "A", "val"),
                ("avg_a", "avg", "A", "val"),
                ("max_all", "max", None, "val"),
                ("b_val", "first", "B", "val")])
    assert got == [(1, 1, 4.0, 2.0, 10.0, 10.0)]


def test_multiple_partitions_independent(spark):
    rows = [(1, 0, "a", 0.0), (1, 1, "b", 0.0),
            (2, 0, "a", 0.0), (2, 1, "a", 0.0), (2, 2, "b", 0.0),
            (3, 0, "b", 0.0)]
    got = _run(spark, rows, "A+ B", [("n", "count", None, None)])
    assert got == [(1, 1, 2), (2, 1, 3)]


def test_empty_symbol_subset_yields_null(spark):
    # optional C never matched: per-symbol first over empty subset -> NULL
    rows = [(1, 0, "a", 1.0), (1, 1, "b", 2.0)]
    got = _run(spark, rows, "A B C?",
               [("c_val", "first", "C", "val")])
    assert got == [(1, 1, None)]


def test_rejects_unsupported_constructs(spark):
    chars = {"A": "A", "B": "B"}
    for bad in ["A {- B -}", "PERMUTE(A)", "A {1,2,3}", "A ^ B", "Z+"]:
        with pytest.raises(ValueError):
            compile_pattern(bad, chars)
    with pytest.raises(ValueError):
        match_recognize(
            _events(spark, [(1, 0, "a", 0.0)]),
            partition_by=[], order_by=["seq"], define=DEFINE,
            pattern="A", measures=[("n", "count", None, None)],
        )
    with pytest.raises(ValueError):
        match_recognize(
            _events(spark, [(1, 0, "a", 0.0)]),
            partition_by=["key"], order_by=["seq"], define=DEFINE,
            pattern="A", measures=[("bad", "median", None, "val")],
        )


def test_zero_width_pattern_rejected(spark):
    """Review fix: SQL:2016 emits an output row per EMPTY match, which
    this engine's scanner cannot produce — a pattern that can match
    zero rows must be rejected loudly, not silently drop those rows."""
    rows = [(1, 0, "a", 0.0), (1, 1, "a", 0.0)]
    with pytest.raises(ValueError, match="zero rows"):
        _run(spark, rows, "B*", [("n", "count", None, None)])
    with pytest.raises(ValueError, match="zero rows"):
        _run(spark, rows, "A? B*", [("n", "count", None, None)])


def test_quantifier_sequences_rejected():
    """Reluctant (+?) and possessive (++) quantifiers silently diverge
    from Trino's greedy semantics — must be rejected at compile time."""
    from mcp_trino_spark.operators.pattern import compile_pattern

    chars = {"A": "A", "B": "B"}
    for bad in ("A+?", "A*+", "A?? B", "A{1,2}?", "A+ {2}"):
        with pytest.raises(ValueError):
            compile_pattern(bad, chars)


def test_pattern_symbols_case_insensitive():
    """Unquoted SQL identifiers are case-insensitive: PATTERN (DOWN+)
    must find DEFINE down, consistently with the MEASURES parser."""
    from mcp_trino_spark.operators.pattern import compile_pattern

    rx = compile_pattern("DOWN+ UP+", {"down": "A", "up": "B"})
    assert rx.fullmatch("AAB")


def test_all_null_measure_inputs_yield_null(spark):
    """SQL semantics over a non-empty span whose measure column is all
    NULL: SUM/MIN/MAX/AVG -> NULL (not 0 / NaN), COUNT(col) -> 0."""
    rows = [(1, 0, "a", None), (1, 1, "a", None), (1, 2, "b", None)]
    out = match_recognize(
        _events(spark, rows),
        partition_by=["key"],
        order_by=["seq"],
        define=DEFINE,
        pattern="A+ B+",
        measures=[("s", "sum", None, "val"), ("mn", "min", None, "val"),
                  ("mx", "max", None, "val"), ("av", "avg", None, "val"),
                  ("c", "count", None, "val"),
                  ("f", "first", None, "val"), ("l", "last", None, "val")],
    )
    [r] = out.collect()
    assert (r["s"], r["mn"], r["mx"], r["av"], r["f"], r["l"]) == (
        None, None, None, None, None, None)
    assert r["c"] == 0


def test_inverted_quantifier_rejected():
    with pytest.raises(ValueError, match="inverted"):
        compile_pattern("A{3,1}", {"A": "A"})


def test_order_by_nulls_modifiers(spark):
    rows = [(1, 0, "a", 0.0), (1, 1, "b", 1.0)]
    out = match_recognize(
        _events(spark, rows),
        partition_by=["key"],
        order_by=["seq ASC NULLS LAST"],
        define=DEFINE,
        pattern="A B",
        measures=[("n", "count", None, None)],
    )
    assert [tuple(r) for r in out.collect()] == [(1, 1, 2)]
    # per-key null placement (Spark-side sort): mixed specs are fine
    out = match_recognize(
        _events(spark, rows),
        partition_by=["key"],
        order_by=["seq NULLS FIRST", "val NULLS LAST"],
        define=DEFINE,
        pattern="A B",
        measures=[("n", "count", None, None)],
    )
    assert [tuple(r) for r in out.collect()] == [(1, 1, 2)]
    with pytest.raises(ValueError, match="unsupported ORDER BY"):
        match_recognize(
            _events(spark, rows),
            partition_by=["key"],
            order_by=["seq COLLATE x"],
            define=DEFINE,
            pattern="A B",
            measures=[("n", "count", None, None)],
        )


def test_enforce_exclusive_rejects_overlapping_defines(spark):
    rows = [(1, 0, "a", 5.0), (1, 1, "a", 20.0)]
    out = match_recognize(
        _events(spark, rows),
        partition_by=["key"],
        order_by=["seq"],
        define={"A": "val > 0", "B": "val > 10"},  # val=20 satisfies both
        pattern="A B",
        measures=[("n", "count", None, None)],
        enforce_exclusive=True,
    )
    with pytest.raises(Exception, match="not mutually.*exclusive|mutually"):
        out.collect()


def test_matcher_handles_multiple_arrow_batches(spark):
    """mapInPandas receives a partition as SEVERAL pandas batches when it
    exceeds arrow.maxRecordsPerBatch; groups straddling batch boundaries
    must still match identically (the matcher concatenates before
    grouping).  Run the funnel with a tiny batch size and compare to the
    default-config result."""
    from mcp_trino_spark import registry

    name = "t10b_match_recognize_funnel"
    sf = "/root/testdata/sf0.001"
    want = sorted(tuple(r) for r in registry.queries()[name](spark, sf).collect())
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        got = sorted(tuple(r) for r in registry.queries()[name](spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want and len(got) > 0


def test_matcher_against_local_reference(spark):
    """Property-style check: random symbol streams over several keys —
    the distributed matcher must agree with a direct local regex
    reference computing the same (greedy, SKIP PAST LAST ROW, ONE ROW
    PER MATCH) semantics."""
    import random
    import re as _re

    rng = random.Random(20260813)
    rows = []
    for key in range(40):
        for seq in range(rng.randint(0, 30)):
            rows.append((key, seq, rng.choice("aabbcx"), float(rng.randint(0, 9))))
    if not rows:
        rows = [(0, 0, "a", 1.0)]

    pattern, rx = "A+ B+ C?", _re.compile("A+B+C?")
    got = _run(spark, rows, pattern,
               [("n", "count", None, None),
                ("first_seq", "first", None, "seq"),
                ("sum_val", "sum", None, "val")])

    sym_of = {"a": "A", "b": "B", "c": "C"}
    want = []
    by_key = {}
    for key, seq, kind, val in sorted(rows):
        by_key.setdefault(key, []).append((seq, sym_of.get(kind, "0"), val))
    for key, items in by_key.items():
        s = "".join(sym for _, sym, _ in items)
        mno = 0
        for m in rx.finditer(s):
            if m.start() == m.end():
                continue
            mno += 1
            span = items[m.start():m.end()]
            want.append((key, mno, len(span), span[0][0],
                         sum(v for _, _, v in span)))
    assert got == sorted(want)


def test_skip_to_next_row_overlapping_matches(spark):
    """AFTER MATCH SKIP TO NEXT ROW: every row that begins a match
    yields one (overlaps allowed); PAST LAST ROW stays non-overlapping.
    Pattern A B over the classified sequence AABB: TO NEXT ROW finds
    the A-B pair at positions (2,3) only... for AAB: (1,2) and, after
    resuming at row 2, (2,3) is not a match — craft a sequence where
    overlap matters: A A B -> PAST LAST: one match (rows 2-3);
    TO NEXT: one match too (row 1 starts no match since row 2 is A).
    Use pattern A+ B: AAB -> PAST LAST: one match (1-3); TO NEXT:
    (1-3) and (2-3) — two matches."""
    import pandas as pd
    from mcp_trino_spark.operators.pattern import match_recognize

    pdf = pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 1],
            "i": [1, 2, 3, 4, 5],
            "x": [1.0, 2.0, -1.0, 3.0, -2.0],  # A A B A B
        }
    )
    df = spark.createDataFrame(pdf)
    kw = dict(
        partition_by=["g"],
        order_by=["i"],
        define={"A": "x > 0", "B": "x < 0"},
        pattern="A+ B",
        measures=[("n_rows", "count", None, None),
                  ("first_x", "first", None, "x")],
    )
    past = match_recognize(df, **kw).collect()
    nxt = match_recognize(df, after_match="to next row", **kw).collect()
    # PAST LAST ROW: [1-3], [4-5]
    assert sorted((r["n_rows"], r["first_x"]) for r in past) == [
        (2, 3.0), (3, 1.0)
    ]
    # TO NEXT ROW: [1-3], [2-3], [4-5]
    assert sorted((r["n_rows"], r["first_x"]) for r in nxt) == [
        (2, 2.0), (2, 3.0), (3, 1.0)
    ]
    # match_no numbers in scan order of the match START
    assert [r["match_no"] for r in sorted(nxt, key=lambda r: r["first_x"])] == [1, 2, 3]


def test_skip_to_next_row_sql_front_end(spark):
    from mcp_trino_spark.execute import execute_query
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    q = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES count(*) AS n
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (H L)
      DEFINE H AS value > 50, L AS value <= 50
    ) LIMIT 5
    """
    r = execute_query(spark, q, dialect="trino")
    assert len(r.rows) == 5
    assert all(row["n"] == 2 for row in r.rows)


def test_all_rows_per_match_running_and_final(spark):
    """ALL ROWS mode: one output row per matched input row; RUNNING
    measures aggregate the prefix, FINAL ones repeat the whole-match
    value, CLASSIFIER() yields the row's symbol."""
    import pandas as pd
    from mcp_trino_spark.operators.pattern import match_recognize

    pdf = pd.DataFrame(
        {"g": [1] * 5, "i": [1, 2, 3, 4, 5], "x": [1.0, 2.0, -1.0, 3.0, -2.0]}
    )
    df = spark.createDataFrame(pdf)
    out = match_recognize(
        df,
        partition_by=["g"],
        order_by=["i"],
        define={"A": "x > 0", "B": "x < 0"},
        pattern="A+ B",
        measures=[
            ("rc", "count", None, None, "running"),
            ("tot", "sum", None, "x", "final"),
            ("cls", "classifier", None, None, "running"),
            ("ravg", "avg", None, "x", "running"),
        ],
        rows_per_match="all",
    )
    rows = sorted(out.collect(), key=lambda r: (r["match_no"], r["i"]))
    got = [(r["i"], r["match_no"], r["rc"], r["tot"], r["cls"], round(r["ravg"], 4))
           for r in rows]
    assert got == [
        (1, 1, 1, 2.0, "A", 1.0),
        (2, 1, 2, 2.0, "A", 1.5),
        (3, 1, 3, 2.0, "B", 0.6667),
        (4, 2, 1, 1.0, "A", 3.0),
        (5, 2, 2, 1.0, "B", 0.5),
    ]


def test_all_rows_sql_front_end_modifiers_rejected(spark):
    from mcp_trino_spark.execute import execute_query
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import TrinoCompatError

    register_tables(spark, "/root/testdata/sf0.001")
    base = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES count(*) AS n
      {mode}
      PATTERN (H L)
      DEFINE H AS value > 50, L AS value <= 50
    ) LIMIT 4
    """
    r = execute_query(
        spark, base.format(mode="ALL ROWS PER MATCH"), dialect="trino"
    )
    assert len(r.rows) == 4
    assert {row["n"] for row in r.rows} <= {1, 2}  # RUNNING default
    # WITH UNMATCHED ROWS is supported (see test_unmatched_rows_and_
    # omit_empty); the remaining rejected modifier is SHOW EMPTY
    # MATCHES — this scanner never emits empty matches
    with pytest.raises(TrinoCompatError, match="EMPTY|modifier"):
        execute_query(
            spark,
            base.format(mode="ALL ROWS PER MATCH SHOW EMPTY MATCHES"),
            dialect="trino",
        )


def test_permute_prefers_argument_order(spark):
    """PERMUTE alternation preference: when several orderings match at
    the same start, the leftmost permutation in ARGUMENT order wins
    (Trino's documented tie-break) — with exclusive DEFINEs only one
    ordering can match, so check the expansion directly too."""
    from mcp_trino_spark.operators.pattern import compile_pattern

    rx = compile_pattern("PERMUTE(A, B, C)", {"A": "a", "B": "b", "C": "c"})
    assert rx.pattern.startswith("(?:abc|acb|bac")
    assert rx.fullmatch("cab") and not rx.fullmatch("aab")
    with pytest.raises(ValueError, match="2-6"):
        compile_pattern("PERMUTE(A)", {"A": "a"})


def test_subset_union_measures(spark):
    import pandas as pd
    from mcp_trino_spark.operators.pattern import match_recognize

    pdf = pd.DataFrame(
        {"g": [1] * 4, "i": [1, 2, 3, 4], "x": [1.0, 2.0, -1.0, -3.0]}
    )
    df = spark.createDataFrame(pdf)
    out = match_recognize(
        df,
        partition_by=["g"],
        order_by=["i"],
        define={"A": "x > 0", "B": "x < 0"},
        pattern="A+ B+",
        measures=[
            ("n_all", "count", "M", None),
            ("tot_all", "sum", "M", "x"),
            ("n_b", "count", "B", None),
        ],
        subsets={"M": ["A", "B"]},
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_all"], r["tot_all"], r["n_b"]) == (4, -1.0, 2)
    # bad subsets fail loudly
    with pytest.raises(ValueError, match="collides"):
        match_recognize(
            df, partition_by=["g"], order_by=["i"],
            define={"A": "x > 0", "B": "x < 0"}, pattern="A B",
            measures=[("n", "count", None, None)], subsets={"A": ["B"]},
        )
    with pytest.raises(ValueError, match="not defined"):
        match_recognize(
            df, partition_by=["g"], order_by=["i"],
            define={"A": "x > 0", "B": "x < 0"}, pattern="A B",
            measures=[("n", "count", None, None)], subsets={"M": ["Z"]},
        )


def test_skip_to_symbol_modes(spark):
    """AFTER MATCH SKIP TO LAST <sym>: scanning resumes AT the last
    row the match mapped to the symbol (that row may start the next
    match) — on a run of five X's, PATTERN (X X X) yields starts at
    offsets 0 and 2, distinct from both PAST LAST ROW (offset 0 only)
    and TO NEXT ROW (offsets 0, 1, 2).  The SQL standard's two SKIP TO
    runtime errors raise loudly exactly where Trino raises."""
    import pandas as pd
    from mcp_trino_spark.operators.pattern import match_recognize

    pdf = pd.DataFrame(
        {"g": [1] * 8, "i": list(range(8)),
         "v": [1, 1, 1, 1, 1, -1, 1, 1]}  # XXXXX . XX
    )
    df = spark.createDataFrame(pdf)
    kw = dict(
        partition_by=["g"], order_by=["i"], define={"X": "v > 0"},
        pattern="X X X",
        measures=[("s", "first", None, "i"), ("e", "last", None, "i")],
    )
    spans = lambda rows: sorted((r["s"], r["e"]) for r in rows)
    assert spans(match_recognize(df, **kw).collect()) == [(0, 2)]
    assert spans(
        match_recognize(df, after_match="to next row", **kw).collect()
    ) == [(0, 2), (1, 3), (2, 4)]
    assert spans(
        match_recognize(df, after_match="to last X", **kw).collect()
    ) == [(0, 2), (2, 4)]
    # SUBSET union variable as the skip target
    out = match_recognize(
        df, after_match="to last M", subsets={"M": ["X"]}, **kw
    ).collect()
    assert spans(out) == [(0, 2), (2, 4)]
    # TO FIRST X resumes at the match's own first row -> loud error
    with pytest.raises(Exception, match="first row of the match"):
        match_recognize(df, after_match="to first X", **kw).collect()
    # unknown symbol rejected at build time
    with pytest.raises(ValueError, match="unknown pattern symbol"):
        match_recognize(df, after_match="to last Q", **kw)
    # symbol absent from the match -> loud per-group error (Trino
    # raises too): pattern A B? with no B rows, skip target B
    pdf2 = pd.DataFrame({"g": [1, 1], "i": [0, 1], "v": [1, 1]})
    df2 = spark.createDataFrame(pdf2)
    with pytest.raises(Exception, match="maps no row"):
        match_recognize(
            df2, partition_by=["g"], order_by=["i"],
            define={"A": "v > 0", "B": "v < 0"}, pattern="A B?",
            measures=[("n", "count", None, None)],
            after_match="to last B",
        ).collect()


def test_skip_to_symbol_sql_front_end(spark):
    """SKIP TO [FIRST|LAST] <symbol> parses through the MATCH_RECOGNIZE
    SQL front-end (SKIP TO <sym> is the standard's LAST shorthand)."""
    from mcp_trino_spark.execute import execute_query
    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.sources.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    body = """
        SELECT user_id, match_no, start_id
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS match_no,
                   FIRST(event_id) AS start_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO {target}
          PATTERN (X X X)
          DEFINE X AS value > 50
        )
    """
    full = execute_query(
        spark, body.format(target="LAST X"), EngineConfig(), dialect="trino"
    )
    shorthand = execute_query(
        spark, body.format(target="X"), EngineConfig(), dialect="trino"
    )
    assert len(full.rows) > 0
    assert sorted((r["user_id"], r["start_id"]) for r in full.rows) == sorted(
        (r["user_id"], r["start_id"]) for r in shorthand.rows
    )


def test_unmatched_rows_and_omit_empty(spark):
    """ALL ROWS PER MATCH WITH UNMATCHED ROWS passes unmatched rows
    through with NULL match_no / NULL measures; OMIT EMPTY MATCHES is
    accepted as a statement of the scanner's existing behavior."""
    import pandas as pd
    from mcp_trino_spark.operators.pattern import match_recognize
    from mcp_trino_spark.execute import execute_query
    from mcp_trino_spark.config import EngineConfig
    from mcp_trino_spark.sources.catalog import register_tables

    pdf = pd.DataFrame(
        {"g": [1] * 6, "i": range(6),
         "v": [60.0, 40.0, 30.0, 70.0, 45.0, 80.0]}
    )  # H L | unmatched | H L | unmatched
    df = spark.createDataFrame(pdf)
    out = match_recognize(
        df, partition_by=["g"], order_by=["i"],
        define={"H": "v > 50", "L": "v <= 50"}, pattern="H L",
        measures=[("tot", "sum", None, "v")],
        rows_per_match="all", unmatched_rows=True,
    ).orderBy("i").collect()
    assert [(r["i"], r["match_no"], r["tot"]) for r in out] == [
        (0, 1, 100.0), (1, 1, 100.0), (2, None, None),
        (3, 2, 115.0), (4, 2, 115.0), (5, None, None),
    ]
    # direct-API guard: the modifier needs ALL ROWS
    with pytest.raises(ValueError, match="rows_per_match"):
        match_recognize(
            df, partition_by=["g"], order_by=["i"],
            define={"H": "v > 50", "L": "v <= 50"}, pattern="H L",
            measures=[("tot", "sum", None, "v")], unmatched_rows=True,
        )
    # SQL front-end: both modifiers parse; unmatched rows arrive NULL
    register_tables(spark, "/root/testdata/sf0.001")
    body = """
        SELECT user_id, event_id, mn
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mn
          ALL ROWS PER MATCH {mod}
          PATTERN (H L)
          DEFINE H AS value > 50,
                 L AS value <= 50
        )
    """
    r_un = execute_query(
        spark, body.format(mod="WITH UNMATCHED ROWS"), EngineConfig(),
        dialect="trino",
    )
    r_omit = execute_query(
        spark, body.format(mod="OMIT EMPTY MATCHES"), EngineConfig(),
        dialect="trino",
    )
    n_null = sum(1 for r in r_un.rows if r["mn"] is None)
    assert n_null > 0
    assert len(r_un.rows) == len(r_omit.rows) + n_null
