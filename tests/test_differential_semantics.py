"""Adversarial randomized differentials for the value-semantics
rewrites (round 9: split_part / trim family / regexp_extract /
element_at; round 10: the window-EXCLUDE family and substr start
semantics).

The per-entry oracles (x36-x39) certify curated columns on real data;
these tests sweep a seeded-random corpus of ADVERSARIAL inputs — empty
strings, multi-char and absent delimiters, unicode, repeated chars,
indices crossing the field count — through the translated Spark
expressions AND an independently-spelled DuckDB implementation of the
Trino contract, comparing whole frames.  One Spark job per test
(examples batched into a single DataFrame), so hypothesis-style
coverage at fixed cost.
"""

import random

import duckdb
import pytest

from mcp_trino_spark.trino_compat import translate

WORDS = ["a", "bb", "ccc", "", "x y", "δδ", "zz", "a,b", "  ", "q"]
DELIMS = [",", "|", "ab", " ", "δ", "--", "zz"]


def _rand_string(rng, max_words=6):
    return rng.choice(["", " ", ","]).join(
        rng.choice(WORDS) for _ in range(rng.randint(0, max_words))
    )


def _frame(rng, n):
    rows = []
    for i in range(n):
        s = _rand_string(rng)
        d = rng.choice(DELIMS)
        idx = rng.randint(1, 6)
        cs = rng.choice(["a", "ab", "δ", "z,", " a", "q"])
        rows.append((i, s, d, idx, cs))
    return rows


def _duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (i BIGINT, s VARCHAR, d VARCHAR, idx INTEGER,"
        " cs VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    return con


def _spark_frame(spark, rows):
    df = spark.createDataFrame(
        rows, "i long, s string, d string, idx int, cs string"
    )
    df.createOrReplaceTempView("diff_t")
    return df


def test_split_part_random_differential(spark):
    rng = random.Random(909)
    rows = _frame(rng, 300)
    _spark_frame(spark, rows)
    got = {
        r["i"]: r["v"]
        for r in spark.sql(
            translate("SELECT i, split_part(s, d, idx) AS v FROM diff_t")
        ).collect()
    }
    want = {
        i: v
        for i, v in _duck(rows).execute(
            """
            SELECT i, CASE WHEN idx <= len(string_split(s, d))
                           THEN split_part(s, d, idx) END
            FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_trim_family_random_differential(spark):
    rng = random.Random(910)
    rows = _frame(rng, 300)
    _spark_frame(spark, rows)
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                "SELECT i, trim(s, cs) AS t2, ltrim(s, cs) AS l2,"
                " rtrim(s, cs) AS r2 FROM diff_t ORDER BY i"
            )
        ).collect()
    ]
    want = _duck(rows).execute(
        "SELECT i, trim(s, cs), ltrim(s, cs), rtrim(s, cs)"
        " FROM t ORDER BY i"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_regexp_extract_random_differential(spark):
    rng = random.Random(911)
    rows = _frame(rng, 300)
    _spark_frame(spark, rows)
    # fixed pattern set (Java and RE2 agree on these constructs),
    # random subject strings; both groupful and groupless, matching
    # and non-matching
    pats = ["([a-z]+)", "b(b)", "zzz(q)", "[a-z]+", "δ+", "q$"]
    sel_spark, sel_duck = [], []
    for k, p in enumerate(pats):
        g = ", 1" if "(" in p else ""
        sel_spark.append(f"regexp_extract(s, '{p}'{g}) AS c{k}")
        dg = ", 1" if "(" in p else ""
        sel_duck.append(
            f"CASE WHEN regexp_matches(s, '{p}') "
            f"THEN regexp_extract(s, '{p}'{dg}) END AS c{k}"
        )
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                f"SELECT i, {', '.join(sel_spark)} FROM diff_t ORDER BY i"
            )
        ).collect()
    ]
    want = _duck(rows).execute(
        f"SELECT i, {', '.join(sel_duck)} FROM t ORDER BY i"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_element_at_random_differential(spark):
    rng = random.Random(912)
    rows = _frame(rng, 300)
    _spark_frame(spark, rows)
    # literal delimiter: the split() rewrite (correctly) rejects
    # non-literal delimiters, so the array source splits on ','
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                "SELECT i, element_at(split(s, ','), idx) AS pos,"
                " element_at(split(s, ','), -idx) AS neg FROM diff_t"
                " ORDER BY i"
            )
        ).collect()
    ]
    want = _duck(rows).execute(
        "SELECT i, string_split(s, ',')[idx],"
        " string_split(s, ',')[-CAST(idx AS INTEGER)] FROM t ORDER BY i"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_window_exclude_random_differential(spark):
    """Randomized window-frame EXCLUDE differential vs DuckDB's NATIVE
    EXCLUDE (DuckDB evaluates RANGE and GROUPS frames with EXCLUDE
    directly — a true engine-independent oracle for the x29/x31/x35/
    x42 rewrite family): seeded-random (partition, duplicate-heavy
    order key, nullable integer aggregand) data swept through every
    aggregate × mode × peer-aligned-frame combination in ONE query per
    engine.  Integer aggregands keep the subtraction splits exact."""
    rng = random.Random(913)
    data = [
        (
            i,
            rng.randint(0, 2),                       # partition
            rng.randint(0, 4),                       # order key (dupes!)
            rng.choice([None] + list(range(-50, 51))),
        )
        for i in range(240)
    ]
    spark.createDataFrame(
        data, "i long, p int, k int, x int"
    ).createOrReplaceTempView("excl_rand_t")

    # DuckDB has no GROUPS frame mode: its spelling of the GROUPS
    # frame orders by a materialized dense_rank and uses RANGE over the
    # group number — the same peer structure through an independent
    # spelling (the x35 oracle protocol)
    frames = [
        ("RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING", "k"),
        ("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "k"),
        ("GROUPS BETWEEN 1 PRECEDING AND 2 FOLLOWING", "grp"),
        ("RANGE BETWEEN CURRENT ROW AND CURRENT ROW", "k"),
    ]
    aggs = ["sum", "count", "avg", "min", "max"]
    modes = ["GROUP", "TIES", "CURRENT ROW"]
    cols, duck_cols = [], []
    n = 0
    for frame, duck_key in frames:
        duck_frame = (
            frame.replace("GROUPS", "RANGE") if duck_key == "grp" else frame
        )
        for agg in aggs:
            for mode in modes:
                n += 1
                name = f"c{n}"
                expr = (
                    f"{agg}(x) OVER (PARTITION BY p ORDER BY k "
                    f"{frame} EXCLUDE {mode})"
                )
                dexpr = (
                    f"{agg}(x) OVER (PARTITION BY p ORDER BY {duck_key} "
                    f"{duck_frame} EXCLUDE {mode})"
                )
                if agg == "avg":
                    expr, dexpr = f"round({expr}, 6)", f"round({dexpr}, 6)"
                cols.append(f"{expr} AS {name}")
                duck_cols.append(f"{dexpr} AS {name}")
    q = f"SELECT i, {', '.join(cols)} FROM excl_rand_t ORDER BY i"
    got = [tuple(r) for r in spark.sql(translate(q)).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, p INTEGER, k INTEGER, x INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data)
    dq = (
        f"SELECT i, {', '.join(duck_cols)} FROM (SELECT *, dense_rank()"
        f" OVER (PARTITION BY p ORDER BY k) AS grp FROM t) ORDER BY i"
    )
    want = con.execute(dq).fetchall()
    assert len(got) == len(want) == 240
    for g, w in zip(got, want):
        gg = tuple(float(v) if v is not None else None for v in g[1:])
        ww = tuple(float(v) if v is not None else None for v in w[1:])
        assert gg == ww, (g[0], gg, ww)


def test_substr_random_differential(spark):
    """Randomized substr start-semantics differential (x43's curated
    oracle, adversarialized): seeded-random strings (empty, unicode,
    whitespace) × starts sweeping far past both ends × lengths
    including zero and negative, compared against an explicit-contract
    DuckDB spelling (DuckDB clamps like Spark, so the oracle encodes
    Trino's empty-on-0 / empty-before-beginning rules in SQL)."""
    rng = random.Random(914)
    rows = []
    for i in range(300):
        s = _rand_string(rng)
        st = rng.randint(-12, 12)
        ln = rng.randint(-2, 8)
        rows.append((i, s, st, ln))
    spark.createDataFrame(
        rows, "i long, s string, st int, ln int"
    ).createOrReplaceTempView("substr_t")
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                "SELECT i, substr(s, st) AS a, substr(s, st, ln) AS b,"
                " substring(s FROM st FOR 3) AS c FROM substr_t ORDER BY i"
            )
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR, st INTEGER, ln INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = con.execute(
        """
        SELECT i,
          CASE WHEN st = 0 OR st < -length(s) THEN '' ELSE substr(s, st) END,
          CASE WHEN ln < 0 THEN ''
               WHEN st = 0 OR st < -length(s) THEN ''
               ELSE substr(s, st, ln) END,
          CASE WHEN st = 0 OR st < -length(s) THEN ''
               ELSE substr(s, st, 3) END
        FROM t ORDER BY i
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_log_and_nullpoison_random_differential(spark):
    """Randomized sweep of the x33/x40 numeric-semantics rewrites:
    IEEE log family over values crossing zero (Trino: ln(0) =
    -Infinity, ln(negative) = NaN; un-rewritten Spark builtins return
    NULL for every non-positive), NULL-poisoning least/greatest
    (Trino: NULL if ANY argument is NULL; Spark skips NULLs), and
    literal-free integer division on column operands of lexically
    known literal type (the rewrite handles literals; columns rely on
    the engine's div).  DuckDB ERRORS on log of non-positives, so the
    oracle spells the IEEE contract explicitly — the x40 protocol."""
    rng = random.Random(915)
    data = [
        (
            i,
            rng.choice([None] + [x / 4.0 for x in range(-20, 21)]),
            rng.choice([None] + list(range(-9, 10))),
            rng.choice([None] + list(range(-9, 10))),
        )
        for i in range(300)
    ]
    spark.createDataFrame(
        data, "i long, d double, a int, b int"
    ).createOrReplaceTempView("logp_t")
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                "SELECT i, round(ln(d), 10) AS l1,"
                " round(log10(d), 10) AS l2, round(log2(d), 10) AS l3,"
                " round(log(3, d), 10) AS l4,"
                " least(a, b) AS lo, greatest(a, b) AS hi,"
                " least(a, b, 5) AS lo3 FROM logp_t ORDER BY i"
            )
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, d DOUBLE, a INTEGER, b INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data)
    ieee = (
        "CASE WHEN d > 0 THEN {f} WHEN d = 0 THEN CAST('-Infinity' AS"
        " DOUBLE) WHEN d < 0 THEN CAST('NaN' AS DOUBLE) END"
    )
    want = con.execute(
        "SELECT i, "
        + ieee.format(f="round(ln(d), 10)") + ", "
        + ieee.format(f="round(log10(d), 10)") + ", "
        + ieee.format(f="round(log2(d), 10)") + ", "
        + ieee.format(f="round(ln(d) / ln(3), 10)") + ","
        " CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE least(a, b) END,"
        " CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE greatest(a, b)"
        " END,"
        " CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE least(a, b, 5)"
        " END"
        " FROM t ORDER BY i"
    ).fetchall()
    import math

    def norm(v):
        if v is None:
            return None
        f = float(v)
        return "nan" if math.isnan(f) else f

    assert [tuple(norm(v) for v in g[1:]) for g in got] == [
        tuple(norm(v) for v in w[1:]) for w in want
    ]


def test_null_ordering_random_differential(spark):
    """Randomized certification of the ORDER BY null-placement
    defaults (x34's curated oracle, adversarialized): Trino sorts
    NULLs as LARGEST (ASC → last, DESC → first); Spark defaults the
    exact opposite, and DuckDB defaults NULLS LAST in BOTH directions
    — three engines, three conventions, so the oracle spells the
    placement explicitly and the Spark side relies on the rewrite.
    Random nullable keys through every (direction × window/statement)
    shape; a unique tiebreaker keeps every rank deterministic."""
    rng = random.Random(916)
    data = [
        (i, rng.choice([None] + list(range(0, 6))), rng.randint(0, 2))
        for i in range(300)
    ]
    spark.createDataFrame(
        data, "i long, k int, p int"
    ).createOrReplaceTempView("nulls_t")
    got = [
        tuple(r)
        for r in spark.sql(
            translate(
                "SELECT i,"
                " row_number() OVER (ORDER BY k, i) AS rn_a,"
                " row_number() OVER (ORDER BY k DESC, i) AS rn_d,"
                " rank() OVER (PARTITION BY p ORDER BY k) AS rk_a,"
                " rank() OVER (PARTITION BY p ORDER BY k DESC) AS rk_d"
                " FROM nulls_t ORDER BY k DESC, i LIMIT 300"
            )
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, k INTEGER, p INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = con.execute(
        "SELECT i,"
        " row_number() OVER (ORDER BY k NULLS LAST, i) AS rn_a,"
        " row_number() OVER (ORDER BY k DESC NULLS FIRST, i) AS rn_d,"
        " rank() OVER (PARTITION BY p ORDER BY k NULLS LAST) AS rk_a,"
        " rank() OVER (PARTITION BY p ORDER BY k DESC NULLS FIRST) AS rk_d"
        " FROM t ORDER BY k DESC NULLS FIRST, i LIMIT 300"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_weighted_percentile_and_kurtosis_random_differential(spark):
    """Randomized sweep of the round-10 aggregate-convention rewrites:
    weighted approx_percentile (→ exact frequency percentile; oracle
    expands each row w times and runs quantile_cont — independent
    spelling of the weight semantics) and kurtosis (→ unbiased sample
    excess; DuckDB computes the same estimator natively).  Random
    group sizes cross the kurtosis n=4 definedness edge."""
    rng = random.Random(917)
    data = [
        (i, rng.randint(0, 11), round(rng.uniform(-50, 50), 3),
         rng.randint(1, 6))
        for i in range(400)
    ]
    spark.createDataFrame(
        data, "i long, g int, x double, w int"
    ).createOrReplaceTempView("wp_t")
    got = {
        r["g"]: (r["p50"], r["p90"], r["k"])
        for r in spark.sql(
            translate(
                "SELECT g, round(approx_percentile(x, w, 0.5), 6) AS p50,"
                " round(approx_percentile(x, w, 0.9), 6) AS p90,"
                " round(kurtosis(x), 6) AS k"
                " FROM wp_t GROUP BY g"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, g INTEGER, x DOUBLE, w INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data)
    want = {
        g: (p50, p90, k)
        for g, p50, p90, k in con.execute(
            """
            WITH expanded AS (
              SELECT g, x FROM t, LATERAL unnest(range(1, w + 1))
            ), pct AS (
              SELECT g, round(quantile_cont(x, 0.5), 6) AS p50,
                     round(quantile_cont(x, 0.9), 6) AS p90
              FROM expanded GROUP BY g
            ), kt AS (
              SELECT g, round(kurtosis(x), 6) AS k FROM t GROUP BY g
            )
            SELECT g, p50, p90, k FROM pct JOIN kt USING (g)
            """
        ).fetchall()
    }
    assert got == want


def test_map_concat_random_differential(spark):
    """Randomized map_concat last-wins differential: random key sets
    with engineered overlaps across three maps; the merged map is
    surfaced as sorted 'k=v' entries (scalar string — no map-typed
    comparison), and the oracle folds the last-wins contract
    explicitly in SQL."""
    rng = random.Random(918)
    keys = ["a", "b", "c", "d"]
    data = []
    for i in range(200):
        trip = []
        for _ in range(3):
            ks = rng.sample(keys, rng.randint(1, 3))
            trip.append((ks, [rng.randint(0, 99) for _ in ks]))
        data.append((i, *[x for pair in trip for x in pair]))
    spark.createDataFrame(
        data,
        "i long, k1 array<string>, v1 array<int>, k2 array<string>,"
        " v2 array<int>, k3 array<string>, v3 array<int>",
    ).createOrReplaceTempView("mc_t")
    got = {
        r["i"]: r["ent"]
        for r in spark.sql(
            translate(
                "SELECT i, array_join(array_sort(transform(map_entries("
                "map_concat(map_from_arrays(k1, v1),"
                " map_from_arrays(k2, v2), map_from_arrays(k3, v3))),"
                " __e -> __e.key || '=' || CAST(__e.value AS VARCHAR))),"
                " ',') AS ent FROM mc_t"
            )
        ).collect()
    }
    # independent python oracle: dict update IS last-wins
    want = {}
    for row in data:
        i, k1, v1, k2, v2, k3, v3 = row
        m = {}
        for ks, vs in ((k1, v1), (k2, v2), (k3, v3)):
            m.update(zip(ks, vs))
        want[i] = ",".join(f"{k}={v}" for k, v in sorted(m.items()))
    assert got == want


def test_date_format_tokens_random_differential(spark):
    """Randomized MySQL-token sweep for date_format (VERDICT r10 item
    6): seeded-random timestamps (midnight/noon edges, max microseconds,
    pre-2000 years) through every supported %-token family, compared
    against DuckDB's strftime with an INDEPENDENTLY-mapped C spelling
    (%i→%M, %W→%A, %M→%B, … — the MySQL and C vocabularies disagree on
    exactly the tokens that silently diverge)."""
    import datetime

    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(920)
    rows = []
    for i in range(200):
        ts = (
            f"{rng.randint(1971, 2099):04d}-{rng.randint(1, 12):02d}-"
            f"{rng.randint(1, 28):02d} {rng.choice([0, 1, 11, 12, 13, 23]):02d}:"
            f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}."
            f"{rng.choice([0, 1, 999999, 123456, 500000]):06d}"
        )
        rows.append((i, ts))
    spark.createDataFrame(rows, "i long, tss string").createOrReplaceTempView(
        "dfmt_t"
    )
    fmts = {
        "c1": ("%Y-%m-%d %H:%i:%s", "%Y-%m-%d %H:%M:%S"),
        "c2": ("%y/%c/%e %k:%i", "%y/%-m/%-d %-H:%M"),
        "c3": ("%d %b %Y %h:%i %p", "%d %b %Y %I:%M %p"),
        "c4": ("%W, %M %e", "%A, %B %-d"),
        "c5": ("%j %T %f", "%j %H:%M:%S %f"),
        "c6": ("on %Y at %H", "on %Y at %H"),  # bare letters stay literal
        "c7": ("%%x %Y", "%%x %Y"),
    }
    sel = ", ".join(
        f"date_format(CAST(tss AS TIMESTAMP), '{f}') AS {k}"
        for k, (f, _) in fmts.items()
    )
    got = {
        r["i"]: tuple(r[k] for k in fmts)
        for r in spark.sql(
            translate(f"SELECT i, {sel} FROM dfmt_t")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, tss VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dsel = ", ".join(
        f"strftime(CAST(tss AS TIMESTAMP), '{d}') AS {k}"
        for k, (_, d) in fmts.items()
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(f"SELECT i, {dsel} FROM t").fetchall()
    }
    assert got == want


def test_date_parse_tokens_random_differential(spark):
    """Randomized date_parse sweep — the direction that caught two
    silent divergences this round: (1) two-digit years: MySQL/Trino
    pivot 70-99 → 1970-1999 (Trino builds appendTwoDigitYear(2020));
    Spark's 'yy' based every input at 2000-2099; (2) lenient digit
    counts: MySQL numeric tokens parse 1-2 digits where Java's padded
    letters require exactly two — '2026-1-2 3:4:5' crashed.  The
    DuckDB strptime oracle pivots %y at POSIX 69 (vs MySQL's 70), so
    the oracle adjusts exactly year 1969 → 2069; and DuckDB's %f reads
    an integer MICROSECOND count where MySQL/Trino/Joda read a
    FRACTION ('.25' = 250000 µs), so the oracle strips the fraction
    and re-adds it as to_microseconds of the right-padded digits —
    three engines, three fraction conventions, all spelled out."""
    import datetime

    rng = random.Random(922)
    rows = []
    for i in range(200):
        y2 = rng.randint(0, 99)
        mo, d = rng.randint(1, 12), rng.randint(1, 28)
        h24, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        frac = rng.choice(["1", "25", "123", "123456"])
        pad = rng.random() < 0.5  # mix padded and unpadded spellings
        mm, dd = (f"{mo:02d}", f"{d:02d}") if pad else (str(mo), str(d))
        rows.append((
            i,
            f"{y2:02d}/{mm}/{dd}",
            f"20{y2:02d}-{mm}-{dd} {h24}:{mi}:{s}.{frac}",
        ))
    spark.createDataFrame(
        rows, "i long, s2 string, sf string"
    ).createOrReplaceTempView("dparse_t")
    got = {
        r["i"]: (r["a"], r["b"])
        for r in spark.sql(
            translate(
                "SELECT i, date_parse(s2, '%y/%c/%e') AS a,"
                " date_parse(sf, '%Y-%m-%d %H:%i:%s.%f') AS b"
                " FROM dparse_t"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s2 VARCHAR, sf VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT i,
              CASE WHEN year(strptime(s2, '%y/%-m/%-d')) = 1969
                   THEN strptime(s2, '%y/%-m/%-d') + INTERVAL 100 YEAR
                   ELSE strptime(s2, '%y/%-m/%-d') END,
              strptime(regexp_replace(sf, '\\.\\d+$', ''),
                       '%Y-%m-%d %-H:%M:%S')
                + to_microseconds(CAST(rpad(regexp_extract(sf,
                      '\\.(\\d+)$', 1), 6, '0') AS BIGINT))
            FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_json_path_random_differential(spark):
    """Randomized JSON-path differential (VERDICT r10 item 6):
    arrays-of-objects, nested nulls, unicode, quote-bearing and
    bracket-leading strings swept through json_extract /
    json_extract_scalar / json_size on nine fixed path shapes.  Paths
    are LITERAL columns because DuckDB's json_type conflates a JSON
    null node with a missing path when the path is a column — with
    literal paths it distinguishes them ('NULL' vs SQL NULL), giving a
    true oracle for Trino's contract (json_extract of a null node is
    the text 'null', json_size of any scalar including null is 0,
    missing paths are SQL NULL).  This sweep caught the round-11
    unicode-escaping divergence (json.dumps ensure_ascii vs Trino's
    raw-UTF-8 Jackson output)."""
    import json as _json

    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(921)

    def rand_scalar():
        return rng.choice(
            [1, -3, 0, 1.5, 2.25, True, False, None,
             "x", "", "a b", "δλ", "[x", "{y", 'q"t', "a'b", 7, 42]
        )

    def rand_json(depth=0):
        r = rng.random()
        if depth >= 3 or r < 0.35:
            return rand_scalar()
        if r < 0.7:
            return {
                k: rand_json(depth + 1)
                for k in rng.sample(["a", "b", "c"], rng.randint(1, 3))
            }
        return [rand_json(depth + 1) for _ in range(rng.randint(0, 3))]

    rows = [
        (i, _json.dumps(rand_json(), ensure_ascii=False)) for i in range(250)
    ]
    spark.createDataFrame(rows, "i long, j string").createOrReplaceTempView(
        "jsd_t"
    )
    paths = ["$.a", "$.a.b", "$.a[0]", "$.a[0].b", "$[0]", "$[1].a",
             "$.b[2]", "$.c", "$.b.c.a"]
    sel = []
    for k, p in enumerate(paths):
        sel += [
            f"json_extract_scalar(j, '{p}') AS s{k}",
            f"json_extract(j, '{p}') AS e{k}",
            f"json_size(j, '{p}') AS z{k}",
        ]
    got = [
        tuple(r)
        for r in spark.sql(
            translate(f"SELECT i, {', '.join(sel)} FROM jsd_t ORDER BY i")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, j VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dsel = []
    for k, p in enumerate(paths):
        typ = f"json_type(TRY_CAST(j AS JSON), '{p}')"
        dsel += [
            f"CASE WHEN {typ} IN ('OBJECT', 'ARRAY') THEN NULL"
            f" ELSE json_extract_string(j, '{p}') END AS s{k}",
            f"CASE WHEN {typ} IS NULL THEN NULL WHEN {typ} = 'NULL'"
            f" THEN 'null' ELSE CAST(json_extract(j, '{p}') AS VARCHAR)"
            f" END AS e{k}",
            f"CASE WHEN {typ} IS NULL THEN NULL"
            f" WHEN {typ} = 'ARRAY' THEN json_array_length(j, '{p}')"
            f" WHEN {typ} = 'OBJECT' THEN len(json_keys(j, '{p}'))"
            f" ELSE 0 END AS z{k}",
        ]
    want = con.execute(
        f"SELECT i, {', '.join(dsel)} FROM t ORDER BY i"
    ).fetchall()
    assert len(got) == len(want) == 250
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (g[0], [
            (a, b) for a, b in zip(g[1:], w[1:]) if a != b
        ])


def test_double_round_and_cast_random_differential(spark):
    """Randomized sweep for the round-11 Trino-rounding passes: doubles
    constructed on decimal .5 boundaries (where Spark's BigDecimal
    HALF_UP and Trino's binary-scaled Math.floor(x*10^n + 0.5) split
    per-value) through round(x, n) and CAST(x AS BIGINT/INT), against
    a DuckDB oracle that spells Trino's forms independently — the
    sign-mirrored floor for round(x, n), DuckDB's native half-away-
    from-zero round() for the HALF_UP integral cast (round-12
    correction: Trino casts via DoubleMath.roundToLong(HALF_UP), not
    Math.round) — both engines evaluate the same IEEE doubles, so the
    comparison is bit-exact."""
    rng = random.Random(1105)
    rows = []
    tails = ["005", "015", "025", "5", "45", "55", "095", "5000001", "49", "99"]
    for i in range(250):
        mag = rng.choice([0, 1, 10, 123, 9999, 123456])
        x = float(f"{mag}.{rng.choice(tails)}")
        if rng.random() < 0.5:
            x = -x
        n = rng.randint(-2, 4)
        rows.append((i, x, n))
    # round-13 extension (VERDICT r12 #5): non-finite / out-of-range
    # values through the TRY_CAST guard — Trino try_cast absorbs
    # roundToLong's ArithmeticException into NULL; round(x, n) on
    # non-finite doubles is identity in both engines
    for j, x in enumerate(
        [float("inf"), float("-inf"), 1e300, -1e300,
         9.223372036854776e18, -9.223372036854776e18]
    ):
        rows.append((250 + j, x, 2))
    spark.createDataFrame(
        rows, "i long, x double, n int"
    ).createOrReplaceTempView("dr_t")
    got = {
        r["i"]: (r["rn"], r["r2"], r["cb"], r["ci"])
        for r in spark.sql(
            translate(
                "SELECT i, round(x, n) AS rn, round(x, 2) AS r2,"
                " TRY_CAST(x AS BIGINT) AS cb, TRY_CAST(x AS INT) AS ci"
                " FROM dr_t",
                column_types={"x": "double", "n": "int", "i": "bigint"},
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x DOUBLE, n INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            """
            SELECT i,
              CASE WHEN x < 0
                   THEN -floor(-x * power(10, n) + 0.5) / power(10, n)
                   ELSE  floor( x * power(10, n) + 0.5) / power(10, n)
              END AS rn,
              CASE WHEN x < 0
                   THEN -floor(-x * 100.0 + 0.5) / 100.0
                   ELSE  floor( x * 100.0 + 0.5) / 100.0
              END AS r2,
              CASE WHEN isfinite(x) AND abs(x) < 9.223372036854776e18
                        OR x = -9.223372036854776e18
                   THEN CAST(round(x) AS BIGINT) END AS cb,
              CASE WHEN isfinite(x) AND abs(x) < 2147483647.5
                   THEN CAST(round(x) AS INTEGER) END AS ci
            FROM t
            WHERE isfinite(x)
            """
        ).fetchall()
    }
    # non-finite rows: DuckDB round() errors on them, so their expected
    # values are pinned directly — CAST(±Inf) raises in BOTH engines
    # (only TRY_CAST rows enter the sweep for them), try_cast -> NULL,
    # and exactly -2^63 is a VALID bigint (roundToLong -> Long.MIN)
    want[250] = (float("inf"), float("inf"), None, None)
    want[251] = (float("-inf"), float("-inf"), None, None)
    want[252] = (1e300, 1e300, None, None)
    want[253] = (-1e300, -1e300, None, None)
    want[254] = (9.223372036854776e18, 9.223372036854776e18, None, None)
    want[255] = (-9.223372036854776e18, -9.223372036854776e18,
                 -9223372036854775808, None)
    assert got == want


def test_array_minmax_null_random_differential(spark):
    """Randomized sweep for the array_max/array_min null-containment
    guard: int arrays with nulls sprinkled at random positions (plus
    empties), against a DuckDB oracle that spells Trino's contract
    independently (NULL when any element is NULL, else list extremum)."""
    rng = random.Random(1106)
    rows = []
    for i in range(200):
        n = rng.randint(0, 6)
        arr = [
            None if rng.random() < 0.25 else rng.randint(-50, 50)
            for _ in range(n)
        ]
        rows.append((i, arr))
    spark.createDataFrame(
        rows, "i long, a array<int>"
    ).createOrReplaceTempView("amm_t")
    got = {
        r["i"]: (r["mx"], r["mn"])
        for r in spark.sql(
            translate("SELECT i, array_max(a) AS mx, array_min(a) AS mn FROM amm_t")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a INTEGER[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT i,
              CASE WHEN len(list_filter(a, x -> x IS NULL)) > 0 THEN NULL
                   ELSE list_max(a) END AS mx,
              CASE WHEN len(list_filter(a, x -> x IS NULL)) > 0 THEN NULL
                   ELSE list_min(a) END AS mn
            FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_listagg_random_differential(spark):
    """Randomized listagg sweep (x57's oracle covers the curated
    shape): random groups of short strings with NULLs and empties,
    multi-char and empty delimiters, ASC/DESC order — against
    DuckDB's string_agg with the same ORDER BY spelling.  Pins the
    Trino contract Spark's native listagg implements: NULL inputs
    skipped, delimiter joins remaining values, empty group → NULL."""
    rng = random.Random(1107)
    rows = []
    for i in range(240):
        g = rng.randint(0, 11)
        v = rng.choice(["a", "bb", "", "δx", "z,z", None, "q"])
        rows.append((i, g, v))
    spark.createDataFrame(
        rows, "i long, g int, v string"
    ).createOrReplaceTempView("lag_t")
    got = {
        r["g"]: (r["asc_j"], r["desc_j"])
        for r in spark.sql(
            translate(
                "SELECT g,"
                " listagg(v, '--') WITHIN GROUP (ORDER BY v) AS asc_j,"
                " listagg(v, '') WITHIN GROUP (ORDER BY v DESC) AS desc_j"
                " FROM lag_t GROUP BY g"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, g INTEGER, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT g,"
            " string_agg(v, '--' ORDER BY v) AS asc_j,"
            " string_agg(v, '' ORDER BY v DESC) AS desc_j"
            " FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want


def test_sequence_step_convention_differential(spark):
    """Pins sequence()'s month-stepping contract: Trino computes
    start + k*step (month-end clamping never ACCUMULATES — Jan 31
    +1 month steps land on 31sts again after February), and Spark's
    sequence implements the same convention.  The DuckDB oracle
    spells the contract directly as list_transform over k (its own
    generate_series accumulates prev+step, which WOULD diverge —
    exactly why the contract needs pinning)."""
    rng = random.Random(1108)
    rows = []
    for i in range(120):
        y, m = rng.randint(1990, 2030), rng.randint(1, 12)
        d = rng.choice([1, 28, 29, 30, 31])
        try:
            import datetime as dt

            start = dt.date(y, m, min(d, 28 if m == 2 else d))
        except ValueError:
            start = dt.date(y, m, 28)
        k = rng.randint(1, 8)
        rows.append((i, start, k))
    spark.createDataFrame(
        rows, "i long, start date, k int"
    ).createOrReplaceTempView("seq_t")
    got = {
        r["i"]: [str(x) for x in r["s"]]
        for r in spark.sql(
            translate(
                "SELECT i, sequence(start, start + k * INTERVAL '1' MONTH,"
                " INTERVAL '1' MONTH) AS s FROM seq_t"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, start DATE, k INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: [str(x) for x in r[1]]
        for r in con.execute(
            "SELECT i, list_transform(generate_series(0, k),"
            " j -> CAST(start + to_months(CAST(j AS INTEGER)) AS DATE))"
            " FROM t"
        ).fetchall()
    }
    assert got == want


def test_decimal_division_random_differential(spark):
    """Randomized decimal-division sweep vs an EXACT rational oracle
    (Python Fraction + half-away-from-zero at Trino's result scale
    max(s1, s2)): random signed decimals at scales 0-3 through the
    rewrite, compared as scaled integers.  Rows whose exact quotient
    sits within 1e-12 of a half boundary are excluded — the
    documented double-rounding residue band (Spark computes the
    quotient at its widened scale before the wrap re-rounds)."""
    from fractions import Fraction

    rng = random.Random(1109)
    rows, expect = [], {}
    i = 0
    while i < 220:
        sa, sb = rng.randint(0, 3), rng.randint(0, 3)
        a = rng.randint(-99999, 99999)
        b = rng.randint(1, 99999) * rng.choice([1, -1])
        fa, fb = Fraction(a, 10**sa), Fraction(b, 10**sb)
        s = max(sa, sb)
        q = fa / fb * 10**s
        # exclude the documented double-rounding boundary band: Spark's
        # widened-scale intermediate carries up to ~5e-13 relative
        # error, which is up to ~5e-10 in SCALED units at s=3
        if abs(q - (q.__floor__() + Fraction(1, 2))) < Fraction(1, 10**8):
            continue
        n, d = q.numerator, q.denominator
        sign = -1 if n < 0 else 1
        if sa == 0 and sb == 0:
            # integer/integer routes to the x47 div rewrite: Trino
            # integer division TRUNCATES toward zero, no decimal calculus
            scaled = sign * (abs(n) // d)
        else:
            scaled = sign * ((2 * abs(n) + d) // (2 * d))
        def _fmt(v, sc):
            if not sc:
                return str(v)
            av = abs(v)
            return f"{'-' if v < 0 else ''}{av // 10**sc}.{av % 10**sc:0{sc}d}"

        a_txt, b_txt = _fmt(a, sa), _fmt(b, sb)
        rows.append((i, a_txt, b_txt, s))
        expect[i] = scaled
        i += 1
    sel = " UNION ALL ".join(
        f"SELECT {i} AS i, CAST(({a}) / ({b}) * {10**s} AS BIGINT) AS v"
        for i, a, b, s in rows[:80]  # one Spark job, bounded plan size
    )
    got = {
        r["i"]: r["v"] for r in spark.sql(translate(sel)).collect()
    }
    want = {i: expect[i] for i, _, _, _ in rows[:80]}
    assert got == want


def test_bitwise_and_codec_random_differential(spark):
    """Randomized sweep over the bitwise/byte-codec families (the
    curated x14/x15 oracles cover fixed columns): random 64-bit
    values through shifts with Trino's ≥64 saturation semantics,
    and-or-xor, and hex/base64 round-trips, against DuckDB spellings
    of the same contracts (DuckDB's native shifts error past the
    type width, so the oracle reproduces the saturation with CASE)."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(1110)
    rows = []
    for i in range(200):
        a = rng.getrandbits(64) - (1 << 63)
        b = rng.getrandbits(64) - (1 << 63)
        s = rng.choice([0, 1, 7, 31, 32, 63, 64, 65, 100])
        txt = "".join(rng.choice("abcXYZ09 δ,") for _ in range(rng.randint(0, 12)))
        rows.append((i, a, b, s, txt))
    spark.createDataFrame(
        rows, "i long, a long, b long, s int, txt string"
    ).createOrReplaceTempView("bw_t")
    got = {
        r["i"]: (r["band"], r["bor"], r["bxor"], r["shl"], r["shr"],
                 r["hexrt"], r["b64rt"])
        for r in spark.sql(
            translate(
                "SELECT i, bitwise_and(a, b) AS band, bitwise_or(a, b) AS bor,"
                " bitwise_xor(a, b) AS bxor,"
                " bitwise_left_shift(a, s) AS shl,"
                " bitwise_right_shift(a, s) AS shr,"
                " from_utf8(from_hex(to_hex(to_utf8(txt)))) AS hexrt,"
                " from_utf8(from_base64(to_base64(to_utf8(txt)))) AS b64rt"
                " FROM bw_t"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (i BIGINT, a BIGINT, b BIGINT, s INTEGER, txt VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            """
            SELECT i, a & b, a | b, xor(a, b),
              CASE WHEN s >= 64 THEN 0
                   ELSE CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
                             THEN m - 18446744073709551616::HUGEINT
                             ELSE m END AS BIGINT) END,
              CASE WHEN s >= 64 THEN 0 WHEN s = 0 THEN a
                   ELSE CAST(ua // (1::HUGEINT << s) AS BIGINT) END,
              txt, txt
            FROM (
              SELECT *,
                (ua * (1::HUGEINT << CASE WHEN s >= 64 THEN 0 ELSE s END))
                  % 18446744073709551616::HUGEINT AS m
              FROM (
                SELECT *, CASE WHEN a < 0
                  THEN CAST(a AS HUGEINT) + 18446744073709551616::HUGEINT
                  ELSE CAST(a AS HUGEINT) END AS ua
                FROM t))
            """
        ).fetchall()
    }
    assert got == want


def test_interval_arithmetic_random_differential(spark):
    """Randomized sweep for datetime ± interval edges (round 12):
    dates/timestamps biased to month ends (day 28-31, leap and
    non-leap Februaries adjacent) through ±n MONTH/YEAR (month-end
    clamping), ±n DAY, and timestamp ±hours/minutes/seconds, against
    DuckDB evaluating the same arithmetic — both engines clamp
    year-month addition to the last day of the target month (as Trino
    does), so the comparison is exact.  DATE + whole-day hour
    intervals pin the round-12 DATE-typed result (Spark used to
    promote to TIMESTAMP; DuckDB's result is CAST to DATE in the
    oracle spelling)."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(1208)
    rows = []
    for i in range(220):
        y = rng.choice([2019, 2020, 2021, 2024, 1999])
        mth = rng.randint(1, 12)
        day = rng.choice([1, 15, 27, 28, 28, 29, 30, 31])
        import calendar
        day = min(day, calendar.monthrange(y, mth)[1])
        months = rng.randint(-30, 30)
        days = rng.randint(-70, 70)
        hours = rng.randint(-100, 100)
        secs = rng.randint(-100000, 100000)
        wdays = rng.randint(-5, 5) * 24
        rows.append((i, f"{y:04d}-{mth:02d}-{day:02d}", months, days,
                     hours, secs, wdays))
    sel = []
    for i, d, months, days, hours, secs, wdays in rows:
        sm = "+" if months >= 0 else "-"
        sd = "+" if days >= 0 else "-"
        sh = "+" if hours >= 0 else "-"
        ss = "+" if secs >= 0 else "-"
        sw = "+" if wdays >= 0 else "-"
        ts = f"TIMESTAMP '{d} 10:30:45'"
        sel.append(
            f"SELECT {i} AS i,"
            f" DATE '{d}' {sm} INTERVAL '{abs(months)}' MONTH AS dm,"
            f" DATE '{d}' {sd} INTERVAL '{abs(days)}' DAY AS dd,"
            f" DATE '{d}' {sw} INTERVAL '{abs(wdays)}' HOUR AS dwh,"
            f" {ts} {sm} INTERVAL '{abs(months)}' MONTH AS tm,"
            f" {ts} {sm} INTERVAL '{abs(months) % 10}' YEAR AS ty,"
            f" {ts} {sh} INTERVAL '{abs(hours)}' HOUR AS th,"
            f" {ts} {ss} INTERVAL '{abs(secs)}' SECOND AS tsec"
        )
        if len(sel) >= 220:
            break
    q = " UNION ALL ".join(sel)
    got = {
        r["i"]: (r["dm"], r["dd"], r["dwh"], r["tm"], r["ty"], r["th"], r["tsec"])
        for r in spark.sql(translate(q)).collect()
    }
    con = duckdb.connect()
    want = {}
    for i, d, months, days, hours, secs, wdays in rows:
        r = con.execute(
            f"""
            SELECT CAST(DATE '{d}' + ({months}) * INTERVAL 1 MONTH AS DATE),
                   CAST(DATE '{d}' + ({days}) * INTERVAL 1 DAY AS DATE),
                   CAST(DATE '{d}' + ({wdays}) * INTERVAL 1 HOUR AS DATE),
                   TIMESTAMP '{d} 10:30:45' + ({months}) * INTERVAL 1 MONTH,
                   TIMESTAMP '{d} 10:30:45' + (({months}) % 10) * INTERVAL 1 YEAR,
                   TIMESTAMP '{d} 10:30:45' + ({hours}) * INTERVAL 1 HOUR,
                   TIMESTAMP '{d} 10:30:45' + ({secs}) * INTERVAL 1 SECOND
            """
        ).fetchone()
        want[i] = tuple(r)
    mism = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not mism, dict(list(mism.items())[:3])


def _simple_upper_ref(s):
    # Java Character.toUpperCase: UnicodeData's SIMPLE uppercase — when
    # the full mapping is multi-char, the simple one is the single
    # TITLECASE capital if Unicode defines one (the ypogegrammeni
    # letters: ᾳ → ᾼ), else identity (ß, ligatures)
    out = []
    for ch in s:
        u = ch.upper()
        if len(u) == 1:
            out.append(u)
        else:
            t = ch.title()
            out.append(t if len(t) == 1 else ch)
    return "".join(out)


def _simple_lower_ref(s):
    # per-code-point: no Final_Sigma conditional (Σ → σ always), İ's
    # simple lowercase is the bare i
    out = []
    for ch in s:
        if ch == "İ":
            out.append("i")
            continue
        if ch == "Σ":
            out.append("σ")
            continue
        l = ch.lower()
        out.append(l if len(l) == 1 else ch)
    return "".join(out)


def _lev_ref(a, b):
    # codepoint-level DP — Trino's levenshtein_distance contract
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_unicode_string_random_differential(spark):
    """Randomized sweep for code-point string semantics (round 12):
    strings mixing ASCII, combining marks, non-BMP emoji (surrogate
    pairs in UTF-16 engines), ß/İ/ﬁ case-mapping divergents, through
    length/substr/strpos/reverse/lpad (DuckDB oracle — code-point
    reverse spelled independently via regexp_extract_all +
    list_reverse), upper/lower (Python simple-mapping reference:
    Trino's 1:1 Character.toUpperCase contract), and
    levenshtein_distance (code-point DP reference; DuckDB's builtin
    is byte-based and would be WRONG here — the sweep that caught
    it)."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(1209)
    ALPHA = ["a", "b", "Z", " ", "ß", "İ", "ﬁ", "é", "é",
             "\U0001F600", "é", "δ", "STRASSE", "straße", "ı",
             "Σ", "ΒΑΣ ΒΑΣ", "ᾳ", "ᾈ", "ῌ"]
    rows = []
    for i in range(200):
        s = "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 8)))
        t = "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 5)))
        start = rng.randint(-3, 6)
        ln = rng.randint(0, 5)
        rows.append((i, s, t, start if start != 0 else 1, ln))
    spark.createDataFrame(
        rows, "i long, s string, t string, p int, l int"
    ).createOrReplaceTempView("uni_t")
    got = {
        r["i"]: (r["ln"], r["sub"], r["pos"], r["rev"], r["up"], r["lo"],
                 r["lev"], r["lp"])
        for r in spark.sql(
            translate(
                "SELECT i, length(s) AS ln, substr(s, p, l) AS sub,"
                " strpos(s, t) AS pos, reverse(s) AS rev,"
                " upper(s) AS up, lower(s) AS lo,"
                " levenshtein_distance(s, t) AS lev,"
                " lpad(s, 6, '*') AS lp"
                " FROM uni_t"
            )
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR, t VARCHAR, p INT, l INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)",
                    [r[:5] for r in rows])
    duck = {
        r[0]: r[1:]
        for r in con.execute(
            """
            SELECT i, length(s),
                   CASE WHEN p < 0 AND length(s) < -p THEN ''
                        ELSE substr(s, p, l) END,
                   strpos(s, t),
                   coalesce(array_to_string(list_reverse(regexp_extract_all(s, '.')), ''), ''),
                   lpad(s, 6, '*')
            FROM t
            """
        ).fetchall()
    }
    mism = []
    for i, s, t, p, l in rows:
        want = (
            duck[i][0], duck[i][1], duck[i][2], duck[i][3],
            _simple_upper_ref(s), _simple_lower_ref(s),
            _lev_ref(s, t), duck[i][4],
        )
        if got[i] != want:
            mism.append((i, s, t, got[i], want))
    assert not mism, mism[:3]


def _trino_stat_ref(pairs):
    """Independent Python reference for Trino's statistical-aggregate
    edge contracts (DoubleCorrelationAggregation /
    DoubleRegressionAggregation / CovarianceAggregation /
    VarianceAggregation): two-pass central moments, then
    isFinite-else-NULL gates on corr/regr_* and count gates on the
    sample aggregates (no finite gate there — NaN propagates)."""
    import math

    pts = [(x, y) for x, y in pairs if x is not None and y is not None]
    n = len(pts)
    keys = ("corr", "slope", "intercept", "covar_samp", "covar_pop",
            "stddev_samp_x")
    # stddev_samp(x) is a one-column aggregate: it skips only x's own
    # NULLs, not pairwise like the two-column moments
    xs_own = [x for x, _ in pairs if x is not None]
    stddev_own = None
    if len(xs_own) > 1:
        mo = math.fsum(xs_own) / len(xs_own)
        m2o = math.fsum((x - mo) ** 2 for x in xs_own)
        stddev_own = math.sqrt(m2o / (len(xs_own) - 1)) if m2o >= 0 else float("nan")
    if n == 0:
        out = dict.fromkeys(keys)
        out["stddev_samp_x"] = stddev_own
        return out
    def fsum(vals):
        # math.fsum raises on -inf + inf; IEEE doubles (what both
        # engines accumulate in) say NaN
        try:
            return math.fsum(vals)
        except ValueError:
            return float("nan")

    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    # constant columns must yield EXACTLY zero central moments: the
    # engines' Welford-style updates keep m2 == 0 for identical values
    # (mean stays the value bit-exactly), while a two-pass mean can be
    # 1 ulp off the constant and manufacture epsilon variance — the
    # alternate-seed hunt caught the reference disagreeing with BOTH
    # engines on constant groups (NULL vs a tiny arbitrary ratio)
    mx = xs[0] if all(x == xs[0] for x in xs) else fsum(xs) / n
    my = ys[0] if all(y == ys[0] for y in ys) else fsum(ys) / n
    m2x = fsum((x - mx) ** 2 for x in xs)
    m2y = fsum((y - my) ** 2 for y in ys)
    mxy = fsum((x - mx) * (y - my) for x, y in pts)

    def fdiv(num, den):
        if den == 0:
            return float("nan")
        return num / den

    def gate(v):
        return v if math.isfinite(v) else None

    corr = gate(fdiv(mxy, math.sqrt(m2x * m2y) if m2x * m2y >= 0 else
                     float("nan")))
    slope = fdiv(mxy, m2x)
    return {
        "corr": corr,
        "slope": gate(slope),
        "intercept": gate(my - slope * mx),
        "covar_samp": None if n <= 1 else mxy / (n - 1),
        "covar_pop": mxy / n,
        "stddev_samp_x": stddev_own,
    }


def _stat_close(got, want):
    import math

    if got is None or want is None:
        return got is None and want is None
    if math.isnan(got) or math.isnan(want):
        return math.isnan(got) and math.isnan(want)
    return math.isclose(got, want, rel_tol=1e-7, abs_tol=1e-9)


def test_stat_agg_edges_random_differential(spark):
    """Randomized sweep for the x64 closure (_rewrite_stat_agg_edges):
    constant-x, constant-y, single-row, NaN/±Inf-bearing and normal
    groups through translated corr/regr_slope/regr_intercept (plus the
    untouched covar/stddev family), against the Python reference of
    Trino's isFinite-else-NULL output gates.  Without the rewrite the
    constant groups RAISE under ANSI mode and the NaN groups return NaN
    where Trino returns NULL."""
    rng = random.Random(913)
    specials = [float("nan"), float("inf"), float("-inf")]
    rows, groups = [], {}
    g = 0
    for kind in ("const_x", "const_y", "single", "nan_x", "inf_y",
                 "normal", "normal", "mixed_null"):
        for _ in range(8):
            g += 1
            size = 1 if kind == "single" else rng.randint(2, 6)
            cx = rng.uniform(-50, 50)
            pairs = []
            for j in range(size):
                x = cx if kind == "const_x" else rng.uniform(-100, 100)
                y = cx if kind == "const_y" else rng.uniform(-100, 100)
                if kind == "nan_x" and j == 0:
                    x = float("nan")
                if kind == "inf_y" and j == 0:
                    y = rng.choice(specials[1:])
                if kind == "mixed_null" and rng.random() < 0.4:
                    if rng.random() < 0.5:
                        x = None
                    else:
                        y = None
                pairs.append((x, y))
            groups[g] = pairs
            rows.extend((g, x, y) for x, y in pairs)
    df = spark.createDataFrame(rows, "g int, x double, y double")
    df.createOrReplaceTempView("statdiff_t")
    got = {
        r["g"]: r
        for r in spark.sql(
            translate(
                "SELECT g, corr(x, y) AS corr,"
                " regr_slope(y, x) AS slope,"
                " regr_intercept(y, x) AS intercept,"
                " covar_samp(x, y) AS covar_samp,"
                " covar_pop(x, y) AS covar_pop,"
                " stddev_samp(x) AS stddev_samp_x"
                " FROM statdiff_t GROUP BY g"
            )
        ).collect()
    }
    bad = []
    for gid, pairs in groups.items():
        want = _trino_stat_ref(pairs)
        if gid not in got:
            # all-null group keys still aggregate; must be present
            bad.append((gid, "missing row", None, None))
            continue
        for k, w in want.items():
            if not _stat_close(got[gid][k], w):
                bad.append((gid, k, got[gid][k], w))
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def _trino_arr_cmp_ref(a, b, op):
    """Independent Python reference for Trino's array comparisons:
    three-valued equality (ArrayEqualOperator), lexicographic ordering
    with checkElementNotNull at visited positions ('THROW') and a
    length tiebreak (ArrayOperators)."""
    if a is None or b is None:
        return None
    if op in ("=", "<>"):
        if len(a) != len(b):
            eq = False
        else:
            unknown, eq = False, True
            for x, y in zip(a, b):
                if x is None or y is None:
                    unknown = True
                elif x != y:
                    eq = False
                    break
            else:
                if unknown:
                    eq = None
        if op == "=":
            return eq
        return None if eq is None else (not eq)
    for x, y in zip(a, b):
        if x is None or y is None:
            return "THROW"
        if x != y:
            return {"<": x < y, "<=": x < y, ">": x > y, ">=": x > y}[op]
    la, lb = len(a), len(b)
    return {"<": la < lb, "<=": la <= lb, ">": la > lb, ">=": la >= lb}[op]


def _arr_sql(a):
    if a is None:
        return "CAST(NULL AS ARRAY(INTEGER))"
    if not a:
        return "CAST(ARRAY[] AS ARRAY(INTEGER))"
    return "ARRAY[" + ", ".join("NULL" if v is None else str(v) for v in a) + "]"


def test_array_comparison_random_differential(spark):
    """Randomized sweep for the x65 closure
    (_rewrite_array_comparisons): random int arrays with nulls at
    arbitrary positions, lengths 0-4, both whole-array NULLs, through
    all six comparison operators — value cases batched in one job
    against the Python reference of Trino's contract; a sample of the
    expected-THROW cases asserted to raise Trino's message."""
    rng = random.Random(914)

    def rand_arr():
        r = rng.random()
        if r < 0.06:
            return None
        n = rng.randint(0, 4)
        return [None if rng.random() < 0.25 else rng.randint(0, 3)
                for _ in range(n)]

    ops = ["=", "<>", "<", "<=", ">", ">="]
    cases = []
    for i in range(240):
        a, b = rand_arr(), rand_arr()
        if rng.random() < 0.3 and a is not None:
            b = list(a)  # equal / shared-prefix pressure
            if b and rng.random() < 0.5:
                b[rng.randrange(len(b))] = rng.randint(0, 3)
        cases.append((i, a, b, ops[i % len(ops)]))
    value_cases = []
    throw_cases = []
    for i, a, b, op in cases:
        want = _trino_arr_cmp_ref(a, b, op)
        (throw_cases if want == "THROW" else value_cases).append(
            (i, a, b, op, want)
        )
    assert len(throw_cases) >= 10  # the seed must exercise the raise path

    got = {}
    # chunked: every comparison expands ~15× in the rewrite, and the
    # CAST-pass family rescans per hit — 60-arm batches keep each
    # translate comfortably inside its deadline
    for lo in range(0, len(value_cases), 60):
        sql = " UNION ALL ".join(
            f"SELECT {i} AS i, {_arr_sql(a)} {op} {_arr_sql(b)} AS v"
            for i, a, b, op, _ in value_cases[lo : lo + 60]
        )
        got.update(
            {r["i"]: r["v"] for r in spark.sql(translate(sql)).collect()}
        )
    bad = [
        (i, op, a, b, got[i], want)
        for i, a, b, op, want in value_cases
        if got[i] != want
    ]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"

    for i, a, b, op, _ in rng.sample(throw_cases, 4):
        with pytest.raises(Exception, match="ARRAY comparison not supported"):
            spark.sql(
                translate(f"SELECT {_arr_sql(a)} {op} {_arr_sql(b)} AS v")
            ).collect()


def _trino_row_cmp_ref(a, b, op):
    """Python reference for Trino's ROW comparisons: three-valued
    equality (RowEqualOperator), field-ordered comparison with
    checkFieldNotNull ('THROW') and operator reflexivity on all-equal
    (RowComparisonOperators)."""
    if op in ("=", "<>"):
        unknown, eq = False, True
        for x, y in zip(a, b):
            if x is None or y is None:
                unknown = True
            elif x != y:
                eq = False
                break
        else:
            if unknown:
                eq = None
        if op == "=":
            return eq
        return None if eq is None else (not eq)
    for x, y in zip(a, b):
        if x is None or y is None:
            return "THROW"
        if x != y:
            return {"<": x < y, "<=": x < y, ">": x > y, ">=": x > y}[op]
    return op in ("<=", ">=")


def _row_sql(t):
    return "ROW(" + ", ".join(
        "NULL" if v is None else str(v) for v in t
    ) + ")"


def test_row_comparison_random_differential(spark):
    """Randomized sweep for the x66 closure: random 1-4 field integer
    rows with nulls through all six operators — value cases batched
    against the Python reference; a sample of the expected-THROW cases
    asserted to raise Trino's message.  Alternating spellings exercise
    the constructor-destructure and named_struct accessor paths."""
    rng = random.Random(915)
    ops = ["=", "<>", "<", "<=", ">", ">="]
    cases = []
    for i in range(180):
        nf = rng.randint(1, 4)
        a = tuple(None if rng.random() < 0.25 else rng.randint(0, 3)
                  for _ in range(nf))
        b = list(a) if rng.random() < 0.4 else [
            None if rng.random() < 0.25 else rng.randint(0, 3)
            for _ in range(nf)
        ]
        if list(a) == list(b) and rng.random() < 0.5 and nf:
            b[rng.randrange(nf)] = rng.randint(0, 3)
        cases.append((i, a, tuple(b), ops[i % len(ops)]))
    value_cases, throw_cases = [], []
    for i, a, b, op in cases:
        want = _trino_row_cmp_ref(a, b, op)
        (throw_cases if want == "THROW" else value_cases).append(
            (i, a, b, op, want)
        )
    assert len(throw_cases) >= 10

    def spell(t, named):
        if not named:
            return _row_sql(t)
        return "named_struct(" + ", ".join(
            f"'f{j}', " + ("CAST(NULL AS INTEGER)" if v is None else str(v))
            for j, v in enumerate(t)
        ) + ")"

    got = {}
    for lo in range(0, len(value_cases), 60):
        sql = " UNION ALL ".join(
            f"SELECT {i} AS i, {spell(a, i % 2 == 1)} {op}"
            f" {spell(b, i % 2 == 1)} AS v"
            for i, a, b, op, _ in value_cases[lo : lo + 60]
        )
        got.update(
            {r["i"]: r["v"] for r in spark.sql(translate(sql)).collect()}
        )
    bad = [
        (i, op, a, b, got[i], want)
        for i, a, b, op, want in value_cases
        if got[i] != want
    ]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"

    for i, a, b, op, _ in rng.sample(throw_cases, 4):
        with pytest.raises(Exception, match="ROW comparison not supported"):
            spark.sql(
                translate(f"SELECT {_row_sql(a)} {op} {_row_sql(b)} AS v")
            ).collect()


def _trino_map_eq_ref(a, b):
    """Python reference for Trino's MapEqualOperator: key-set based,
    three-valued over values."""
    if a is None or b is None:
        return None
    if len(a) != len(b) or set(a) != set(b):
        return False
    unknown = False
    for k, v in a.items():
        w = b[k]
        if v is None or w is None:
            unknown = True
        elif v != w:
            return False
    return None if unknown else True


def test_map_equality_random_differential(spark):
    """Randomized sweep for the x67 closure: random int→int maps with
    null values through =/<> (Spark natively ERRORS on any map
    comparison, so every case exercises the rewrite), against the
    Python reference of Trino's key-set three-valued contract."""
    rng = random.Random(916)

    def rand_map():
        if rng.random() < 0.06:
            return None
        keys = rng.sample(range(5), rng.randint(0, 4))
        return {k: (None if rng.random() < 0.3 else rng.randint(0, 2))
                for k in keys}

    def map_sql(m):
        if m is None:
            return "CAST(NULL AS MAP(INTEGER, INTEGER))"
        if not m:
            return "map_from_arrays(CAST(ARRAY[] AS ARRAY(INTEGER)),"\
                   " CAST(ARRAY[] AS ARRAY(INTEGER)))"
        ks = ", ".join(str(k) for k in m)
        vs = ", ".join("CAST(NULL AS INTEGER)" if v is None else str(v)
                       for v in m.values())
        return f"MAP(ARRAY[{ks}], ARRAY[{vs}])"

    cases = []
    for i in range(180):
        a = rand_map()
        if rng.random() < 0.45 and a is not None:
            b = dict(a)  # equal / near-equal pressure
            if b and rng.random() < 0.6:
                k = rng.choice(list(b))
                if rng.random() < 0.5:
                    b[k] = rng.randint(0, 2)
                else:
                    del b[k]
            if rng.random() < 0.3:
                b = dict(reversed(list(b.items())))  # order-insensitivity
        else:
            b = rand_map()
        cases.append((i, a, b, "=" if i % 2 else "<>"))

    got = {}
    for lo in range(0, len(cases), 60):
        sql = " UNION ALL ".join(
            f"SELECT {i} AS i, {map_sql(a)} {op} {map_sql(b)} AS v"
            for i, a, b, op in cases[lo : lo + 60]
        )
        got.update(
            {r["i"]: r["v"] for r in spark.sql(translate(sql)).collect()}
        )
    bad = []
    for i, a, b, op in cases:
        want = _trino_map_eq_ref(a, b)
        if op == "<>" and want is not None:
            want = not want
        if got[i] != want:
            bad.append((i, op, a, b, got[i], want))
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_array_membership_random_differential(spark):
    """Convergence sweep over the array membership/search family —
    contains (Trino spelling → array_contains), arrays_overlap, and
    array_position's not-found-0 / NULL-probe contracts.  Both
    engines PUBLISH the same three-valued membership rule (found →
    true; not found with null elements → NULL; else false — the SQL
    IN semantics), so this sweep is expected to come back EMPTY
    against the Python reference of that shared contract: it exists
    to pin the agreement (a regression in either the translate
    mapping or a Spark upgrade shows up here first).  Known
    out-of-scope corner: array_position over arrays WITH null
    elements and a missing probe (no public Trino pin available
    in-sandbox; Spark returns 0)."""
    rng = random.Random(917)

    def rand_arr():
        if rng.random() < 0.05:
            return None
        return [None if rng.random() < 0.25 else rng.randint(0, 3)
                for _ in range(rng.randint(0, 5))]

    def ref_contains(arr, x):
        if arr is None or x is None:
            return None
        if x in [e for e in arr if e is not None]:
            return True
        return None if any(e is None for e in arr) else False

    def ref_overlap(a, b):
        if a is None or b is None:
            return None
        av = {e for e in a if e is not None}
        bv = {e for e in b if e is not None}
        if av & bv:
            return True
        has_null = any(e is None for e in a) or any(e is None for e in b)
        # SQL quantified-IN shape: an empty side decides FALSE even
        # with nulls on the other side (no pair can match)
        if not a or not b:
            return False
        return None if has_null else False

    def ref_position(arr, x):
        # only null-free arrays and non-null probes enter this branch
        if arr is None or x is None:
            return None
        return arr.index(x) + 1 if x in arr else 0

    cases = []
    for i in range(200):
        a, b = rand_arr(), rand_arr()
        x = None if rng.random() < 0.15 else rng.randint(0, 3)
        cases.append((i, a, b, x))

    def arr_sql(a):
        if a is None:
            return "CAST(NULL AS ARRAY(INTEGER))"
        if not a:
            return "CAST(ARRAY[] AS ARRAY(INTEGER))"
        return "ARRAY[" + ", ".join(
            "NULL" if v is None else str(v) for v in a
        ) + "]"

    def x_sql(x):
        return "CAST(NULL AS INTEGER)" if x is None else str(x)

    got = {}
    for lo in range(0, len(cases), 100):
        sql = " UNION ALL ".join(
            f"SELECT {i} AS i,"
            f" contains({arr_sql(a)}, {x_sql(x)}) AS c,"
            f" arrays_overlap({arr_sql(a)}, {arr_sql(b)}) AS o,"
            + (
                f" array_position({arr_sql(a)}, {x_sql(x)}) AS p"
                if a is not None and None not in a and x is not None
                else " CAST(NULL AS BIGINT) AS p"
            )
            for i, a, b, x in cases[lo : lo + 100]
        )
        got.update({r["i"]: r for r in spark.sql(translate(sql)).collect()})
    bad = []
    for i, a, b, x in cases:
        r = got[i]
        if r["c"] != ref_contains(a, x):
            bad.append(("contains", i, a, x, r["c"], ref_contains(a, x)))
        if r["o"] != ref_overlap(a, b):
            bad.append(("overlap", i, a, b, r["o"], ref_overlap(a, b)))
        if a is not None and None not in a and x is not None:
            if r["p"] != ref_position(a, x):
                bad.append(("position", i, a, x, r["p"], ref_position(a, x)))
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_array_in_list_random_differential(spark):
    """Randomized sweep for the IN-list closure
    (_rewrite_array_in_lists): random null-bearing arrays against
    random 1-3 item IN lists, IN and NOT IN, vs the Python reference
    of Trino's chained three-valued equality."""
    rng = random.Random(918)

    def rand_arr():
        return [None if rng.random() < 0.25 else rng.randint(0, 2)
                for _ in range(rng.randint(0, 3))]

    def ref_in(a, items, neg):
        eqs = [_trino_arr_cmp_ref(a, it, "=") for it in items]
        if True in eqs:
            v = True
        elif None in eqs:
            v = None
        else:
            v = False
        if neg:
            return None if v is None else (not v)
        return v

    cases = []
    for i in range(150):
        a = rand_arr()
        items = [
            list(a) if rng.random() < 0.4 else rand_arr()
            for _ in range(rng.randint(1, 3))
        ]
        cases.append((i, a, items, i % 3 == 0))

    got = {}
    for lo in range(0, len(cases), 50):
        sql = " UNION ALL ".join(
            f"SELECT {i} AS i, {_arr_sql(a)}"
            f" {'NOT IN' if neg else 'IN'}"
            f" ({', '.join(_arr_sql(it) for it in items)}) AS v"
            for i, a, items, neg in cases[lo : lo + 50]
        )
        got.update(
            {r["i"]: r["v"] for r in spark.sql(translate(sql)).collect()}
        )
    bad = [
        (i, a, items, neg, got[i], ref_in(a, items, neg))
        for i, a, items, neg in cases
        if got[i] != ref_in(a, items, neg)
    ]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def _trino_decimal_avg_ref(vals, scale):
    """Trino DecimalAverageAggregation: exact rational mean, HALF_UP
    away from zero at the INPUT scale, as a scaled integer (None on
    the empty/all-NULL group)."""
    from fractions import Fraction

    xs = [v for v in vals if v is not None]
    if not xs:
        return None
    q = Fraction(sum(xs), len(xs))  # vals pre-scaled: units of 10^-scale
    sign = -1 if q < 0 else 1
    n, d = abs(q.numerator), q.denominator
    return sign * ((2 * n + d) // (2 * d))


def test_decimal_avg_random_differential(spark):
    """Randomized sweep of the decimal-average closure
    (_rewrite_decimal_avg) vs an EXACT rational reference: random
    signed scale-2 decimals in random-sized groups (with NULLs),
    through the translated avg at DECIMAL(12,2), compared as scaled
    integers.  The r14 version EXCLUDED means near half boundaries
    (the CAST wrap's double-rounding band); the r15 exact integer
    protocol removed the band, so boundary-adjacent groups now stay
    in the sweep."""
    rng = random.Random(1401)
    rows, expect = [], {}
    g = 0
    while g < 60:
        n = rng.randint(1, 7)
        vals = [
            None if rng.random() < 0.15 else rng.randint(-99999, 99999)
            for _ in range(n)
        ]
        expect[g] = _trino_decimal_avg_ref(vals, 2)
        for v in vals:
            rows.append((g, None if v is None else f"{v / 100:.2f}"))
        g += 1
    spark.createDataFrame(rows, "g int, v string").createOrReplaceTempView(
        "avg_t"
    )
    got = {
        r["g"]: r["v"]
        for r in spark.sql(
            translate(
                "SELECT g, CAST(avg(CAST(v AS DECIMAL(12,2))) * 100"
                " AS BIGINT) AS v FROM avg_t GROUP BY g"
            )
        ).collect()
    }
    assert got == expect


def test_decimal_avg_half_boundary_sweep(spark):
    """VERDICT r14 #4: the x71 double-rounding band, swept head-on.
    The r14 CAST wrap computed the mean at Spark's widened s+4 scale
    first, so an exact mean in [b - 0.5*10^-(s+4), b) just below a
    half boundary b rounded UP through the intermediate — REAL and
    constructible (group 3 below: 20 000 values summing 99.99 at
    scale 2 have exact mean 0.0049995 dollars; the wrap said 0.01,
    Trino says 0.00).  The r15 exact integer protocol rounds ONCE, so
    every group here — exact halves, band-edge means, means just
    inside and outside the former window, both signs — must match the
    Fraction-exact HALF_UP reference with no exclusions."""
    big = 20000
    groups = {
        1: [1, 2],                            # exact half, positive
        2: [-1, -2],                          # exact half, negative
        3: [9999] + [0] * (big - 1),          # 0.49995c: in-band edge
        4: [-9999] + [0] * (big - 1),         # negative band edge
        5: [10001] + [0] * (big - 1),         # just past the boundary
        6: [9998] + [0] * (big - 1),          # below the band: 0.4999c
        7: [1, 1, 2],                         # repeating third
        8: [6 * 7 + 3] + [0] * 5,             # n=6 exact half: 7.5c
        9: [None, 1, 2],                      # NULL inside the group
    }
    rows = []
    for g, vals in groups.items():
        for v in vals:
            rows.append((g, None if v is None else f"{v / 100:.2f}"))
    expect = {g: _trino_decimal_avg_ref(vals, 2) for g, vals in groups.items()}
    spark.createDataFrame(rows, "g int, v string").createOrReplaceTempView(
        "avg_band_t"
    )
    got = {
        r["g"]: r["v"]
        for r in spark.sql(
            translate(
                "SELECT g, CAST(avg(CAST(v AS DECIMAL(12,2))) * 100"
                " AS BIGINT) AS v FROM avg_band_t GROUP BY g"
            )
        ).collect()
    }
    assert got == expect
    spark.catalog.dropTempView("avg_band_t")


def test_range_frame_null_keys_random_differential(spark):
    """Randomized sweep of window-frame boundary semantics over NULL
    sort keys (the r14 family VERDICT r13 #4b): random int-or-NULL
    keys through RANGE offset frames (both directions, mixed bounds),
    ROWS and GROUPS frames, with sum/count/min/avg measures, vs DuckDB
    spelling Trino's null placement explicitly.  NULL keys must form
    one peer group whose RANGE frame is exactly its peers; empty
    frames must yield NULL sums, not 0.  NaN/Infinity keys stay out:
    frame-bound arithmetic over non-finite keys has no
    reference-exact contract (documented residue)."""
    rng = random.Random(1402)
    rows = []
    for i in range(150):
        rows.append(
            (
                i,
                rng.randint(0, 2),
                None if rng.random() < 0.22 else rng.randint(0, 15),
                rng.randint(-50, 50),
            )
        )
    spark.createDataFrame(
        rows, "i int, p int, k int, v int"
    ).createOrReplaceTempView("wf_t")

    specs = []
    for j in range(10):
        lo, hi = sorted((rng.randint(0, 4), rng.randint(0, 4)))
        direction = rng.choice(["ASC", "DESC"])
        # GROUPS stays out: DuckDB doesn't implement it, and spelling
        # the reference as RANGE-over-dense_rank would mirror the
        # engine's own rewrite (no longer a differential); the w12/x30
        # oracles certify GROUPS against pinned values instead.
        kind = rng.choice(["RANGE", "ROWS"])
        bound = rng.choice(
            [
                f"BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
                f"BETWEEN UNBOUNDED PRECEDING AND {hi} FOLLOWING",
                f"BETWEEN {lo} PRECEDING AND CURRENT ROW",
                f"BETWEEN {lo + 1} FOLLOWING AND {lo + 3} FOLLOWING",
            ]
        )
        agg = rng.choice(["sum(v)", "count(v)", "min(v)", "count(*)"])
        specs.append((j, agg, direction, kind, bound))

    trino_cols = ", ".join(
        f"{agg} OVER (PARTITION BY p ORDER BY k {d} {kind} {b}) AS c{j}"
        for j, agg, d, kind, b in specs
    )
    # Trino defaults made explicit for DuckDB (ASC → NULLS LAST,
    # DESC → NULLS FIRST — the x34 contract the translator injects)
    duck_cols = ", ".join(
        "{} OVER (PARTITION BY p ORDER BY k {} {} {} {}) AS c{}".format(
            agg, d, "NULLS LAST" if d == "ASC" else "NULLS FIRST", kind, b, j
        )
        for j, agg, d, kind, b in specs
    )
    got = {
        r["i"]: tuple(r[f"c{j}"] for j, *_ in specs)
        for r in spark.sql(
            translate(f"SELECT i, {trino_cols} FROM wf_t")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE wf_t (i INT, p INT, k INT, v INT)")
    con.executemany("INSERT INTO wf_t VALUES (?,?,?,?)", rows)
    want = {
        r[0]: tuple(
            int(x) if x is not None and isinstance(x, (int, float)) else x
            for x in r[1:]
        )
        for r in con.execute(f"SELECT i, {duck_cols} FROM wf_t").fetchall()
    }
    mism = {
        i: (got[i], want[i]) for i in want if got[i] != want[i]
    }
    assert not mism, f"{len(mism)} divergent rows, e.g. {list(mism.items())[:3]}"


_DT_UNITS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}
_YM_UNITS = {"MONTH": 1, "YEAR": 12}


def test_interval_comparison_random_differential(spark):
    """Randomized sweep of interval COMPARISON contexts (the r14
    family VERDICT r13 #4c — the x61 machinery stops at arithmetic):
    random day-time and year-month interval literals through =, <>,
    ordering, BETWEEN, IN lists, simple CASE and nullif, against an
    exact integer reference (seconds / months).  Cross-kind
    comparisons (day-time vs year-month) are type errors in BOTH
    engines — loud parity, excluded.  All literal-driven: one Spark
    job, no DuckDB (DuckDB's INTERVAL is a mixed month/day/micros
    struct with its own comparison rules — not the Trino contract)."""
    rng = random.Random(1403)
    exprs, expect = [], {}
    i = 0
    while i < 90:
        ym = rng.random() < 0.4
        units = _YM_UNITS if ym else _DT_UNITS
        u1, u2 = rng.choice(list(units)), rng.choice(list(units))
        n1, n2 = rng.randint(0, 72), rng.randint(0, 72)
        a, b = n1 * units[u1], n2 * units[u2]
        lit1 = f"INTERVAL '{n1}' {u1}"
        lit2 = f"INTERVAL '{n2}' {u2}"
        ctx = rng.choice(["eq", "ne", "lt", "between", "in", "case", "nullif"])
        if ctx == "eq":
            exprs.append(f"{lit1} = {lit2}")
            expect[i] = a == b
        elif ctx == "ne":
            exprs.append(f"{lit1} <> {lit2}")
            expect[i] = a != b
        elif ctx == "lt":
            exprs.append(f"{lit1} < {lit2}")
            expect[i] = a < b
        elif ctx == "between":
            hi = f"INTERVAL '{n2 + 5}' {u2}"
            exprs.append(f"{lit1} BETWEEN {lit2} AND {hi}")
            expect[i] = b <= a <= (n2 + 5) * units[u2]
        elif ctx == "in":
            exprs.append(f"{lit1} IN ({lit2}, INTERVAL '1' {u1})")
            expect[i] = a == b or n1 == 1
        elif ctx == "case":
            exprs.append(
                f"CASE {lit1} WHEN {lit2} THEN true ELSE false END"
            )
            expect[i] = a == b
        else:
            exprs.append(f"nullif({lit1}, {lit2}) IS NULL")
            expect[i] = a == b
        i += 1
    sel = " UNION ALL ".join(
        f"SELECT {j} AS i, ({e}) AS v" for j, e in enumerate(exprs)
    )
    got = {r["i"]: r["v"] for r in spark.sql(translate(sel)).collect()}
    mism = {j: (got[j], expect[j]) for j in expect if got[j] != expect[j]}
    assert not mism, f"{len(mism)} divergent, e.g. {list(mism.items())[:4]}"


def _gen_shape(rng, depth, leaves=("num",)):
    """``leaves`` (r15, VERDICT r14 #6): which scalar leaf TYPES the
    shape may bottom out in — "num" (int, NaN-double 12%), "dec"
    (DECIMAL literals — fresh engine-side rewrites this round), and
    "interval" (day-time intervals).  A container's element leaves
    share one kind so the rendered literal types consistently."""
    kinds = ["scalar"] * 2 + (["array", "struct", "map"] if depth > 0 else [])
    k = rng.choice(kinds)
    if k == "scalar":
        lk = rng.choice(leaves)
        return None if lk == "num" else (lk,)
    if k == "array":
        return ("array", _gen_shape(rng, depth - 1, leaves))
    if k == "map":
        return ("map", _gen_shape(rng, depth - 1, leaves))
    return (
        "struct",
        [_gen_shape(rng, depth - 1, leaves) for _ in range(rng.randint(1, 3))],
    )


def _gen_value(rng, shape, top=False):
    if not top and rng.random() < 0.18:
        return None
    if shape is None:
        # x74: NaN leaves — nested element equality is IEEE in Trino
        # (a NaN pair decides FALSE where Spark's x = y said equal)
        if rng.random() < 0.12:
            return float("nan")
        return rng.randint(0, 3)
    kind = shape[0]
    if kind == "dec":
        from decimal import Decimal

        return Decimal(rng.randint(-250, 250)) / 100
    if kind == "interval":
        return rng.randint(0, 4)
    if kind == "array":
        return [_gen_value(rng, shape[1]) for _ in range(rng.randint(0, 3))]
    if kind == "map":
        keys = rng.sample([1, 2, 3, 4], rng.randint(0, 3))
        return {k: _gen_value(rng, shape[1]) for k in sorted(keys)}
    return tuple(_gen_value(rng, s) for s in shape[1])


def _render_trino(v, shape):
    import math as _math

    if v is None:
        return "NULL"
    if shape is None:
        if isinstance(v, float) and _math.isnan(v):
            return "nan()"
        return str(v)
    kind = shape[0]
    if kind == "dec":
        return f"DECIMAL '{v}'"
    if kind == "interval":
        return f"INTERVAL '{v}' DAY"
    if kind == "array":
        return "ARRAY[" + ", ".join(_render_trino(e, shape[1]) for e in v) + "]"
    if kind == "map":
        ks = sorted(v)
        return (
            "MAP(ARRAY["
            + ", ".join(str(k) for k in ks)
            + "], ARRAY["
            + ", ".join(_render_trino(v[k], shape[1]) for k in ks)
            + "])"
        )
    return "ROW(" + ", ".join(
        _render_trino(f, s) for f, s in zip(v, shape[1])
    ) + ")"


def _tri_eq(a, b):
    """Trino's recursive three-valued equality (Array/Row/MapEqual
    operators): None operand → None; container size/key mismatch →
    False; any decided-unequal element → False; else any None element
    → None; else True."""
    if a is None or b is None:
        return None
    if isinstance(a, list):
        if len(a) != len(b):
            return False
        res = True
        for x, y in zip(a, b):
            r = _tri_eq(x, y)
            if r is False:
                return False
            if r is None:
                res = None
        return res
    if isinstance(a, tuple):
        res = True
        for x, y in zip(a, b):
            r = _tri_eq(x, y)
            if r is False:
                return False
            if r is None:
                res = None
        return res
    if isinstance(a, dict):
        if set(a) != set(b):
            return False
        res = True
        for k in a:
            r = _tri_eq(a[k], b[k])
            if r is False:
                return False
            if r is None:
                res = None
        return res
    return a == b


def _tri_or(*vals):
    if any(v is True for v in vals):
        return True
    if any(v is None for v in vals):
        return None
    return False


def _b2s(v):
    return None if v is None else ("true" if v else "false")


@pytest.mark.parametrize(
    "seed,depth,count,leaves",
    [
        (1404, 3, 30, ("num",)),
        (9404, 3, 30, ("num",)),
        # r15 deepening (VERDICT r14 #6): depth 4 on small draw
        # counts, DECIMAL and INTERVAL leaves (both carry fresh
        # engine-side rewrites), two new seed offsets
        (2404, 4, 12, ("num", "dec")),
        (7404, 4, 12, ("num", "interval", "dec")),
    ],
)
def test_equality_contexts_unified_property(spark, seed, depth, count, leaves):
    """The x65–x70 + x72 closure property (VERDICT r13 #5): ALL five
    equality-bearing SQL contexts — =, <>, IN lists, simple CASE,
    nullif — over randomly NESTED array/row/map literals (NULLs at
    every level) must agree with ONE recursive three-valued reference,
    so future translator edits cannot de-unify the forms or regress
    the nested recursion (pre-x72, depth ≥ 2 nulls conflated through
    Spark's ``=`` inside the lambdas).  "num" scalar leaves draw NaN
    12% of the time (x74: nested element equality is IEEE in Trino —
    the Python reference's ``==`` is IEEE already); "dec"/"interval"
    leaves (r15) compare exactly on both sides."""
    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)  # nan() leaves (x74)
    rng = random.Random(seed)
    selects, expect = [], {}
    i = 0
    while i < count:
        shape = _gen_shape(rng, depth, leaves)
        if shape is None or shape[0] in ("dec", "interval"):
            continue
        a = _gen_value(rng, shape, top=True)
        # bias toward near-equal pairs: mutate a copy half the time
        b = _gen_value(rng, shape, top=True) if rng.random() < 0.5 else a
        c = _gen_value(rng, shape, top=True)
        sa, sb, sc = (_render_trino(v, shape) for v in (a, b, c))
        if len(sa) + len(sb) + len(sc) > (200 if depth >= 4 else 350):
            # the recursive forms repeat operand text per nesting
            # level; huge literals would trip the translator's loud
            # 1 MB guard rather than test semantics
            continue
        eq_ab, eq_ac = _tri_eq(a, b), _tri_eq(a, c)
        expect[i] = (
            _b2s(eq_ab),
            _b2s(None if eq_ab is None else not eq_ab),
            _b2s(_tri_or(eq_ab, eq_ac)),
            "b" if eq_ab is True else ("c" if eq_ac is True else "e"),
            _b2s(eq_ab is True),
        )
        selects.append(
            f"SELECT {i} AS i,"
            f" CAST(({sa}) = ({sb}) AS VARCHAR) AS c_eq,"
            f" CAST(({sa}) <> ({sb}) AS VARCHAR) AS c_ne,"
            f" CAST(({sa}) IN ({sb}, {sc}) AS VARCHAR) AS c_in,"
            f" CASE {sa} WHEN {sb} THEN 'b' WHEN {sc} THEN 'c'"
            f" ELSE 'e' END AS c_case,"
            f" CAST(nullif({sa}, {sb}) IS NULL AS VARCHAR) AS c_nullif"
        )
        i += 1
    got = {}
    # chunked: the recursive forms repeat operand text per nesting
    # level, and many deep cases in ONE statement trip the translator's
    # loud 1 MB size guard (the guard itself is correct behavior);
    # depth-4 literals expand ~4^depth through the per-level
    # common-type wraps, so they run one select per statement
    step = 1 if depth >= 4 else 3
    for lo in range(0, len(selects), step):
        for r in spark.sql(
            translate(" UNION ALL ".join(selects[lo : lo + step]))
        ).collect():
            got[r["i"]] = (
                r["c_eq"], r["c_ne"], r["c_in"], r["c_case"], r["c_nullif"]
            )
    mism = {j: (got[j], expect[j]) for j in expect if got[j] != expect[j]}
    assert not mism, f"{len(mism)} divergent, e.g. {list(mism.items())[:3]}"


def _ieee_cmp(a, b, op):
    """Trino DoubleOperators (IEEE Java): any NaN operand → false,
    except <> where a NaN operand → true; NULL propagates."""
    import math

    if a is None or b is None:
        return None
    nan = math.isnan(a) or math.isnan(b)
    if op == "=":
        return False if nan else a == b
    if op == "<>":
        return True if nan else a != b
    if nan:
        return False
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def test_double_nan_comparison_random_differential(spark):
    """Randomized sweep of the r14 NaN-comparison closure
    (_rewrite_double_nan_comparisons + the IN/CASE/nullif float arms):
    random doubles drawn from {finite, NaN, ±Infinity, NULL} through
    all six operators, IN lists, simple CASE and nullif, against the
    IEEE reference — Spark's operators treat NaN as equal to itself
    and larger than everything; Trino's are Java IEEE (all false).
    Operands render as typed literals or CAST('…' AS DOUBLE) spellings
    at random (the latter exercises the conservative maybe-NaN path)."""
    import math

    from mcp_trino_spark.trino_compat import install_compat_functions

    install_compat_functions(spark)
    rng = random.Random(1405)
    nan, inf = float("nan"), float("inf")

    def draw():
        r = rng.random()
        if r < 0.30:
            return nan
        if r < 0.40:
            return inf if rng.random() < 0.5 else -inf
        if r < 0.50:
            return None
        return round(rng.uniform(-100, 100), 3)

    def render(v):
        if v is None:
            return "CAST(NULL AS DOUBLE)"
        if math.isnan(v):
            return rng.choice(["nan()", "DOUBLE 'NaN'", "CAST('NaN' AS DOUBLE)"])
        if math.isinf(v):
            s = "Infinity" if v > 0 else "-Infinity"
            return f"CAST('{s}' AS DOUBLE)"
        if rng.random() < 0.5:
            return f"DOUBLE '{v!r}'"
        return f"CAST('{v!r}' AS DOUBLE)"

    selects, expect = [], {}
    for i in range(70):
        a, b, c = draw(), draw(), draw()
        sa, sb, sc = render(a), render(b), render(c)
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        eq_ab, eq_ac = _ieee_cmp(a, b, "="), _ieee_cmp(a, c, "=")
        in_exp = (
            None
            if (a is None)
            else (
                True
                if (eq_ab is True or eq_ac is True)
                else (None if (eq_ab is None or eq_ac is None) else False)
            )
        )
        nf = None if a is None else (a if _ieee_cmp(a, b, "=") is not True else None)
        expect[i] = (
            _ieee_cmp(a, b, op),
            in_exp,
            "b" if eq_ab is True else ("c" if eq_ac is True else "e"),
            nf is None,
            bool(nf is not None and math.isnan(nf)),
        )
        selects.append(
            f"SELECT {i} AS i,"
            f" (({sa}) {op} ({sb})) AS c_op,"
            f" (({sa}) IN ({sb}, {sc})) AS c_in,"
            f" CASE {sa} WHEN {sb} THEN 'b' WHEN {sc} THEN 'c'"
            f" ELSE 'e' END AS c_case,"
            f" (nullif({sa}, {sb}) IS NULL) AS c_nn,"
            f" coalesce(isnan(nullif({sa}, {sb})), false) AS c_nnan"
        )
    got = {
        r["i"]: (r["c_op"], r["c_in"], r["c_case"], r["c_nn"], r["c_nnan"])
        for r in spark.sql(translate(" UNION ALL ".join(selects))).collect()
    }
    mism = {j: (got[j], expect[j]) for j in expect if got[j] != expect[j]}
    assert not mism, f"{len(mism)} divergent, e.g. {list(mism.items())[:4]}"
