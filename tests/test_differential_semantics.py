"""Adversarial randomized differentials for the round-9 value-semantics
rewrites (split_part / trim family / regexp_extract / element_at).

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
