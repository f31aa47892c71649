"""Scalar function surface — SURVEY §2.8 (X1-X14).

The reference exposes Trino's full scalar library by pass-through
(reference internal/trino/client.go:305 links the Trino SQL reference;
``CONTAINS`` appears in a captured user query at
internal/trino/comment_test.go:72-74).  Each family is declared by one
query exercising its functions over the testdata with a DuckDB oracle.
All of these are JVM-side codegen'd expressions — no Python in the hot
path — so they cost the same as any column arithmetic at 100 TB.

Cross-engine notes (SURVEY §7.4.1) handled here:
- day-of-week numbering: Spark ``weekday()`` (0=Mon) + 1 == DuckDB ``isodow``.
- Spark ``date_add(d, n)`` == DuckDB ``d + INTERVAL n DAY``.
- double→int casts differ (Spark truncates, DuckDB rounds) → only
  FLOOR/CEIL-mediated casts are declared.
- format tokens: Spark ``yyyy-MM-dd`` == DuckDB strftime ``%Y-%m-%d``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import register


def _asql(spark, sf_dir, sql):
    """``spark.sql`` with the analyzed-plan cache (sources/catalog.py
    ``analyzed_sql`` — VERDICT r15 #1): Catalyst analysis of the big
    translated UNION batches costs 0.3-0.5 s per call; the analyzed
    DataFrame is memoized against the TRANSLATED text plus the sf_dir's
    resolved table-file fingerprints, so re-pointing the temp views at
    another scale factor (identical schemas, different files) always
    misses.  translate() itself still runs per call — its column-type
    safety net must see the live session.  Applied to the BENCHED
    x-entries only: the mechanical rewrite changes each entry's
    implementing function, and re-staling all 63 translate-routed
    entries at once exceeds the 50-slot certification window
    (tools/rotate_window.py refuses, correctly); the helper is
    available to any entry a future round can afford to re-certify."""
    from mcp_trino_spark.sources.catalog import analyzed_sql

    return analyzed_sql(spark, sf_dir, sql)


@register(
    "x1_string_basics",
    oracle="""
    SELECT c_custkey,
           length(c_name) AS name_len,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           trim(c_name) AS name_trim,
           substr(c_name, 1, 8) AS name_prefix,
           c_name || '-' || c_mktsegment AS name_seg,
           replace(c_name, 'Customer', 'Cust') AS name_repl,
           reverse(c_mktsegment) AS seg_rev,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           strpos(c_name, '#') AS hash_pos,
           split_part(c_name, '#', 2) AS name_id,
           starts_with(c_name, 'Customer') AS is_cust
    FROM customer
    """,
)
def x1_string_basics(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    c = F.col("c_name")
    return customer.select(
        "c_custkey",
        F.length(c).alias("name_len"),
        F.lower(c).alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(c).alias("name_trim"),
        F.substring(c, 1, 8).alias("name_prefix"),
        # F.concat (not concat_ws): `||` propagates NULL, concat_ws skips it
        F.concat(c, F.lit("-"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(c, F.lit("Customer"), F.lit("Cust")).alias("name_repl"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.instr(c, "#").alias("hash_pos"),
        F.split_part(c, F.lit("#"), F.lit(2)).alias("name_id"),
        F.startswith(c, F.lit("Customer")).alias("is_cust"),
    )


@register(
    "x2_regex",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '^[a-m]') AS starts_early,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           len(regexp_extract_all(p_type, '[A-Z]+')) AS n_upper_runs
    FROM part
    """,
)
def x2_regex(spark, sf_dir):
    (part,) = T(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_count("p_type", F.lit("[A-Z]+")).alias("n_upper_runs"),
    )


@register(
    "x3_date_extract",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           isodow(o_orderdate) AS dow_iso,
           dayofyear(o_orderdate) AS doy,
           quarter(o_orderdate) AS q,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    """,
)
def x3_date_extract(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        (F.weekday(d) + 1).alias("dow_iso"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("q"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
    )


@register(
    "x4_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS week_before,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2099-12-31') AS days_to_eoy,
           date_diff('month', CAST(o_orderdate AS DATE), DATE '2099-12-31') AS months_to_eoy
    FROM orders
    """,
)
def x4_date_arith(spark, sf_dir):
    (orders,) = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    eoy = F.lit("2099-12-31").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 7).alias("week_before"),
        F.datediff(eoy, d).alias("days_to_eoy"),
        F.months_between(eoy, d).cast("long").alias("months_to_eoy"),
    )


@register(
    "x5_timestamp_fmt",
    oracle="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day_str,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M') AS minute_str,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS unix_sec
    FROM events
    """,
)
def x5_timestamp_fmt(spark, sf_dir):
    (events,) = T(spark, sf_dir, "events")
    ts = F.col("ts")
    return events.select(
        "event_id",
        F.date_format(ts, "yyyy-MM-dd").alias("day_str"),
        F.date_format(ts, "yyyy-MM-dd HH:mm").alias("minute_str"),
        F.unix_timestamp(ts).alias("unix_sec"),
    )


@register(
    "x6_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS dev_from_25,
           round(l_extendedprice, 1) AS price_r1,
           CAST(ceil(l_discount * 100.0) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           round(power(l_discount, 2.0), 10) AS disc_sq,
           mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS dev_sign,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def x6_math(spark, sf_dir):
    (li,) = T(spark, sf_dir, "lineitem")
    q, p, disc, tax = (F.col(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("dev_from_25"),
        F.round(p, 1).alias("price_r1"),
        F.ceil(disc * 100.0).alias("disc_pct_ceil"),
        F.floor(q / 10.0).alias("qty_decile"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.round(F.pow(disc, 2.0), 10).alias("disc_sq"),
        (q.cast("bigint") % 7).alias("qty_mod7"),
        F.signum(q - 25.0).alias("dev_sign"),
        F.greatest(tax, disc).alias("max_rate"),
        F.least(tax, disc).alias("min_rate"),
    )


@register(
    "x7_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(c_name, 'unknown') AS name_or_default,
           nullif(c_mktsegment, 'BUILDING') AS seg_non_building,
           CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_class,
           TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS id_from_name
    FROM customer
    """,
)
def x7_conditional(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.coalesce(F.col("c_name"), F.lit("unknown")).alias("name_or_default"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_non_building"),
        F.when(F.col("c_acctbal") < 0, "debt").otherwise("credit").alias("bal_class"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).try_cast("bigint").alias(
            "id_from_name"
        ),
    )


@register(
    "x8_casting",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE) AS ship_date,
           l_quantity / 2 AS half_qty,
           l_orderkey // 100 AS key_div100
    FROM lineitem
    """,
)
def x8_casting(spark, sf_dir):
    """Casting lattice; `/` is double division on both engines, integer
    division is explicit (Spark DIV == DuckDB //), and double→int goes
    through FLOOR (Spark truncates but DuckDB rounds on bare casts)."""
    (li,) = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.col("l_quantity") / 2).alias("half_qty"),
        F.expr("l_orderkey DIV 100").alias("key_div100"),
    )


@register(
    "x9_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_elem,
           len(list_distinct(embedding)) AS n_distinct,
           CAST(list_extract(list_sort(embedding), 1) AS DOUBLE) AS min_elem
    FROM embeddings
    """,
)
def x9_array(spark, sf_dir):
    (emb,) = T(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_elem"),
        F.element_at(e, -1).cast("double").alias("last_elem"),
        F.size(F.array_distinct(e)).alias("n_distinct"),
        F.element_at(F.sort_array(e), 1).cast("double").alias("min_elem"),
    )


@register(
    "x10_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS sum_sq,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def x10_array_hof(spark, sf_dir):
    """Higher-order array functions (Trino transform/filter/reduce ==
    Spark transform/filter/aggregate — identical lambda syntax).

    Sum-of-squares accumulates in float-cast-to-double order-preserving
    left-to-right on both engines (list order is defined), so values
    match exactly.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.aggregate(
            F.transform(e, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "x11_map_struct",
    oracle="""
    SELECT n_nationkey,
           struct_pack(k := n_nationkey, region := n_regionkey).k AS packed_key,
           map_from_entries([('nation', n_name), ('region_id', CAST(n_regionkey AS VARCHAR))])['nation'][1] AS mapped_name
    FROM nation
    """,
)
def x11_map_struct(spark, sf_dir):
    (nation,) = T(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.struct(
            F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("region")
        )["k"].alias("packed_key"),
        F.create_map(
            F.lit("nation"), F.col("n_name"),
            F.lit("region_id"), F.col("n_regionkey").cast("string"),
        )["nation"].alias("mapped_name"),
    )


@register(
    "x12_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.device') AS device,
           TRY_CAST(json_extract_string(props, '$.dur_ms') AS BIGINT) AS dur_ms
    FROM events
    """,
)
def x12_json(spark, sf_dir):
    (events,) = T(spark, sf_dir, "events")
    p = F.col("props")
    return events.select(
        "event_id",
        F.get_json_object(p, "$.device").alias("device"),
        F.get_json_object(p, "$.dur_ms").try_cast("bigint").alias("dur_ms"),
    )


@register(
    "x13_struct_row",
    oracle="""
    SELECT t.pair.r AS region_key, t.pair.nm AS region_name
    FROM (SELECT struct_pack(r := r_regionkey, nm := r_name) AS pair FROM region) t
    """,
)
def x13_struct_row(spark, sf_dir):
    (region,) = T(spark, sf_dir, "region")
    pair = F.struct(F.col("r_regionkey").alias("r"), F.col("r_name").alias("nm"))
    return region.select(pair.alias("pair")).select(
        F.col("pair.r").alias("region_key"), F.col("pair.nm").alias("region_name")
    )


@register(
    "x14_hashing",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           lower(to_hex(doc_id)) AS id_hex
    FROM documents
    """,
)
def x14_hashing(spark, sf_dir):
    (docs,) = T(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.lower(F.hex(F.col("doc_id"))).alias("id_hex"),
    )


@register(
    "x15_bitwise",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12 AS band,
           n_nationkey | 5 AS bor,
           xor(n_nationkey, 9) AS bxor,
           n_nationkey << 2 AS shl,
           n_nationkey >> 1 AS shr,
           ~n_nationkey AS bnot
    FROM nation
    """,
)
def x15_bitwise(spark, sf_dir):
    """Bitwise operator family (Trino/Spark: & | ^ << >> ~; DuckDB
    spells xor() and the shifts identically)."""
    (nation,) = T(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return nation.select(
        "n_nationkey",
        k.bitwiseAND(12).alias("band"),
        k.bitwiseOR(5).alias("bor"),
        k.bitwiseXOR(9).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
        F.expr("~n_nationkey").alias("bnot"),
    )


@register(
    "x17_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
             || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM urls
    """,
)
def x17_url(spark, sf_dir):
    """URL decomposition (Trino's url_extract_* family) via Spark's
    native parse_url — JVM-side, codegen'd.  The oracle rebuilds the
    same parts with regexes over identical constructed URLs."""
    (docs,) = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "x18_array_setops",
    oracle="""
    WITH t AS (
      SELECT n_nationkey AS k,
             [n_nationkey, n_nationkey + 1, n_nationkey + 2] AS a,
             [n_nationkey + 2, n_nationkey + 3] AS b
      FROM nation
    )
    SELECT k,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS u,
           array_to_string(list_sort(list_intersect(a, b)), ',') AS i,
           array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ',') AS d
    FROM t
    """,
)
def x18_array_setops(spark, sf_dir):
    """Array set operations (union / intersect / except).  Both engines
    return set results in engine-specific order, so each side sorts and
    flattens to a joined string — the values, not the order, are the
    contract, and scalar output keeps the result canonicalizable by
    any generic row-hash harness (list cells are not hashable)."""
    (nation,) = T(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    a = F.array(k, k + 1, k + 2)
    b = F.array(k + 2, k + 3)

    def _flat(c):
        return F.array_join(F.array_sort(c).cast("array<string>"), ",")

    return nation.select(
        k.alias("k"),
        _flat(F.array_union(a, b)).alias("u"),
        _flat(F.array_intersect(a, b)).alias("i"),
        _flat(F.array_except(a, b)).alias("d"),
    )


@register(
    "x12b_json_structured",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_valid(props) AS is_valid
    FROM events
    """,
)
def x12b_json_structured(spark, sf_dir):
    """Schema-declared JSON parsing: from_json with an explicit struct
    schema (vs x12's path extraction) — fields become typed columns the
    optimizer can prune and push through, instead of per-row string
    probing."""
    (events,) = T(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return events.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (parsed.getField("k") % 10).alias("k_mod"),
        parsed.isNotNull().alias("is_valid"),
    )


@register(
    "x19_trino_dialect",
    oracle="""
    SELECT c_custkey,
           CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
           chr(CAST(65 + c_custkey % 26 AS INT)) AS letter,
           'x' AS first_elem,
           split_part(c_name, '#', 2) AS name_num,
           CAST(c_custkey & 255 AS BIGINT) AS low_byte,
           CAST(DATE '2024-01-01' + INTERVAL 5 DAY AS DATE) AS d5
    FROM customer
    """,
)
def x19_trino_dialect(spark, sf_dir):
    """The Trino dialect layer itself, under the oracle gate: a query in
    Trino spelling (strpos, true-codepoint chr, 1-based ARRAY[..][1],
    split_part, bitwise_and, 3-arg date_add) runs through
    translate()+compat UDFs and must produce the same values DuckDB
    computes from native SQL.  Reference surface: client.go:501-617
    passes exactly this kind of query text through verbatim.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey,
                   CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
                   chr(65 + c_custkey % 26) AS letter,
                   ARRAY['x', 'y'][1] AS first_elem,
                   split_part(c_name, '#', 2) AS name_num,
                   CAST(bitwise_and(c_custkey, 255) AS BIGINT) AS low_byte,
                   CAST(date_add('day', 5, DATE '2024-01-01') AS DATE) AS d5
            FROM customer
            """
        )
    )


@register(
    "o12_fetch_with_ties",
    oracle="""
    SELECT c_custkey, c_nationkey FROM (
      SELECT c_custkey, c_nationkey,
             RANK() OVER (ORDER BY c_nationkey DESC) AS rk
      FROM customer
    ) WHERE rk <= 10
    """,
)
def o12_fetch_with_ties(spark, sf_dir):
    """ANSI/Trino ``FETCH FIRST n ROWS WITH TIES`` through the dialect
    layer.  The SQL standard defines WITH TIES as rank() <= n over the
    ORDER BY key; translate() rewrites it to the equivalent distributed
    THRESHOLD plan — TakeOrderedAndProject top-n → read the n-th key via
    a scalar subquery → parallel filter ``key at-or-before threshold``
    (direction- and NULLS-aware) — because the textbook global RANK()
    window plans as a single-partition WindowExec that funnels every
    row through one task at 100 TB.  The oracle is the independent
    rank() spelling in DuckDB, so the hash-match proves the threshold
    plan computes exactly rank() <= n semantics — every peer of the
    n-th row kept.  Reference surface: client.go:501-617 passes
    FETCH ... WITH TIES SQL through to Trino verbatim.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey, c_nationkey FROM customer
            ORDER BY c_nationkey DESC
            FETCH FIRST 10 ROWS WITH TIES
            """
        )
    ).select("c_custkey", "c_nationkey")


@register(
    "x20_approx_most_frequent",
    oracle="""
    SELECT c_nationkey, seg, cnt FROM (
      SELECT c_nationkey, c_mktsegment AS seg, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY COUNT(*) DESC, c_mktsegment ASC
             ) AS rk
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ) WHERE rk <= 2
    """,
)
def x20_approx_most_frequent(spark, sf_dir):
    """Trino ``approx_most_frequent(buckets, value, capacity)`` through
    the dialect layer: translate() rewrites it to the exact distributed
    heavy-hitters plan — per-(group, value) counts, rank per group,
    top-``buckets`` collected into a count-ordered map (trino_compat.py
    documents why exact is a valid refinement of the sketch contract
    and the Misra-Gries upgrade path).  The result map is exploded back
    to rows so the DuckDB oracle — an independent rank() spelling —
    hash-checks keys AND counts without relying on cross-engine map
    ordering.  Reference surface: client.go:501-617 passes
    approx_most_frequent SQL through to Trino.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    df = _asql(
        spark,
        sf_dir,
        translate(
            """
            SELECT c_nationkey, approx_most_frequent(2, c_mktsegment, 100) AS hh
            FROM customer GROUP BY c_nationkey
            """
        )
    )
    return df.select(
        "c_nationkey", F.explode("hh").alias("seg", "cnt")
    )


@register(
    "x21_reduce_agg",
    oracle="""
    SELECT c_nationkey, CAST(SUM(c_custkey * c_custkey) AS BIGINT) AS ssq
    FROM customer GROUP BY c_nationkey
    """,
)
def x21_reduce_agg(spark, sf_dir):
    """Trino ``reduce_agg(input, init, inputFn, combineFn)`` through the
    dialect layer: translate() rewrites it to a size-capped
    ``aggregate(collect_list(input), init, inputFn)`` fold (group-local
    buffering bounded by _REDUCE_AGG_MAX_GROUP, loud raise_error above
    it; trino_compat._rewrite_reduce_agg documents why dropping
    combineFn is sound for reduce_agg's commutative-monoid contract).
    The fold here is a sum of squares, so the DuckDB oracle can spell
    it independently as SUM(x*x) — associativity makes the two
    evaluation orders bit-identical on integers, proving the fold
    computes the reduction rather than some order-dependent artifact.
    Reference surface: client.go:501-617 passes reduce_agg SQL through
    to Trino's function library.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return _asql(
        spark,
        sf_dir,
        translate(
            """
            SELECT c_nationkey,
                   reduce_agg(c_custkey, 0,
                              (s, v) -> s + v * v,
                              (s1, s2) -> s1 + s2) AS ssq
            FROM customer GROUP BY c_nationkey
            """
        )
    )


@register(
    "x22_quantified_subqueries",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_nationkey = ANY (SELECT n_nationkey FROM nation
                             WHERE n_regionkey = 1)
      AND c_acctbal > ALL (SELECT min(o_totalprice) / 1000 FROM orders)
    """,
)
def x22_quantified_subqueries(spark, sf_dir):
    """Quantified comparison predicates through the dialect layer:
    translate() maps `= ANY` onto an IN-subquery and the ordering
    quantifier `> ALL` onto a min/max scalar subquery
    (trino_compat._rewrite_quantified_comparisons).  DuckDB executes
    the SAME quantified SQL natively, so the hash-match is a true
    differential check of the rewrite against an independent
    implementation of the standard's semantics.  Reference surface:
    client.go:501-617 passes quantified predicates through to Trino.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey FROM customer
            WHERE c_nationkey = ANY (SELECT n_nationkey FROM nation
                                     WHERE n_regionkey = 1)
              AND c_acctbal > ALL (SELECT min(o_totalprice) / 1000 FROM orders)
            """
        )
    )


@register(
    "x23_vector_math",
    oracle="""
    SELECT vec_id,
      CAST(round(list_dot_product(CAST(embedding AS DOUBLE[]),
           list_reverse(CAST(embedding AS DOUBLE[]))) * 1000) AS BIGINT)
        AS dotr,
      CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
           CAST(embedding AS DOUBLE[]))) * 1000) AS BIGINT) AS nrm
    FROM embeddings
    """,
)
def x23_vector_math(spark, sf_dir):
    """Vector math through the dialect layer (batch 13's
    dot_product/l2_norm zip_with+aggregate UDFs) hash-checked against
    DuckDB's native list_dot_product — both sides cast the float32
    embeddings to double and round to 1e-3 before the integer compare,
    the established float-exactness protocol (registry.ISUM).  The
    reversed-vector dot keeps the check non-trivial (a self-dot alone
    can't catch an operand-ordering bug).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import (
        install_compat_functions,
        translate,
    )

    register_tables(spark, sf_dir)
    install_compat_functions(spark)  # dot_product/l2_norm are SQL UDFs
    return spark.sql(
        translate(
            """
            SELECT vec_id,
              CAST(round(dot_product(CAST(embedding AS ARRAY<DOUBLE>),
                   reverse(CAST(embedding AS ARRAY<DOUBLE>))) * 1000)
                AS BIGINT) AS dotr,
              CAST(round(l2_norm(CAST(embedding AS ARRAY<DOUBLE>)) * 1000)
                AS BIGINT) AS nrm
            FROM embeddings
            """
        )
    )


@register(
    "x24_setdigest",
    oracle="""
    WITH a AS (SELECT DISTINCT c_custkey AS k FROM customer
               WHERE c_custkey <= 300 AND c_nationkey < 13),
         b AS (SELECT DISTINCT c_custkey AS k FROM customer
               WHERE c_custkey <= 300 AND c_nationkey < 20)
    SELECT
      (SELECT COUNT(*) FROM a) AS card_a,
      (SELECT COUNT(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b))
        AS inter_ab,
      CAST(round(
        CAST((SELECT COUNT(*) FROM (SELECT k FROM a INTERSECT
              SELECT k FROM b)) AS DOUBLE)
        / (SELECT COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b))
        * 1000000) AS BIGINT) AS jac
    """,
)
def x24_setdigest(spark, sf_dir):
    """Trino's SetDigest surface (make_set_digest / cardinality /
    intersection_cardinality / jaccard_index) over KMV sketches
    (functions/setdigest.py — the fourth mergeable-sketch family).
    The probed sets are capped at 300 keys (< K = 512), where the KMV
    sketch stores the whole hash set and every reader is EXACT — so
    DuckDB's exact set algebra (COUNT DISTINCT / INTERSECT / UNION) is
    a hash-exact oracle, proving the digest pipeline end-to-end rather
    than sampling a tolerance band.  The stored-digest cardinality uses
    the reader name ``__setdigest_cardinality`` directly: bare
    ``cardinality`` is type-overloaded (arrays/maps), and only the
    composed ``cardinality(make_set_digest|merge_set_digest(...))``
    spellings rewrite (tested in test_trino_compat) — Spark also
    cannot plan a pandas grouped-agg in a scalar subquery alongside
    other pandas UDFs (UnevaluableAggregateFunc), so the digest sides
    come from a CROSS JOIN of 1-row aggregates.  Reference surface:
    client.go:501-617 passes the SetDigest functions through to Trino.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import (
        install_compat_functions,
        translate,
    )

    register_tables(spark, sf_dir)
    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT __setdigest_cardinality(a.d) AS card_a,
                   intersection_cardinality(a.d, b.d) AS inter_ab,
                   CAST(round(jaccard_index(a.d, b.d) * 1000000) AS BIGINT)
                     AS jac
            FROM (SELECT make_set_digest(c_custkey) AS d FROM customer
                  WHERE c_custkey <= 300 AND c_nationkey < 13) a
            CROSS JOIN
                 (SELECT make_set_digest(c_custkey) AS d FROM customer
                  WHERE c_custkey <= 300 AND c_nationkey < 20) b
            """
        )
    )


@register(
    "w12_groups_frame",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, value,
             DENSE_RANK() OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('hour', CAST(ts AS TIMESTAMP))
             ) AS grp
      FROM events WHERE user_id < 50
    ),
    gs AS (
      SELECT user_id, grp, SUM(CAST(value AS DECIMAL(25,6))) AS s
      FROM g GROUP BY user_id, grp
    )
    SELECT g.user_id, g.event_id, CAST(SUM(gs.s) AS DOUBLE) AS windowed_value
    FROM g JOIN gs
      ON gs.user_id = g.user_id AND gs.grp BETWEEN g.grp - 1 AND g.grp + 1
    GROUP BY g.user_id, g.event_id
    """,
)
def w12_groups_frame(spark, sf_dir):
    """SQL GROUPS window frames through the dialect layer: translate()
    rewrites the frame to RANGE over a precomputed DENSE_RANK group
    number (a GROUPS frame counts peer groups of the sort key — exactly
    a RANGE frame over the key's dense rank).  The oracle computes the
    same semantics by an independent construction — per-peer-group sums
    band-joined on adjacent group numbers — so the hash-match proves the
    rewrite, not the rewrite's own spelling (this DuckDB build has no
    native GROUPS mode).  Peer groups are real here (many events share a
    user-hour), so GROUPS genuinely differs from ROWS.

    Scale: the dense_rank pass and the frame aggregation share the
    (user_id) hash partitioning and sort — one exchange total, same as
    the native frame would cost.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT user_id, event_id,
                   CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
                     PARTITION BY user_id
                     ORDER BY date_trunc('hour', ts)
                     GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   ) AS DOUBLE) AS windowed_value
            FROM events WHERE user_id < 50
            """
        )
    )


@register(
    "x25_dialect_round7",
    oracle=r"""
    SELECT n_nationkey,
           'AB' AS ulit,
           CAST(n_nationkey AS VARCHAR) AS nk_json,
           upper(md5(n_name)) AS name_md5_hex,
           u.val AS val,
           n_nationkey > ANY (SELECT CASE WHEN r_regionkey = 4 THEN NULL
                                          ELSE r_regionkey END
                              FROM region) AS any_cmp
    FROM nation,
         LATERAL unnest([CAST(n_regionkey AS BIGINT), n_nationkey]) AS u(val)
    WHERE n_nationkey < 10
    """,
)
def x25_dialect_round7(spark, sf_dir):
    """Differential certification of the round-7 dialect additions in
    one hash-gated entry: `U&'…'` unicode literals, `CAST(x AS JSON)`,
    VARBINARY md5 (`to_hex(md5(to_utf8(…)))` — DuckDB computes the
    same digest natively), comma-join UNNEST, and the NULL-aware
    ordering ANY (the subquery plants a NULL element, so rows with no
    witness must surface UNKNOWN, not FALSE — DuckDB evaluates the
    quantifier natively, making this a true independent check of the
    OR-guard rewrite).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    register_tables(spark, sf_dir)
    install_compat_functions(spark)  # to_utf8 is a registered SQL UDF
    return spark.sql(
        translate(
            r"""
            SELECT n_nationkey,
                   U&'\0041\0042' AS ulit,
                   CAST(n_nationkey AS JSON) AS nk_json,
                   to_hex(md5(to_utf8(n_name))) AS name_md5_hex,
                   u.val AS val,
                   n_nationkey > ANY (SELECT CASE WHEN r_regionkey = 4 THEN NULL
                                                  ELSE r_regionkey END
                                      FROM region) AS any_cmp
            FROM nation,
                 UNNEST(ARRAY[CAST(n_regionkey AS BIGINT), n_nationkey]) AS u(val)
            WHERE n_nationkey < 10
            """
        )
    )


@register(
    "x26_nth_from_last",
    oracle=r"""
    WITH fr AS (
      SELECT o_custkey, o_orderkey,
             list(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             list(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS band,
             list(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev
      FROM orders WHERE o_custkey < 100
    )
    SELECT o_custkey, o_orderkey,
           cum[-2] AS second_last,
           band[-1] AS band_last,
           rev[-3] AS third_last_price
    FROM fr
    """,
)
def x26_nth_from_last(spark, sf_dir):
    """Differential certification of the nth_value ... FROM LAST
    rewrite (_rewrite_nth_from_last): three windows exercise the
    mirrored default frame (RANGE CURRENT ROW..UNBOUNDED FOLLOWING),
    a finite ROWS band (2 PRECEDING..1 FOLLOWING → 1 PRECEDING..2
    FOLLOWING), and a DESC ordering whose reversal flips both the
    direction and the null placement.  The DuckDB oracle is
    INDEPENDENT of the order-reversal trick: it collects each frame
    with a windowed list() and indexes from the end (l[-n]), so a
    wrong frame mirror or direction flip hash-mismatches.

    Reference parity: Trino accepts the SQL-standard FROM FIRST/LAST
    grammar on nth_value and the reference forwards it verbatim
    (internal/trino/client.go); SURVEY §2 carried this as the last
    rewriteable dialect gap through round 7.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return _asql(
        spark,
        sf_dir,
        translate(
            r"""
            SELECT o_custkey, o_orderkey,
                   nth_value(o_orderkey, 2) FROM LAST OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS second_last,
                   nth_value(o_orderkey, 1) FROM LAST OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS band_last,
                   nth_value(o_totalprice, 3) FROM LAST OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey DESC)
                     AS third_last_price
            FROM orders WHERE o_custkey < 100
            """
        )
    )


@register(
    "x27_lambda_regexp_replace",
    oracle=r"""
    SELECT n_nationkey,
           array_to_string(
             list_transform(
               string_split(lower(n_name), ' '),
               w -> CASE WHEN length(w) = 0 THEN w
                         ELSE upper(w[1]) || w[2:] END),
             ' ') AS title,
           replace(lower(n_name), 'a', 'X') AS subst
    FROM nation
    """,
)
def x27_lambda_regexp_replace(spark, sf_dir):
    """Differential certification of the lambda regexp_replace rewrite
    (_rewrite_lambda_regexp_replace): title-casing via a 2-group
    lambda and constant substitution via a group-less lambda.  The
    DuckDB oracle is INDEPENDENT of the rewrite's mechanism — word
    splitting + slicing for the title case, plain replace() for the
    substitution — so a misaligned split/extract or wrong group
    indexing hash-mismatches.

    Reference parity: Trino evaluates regexp_replace(string, pattern,
    function) natively and the reference forwards it verbatim
    (internal/trino/client.go); SURVEY batch 12 carried this as a
    documented gap through round 7.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            r"""
            SELECT n_nationkey,
                   regexp_replace(lower(n_name), '([a-z])([a-z]*)',
                                  x -> upper(x[1]) || x[2]) AS title,
                   regexp_replace(lower(n_name), 'a', x -> 'X') AS subst
            FROM nation
            """
        )
    )


@register(
    "x28_dialect_round8",
    oracle="""
    SELECT o_orderkey,
           CAST(isodow(o_orderdate) AS INT) AS dw,
           CAST(dayofyear(o_orderdate) AS INT) AS dy,
           CAST(weekofyear(o_orderdate) AS INT) AS wk,
           CAST(isoyear(o_orderdate) AS INT) AS yw
    FROM orders WHERE o_orderkey < 1000
    """,
)
def x28_dialect_round8(spark, sf_dir):
    """Differential certification of the round-8 date-field dialect
    work in one hash-gated entry: the dow()/doy() short aliases and
    the extract(dow/yow ...) field rewrite — both land on ISO
    semantics (Monday=1; ISO week-numbering year).  The DuckDB oracle
    evaluates isodow/dayofyear/weekofyear/isoyear natively, so a leak
    of Spark's Sunday=1 dayofweek (the silent divergence the round-8
    gap-hunt caught in extract(dow ...)) hash-mismatches on every
    non-Sunday date.

    Reference parity: Trino evaluates these natively and the reference
    forwards them verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    register_tables(spark, sf_dir)
    install_compat_functions(spark)  # dow/doy are registered SQL UDFs
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   dow(o_orderdate) AS dw,
                   doy(o_orderdate) AS dy,
                   CAST(extract(week FROM o_orderdate) AS INT) AS wk,
                   CAST(extract(yow FROM o_orderdate) AS INT) AS yw
            FROM orders WHERE o_orderkey < 1000
            """
        )
    )


@register(
    "x29_window_exclude",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE CURRENT ROW) AS BIGINT) AS nbr_sum,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)
             AS nbr_cnt,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)
             AS nbr_min,
           CAST(avg(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE CURRENT ROW) AS DOUBLE) AS nbr_avg,
           CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW EXCLUDE CURRENT ROW) AS BIGINT) AS run_sum
    FROM orders WHERE o_custkey < 200
    """,
)
def x29_window_exclude(spark, sf_dir):
    """Differential certification of the window-frame EXCLUDE CURRENT
    ROW rewrite (_rewrite_window_exclude) — neighbor-window sum/count/
    min/avg plus the running-frame shape, against DuckDB's NATIVE
    window EXCLUDE (a true engine-independent check: a wrong sub-frame
    bound or NULL-combination rule diverges immediately).

    Exactness: aggregates run over o_orderkey (integer-valued — the
    split changes double-addition order, which is only safe when every
    partial sum is exact); avg divides exact sums by exact counts, the
    same double division both engines.

    Reference parity: Trino evaluates SQL-standard frame EXCLUDE
    natively and the reference forwards it verbatim
    (internal/trino/client.go); SURVEY carried EXCLUDE as a documented
    no-Spark-grammar gap through round 7 — closed for ROWS frames.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   sum(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND
                     2 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_sum,
                   count(*) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND
                     2 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_cnt,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND
                     1 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_min,
                   avg(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND
                     2 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_avg,
                   sum(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW EXCLUDE CURRENT ROW) AS run_sum
            FROM orders WHERE o_custkey < 200
            """
        )
    )


@register(
    "x30_escape_free_literals",
    oracle=r"""
    SELECT c.c_custkey,
           CAST(regexp_replace(c.c_name, '\D+', '', 'g') AS BIGINT)
             AS cust_num,
           regexp_matches(c.c_name, 'Customer#\d{9}') AS well_formed,
           regexp_matches(d.text, '\bthe\b') AS has_the,
           length(regexp_replace(d.text, '\s+', ' ', 'g')) AS squashed_len,
           CASE WHEN '50%' LIKE '50\%' ESCAPE '\'
                 AND 'a_b' LIKE 'a\_b' ESCAPE '\'
                 AND 'axb' NOT LIKE 'a\_b' ESCAPE '\' THEN 1 ELSE 0 END
             AS esc_ok
    FROM customer c JOIN documents d ON d.doc_id = c.c_custkey
    """,
)
def x30_escape_free_literals(spark, sf_dir):
    r"""Differential certification of the escape-free literal re-spell
    (_respell_escape_free_literals): Trino string literals have NO
    backslash escapes (SQL standard — the reference forwards query
    text verbatim to Trino, client.go:501-617), so '\d' means
    backslash-d; Spark's lexer would silently eat the backslash.  The
    DuckDB oracle lexes literals escape-free natively, so BOTH sides
    here spell the regex/LIKE patterns the Trino way — an un-respelled
    backslash diverges immediately (cust_num casts a non-numeric
    string, well_formed goes all-False, squashed_len shifts).

    Covers \d / \D / \s / \b regex classes through regexp_like /
    regexp_replace and the LIKE ... ESCAPE '\' family (both the
    escaped-wildcard match and the must-not-match).  SURVEY carried
    this as THE documented literal-syntax gap from round 3 ("write
    '\\d'") — closed.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            r"""
            SELECT c.c_custkey,
                   CAST(regexp_replace(c.c_name, '\D+', '') AS BIGINT)
                     AS cust_num,
                   regexp_like(c.c_name, 'Customer#\d{9}') AS well_formed,
                   regexp_like(d.text, '\bthe\b') AS has_the,
                   length(regexp_replace(d.text, '\s+', ' '))
                     AS squashed_len,
                   CASE WHEN '50%' LIKE '50\%' ESCAPE '\'
                         AND 'a_b' LIKE 'a\_b' ESCAPE '\'
                         AND 'axb' NOT LIKE 'a\_b' ESCAPE '\' THEN 1 ELSE 0
                     END AS esc_ok
            FROM customer c JOIN documents d ON d.doc_id = c.c_custkey
            """
        )
    )


@register(
    "x31_window_exclude_peers",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY year(o_orderdate) RANGE BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS BIGINT) AS yr_sum_g,
           CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY year(o_orderdate) RANGE BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS BIGINT) AS yr_sum_t,
           count(*) OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP) AS yr_cnt_g,
           CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY year(o_orderdate) RANGE BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW EXCLUDE CURRENT ROW) AS BIGINT) AS run_sum_c,
           CAST(avg(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY year(o_orderdate) RANGE BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS DOUBLE) AS yr_avg_t
    FROM orders WHERE o_custkey < 200
    """,
)
def x31_window_exclude_peers(spark, sf_dir):
    """Differential certification of the EXCLUDE GROUP/TIES peer-
    subtraction rewrite (_exclude_peer_subtraction) against DuckDB's
    NATIVE window EXCLUDE: same-year orders form real peer groups per
    customer, so a wrong peer window (missing partition key, unstripped
    sort qualifier) or a wrong add-back term diverges on every
    multi-order year.  The Spark side spells the running frame
    implicitly (ORDER BY without a frame) — the rewrite must supply
    Trino's default RANGE UNBOUNDED..CURRENT semantic that the oracle
    spells explicitly.

    Exactness: aggregates over o_orderkey (integer-valued — the
    subtraction re-orders double addition, exact only for integers);
    avg divides exact sums by exact counts identically in both
    engines.

    Reference parity: Trino evaluates SQL-standard frame EXCLUDE
    natively and the reference forwards it verbatim
    (internal/trino/client.go); x29 certified the ROWS split — this
    closes the GROUP/TIES modes SURVEY carried as rejected-loudly.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   sum(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY extract(YEAR FROM o_orderdate)
                     RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                     FOLLOWING EXCLUDE GROUP) AS yr_sum_g,
                   sum(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY extract(YEAR FROM o_orderdate)
                     RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                     FOLLOWING EXCLUDE TIES) AS yr_sum_t,
                   count(*) OVER (PARTITION BY o_custkey
                     ORDER BY extract(YEAR FROM o_orderdate)
                     RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                     FOLLOWING EXCLUDE GROUP) AS yr_cnt_g,
                   sum(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY extract(YEAR FROM o_orderdate)
                     EXCLUDE CURRENT ROW) AS run_sum_c,
                   CAST(avg(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY extract(YEAR FROM o_orderdate)
                     RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                     FOLLOWING EXCLUDE TIES) AS DOUBLE) AS yr_avg_t
            FROM orders WHERE o_custkey < 200
            """
        )
    )


@register(
    "x32_subscript_semantics",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS w1,
           string_split(text, ' ')[3] AS w3,
           string_split(text, ' ')[len(string_split(text, ' '))] AS wlast,
           MAP(['len','id'], [n_chars, doc_id])['id'][1] AS mid
    FROM documents WHERE doc_id < 300
    """,
)
def x32_subscript_semantics(spark, sf_dir):
    """Differential certification of the bare-subscript rewrite
    (_rewrite_subscripts): Trino's ``expr[e]`` is 1-based on arrays
    and key-exact on maps, where the same spelling parses 0-based /
    NULL-returning in Spark — the header's long-documented SILENT
    divergence, now respelled to ``element_at``.  DuckDB indexes
    1-based natively, so first/middle/dynamic-last word extraction
    diverges on every row if any index shifts by one; the map access
    exercises the non-array branch of the same rewrite (DuckDB spells
    the unwrap ``[key][1]`` because its map extract returns a list).

    Covers: literal index on a function-call base, an expression index
    (cardinality(...) — the dynamic last element), a subscript chain
    through translate's own cardinality->size rename, and a map key
    lookup.

    Reference parity: Trino evaluates subscripts natively and the
    reference forwards them verbatim (internal/trino/client.go);
    SURVEY carried 1-based subscripts on non-literal arrays as THE
    remaining silent-divergence gap from round 1.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    register_tables(spark, sf_dir)
    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT doc_id,
                   split(text, ' ')[1] AS w1,
                   split(text, ' ')[3] AS w3,
                   split(text, ' ')[cardinality(split(text, ' '))] AS wlast,
                   MAP(ARRAY['len','id'], ARRAY[n_chars, doc_id])['id'] AS mid
            FROM documents WHERE doc_id < 300
            """
        )
    )


@register(
    "x33_arith_null_semantics",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(7.0/2) AS BIGINT) AS lit_div,
           CAST(trunc(-7.0/2) AS BIGINT) AS lit_div_neg,
           CASE WHEN (CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE o_totalprice * 2 END) IS NULL
                 OR o_totalprice IS NULL THEN NULL
                ELSE least(o_totalprice,
                           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                ELSE o_totalprice * 2 END) END AS lnull,
           CASE WHEN (CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE o_totalprice * 2 END) IS NULL
                 OR o_totalprice IS NULL THEN NULL
                ELSE greatest(o_totalprice,
                              CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                   ELSE o_totalprice * 2 END) END AS gnull
    FROM orders WHERE o_orderkey < 2000
    """,
)
def x33_arith_null_semantics(spark, sf_dir):
    """Differential certification of two round-8 gap-hunt closures
    (value-level silent divergences the execute-only sweeps cannot
    catch):

    - **Integer-literal division truncates**: Trino's ``7/2`` is 2 and
      ``-7/2`` is -3 (truncation toward zero); Spark's ``/`` is always
      fractional.  The literal/literal case is rewritten to ``div``
      (_rewrite_int_literal_division); the oracle spells
      trunc()-division explicitly because DuckDB's ``/`` is fractional
      too (and its ``//`` FLOORS, which differs on negatives).
      Column-typed integer division stays a documented divergence —
      operand types are not lexically knowable.
    - **least/greatest NULL-poison**: Trino returns NULL when ANY
      argument is NULL; Spark (and DuckDB) skip NULLs.  Rewritten to
      an any-argument-null CASE guard (_rewrite_least_greatest_nulls);
      the oracle spells the guard explicitly.  Every third row drives
      one argument NULL, both extremes covered on real DECIMAL data.

    Reference parity: Trino evaluates both natively and the reference
    forwards the SQL verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   7/2 AS lit_div,
                   -7/2 AS lit_div_neg,
                   least(o_totalprice,
                         CASE WHEN o_orderkey % 3 = 0 THEN NULL
                              ELSE o_totalprice * 2 END) AS lnull,
                   greatest(o_totalprice,
                            CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                 ELSE o_totalprice * 2 END) AS gnull
            FROM orders WHERE o_orderkey < 2000
            """
        )
    )


@register(
    "x34_null_ordering_defaults",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           row_number() OVER (ORDER BY k, o_orderkey) AS rn_asc,
           row_number() OVER (ORDER BY k DESC NULLS FIRST, o_orderkey)
             AS rn_desc,
           rank() OVER (ORDER BY k) AS rk_asc
    FROM t
    """,
)
def x34_null_ordering_defaults(spark, sf_dir):
    """Differential certification of the ORDER BY null-placement
    defaults (_rewrite_order_by_null_defaults): Trino (and DuckDB,
    which makes the oracle a true differential) defaults to NULLS LAST
    for ASC (nulls-as-largest) where Spark defaults NULLS FIRST — so
    every rank/row_number over a nullable key (20% NULL here) silently
    shifts by the NULL count without the rewrite.  The ASC columns
    spell the ORDER BY withOUT explicit NULLS clauses on both sides;
    only the rewrite makes Spark agree.  The DESC column pins Trino's
    other default (NULLS FIRST — nulls-as-largest) with the oracle
    explicit, because DuckDB's own DESC default is nulls LAST (it
    defaults nulls_last in BOTH directions — three engines, three
    conventions).

    Reference parity: the reference passes ORDER BY through to Trino
    verbatim (internal/trino/client.go); ordering defaults are engine
    semantics, invisible to execute-only probes — caught by the
    round-8b value-level hunt.
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            WITH t AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 5 = 0 THEN NULL
                          ELSE o_custkey END AS k
              FROM orders WHERE o_orderkey < 2000
            )
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY k, o_orderkey) AS rn_asc,
                   row_number() OVER (ORDER BY k DESC, o_orderkey)
                     AS rn_desc,
                   rank() OVER (ORDER BY k) AS rk_asc
            FROM t
            """
        )
    )


@register(
    "x35_exclude_minmax",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, year(o_orderdate) AS yr
      FROM orders WHERE o_custkey < 200
    ), g AS (
      SELECT *, dense_rank() OVER (PARTITION BY o_custkey ORDER BY yr)
               AS grp
      FROM t
    )
    SELECT o_orderkey,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP) AS yr_min_g,
           max(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE TIES) AS yr_max_t,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE GROUP) AS run_min_g,
           max(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP) AS nbr_max_g,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE TIES) AS nbr_min_t
    FROM g
    """,
)
def x35_exclude_minmax(spark, sf_dir):
    """Differential certification of MIN/MAX under window-frame EXCLUDE
    GROUP/TIES (_exclude_minmax_sub_windows): extremes cannot be
    recovered by the x31 subtraction, but on peer-group-ALIGNED frames
    the frame-minus-peer-group region is exactly two sub-windows —
    prefix ending one peer group before the current one, suffix
    starting one after — spelled as offset-bound GROUPS frames that the
    w12 dense_rank machinery compiles onto ONE shared group-number
    column (both sub-windows share the (partition, order) spec: one
    Window operator, one exchange).  TIES adds the current row's own
    value; least/greatest combine with skip-NULL semantics so an empty
    sub-frame drops out exactly like the aggregate's NULL-ignoring
    contract.

    The oracle runs DuckDB's NATIVE window EXCLUDE (matcher-
    independent); DuckDB has no GROUPS mode, so the GROUPS columns
    order by an explicitly materialized dense_rank — the same
    peer-group structure through a different spelling on each engine.
    Same-year orders per customer form real multi-row peer groups, so
    a wrong sub-frame edge (off-by-one group) diverges on every
    multi-order year; the implicit-frame column (run_min_g) pins the
    default-frame conversion, and first-group rows pin the empty-
    prefix NULL path.

    Reference parity: Trino evaluates SQL-standard frame EXCLUDE for
    all aggregates natively and the reference forwards it verbatim
    (internal/trino/client.go); closes the MIN/MAX residue VERDICT r8
    carried (x29 split the ROWS case, x31 the SUM/COUNT/AVG peer
    case).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            WITH t AS (
              SELECT o_orderkey, o_custkey,
                     extract(YEAR FROM o_orderdate) AS yr
              FROM orders WHERE o_custkey < 200
            )
            SELECT o_orderkey,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr RANGE BETWEEN UNBOUNDED PRECEDING AND
                     UNBOUNDED FOLLOWING EXCLUDE GROUP) AS yr_min_g,
                   max(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr RANGE BETWEEN UNBOUNDED PRECEDING AND
                     UNBOUNDED FOLLOWING EXCLUDE TIES) AS yr_max_t,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr EXCLUDE GROUP) AS run_min_g,
                   max(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr GROUPS BETWEEN 1 PRECEDING AND
                     1 FOLLOWING EXCLUDE GROUP) AS nbr_max_g,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr GROUPS BETWEEN 1 PRECEDING AND
                     1 FOLLOWING EXCLUDE TIES) AS nbr_min_t
            FROM t
            """
        )
    )


@register(
    "x36_element_at_nullsafe",
    oracle="""
    SELECT doc_id,
           ws[2] AS w2,
           ws[len(ws) + 5] AS w_oob,
           ws[-1] AS w_last,
           ws[-(len(ws) + 5)] AS w_negoob,
           MAP(['len','id'], [n_chars, doc_id])['id'][1] AS m_hit,
           MAP(['len','id'], [n_chars, doc_id])['zz'][1] AS m_miss
    FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
          FROM documents WHERE doc_id < 300)
    """,
)
def x36_element_at_nullsafe(spark, sf_dir):
    """Differential certification of the user-spelled ``element_at``
    respell (_rewrite_element_at_nullsafe): Trino's element_at returns
    NULL out of bounds and on missing map keys, but Spark 4 runs ANSI
    mode where element_at THROWS on an out-of-bounds array index — a
    Trino-valid query would crash mid-scan (a round-9 probe-caught
    divergence; invisible to execute-only gap hunts that never indexed
    past an array's end).  try_element_at matches Trino exactly:
    index 0 still throws, negative in-range reads from the end,
    |i| > cardinality and missing map keys yield NULL.  DuckDB's list
    indexing is natively NULL-out-of-bounds (positive, negative, and
    map-missing probed), so every column here is a true differential:
    in-range, past-the-end, from-the-end, negative-past-the-end, map
    hit, map miss.

    The SUBSCRIPT spelling (``arr[i]``, x32) deliberately keeps the
    throwing element_at — Trino subscripts DO throw out of bounds, so
    strict/lenient parity is per-spelling, matching Trino's own split.

    Reference parity: Trino evaluates element_at natively and the
    reference forwards it verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT doc_id,
                   element_at(ws, 2) AS w2,
                   element_at(ws, cardinality(ws) + 5) AS w_oob,
                   element_at(ws, -1) AS w_last,
                   element_at(ws, -(cardinality(ws) + 5)) AS w_negoob,
                   element_at(MAP(ARRAY['len','id'],
                                  ARRAY[n_chars, doc_id]), 'id') AS m_hit,
                   element_at(MAP(ARRAY['len','id'],
                                  ARRAY[n_chars, doc_id]), 'zz') AS m_miss
            FROM (SELECT doc_id, n_chars, split(text, ' ') AS ws
                  FROM documents WHERE doc_id < 300)
            """
        )
    )


@register(
    "x37_regexp_extract_nullsafe",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN regexp_matches(text, 'the [a-z]+')
                THEN regexp_extract(text, 'the [a-z]+') END AS whole,
           CASE WHEN regexp_matches(text, 'the ([a-z]+)')
                THEN regexp_extract(text, 'the ([a-z]+)', 1) END AS grp1,
           CASE WHEN regexp_matches(text, 'zzqx(\d+)')
                THEN regexp_extract(text, 'zzqx(\d+)', 1) END AS nomatch,
           CASE WHEN regexp_matches(lang, '^[a-z]')
                THEN regexp_extract(lang, '^[a-z]') END AS first_alpha
    FROM documents WHERE doc_id < 300
    """,
)
def x37_regexp_extract_nullsafe(spark, sf_dir):
    r"""Differential certification of the regexp_extract Trino
    semantics (_rewrite_regexp_extract_nullsafe): Trino returns NULL
    when the pattern does not match and its 2-arg form returns the
    WHOLE match — Spark returns '' on no-match and defaults the
    missing group to 1, ERRORING when the pattern has no capture
    group (so the Trino-valid 2-arg groupless call crashed outright
    before this pass; the no-match '' was a silent value divergence).
    The Spark side spells plain Trino regexp_extract; the oracle
    spells the NULL-on-no-match contract explicitly (DuckDB's own
    regexp_extract is also ''-on-no-match, so the guard is the
    portable ANSI way to say what Trino builds in).

    Covers: 2-arg groupless whole-match, 3-arg group extraction,
    never-matching pattern (NULL column), and an anchored match on a
    short column.  Documented residue at the rewrite: a matched
    pattern whose requested group did not participate yields ''
    where Trino yields NULL (engine-internal coalescing).

    Reference parity: Trino evaluates regexp_extract natively and the
    reference forwards it verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            r"""
            SELECT doc_id,
                   regexp_extract(text, 'the [a-z]+') AS whole,
                   regexp_extract(text, 'the ([a-z]+)', 1) AS grp1,
                   regexp_extract(text, 'zzqx(\d+)', 1) AS nomatch,
                   regexp_extract(lang, '^[a-z]') AS first_alpha
            FROM documents WHERE doc_id < 300
            """
        )
    )


@register(
    "x38_split_part_semantics",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS id_part,
           CASE WHEN 5 <= len(string_split(c_name, '#'))
                THEN split_part(c_name, '#', 5) END AS oob_part,
           split_part(c_name, 'zzz', 1) AS whole,
           CASE WHEN c_custkey % 4 + 1 <= len(string_split(c_name, '0'))
                THEN split_part(c_name, '0', CAST(c_custkey % 4 + 1 AS INTEGER)) END
             AS dyn_part
    FROM customer WHERE c_custkey < 400
    """,
)
def x38_split_part_semantics(spark, sf_dir):
    """Differential certification of the split_part Trino semantics
    (_rewrite_split_part_semantics): Trino returns NULL when the index
    exceeds the field count and ERRORS on a non-positive index —
    Spark returns '' out of range and silently reads from the END for
    a negative index (probe-caught round 9; both silent on Trino-valid
    queries).  The rewrite derives the field count from literal
    ``replace`` (non-overlapping occurrence counting, exactly
    split_part's own splitting — no regex escape, any-expression
    delimiters).

    Columns: in-range extraction, past-the-field-count (NULL), a
    never-occurring delimiter (whole string is field 1), and a
    row-varying index that crosses the field count per row.  DuckDB's
    split_part is also ''-out-of-range, so the oracle spells Trino's
    NULL contract explicitly with its own field counter
    (len(string_split)) — an independent implementation of the guard.

    Reference parity: Trino evaluates split_part natively and the
    reference forwards it verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey,
                   split_part(c_name, '#', 2) AS id_part,
                   split_part(c_name, '#', 5) AS oob_part,
                   split_part(c_name, 'zzz', 1) AS whole,
                   split_part(c_name, '0',
                              CAST(c_custkey % 4 + 1 AS INTEGER))
                     AS dyn_part
            FROM customer WHERE c_custkey < 400
            """
        )
    )


@register(
    "x39_trim_chars_order",
    oracle="""
    SELECT c_custkey,
           rtrim(c_name, '0123456789') AS no_digits,
           ltrim(c_name, 'Custome') AS no_prefix,
           trim(c_name, 'C1') AS both_set,
           trim(c_name) AS plain
    FROM customer WHERE c_custkey < 400
    """,
)
def x39_trim_chars_order(spark, sf_dir):
    """Differential certification of the two-arg trim family arg order
    (_rewrite_trim_chars): Trino's trim/ltrim/rtrim(string, chars)
    take the SOURCE first (StringFunctions.java CodePoints second
    parameter — the Postgres convention DuckDB shares, which makes
    this a native differential) while Spark's two-arg forms take the
    trim SET first — a probe-caught SILENT arg swap: the Trino-valid
    call strips the wrong string with the wrong set and returns a
    value, not an error.  trim maps onto Spark's string-first btrim;
    ltrim/rtrim swap argument order.

    Columns: strip trailing digits, strip a leading codepoint set,
    strip a both-ends set, and the untouched 1-arg whitespace form.

    Reference parity: Trino evaluates the trim family natively and the
    reference forwards it verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey,
                   rtrim(c_name, '0123456789') AS no_digits,
                   ltrim(c_name, 'Custome') AS no_prefix,
                   trim(c_name, 'C1') AS both_set,
                   trim(c_name) AS plain
            FROM customer WHERE c_custkey < 400
            """
        )
    )


@register(
    "x40_log_ieee_semantics",
    oracle="""
    SELECT c_custkey,
           CASE WHEN s > 0 THEN ln(s)
                WHEN s = 0 THEN CAST('-Infinity' AS DOUBLE)
                WHEN s < 0 THEN CAST('NaN' AS DOUBLE) END AS ln_s,
           CASE WHEN c_acctbal > 0 THEN round(ln(c_acctbal), 6)
                WHEN c_acctbal = 0 THEN CAST('-Infinity' AS DOUBLE)
                WHEN c_acctbal < 0 THEN CAST('NaN' AS DOUBLE) END AS ln_bal,
           CASE WHEN s > 0 THEN log10(s)
                WHEN s = 0 THEN CAST('-Infinity' AS DOUBLE)
                WHEN s < 0 THEN CAST('NaN' AS DOUBLE) END AS l10_s,
           CASE WHEN s > 0 THEN ln(s) / ln(2)
                WHEN s = 0 THEN CAST('-Infinity' AS DOUBLE)
                WHEN s < 0 THEN CAST('NaN' AS DOUBLE) END AS lb_s
    FROM (SELECT c_custkey, c_acctbal,
                 CAST(c_custkey % 3 - 1 AS DOUBLE) AS s
          FROM customer WHERE c_custkey < 400)
    """,
)
def x40_log_ieee_semantics(spark, sf_dir):
    """Differential certification of the IEEE log-family semantics
    (_rewrite_log_ieee): Trino's ln/log10/log2/log(b, x) are pure
    Math.log (MathFunctions.java) — 0 gives -Infinity, negatives give
    NaN — where Spark's builtins return NULL for every non-positive
    input (probe-caught; bites any pipeline taking log of a zero
    count).  The Spark side spells plain Trino calls; the oracle
    spells the IEEE contract explicitly (DuckDB ERRORS on log of
    non-positives, so the guard is the portable way to say what both
    Java and C libm do; positive-input ln/log10 are bit-identical
    across all three engines — the l24/l28 precedent).

    Columns: a three-way signed column (-1/0/1 → NaN/-Infinity/0.0)
    through ln, log10, and 2-arg log(2, x), plus ln over a real money
    column whose negatives exercise the NaN path at scale (rounded to
    6 places — Java Math.log and DuckDB's libm log disagree by 1 ULP
    on ~2% of real inputs, measured here; the SPECIAL values are
    bit-exact unrounded).

    Reference parity: Trino evaluates the log family natively and the
    reference forwards it verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT c_custkey,
                   ln(s) AS ln_s,
                   round(ln(c_acctbal), 6) AS ln_bal,
                   log10(s) AS l10_s,
                   log(2, s) AS lb_s
            FROM (SELECT c_custkey, c_acctbal,
                         CAST(c_custkey % 3 - 1 AS DOUBLE) AS s
                  FROM customer WHERE c_custkey < 400)
            """
        )
    )


@register(
    "x41_orderless_ranking",
    oracle="""
    SELECT o_orderkey,
           rank() OVER () AS rk_all,
           dense_rank() OVER (PARTITION BY o_custkey) AS dr_cust,
           percent_rank() OVER (PARTITION BY o_custkey) AS pr_cust,
           cume_dist() OVER () AS cd_all,
           count(*) OVER (PARTITION BY o_custkey) AS n_cust
    FROM orders WHERE o_custkey < 200
    """,
)
def x41_orderless_ranking(spark, sf_dir):
    """Differential certification of orderless ranking windows
    (_rewrite_orderless_ranking_windows): Trino accepts ranking/offset
    window functions with NO window ORDER BY — every row is a peer, so
    rank()/dense_rank() are 1 everywhere, percent_rank() 0,
    cume_dist() 1 — where Spark refused the spec outright ("requires
    window to be ordered"); a Trino-valid query errored loudly until
    round 9.  The injected constant ORDER BY 1 keeps every row a peer,
    reproducing the semantics exactly; this entry certifies the
    DETERMINISTIC all-peers columns (row_number/ntile stay arbitrary
    on both engines, covered by the unit test's count-level asserts).
    The aggregate count(*) window pins that orderless AGGREGATE specs
    pass through untouched.  DuckDB evaluates the orderless forms
    natively — a true differential.

    Reference parity: Trino evaluates orderless window specs natively
    and the reference forwards them verbatim
    (internal/trino/client.go).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   rank() OVER () AS rk_all,
                   dense_rank() OVER (PARTITION BY o_custkey) AS dr_cust,
                   percent_rank() OVER (PARTITION BY o_custkey) AS pr_cust,
                   cume_dist() OVER () AS cd_all,
                   count(*) OVER (PARTITION BY o_custkey) AS n_cust
            FROM orders WHERE o_custkey < 200
            """
        )
    )


@register(
    "x42_exclude_current_row_minmax",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, year(o_orderdate) AS yr
      FROM orders WHERE o_custkey < 200
    ), g AS (
      SELECT *, dense_rank() OVER (PARTITION BY o_custkey ORDER BY yr)
               AS grp
      FROM t
    )
    SELECT o_orderkey,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS all_min_x,
           max(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE CURRENT ROW) AS run_max_x,
           min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE CURRENT ROW) AS nbr_min_x,
           max(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY yr
             RANGE BETWEEN CURRENT ROW AND CURRENT ROW
             EXCLUDE CURRENT ROW) AS peer_max_x
    FROM g
    """,
)
def x42_exclude_current_row_minmax(spark, sf_dir):
    """Differential certification of MIN/MAX under EXCLUDE CURRENT ROW
    on peer-defined frames (_exclude_minmax_current_row) — the last
    loud window-EXCLUDE residue (VERDICT r9 item 3).  Unlike
    GROUP/TIES, the excluded region keeps the current row's peers, so
    beyond the x35 peer-aligned GROUPS sub-windows the rewrite needs
    "peers minus me": a REFINED window partitioned by (partition +
    order keys) — the peer group becomes the partition — where the two
    ROWS half-frames around the current row union to exactly that set
    under ANY physical order (both halves evaluate in one Window
    operator over one sort, so the combined extreme is
    order-invariant).

    Four shapes pin the region algebra: full-partition frame (both
    sub-windows + peer split), running frame (prefix sub-window only),
    GROUPS neighbor frame (bounded offsets), and the frame that is
    exactly the peer group (peer split alone — NULL for peerless
    rows).  Same-year orders per customer form real multi-row peer
    groups; single-order customers pin the empty-region NULL path.
    The oracle runs DuckDB's NATIVE window EXCLUDE (DuckDB has no
    GROUPS mode, so that column orders by a materialized dense_rank —
    the same peer structure through a different spelling).

    Reference parity: Trino evaluates SQL-standard frame EXCLUDE for
    all aggregates natively and the reference forwards it verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return _asql(
        spark,
        sf_dir,
        translate(
            """
            WITH t AS (
              SELECT o_orderkey, o_custkey,
                     extract(YEAR FROM o_orderdate) AS yr
              FROM orders WHERE o_custkey < 200
            )
            SELECT o_orderkey,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr RANGE BETWEEN UNBOUNDED PRECEDING AND
                     UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)
                     AS all_min_x,
                   max(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr EXCLUDE CURRENT ROW) AS run_max_x,
                   min(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr GROUPS BETWEEN 1 PRECEDING AND
                     1 FOLLOWING EXCLUDE CURRENT ROW) AS nbr_min_x,
                   max(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY yr RANGE BETWEEN CURRENT ROW AND
                     CURRENT ROW EXCLUDE CURRENT ROW) AS peer_max_x
            FROM t
            """
        )
    )


@register(
    "x43_substr_semantics",
    oracle="""
    SELECT doc_id,
           CASE WHEN st = 0 OR st < -length(text) THEN ''
                ELSE substr(text, st) END AS tail_s,
           CASE WHEN st = 0 OR st < -length(text) THEN ''
                ELSE substr(text, st, 7) END AS win_s,
           CASE WHEN 0 = 0 THEN '' END AS zero_s,
           substr(text, 3) AS pos_s
    FROM (SELECT doc_id, text,
                 CAST(doc_id % 7 - 3 AS INTEGER) * 120 AS st
          FROM documents WHERE doc_id < 400)
    """,
)
def x43_substr_semantics(spark, sf_dir):
    """Differential certification of substr/substring start semantics
    (_rewrite_substr_semantics): Trino returns EMPTY for start
    position 0 and for a negative start pointing before the beginning
    (|start| > length), where Spark treats 0 as position 1 and CLAMPS
    out-of-range negative starts — silent wrong answers on Trino-valid
    queries (substring('abcde', 0) returned the whole string; a
    -7 start on a 5-char string returned its head).  The start column
    sweeps -360..+360 in 120-char steps against real document lengths,
    so every regime appears: zero, in-range negative (counts from the
    end on both engines — rewrite must NOT touch it), out-of-range
    negative (empty), positive in-range, positive past the end (empty
    on both).  Both call spellings (comma and ANSI FROM/FOR) route
    through the same guard; the zero_s column pins the literal-zero
    constant fold.

    DuckDB clamps exactly like Spark, so the oracle spells Trino's
    empty contract explicitly (the x36-x39 protocol: the oracle is the
    CONTRACT, the entry certifies the rewrite reproduces it).

    Reference parity: Trino evaluates substr natively
    (StringFunctions — start 0 and |start| > codepoint count return
    the empty slice) and the reference forwards query text verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT doc_id,
                   substr(text, st) AS tail_s,
                   substring(text FROM st FOR 7) AS win_s,
                   substr(text, 0) AS zero_s,
                   substring(text, 3) AS pos_s
            FROM (SELECT doc_id, text,
                         CAST(doc_id % 7 - 3 AS INTEGER) * 120 AS st
                  FROM documents WHERE doc_id < 400)
            """
        )
    )


@register(
    "x44_map_concat_lastwin",
    oracle="""
    SELECT doc_id,
           doc_id AS k_id,
           n_chars % 97 AS k_len,
           doc_id % 3 AS k_tag,
           3 AS n_keys
    FROM documents WHERE doc_id < 400
    """,
)
def x44_map_concat_lastwin(spark, sf_dir):
    """Differential certification of map_concat duplicate-key semantics
    (_rewrite_map_concat): Trino's map_concat takes the LAST map's
    value for a duplicate key, where Spark THROWS under its default
    mapKeyDedupPolicy=EXCEPTION — a Trino-valid overlap crashed the
    engine (probe-caught, round 10).  Two constructed maps overlap on
    'len' with different values per row; the entry surfaces the merged
    map through key lookups (scalar output columns — the driver's
    value hash needs no map coercion), so a first-wins or throwing
    implementation diverges on every row.  The oracle spells the
    contract directly (which value each key must carry), making it
    engine-independent.

    map()/map_from_entries with duplicate keys still THROW on both
    engines (Trino parity) — the rewrite fixes map_concat per-call
    instead of flipping the global dedup policy, which would have
    silenced those errors into silent divergence.

    Reference parity: Trino evaluates map_concat natively
    (MapConcatFunction — later maps override) and the reference
    forwards query text verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT doc_id,
                   m['id'] AS k_id,
                   m['len'] AS k_len,
                   m['tag'] AS k_tag,
                   cardinality(m) AS n_keys
            FROM (
              SELECT doc_id,
                     map_concat(
                       MAP(ARRAY['id', 'len'],
                           ARRAY[doc_id, n_chars]),
                       MAP(ARRAY['len', 'tag'],
                           ARRAY[n_chars % 97, doc_id % 3])) AS m
              FROM documents WHERE doc_id < 400
            )
            """
        )
    )


@register(
    "x45_weighted_percentile",
    oracle="""
    WITH expanded AS (
      SELECT l_returnflag, l_quantity
      FROM lineitem, LATERAL unnest(range(1, l_linenumber + 1))
      WHERE l_orderkey < 4000
    )
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90
    FROM expanded GROUP BY l_returnflag
    """,
)
def x45_weighted_percentile(spark, sf_dir):
    """Differential certification of Trino's WEIGHTED
    ``approx_percentile(x, w, percentage)``
    (_rewrite_approx_percentile_weighted, probe-caught round 10): the
    plain rename to percentile_approx handed Spark the weight as its
    percentage and the percentage as its accuracy — every Trino-valid
    weighted call died with a misleading type error.  The rewrite
    targets Spark's EXACT ``percentile(x, percentage, w)``, whose
    frequency argument is exactly Trino's per-row weight (the value
    counted w times); an exact percentile satisfies approx_percentile's
    accuracy contract by definition, which also makes the entry
    ORACLE-able where a sketch would be rows-only.  The oracle
    materializes the weight semantics independently — each row expanded
    w times via LATERAL unnest, then quantile_cont (the same type-7
    interpolation Spark's percentile computes).  l_linenumber (1..7)
    is the weight, so every group mixes weights.

    Reference parity: Trino evaluates the weighted forms natively
    (ApproximateWeightedPercentileAggregations) and the reference
    forwards query text verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_returnflag,
                   round(approx_percentile(l_quantity, l_linenumber,
                                           0.5), 6) AS p50,
                   round(approx_percentile(l_quantity, l_linenumber,
                                           0.9), 6) AS p90
            FROM lineitem WHERE l_orderkey < 4000
            GROUP BY l_returnflag
            """
        )
    )


@register(
    "x46_stats_shape_semantics",
    oracle="""
    SELECT o_orderpriority,
           round(kurtosis(o_totalprice), 6) AS kurt,
           round(skewness(o_totalprice) * (count(o_totalprice) - 2)
                 / sqrt(count(o_totalprice) * (count(o_totalprice) - 1.0)),
                 6) AS skew,
           array_to_string(list_sort(list(o_orderkey))[1:3], ',') AS lo3,
           array_to_string(list_reverse_sort(list(o_orderkey))[1:3], ',')
             AS hi3
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderpriority
    """,
)
def x46_stats_shape_semantics(spark, sf_dir):
    """Differential certification of the distribution-shape aggregates
    and the n-extremes forms (probe-caught round 10):

    - ``kurtosis(x)``: Trino documents the UNBIASED sample excess
      estimator; Spark computes the POPULATION excess g2 — silently
      different values on every group (−0.212 vs 3.152 on one probe).
      ``_rewrite_kurtosis_unbiased`` bridges them algebraically,
      G2 = (n-1)/((n-2)(n-3))·((n+1)·g2 + 6), reusing Spark's stable
      central-moment aggregate.  DuckDB computes the same unbiased
      estimator natively — a true differential.
    - ``skewness(x)``: BOTH Trino and Spark compute the population g1,
      so no rewrite — but DuckDB's skewness is sample-adjusted, so the
      oracle converts (g1 = G1·(n-2)/√(n(n-1))), pinning that the
      engine does NOT drift to the sample form.
    - ``min(x, n)`` / ``max(x, n)``: Trino's n-extremes ARRAY forms
      died with a confusing arity error; ``_rewrite_minmax_n``
      respells them over collect_list (array_join'd here so the
      driver hashes scalar strings).  This DuckDB has no 2-arg
      min/max, so the oracle spells the contract via sorted-list
      slices.

    Reference parity: Trino evaluates all of these natively
    (AggregationFunctions; the kurtosis formula is in its function
    docs) and the reference forwards query text verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderpriority,
                   round(kurtosis(o_totalprice), 6) AS kurt,
                   round(skewness(o_totalprice), 6) AS skew,
                   array_join(min(o_orderkey, 3), ',') AS lo3,
                   array_join(max(o_orderkey, 3), ',') AS hi3
            FROM orders WHERE o_orderkey < 2000
            GROUP BY o_orderpriority
            """
        )
    )


@register(
    "x47_column_int_division",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(trunc(CAST(l_partkey AS DOUBLE) / l_linenumber) AS BIGINT)
             AS col_col,
           CAST(trunc(CAST(l_partkey AS DOUBLE) / 7) AS BIGINT) AS col_lit,
           CAST(trunc(CAST(l_partkey - 500 AS DOUBLE)
                      / (l_suppkey % 5 + 1)) AS BIGINT) AS neg_cross,
           CAST(trunc(CAST(trunc(CAST(l_partkey AS DOUBLE) / l_linenumber)
                           AS DOUBLE) / 3) AS BIGINT) AS chained,
           l_extendedprice / l_linenumber AS frac_stays
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def x47_column_int_division(spark, sf_dir):
    """Differential certification of COLUMN-typed integer division
    (_rewrite_column_int_division, closing the last knowable silent
    divergence from SURVEY §13): Trino's ``/`` on integer operands
    TRUNCATES toward zero; Spark's ``/`` is always fractional, so
    ``o_orderkey / o_custkey`` silently returned doubles.  The literal/
    literal case was closed in round 8 (x33); for plain column
    references the catalog schema DOES make operand types knowable, so
    the façade feeds translate() a column→type map
    (execute._catalog_column_types — ambiguous names collapse to a
    non-type sentinel and stay un-rewritten) and integer/integer
    respells to Spark's ``div`` (truncating, ANSI-raising on /0 —
    both matching Trino).  Covered forms: column/column, column/
    literal, CAST-to-integral operands (the ``neg_cross`` column
    crosses negative numerators, pinning truncation vs floor), and
    chains (``a/b/c`` → ``((a div b) div c)`` — the parenthesized
    ``div`` group re-enters as an integral operand).  The mixed
    double/bigint column stays fractional, pinning the non-rewrite.
    The oracle spells trunc()-division explicitly (DuckDB's ``//``
    floor/trunc behavior is version-dependent on negatives).

    Residue stays documented (module header): function results,
    subquery-aliased outputs, and ambiguous column names are not
    lexically typable and keep Spark semantics.

    Reference parity: Trino evaluates integer division natively and
    the reference forwards query text verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_orderkey, l_linenumber,
                   l_partkey / l_linenumber AS col_col,
                   l_partkey / 7 AS col_lit,
                   CAST(l_partkey - 500 AS BIGINT)
                     / CAST(l_suppkey % 5 + 1 AS BIGINT) AS neg_cross,
                   l_partkey / l_linenumber / 3 AS chained,
                   l_extendedprice / l_linenumber AS frac_stays
            FROM lineitem WHERE l_orderkey < 3000
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x48_datetime_token_semantics",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%A, %B %-d') AS wd,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%y/%-m/%-d') AS s2,
           strptime(strftime(CAST(o_orderdate AS TIMESTAMP),
                             '%y/%-m/%-d'), '%y/%-m/%-d') AS roundtrip,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%j %H:%M:%S') AS doy,
           CASE WHEN year(strptime(lpad(CAST(o_orderkey % 100 AS VARCHAR),
                                        2, '0') || '/6/15',
                                   '%y/%-m/%-d')) = 1969
                THEN strptime(lpad(CAST(o_orderkey % 100 AS VARCHAR),
                                   2, '0') || '/6/15', '%y/%-m/%-d')
                     + INTERVAL 100 YEAR
                ELSE strptime(lpad(CAST(o_orderkey % 100 AS VARCHAR),
                                   2, '0') || '/6/15', '%y/%-m/%-d')
           END AS pivot_ts
    FROM orders WHERE o_orderkey < 2000
    """,
)
def x48_datetime_token_semantics(spark, sf_dir):
    """Differential certification of the MySQL date-token family
    (round-11 sweep catches, both closed in _rewrite_date_parse /
    _MYSQL_TOKENS_PARSE):

    - **two-digit-year pivot**: Trino builds its %y parser with
      ``appendTwoDigitYear(PIVOT_YEAR = 2020)`` (public source,
      io.trino.operator.scalar.DateTimeFunctions) — 70-99 → 1970-1999,
      00-69 → 2000-2069, MySQL's documented rule — while Spark's 'yy'
      bases at 2000, silently shifting '85' to 2085.  The rewrite
      subtracts a century when the parsed year lands ≥ 2070; the
      ``pivot_ts`` column sweeps o_orderkey%100 across BOTH pivot
      sides (the DuckDB oracle pivots at POSIX 69, adjusted by CASE).
    - **lenient digit counts**: MySQL numeric tokens parse 1-2 digits;
      Java's padded letters require exactly two on parse, so the parse
      direction now maps to the unpadded spellings (roundtrip column:
      format-with-unpadded-tokens then parse back).
    - the FORMAT direction stays padded and is certified across the
      name/ordinal token families (wd/doy columns; DuckDB strftime's C
      vocabulary — %A/%B/%-d — is an independent spelling of the same
      contract).

    Reference parity: Trino evaluates date_format/date_parse natively
    and the reference forwards query text verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   date_format(o_orderdate, '%W, %M %e') AS wd,
                   date_format(o_orderdate, '%y/%c/%e') AS s2,
                   date_parse(date_format(o_orderdate, '%y/%c/%e'),
                              '%y/%c/%e') AS roundtrip,
                   date_format(o_orderdate, '%j %T') AS doy,
                   date_parse(lpad(CAST(o_orderkey % 100 AS VARCHAR),
                                   2, '0') || '/6/15',
                              '%y/%c/%e') AS pivot_ts
            FROM orders WHERE o_orderkey < 2000
            """
        )
    )


@register(
    "x49_json_path_semantics",
    oracle="""
    WITH docs AS (
      SELECT o_orderkey,
             '{"a": [' || CAST(o_orderkey AS VARCHAR) || ', {"b": "'
               || o_orderpriority || '"}], "c": null, "d": "['
               || o_orderstatus || '", "e": {"f": true}}' AS j
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           json_extract_string(j, '$.a[0]') AS a0,
           CAST(json_extract(j, '$.a[1]') AS VARCHAR) AS a1,
           json_extract_string(j, '$.a[1].b') AS a1b,
           'null' AS cnull,
           0 AS csize,
           json_extract_string(j, '$.d') AS dstr,
           0 AS dsize,
           CAST(json_array_length(j, '$.a') AS INTEGER) AS asize,
           CAST(len(json_keys(j, '$.e')) AS INTEGER) AS esize,
           CAST(NULL AS VARCHAR) AS missing,
           CAST(NULL AS INTEGER) AS msize
    FROM docs
    """,
)
def x49_json_path_semantics(spark, sf_dir):
    """Differential certification of the JSON-path family's edge
    semantics (round-11 sweep catches, both closed):

    - **raw-UTF-8 serialization**: json_extract now emits
      ensure_ascii=False like Trino's Jackson extractor (the \\uXXXX
      escaping silently diverged on every non-ASCII string);
    - **json_size type detection**: sizes are decided on the EXACT
      extractor's serialized node, so a string VALUE beginning with
      '[' (the ``d`` column) is a scalar of size 0 — the old
      get_json_object + startswith heuristic fed it to
      json_array_length and returned NULL;
    - **JSON null vs missing path**: json_extract of an existing null
      node is the text 'null' with size 0 (Trino's
      JsonValueJsonExtractor writes the node verbatim); a missing path
      is SQL NULL end-to-end.  DuckDB conflates the two (its
      json_extract maps null nodes to SQL NULL), so the oracle spells
      Trino's contract as literals on the engineered doc — arrays-of-
      objects paths (a0/a1/a1b) remain true cross-engine
      differentials.

    Reference parity: Trino evaluates the json_* family natively and
    the reference forwards query text verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    register_tables(spark, sf_dir)
    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            WITH docs AS (
              SELECT o_orderkey,
                     '{"a": [' || CAST(o_orderkey AS VARCHAR) || ', {"b": "'
                       || o_orderpriority || '"}], "c": null, "d": "['
                       || o_orderstatus || '", "e": {"f": true}}' AS j
              FROM orders WHERE o_orderkey < 2000
            )
            SELECT o_orderkey,
                   json_extract_scalar(j, '$.a[0]') AS a0,
                   json_extract(j, '$.a[1]') AS a1,
                   json_extract_scalar(j, '$.a[1].b') AS a1b,
                   json_extract(j, '$.c') AS cnull,
                   json_size(j, '$.c') AS csize,
                   json_extract_scalar(j, '$.d') AS dstr,
                   json_size(j, '$.d') AS dsize,
                   json_size(j, '$.a') AS asize,
                   json_size(j, '$.e') AS esize,
                   json_extract_scalar(j, '$.zz') AS missing,
                   json_size(j, '$.zz') AS msize
            FROM docs
            """
        )
    )


@register(
    "x50_typeof_spellings",
    oracle="""
    SELECT o_orderkey,
           'bigint' AS t_key, 'varchar' AS t_status, 'double' AS t_price,
           'timestamp(6)' AS t_date, 'array(bigint)' AS t_arr,
           'map(varchar, bigint)' AS t_map,
           'row(a bigint, b varchar)' AS t_row,
           'decimal(12,2)' AS t_dec, 'unknown' AS t_null, 'double' AS t_dbl,
           'timestamp(0)' AS t_ts0, 'timestamp(3)' AS t_ts3,
           'varchar(4)' AS t_vc
    FROM orders WHERE o_orderkey < 2000
    """,
)
def x50_typeof_spellings(spark, sf_dir):
    """Differential certification of typeof()'s Trino type-name
    spellings (_rewrite_typeof_trino, a round-11 probe catch): Spark's
    typeof returns catalog spellings (``bigint`` survives, but ``int``/
    ``string``/``array<bigint>``/``struct<a:bigint>`` all silently
    diverged from Trino's ``integer``/``varchar``/``array(bigint)``/
    ``row(a bigint)``).  The rewrite maps the output through a
    constant JVM-side string chain; the oracle pins the expected Trino
    spellings as literals — scalar, complex (array/map/row with
    Trino's comma-space convention vs decimal's no-space), NULL
    (``unknown``), the timestamp(6) mapping for this engine's
    µs-precision timestamp COLUMNS, and the round-13 literal
    constant-folds: per-literal timestamp precision (fractional-digit
    count) and varchar(n) over the literal's code-point length with
    doubled-quote escapes counted once.

    Reference parity: typeof evaluates in Trino, text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   typeof(o_orderkey) AS t_key,
                   typeof(o_orderstatus) AS t_status,
                   typeof(o_totalprice) AS t_price,
                   typeof(o_orderdate) AS t_date,
                   typeof(ARRAY[o_orderkey]) AS t_arr,
                   typeof(MAP(ARRAY[o_orderstatus], ARRAY[o_orderkey]))
                     AS t_map,
                   typeof(CAST(ROW(o_orderkey, o_orderstatus)
                               AS ROW(a BIGINT, b VARCHAR))) AS t_row,
                   typeof(CAST(o_totalprice AS DECIMAL(12,2))) AS t_dec,
                   typeof(NULL) AS t_null,
                   typeof(1.5E0) AS t_dbl,
                   typeof(TIMESTAMP '2020-01-15') AS t_ts0,
                   typeof(TIMESTAMP '2020-01-15 10:30:00.123') AS t_ts3,
                   typeof('ab''c') AS t_vc
            FROM orders WHERE o_orderkey < 2000
            """
        )
    )


@register(
    "x51_array_minmax_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber > 3 THEN NULL
                ELSE greatest(l_quantity, l_discount, l_tax) END AS mx,
           least(l_quantity, l_discount) AS mn,
           l_extendedprice AS single
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def x51_array_minmax_nulls(spark, sf_dir):
    """Differential certification of array_max/array_min's
    null-containment semantics (_rewrite_array_minmax_nulls, a
    round-11 probe catch): Trino returns NULL when the array CONTAINS
    a null element (null-rejecting comparator) while Spark's builtins
    silently skip nulls — ``array_max(ARRAY[1, NULL])`` was 1.  The
    ``mx`` column injects a NULL element on l_linenumber > 3 rows
    (where the guard must yield NULL); the oracle spells the contract
    independently via CASE + greatest/least over the same elements.

    Reference parity: Trino ArrayMaxFunction/ArrayMinFunction, text
    forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_orderkey, l_linenumber,
                   array_max(ARRAY[l_quantity, l_discount,
                             CASE WHEN l_linenumber > 3 THEN NULL
                                  ELSE l_tax END]) AS mx,
                   array_min(ARRAY[l_quantity, l_discount]) AS mn,
                   array_max(ARRAY[l_extendedprice]) AS single
            FROM lineitem WHERE l_orderkey < 3000
            """
        )
    )


@register(
    "x52_double_round_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * 100.0 + 0.5) / 100.0 AS r2,
           floor(l_discount * 10.0 + 0.5) / 10.0 AS r1,
           floor((l_partkey * 5 + 5) * power(10, -1) + 0.5)
             / power(10, -1) AS rneg,
           floor(l_quantity + 0.5) / 1.0 AS r0,
           floor(l_tax * power(10, l_linenumber % 3) + 0.5)
             / power(10, l_linenumber % 3) AS rvar
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def x52_double_round_semantics(spark, sf_dir):
    """Differential certification of round(double, n)'s binary-scaled
    Trino semantics (_rewrite_double_round, a round-11 probe catch):
    Trino computes ``Math.floor(x * 10^n + 0.5) / 10^n``
    (sign-mirrored) in IEEE doubles while Spark rounds the shortest
    DECIMAL spelling HALF_UP — they split exactly on values whose
    decimal spelling sits on a .5 boundary the binary product has
    fallen below (round(1.005E0, 2): Trino 1.0, stock Spark 1.01).
    Plain double columns are knowable via the catalog map (the x47
    contract); ``rneg`` covers a negative-scale round over a
    CAST-typed operand, ``rvar`` a non-literal scale.  The oracle
    spells the floor form explicitly (lineitem measures are
    non-negative, so the un-mirrored spelling is exact); the
    randomized sweep in tests/test_differential_semantics.py crosses
    signs and boundary tails.

    Reference parity: Trino MathFunctions.round(double, long), text
    forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice, 2) AS r2,
                   round(l_discount, 1) AS r1,
                   round(CAST(l_partkey * 5 + 5 AS DOUBLE), -1) AS rneg,
                   round(l_quantity, 0) AS r0,
                   round(l_tax, l_linenumber % 3) AS rvar
            FROM lineitem WHERE l_orderkey < 3000
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x53_cast_rounding_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice) AS BIGINT) AS cb,
           CAST(round(l_quantity) AS INTEGER) AS ci,
           CAST(round(l_tax) AS INTEGER) AS tc,
           CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)))
                AS BIGINT) AS dec_b,
           CAST(round(l_quantity - 25.5) AS BIGINT) AS neg
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def x53_cast_rounding_semantics(spark, sf_dir):
    """Differential certification of CAST-to-integral ROUNDING
    (_rewrite_cast_rounding; round-11 probe catch, round-12 tie
    correction): Trino's CAST of a DOUBLE to an integral type is
    ``DoubleMath.roundToLong(HALF_UP)`` — ties AWAY from zero, so the
    ``neg`` column (integral l_quantity - 25.5 — every row a .5 tie,
    half of them negative) is the load-bearing differential: -24.5 →
    -25, where the previously-shipped Math.round form gave -24.
    DECIMAL casts are the same HALF_UP, while Spark's ANSI cast
    TRUNCATES toward zero in both cases — ``CAST(2.5E0 AS BIGINT)``
    was silently 2.  Plain double columns are knowable via the
    catalog map; ``dec_b`` covers the decimal branch through a
    CAST-typed operand, ``neg`` a CAST-to-DOUBLE operand wrapping an
    expression.  The oracle spells HALF_UP independently via DuckDB's
    ``round()`` (C round(): half away from zero).

    Reference parity: Trino DoubleOperators.castToLong
    (DoubleMath.roundToLong HALF_UP) / DecimalCasts HALF_UP, text
    forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_orderkey, l_linenumber,
                   CAST(l_extendedprice AS BIGINT) AS cb,
                   CAST(l_quantity AS INTEGER) AS ci,
                   TRY_CAST(l_tax AS INTEGER) AS tc,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS BIGINT)
                     AS dec_b,
                   CAST(CAST(l_quantity - 25.5 AS DOUBLE) AS BIGINT) AS neg
            FROM lineitem WHERE l_orderkey < 3000
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x54_array_subscript_guard",
    oracle="""
    SELECT vec_id,
           embedding[CAST(vec_id % 4 AS INTEGER) + 1] AS vmod,
           embedding[1] AS first
    FROM embeddings WHERE vec_id < 200
    """,
)
def x54_array_subscript_guard(spark, sf_dir):
    """Differential certification of the schema-aware negative-
    subscript guard (round-11 extension of _rewrite_subscripts): a
    subscript on a KNOWN array column gets a runtime negativity check
    that raises like Trino ("Array subscript is negative") instead of
    Spark's element_at silently reading from the end; positive
    indexing through the guard stays exact (this oracle — DuckDB list
    indexing is natively 1-based).  The raise path is pinned by
    pytest (tests/test_trino_compat.py::
    test_array_subscript_negative_guard); map columns and unknowable
    bases keep the documented residue.

    Reference parity: Trino ArraySubscriptOperator raises
    INVALID_FUNCTION_ARGUMENT on negative indices, text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT vec_id,
                   embedding[CAST(vec_id % 4 AS INTEGER) + 1] AS vmod,
                   embedding[1] AS first
            FROM embeddings WHERE vec_id < 200
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x55_cast_double_varchar",
    oracle="""
    SELECT i, expected AS rendered FROM (VALUES
        (1, '1.5E0'), (2, '1E2'), (3, '0E0'), (4, 'NaN'),
        (5, '1E-3'), (6, '1.23456E2'), (7, 'Infinity'),
        (8, '-2.5E0'), (9, '5E-324'), (10, '1.7976931348623157E308'),
        (11, NULL), (12, '2.675E0'), (13, '-0E0'), (14, '0E0')
    ) AS t(i, expected)
    """,
)
def x55_cast_double_varchar(spark, sf_dir):
    """Differential certification of CAST(double AS VARCHAR)'s Trino
    rendering (round-11 residue closure in _rewrite_cast_rounding):
    Trino renders doubles in always-scientific shortest-roundtrip
    form since Trino 373 — '1.5E0', '1E2', '0E0', 'NaN',
    subnormal/MAX extremes — where Spark renders '1.5'/'100.0'
    (silent text divergence).  Knowable-double operands only (the
    x47 contract); the oracle pins the expected spellings as
    literals over a VALUES relation; rows 13/14 pin the ±0 sign
    through the runtime path (VALUES rows are per-row values, immune
    to the literal-CAST conflation the translate-time constant fold
    closes).  NULL stays NULL (the JVM-side
    isnan guard splits Arrow's NULL/NaN conflation).  Residue: REAL
    operands (no float32 shortest-repr Python-side), varchar(n)
    targets, and Spark's normalization of the -0.0E0 literal
    (renders '0E0' where Trino keeps '-0E0').

    Reference parity: Trino's Ryu-based double→varchar cast
    (io.trino.operator.scalar.DoubleOperators), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT i, CAST(x AS VARCHAR) AS rendered FROM (VALUES
                (1, 1.5E0), (2, 1.0E2), (3, 0.0E0),
                (4, CAST('NaN' AS DOUBLE)),
                (5, 1.0E-3), (6, 123.456E0),
                (7, CAST('Infinity' AS DOUBLE)),
                (8, -2.5E0), (9, 5.0E-324),
                (10, 1.7976931348623157E308),
                (11, CAST(NULL AS DOUBLE)), (12, 2.675E0),
                (13, -0.0E0), (14, 0.0E0)
            ) AS t(i, x)
            """,
            column_types={"x": "double", "i": "int"},
        )
    )


@register(
    "x56_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM spine WHERE n < 7
    )
    SELECT s.n,
           count(l.l_orderkey) AS cnt,
           COALESCE(sum(l.l_quantity), 0) AS qty
    FROM spine s LEFT JOIN lineitem l ON l.l_linenumber = s.n
    GROUP BY s.n
    """,
)
def x56_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE end-to-end (round-11 coverage addition): Trino
    supports recursive CTEs (expanded to a bounded iterative form,
    docs/src/main/sphinx/sql/select.md WITH RECURSIVE) and Spark 4.1
    executes them natively (UnionLoop iterative plan), so the façade
    passes them through — the read-only classifier already accepts
    the WITH form and translate() leaves the recursion structure
    intact.  The query builds a 7-row integer spine recursively and
    LEFT JOINs real lineitem rows onto it (empty line numbers keep a
    zero row), so both the recursion and its join/aggregate
    composition are value-certified; DuckDB runs the identical
    recursive SQL as the oracle.

    Scale note: the recursive spine materializes ONCE on the driver
    plan side (7 rows); the join against lineitem is an ordinary
    broadcast of the tiny spine side — recursion depth is bounded by
    the anchor predicate, never by table size.

    Reference parity: recursion evaluates in Trino, text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            WITH RECURSIVE spine(n) AS (
                SELECT 1 UNION ALL SELECT n + 1 FROM spine WHERE n < 7
            )
            SELECT s.n,
                   count(l.l_orderkey) AS cnt,
                   COALESCE(sum(l.l_quantity), 0) AS qty
            FROM spine s LEFT JOIN lineitem l ON l.l_linenumber = s.n
            GROUP BY s.n
            """
        )
    )


@register(
    "x57_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           string_agg(DISTINCT o_orderstatus, '|'
                      ORDER BY o_orderstatus) AS distinct_statuses
    FROM orders WHERE o_orderkey < 300
    GROUP BY o_orderpriority
    """,
)
def x57_listagg(spark, sf_dir):
    """listagg certification (round-11 coverage): Trino's
    ``listagg(x, sep) WITHIN GROUP (ORDER BY ...)`` — Spark 4.x runs
    the same spelling natively with matching semantics (NULL inputs
    skipped, default ON OVERFLOW ERROR never fires below the length
    cap), so the façade passes it through; this entry value-certifies
    the grouped + DISTINCT forms against DuckDB's independently-spelled
    string_agg.  Residue (loud, documented SURVEY §13): the explicit
    ``ON OVERFLOW TRUNCATE/ERROR`` clause is a Spark parse error, never
    a silent divergence.

    Reference parity: listagg evaluates in Trino, text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT o_orderpriority,
                   listagg(o_orderstatus, ',')
                     WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
                   listagg(DISTINCT o_orderstatus, '|')
                     WITHIN GROUP (ORDER BY o_orderstatus)
                     AS distinct_statuses
            FROM orders WHERE o_orderkey < 300
            GROUP BY o_orderpriority
            """
        )
    )


@register(
    "x58_decimal_division_scale",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST((2 * CAST(round(l_extendedprice * 100) AS HUGEINT) * 100
                 + CAST(round(l_quantity * 100) AS HUGEINT))
                // (2 * CAST(round(l_quantity * 100) AS HUGEINT))
                AS BIGINT) AS unit_price_c,
           CAST((2 * CAST(round(l_discount * 100) AS HUGEINT)
                 + CAST(round(l_quantity) AS HUGEINT))
                // (2 * CAST(round(l_quantity) AS HUGEINT))
                AS BIGINT) AS unit_disc_c
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def x58_decimal_division_scale(spark, sf_dir):
    """Differential certification of Trino's DECIMAL-division type
    calculus (_rewrite_decimal_division, a round-11 catch): Trino
    keeps ``scale = max(s1, s2)`` and rounds HALF_UP (``DECIMAL
    '1.00' / DECIMAL '3.00' = 0.33``) while Spark widens the result
    scale (0.3333333333333) — a silent VALUE divergence on every
    Trino-valid decimal division.  Knowable operands (CAST targets
    here) get a CAST to Trino's result type; results are emitted as
    SCALED BIGINTs (×10^s) so the oracle can spell the contract in
    exact HUGEINT arithmetic — ``(2·A·10^k + B) // (2·B)`` is
    half-up on the positive lineitem measures, fully independent of
    DuckDB's own decimal-division rules.  The randomized sweep in
    tests/test_differential_semantics.py crosses signs and scales
    against a Fraction oracle and pins the integer-div interplay.

    Residue (documented at the rewrite): double-rounding inside a
    ~1e-9-wide band around half boundaries; unparameterized DECIMAL
    operand defaults.

    Reference parity: Trino DecimalOperators division
    (docs functions/decimal.md type calculus), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return spark.sql(
        translate(
            """
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        / CAST(l_quantity AS DECIMAL(12,2))
                        * 100 AS BIGINT) AS unit_price_c,
                   CAST(CAST(l_discount AS DECIMAL(5,2))
                        / CAST(l_quantity AS DECIMAL(4,0))
                        * 100 AS BIGINT) AS unit_disc_c
            FROM lineitem WHERE l_orderkey < 3000
            """
        )
    )


@register(
    "x59_xxhash64",
    oracle="""
    SELECT i, expected AS digest FROM (VALUES
        (1, 'EF46DB3751D8E999'), (2, 'D24EC4F1A98C6E5B'),
        (3, '44BC2CF5AD770999'), (4, '4AE5684CD402FBB4'),
        (5, NULL)
    ) AS t(i, expected)
    """,
)
def x59_xxhash64(spark, sf_dir):
    """Differential certification of xxhash64's Trino contract
    (_rewrite_xxhash64, a round-11 catch): standard XXH64 (seed 0)
    over raw VARBINARY bytes, big-endian VARBINARY out — Spark's
    builtin of the same name is a seed-42 hash of its internal value
    format returning BIGINT, so every user-spelled digest silently
    differed.  Rows 1-3 pin the PUBLISHED XXH64 reference vectors
    ('', 'a', 'abc'); row 4 is a 46-byte input exercising the
    32-byte lane-accumulator path (self-derived, regression-pinned);
    row 5 pins NULL-in-NULL-out.  The engine-local checksum()
    rollup deliberately keeps Spark's builtin (generated after the
    rename pass).

    Reference parity: io.trino.operator.scalar.VarbinaryFunctions
    xxhash64, text forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT i, hex(xxhash64(to_utf8(s))) AS digest FROM (VALUES
                (1, ''), (2, 'a'), (3, 'abc'),
                (4, '0123456789abcdefghijklmnopqrstuvwxyz0123456789'),
                (5, CAST(NULL AS VARCHAR))
            ) AS t(i, s)
            """
        )
    )


@register(
    "x60_unicode_case_semantics",
    oracle="""
    SELECT i, expected_u AS up, expected_l AS lo, ln FROM (VALUES
        (1, 'STRAßE', 'straße', 6),
        (2, 'İSTANBUL', 'istanbul', 8),
        (3, 'ﬁLE', 'ﬁle', 3),
        (4, 'HELLO', 'hello', 5),
        (5, NULL, NULL, NULL),
        (6, 'ẞTRAßE', 'ßtraße', 6),
        (7, 'AB😀CD', 'ab😀cd', 5),
        (8, 'EDUTÉ', 'eduté', 5),
        (9, 'ΒΑΣ ΒΑΣ', 'βασ βασ', 7),
        (10, 'ᾼ ᾈ', 'ᾳ ᾀ', 3)
    ) AS t(i, expected_u, expected_l, ln)
    """,
)
def x60_unicode_case_semantics(spark, sf_dir):
    """Differential certification of the round-12 simple-case-mapping
    catch (_rewrite_simple_case): Trino upper()/lower() map each code
    point 1:1 via Character.toUpperCase/toLowerCase (airlift
    SliceUtf8) — upper('straße') = 'STRAßE', lower('İSTANBUL') =
    'istanbul' (bare i), upper('ﬁle') = 'ﬁLE' — where Spark's Java
    full mapping said 'STRASSE'/'i̇stanbul'/'FILE', silently, on any
    German/Turkish corpus.  Rows also pin code-point length (Trino
    counts code points: 'ab😀cd' is 5) and code-point reverse (row 8
    input is reverse('étude'), precomposed é — the combining-mark
    ordering cases live in the randomized sweep).  The oracle pins expected spellings as
    literals over a VALUES relation (DuckDB's own upper() is
    full-mapping and would be wrong here — the divergence the sweep
    in tests/test_differential_semantics.py caught).

    Reference parity: Trino StringFunctions.upper/lower →
    SliceUtf8.toUpperCase/toLowerCase, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT i, upper(s) AS up, lower(s) AS lo, length(s) AS ln
            FROM (VALUES
                (1, 'straße'), (2, 'İstanbul'), (3, 'ﬁle'),
                (4, 'Hello'), (5, CAST(NULL AS VARCHAR)),
                (6, 'ẞtraße'), (7, 'ab😀cd'), (8, reverse('étude')),
                (9, 'ΒΑΣ ΒΑΣ'), (10, 'ᾳ ᾈ')
            ) AS t(i, s)
            """
        )
    )


@register(
    "x61_date_interval_semantics",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 1 * INTERVAL 1 MONTH AS DATE) AS m1,
           CAST(CAST(o_orderdate AS DATE) + 13 * INTERVAL 1 MONTH AS DATE) AS m13,
           CAST(CAST(o_orderdate AS DATE) - 1 * INTERVAL 1 MONTH AS DATE) AS mneg,
           CAST(CAST(o_orderdate AS DATE) + 48 * INTERVAL 1 HOUR AS DATE) AS wh,
           CAST(CAST(o_orderdate AS DATE) + 7 * INTERVAL 1 DAY AS DATE) AS d7,
           CAST(o_orderdate AS TIMESTAMP) + (o_orderkey % 5) * INTERVAL 1 YEAR
             + 36 * INTERVAL 1 HOUR AS tsmix
    FROM orders WHERE o_orderkey < 2000
    """,
)
def x61_date_interval_semantics(spark, sf_dir):
    """Differential certification of the round-12 date-interval catch
    (_rewrite_date_interval) and month-end clamping over real data:
    Trino DATE ± day-time interval keeps the DATE type (wh: +48
    hours is two whole days → DATE, where Spark promoted to
    TIMESTAMP) and year-month addition clamps to the target
    month-end (m1/m13/mneg cross 31→30/28/29-day months across the
    orders date range); the date operands are CAST-typed
    (o_orderdate is a timestamp in the testdata parquet — the CAST
    target is the x47 knowability route); tsmix exercises TIMESTAMP arithmetic mixing
    a column-dependent year-month interval with a day-time one
    (CAST(date AS TIMESTAMP) keeps Spark arithmetic — the operand is
    no longer date-typed).  The sub-day raise path is pinned by
    pytest (tests/test_trino_compat.py::
    test_date_interval_trino_semantics).  The oracle spells interval
    multiples (DuckDB's INTERVAL literal rejects negative/derived
    counts) and CASTs its timestamp-promoting date arithmetic back
    to DATE.

    Reference parity: Trino DateTimeOperators
    datePlusIntervalDayToSecond (whole-day check) /
    datePlusIntervalYearToMonth (month-end clamp), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    register_tables(spark, sf_dir)
    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) + INTERVAL '1' MONTH AS m1,
                   CAST(o_orderdate AS DATE) + INTERVAL '13' MONTH AS m13,
                   CAST(o_orderdate AS DATE) - INTERVAL '1' MONTH AS mneg,
                   CAST(o_orderdate AS DATE) + INTERVAL '48' HOUR AS wh,
                   CAST(o_orderdate AS DATE) + INTERVAL '7' DAY AS d7,
                   CAST(o_orderdate AS TIMESTAMP)
                     + (o_orderkey % 5) * INTERVAL '1' YEAR
                     + INTERVAL '36' HOUR AS tsmix
            FROM orders WHERE o_orderkey < 2000
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x62_real_varchar_rendering",
    oracle="""
    SELECT i, expected AS rendered FROM (VALUES
        (1, '1E-1'), (2, '1.5E0'), (3, '1.23456E2'),
        (4, 'NaN'), (5, NULL), (6, '-2.675E0'), (7, '1E2'),
        (8, '6E-45'), (9, '3.4028235E38')
    ) AS t(i, expected)
    """,
)
def x62_real_varchar_rendering(spark, sf_dir):
    """Differential certification of the round-12 REAL rendering and
    fractional typed-literal closures: CAST(real AS VARCHAR) computes
    shortest-roundtrip digits over FLOAT32 (Trino's Ryu-for-float —
    REAL '0.1' renders '1E-1' where the float64 path would say
    '1.0000000149011612E-1'), and DOUBLE '...'/REAL '...' typed
    literals respell to CASTs (Spark's parser rejects fractional
    typed literals).  Rows 8/9 pin the float32 denormal floor
    (5.6e-45 → shortest '6E-45') and FLT_MAX.  The oracle pins
    expected spellings as literals over a VALUES relation (DuckDB
    renders floats positionally).

    Reference parity: Trino RealOperators castToVarchar (Ryu float32
    shortest form), text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT i, CAST(x AS VARCHAR) AS rendered FROM (VALUES
                (1, REAL '0.1'), (2, REAL '1.5'), (3, REAL '123.456'),
                (4, CAST('NaN' AS REAL)), (5, CAST(NULL AS REAL)),
                (6, REAL '-2.675'), (7, REAL '100'),
                (8, REAL '5.605193857299268E-45'),
                (9, REAL '3.4028235E38')
            ) AS t(i, x)
            """,
            column_types={"x": "float", "i": "int"},
        )
    )


@register(
    "x63_try_cast_nonfinite",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, NULL), (2, NULL), (3, NULL), (4, NULL), (5, NULL),
        (6, -9223372036854775808), (7, 3), (8, -3),
        (9, 9223372036854774784), (10, NULL), (11, NULL)
    ) AS t(i, expected)
    """,
)
def x63_try_cast_nonfinite(spark, sf_dir):
    """Differential certification of the round-13 TRY_CAST closure
    (_rewrite_cast_rounding; VERDICT r12 #5): Trino's try_cast absorbs
    DoubleMath.roundToLong's ArithmeticException — NaN, ±Infinity, and
    beyond-long magnitudes all yield NULL — where the previous rewrite's
    floor() overflow fired OUTSIDE the try scope and errored.  Rows 1-5
    and 10-11 pin the guarded-to-NULL set (Infinity/-Infinity/NaN/±1e300,
    plus an INTEGER and a SMALLINT target); row 6 pins the -2^63
    special case (a VALID bigint whose sign-mirrored |x| + 0.5 would
    overflow floor — roundToLong returns Long.MIN); rows 7-8 keep the
    HALF_UP away-from-zero ties; row 9 the largest in-range double.
    The oracle pins expected values as literals over a VALUES relation
    (DuckDB's own double→int cast rounds half-to-even, a different
    contract).

    Reference parity: Trino DoubleOperators.castToLong under TRY
    (TryCastFunction wraps the ArithmeticException), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i, TRY_CAST(CAST('Infinity' AS DOUBLE) AS BIGINT) AS v
            UNION ALL SELECT 2, TRY_CAST(CAST('-Infinity' AS DOUBLE) AS BIGINT)
            UNION ALL SELECT 3, TRY_CAST(CAST('NaN' AS DOUBLE) AS BIGINT)
            UNION ALL SELECT 4, TRY_CAST(1.0E300 AS BIGINT)
            UNION ALL SELECT 5, TRY_CAST(-1.0E300 AS BIGINT)
            UNION ALL SELECT 6, CAST(-9.223372036854776E18 AS BIGINT)
            UNION ALL SELECT 7, TRY_CAST(2.5E0 AS BIGINT)
            UNION ALL SELECT 8, TRY_CAST(-2.5E0 AS BIGINT)
            UNION ALL SELECT 9, TRY_CAST(9.223372036854775E18 AS BIGINT)
            UNION ALL SELECT 10, CAST(TRY_CAST(CAST('NaN' AS DOUBLE)
                                               AS INTEGER) AS BIGINT)
            UNION ALL SELECT 11, CAST(TRY_CAST(1.0E300 AS SMALLINT) AS BIGINT)
            """
        )
    )


@register(
    "x64_stat_agg_edge_contracts",
    oracle="""
    SELECT CAST(l_returnflag AS VARCHAR) AS grp,
           round(corr(l_quantity, l_extendedprice), 6) AS c_norm,
           corr(l_quantity * 0.0 + 5.0, l_extendedprice) AS c_const,
           regr_slope(l_extendedprice, l_quantity * 0.0) AS s_const,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS s_norm,
           regr_intercept(l_extendedprice, l_quantity * 0.0 + 3.0) AS i_const
    FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_returnflag
    UNION ALL
    SELECT 'o' || CAST(l_orderkey AS VARCHAR),
           corr(l_quantity, l_extendedprice),
           corr(l_quantity, l_extendedprice),
           regr_slope(l_extendedprice, l_quantity),
           regr_slope(l_extendedprice, l_quantity),
           regr_intercept(l_extendedprice, l_quantity)
    FROM lineitem WHERE l_orderkey < 200
    GROUP BY l_orderkey HAVING count(*) = 1
    """,
)
def x64_stat_agg_edge_contracts(spark, sf_dir):
    """Differential certification of the round-13 statistical-aggregate
    edge closure (_rewrite_stat_agg_edges): Trino's corr / regr_slope /
    regr_intercept write only FINITE results and NULL otherwise
    (DoubleCorrelationAggregation / DoubleRegressionAggregation), while
    Spark's corr RAISES DIVIDE_BY_ZERO under ANSI mode on a constant
    group (c_const — every group constant-x by construction) and the
    regr pair returns NaN on non-finite inputs.  The UNION arm pins the
    single-row-group gate (n=1 → NULL for all three).  Normal-path
    values round at 6 digits (the a11 float-accumulation contract);
    edge columns are exact NULLs.  DuckDB's corr/regr natively yield
    NULL on the constant and single-row gates — a true differential.

    Reference parity: Trino DoubleCorrelationAggregation.corr /
    DoubleRegressionAggregation isFinite-else-NULL output gates, text
    forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return _asql(
        spark,
        sf_dir,
        translate(
            """
            SELECT CAST(l_returnflag AS VARCHAR) AS grp,
                   round(corr(l_quantity, l_extendedprice), 6) AS c_norm,
                   corr(l_quantity * 0.0 + 5.0, l_extendedprice) AS c_const,
                   regr_slope(l_extendedprice, l_quantity * 0.0) AS s_const,
                   round(regr_slope(l_extendedprice, l_quantity), 6) AS s_norm,
                   regr_intercept(l_extendedprice, l_quantity * 0.0 + 3.0)
                     AS i_const
            FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_returnflag
            UNION ALL
            SELECT 'o' || CAST(l_orderkey AS VARCHAR),
                   corr(l_quantity, l_extendedprice),
                   corr(l_quantity, l_extendedprice),
                   regr_slope(l_extendedprice, l_quantity),
                   regr_slope(l_extendedprice, l_quantity),
                   regr_intercept(l_extendedprice, l_quantity)
            FROM lineitem WHERE l_orderkey < 200
            GROUP BY l_orderkey HAVING count(*) = 1
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x65_array_comparison_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, NULL), (2, false), (3, false), (4, true),
        (5, NULL), (6, true), (7, true), (8, true),
        (9, true), (10, false), (11, NULL), (12, true),
        (13, NULL), (14, true), (15, NULL)
    ) AS t(i, expected)
    """,
)
def x65_array_comparison_semantics(spark, sf_dir):
    """Differential certification of the round-13 array-comparison
    closure (_rewrite_array_comparisons): Trino array equality is
    THREE-VALUED (ARRAY[1,NULL] = ARRAY[1,NULL] → NULL; decided-unequal
    pair or length mismatch → false) where Spark's ``=`` treats null
    elements as equal values and says TRUE; ordering scans to the first
    differing position with a length tiebreak (null elements past the
    decision are never visited — rows 6/7), where Spark orders nulls
    smallest.  The raise path (a null AT the deciding position —
    Trino's checkElementNotNull) is pinned by pytest
    (tests/test_differential_semantics.py); the oracle pins expected
    booleans as literals over a VALUES relation (DuckDB's own array
    ordering returns NULL where Trino throws — a different contract).
    Rows 13-15 pin IN/NOT IN lists — Trino evaluates IN as chained
    three-valued equality (_rewrite_array_in_lists), where Spark's IN
    reused its null-conflating array equality.

    Reference parity: Trino ArrayEqualOperator / ArrayOperators
    lexicographic comparisons, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i, ARRAY[1, NULL] = ARRAY[1, NULL] AS v
            UNION ALL SELECT 2, ARRAY[1, NULL] = ARRAY[2, NULL]
            UNION ALL SELECT 3, ARRAY[1, NULL] = ARRAY[1]
            UNION ALL SELECT 4, ARRAY[1, 2] = ARRAY[1, 2]
            UNION ALL SELECT 5, ARRAY[1, NULL] <> ARRAY[1, NULL]
            UNION ALL SELECT 6, ARRAY[1, NULL] < ARRAY[2, NULL]
            UNION ALL SELECT 7, ARRAY[1] < ARRAY[1, NULL]
            UNION ALL SELECT 8, ARRAY[1, 2] <= ARRAY[1, 2]
            UNION ALL SELECT 9, ARRAY[2] > ARRAY[1, 9]
            UNION ALL SELECT 10, ARRAY[1, 2] >= ARRAY[1, 3]
            UNION ALL SELECT 11, CAST(NULL AS ARRAY(INTEGER)) = ARRAY[1]
            UNION ALL SELECT 12, ARRAY[1, NULL] <> ARRAY[2]
            UNION ALL SELECT 13, ARRAY[1, NULL] IN (ARRAY[1, NULL])
            UNION ALL SELECT 14, ARRAY[1, 2] IN (ARRAY[3], ARRAY[1, 2])
            UNION ALL SELECT 15, ARRAY[1, NULL] NOT IN (ARRAY[1, NULL])
            """
        )
    )


@register(
    "x66_row_comparison_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, NULL), (2, false), (3, true), (4, NULL),
        (5, true), (6, true), (7, false), (8, true),
        (9, NULL), (10, NULL), (11, true)
    ) AS t(i, expected)
    """,
)
def x66_row_comparison_semantics(spark, sf_dir):
    """Differential certification of the round-13 ROW-comparison
    closure (_rewrite_array_comparisons' row arm): Trino ROW equality
    is THREE-VALUED (ROW(1,NULL) = ROW(1,NULL) → NULL; a decided
    unequal field → false — RowEqualOperator) where Spark's struct
    ``=`` treats null fields as equal values and says TRUE; ordering
    scans fields in declared order with a null-field raise at visited
    positions (rows 5/6 decide at field 1 before any NULL is visited).
    Constructors destructure to their argument expressions; row 9/10
    pin the named_struct and ROW-cast accessor paths.  The raise path
    is pinned by pytest; the oracle pins expected booleans as literals
    (DuckDB struct comparison returns NULL where Trino throws).

    Reference parity: Trino RowEqualOperator /
    RowComparisonOperators, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i, ROW(1, NULL) = ROW(1, NULL) AS v
            UNION ALL SELECT 2, ROW(1, NULL) = ROW(2, NULL)
            UNION ALL SELECT 3, ROW(1, 2) = ROW(1, 2)
            UNION ALL SELECT 4, ROW(1, NULL) <> ROW(1, NULL)
            UNION ALL SELECT 5, ROW(1, NULL) < ROW(2, NULL)
            UNION ALL SELECT 6, ROW(2, 0) > ROW(1, 9)
            UNION ALL SELECT 7, ROW(1, 2) < ROW(1, 2)
            UNION ALL SELECT 8, ROW(1, 2) <= ROW(1, 2)
            UNION ALL SELECT 9, named_struct('a', 1, 'b', CAST(NULL AS INTEGER))
                                = named_struct('a', 1, 'b', CAST(NULL AS INTEGER))
            UNION ALL SELECT 10, CAST(ROW(1, NULL) AS ROW(a INTEGER, b INTEGER))
                                 = CAST(ROW(1, NULL) AS ROW(a INTEGER, b INTEGER))
            UNION ALL SELECT 11, ROW(1, NULL) <> ROW(2, 5)
            """
        )
    )


@register(
    "x67_map_equality_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, true), (2, true), (3, false), (4, false), (5, false),
        (6, NULL), (7, false), (8, true), (9, NULL), (10, NULL)
    ) AS t(i, expected)
    """,
)
def x67_map_equality_semantics(spark, sf_dir):
    """Differential certification of the round-13 map-equality closure
    (_rewrite_array_comparisons' map arm): Spark has NO map equality at
    all (INVALID_ORDERING_TYPE — a valid Trino query was a hard error),
    while Trino's MapEqualOperator is key-set-based and three-valued:
    order-insensitive (row 2), size/key mismatches decide false, a
    decided-unequal value pair beats a NULL value elsewhere (row 7),
    and NULL values alone leave the result NULL (rows 6/9).  The
    oracle pins expected booleans as literals (DuckDB map equality is
    POSITIONAL over its ordered entry list — a different contract).

    Reference parity: Trino MapEqualOperator (MapGenericEquality),
    text forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i,
                   MAP(ARRAY[1], ARRAY['a']) = MAP(ARRAY[1], ARRAY['a']) AS v
            UNION ALL SELECT 2, MAP(ARRAY[1,2], ARRAY['a','b'])
                                = MAP(ARRAY[2,1], ARRAY['b','a'])
            UNION ALL SELECT 3, MAP(ARRAY[1], ARRAY['a'])
                                = MAP(ARRAY[1], ARRAY['b'])
            UNION ALL SELECT 4, MAP(ARRAY[1], ARRAY['a'])
                                = MAP(ARRAY[2], ARRAY['a'])
            UNION ALL SELECT 5, MAP(ARRAY[1], ARRAY['a'])
                                = MAP(ARRAY[1,2], ARRAY['a','b'])
            UNION ALL SELECT 6, MAP(ARRAY[1], ARRAY[CAST(NULL AS VARCHAR)])
                                = MAP(ARRAY[1], ARRAY[CAST(NULL AS VARCHAR)])
            UNION ALL SELECT 7, MAP(ARRAY[1,2], ARRAY['a',NULL])
                                = MAP(ARRAY[1,2], ARRAY['b',NULL])
            UNION ALL SELECT 8, MAP(ARRAY[1], ARRAY['a'])
                                <> MAP(ARRAY[1], ARRAY['b'])
            UNION ALL SELECT 9, MAP(ARRAY[1], ARRAY[CAST(NULL AS VARCHAR)])
                                <> MAP(ARRAY[1], ARRAY[CAST(NULL AS VARCHAR)])
            UNION ALL SELECT 10, CAST(NULL AS MAP(INTEGER, VARCHAR))
                                 = MAP(ARRAY[1], ARRAY['a'])
            """
        )
    )


@register(
    "x68_complex_simple_case",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'miss'), (2, 'b'), (3, NULL), (4, 'miss'),
        (5, 'hit'), (6, 'one')
    ) AS t(i, expected)
    """,
)
def x68_complex_simple_case(spark, sf_dir):
    """Differential certification of the round-13 simple-CASE closure
    (_rewrite_complex_simple_case): simple CASE over a complex operand
    is sugar for chained equality, so Spark's null-conflating
    array/struct equality took WHEN branches Trino's three-valued
    equality skips — ``CASE ARRAY[1, NULL] WHEN ARRAY[1, NULL] THEN
    'hit' ELSE 'miss' END`` is 'miss' in Trino (a NULL comparison is
    not a match) and was silently 'hit'.  The rewrite respells the
    CASE to its searched form over the x65/x66/x67 equality
    expressions; scalar simple CASE (row 6) is untouched.  The oracle
    pins expected strings as literals (DuckDB's struct/list equality
    contracts differ in these corners).

    Reference parity: Trino desugars simple CASE through the same
    EQUAL operator chain (SimpleCaseExpression), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CASE ARRAY[1, NULL] WHEN ARRAY[1, NULL]
                   THEN 'hit' ELSE 'miss' END AS v
            UNION ALL SELECT 2, CASE ARRAY[1, 2] WHEN ARRAY[3] THEN 'a'
                   WHEN ARRAY[1, 2] THEN 'b' ELSE 'c' END
            UNION ALL SELECT 3, CASE ARRAY[1] WHEN ARRAY[2] THEN 'a' END
            UNION ALL SELECT 4, CASE ROW(1, NULL) WHEN ROW(1, NULL)
                   THEN 'hit' ELSE 'miss' END
            UNION ALL SELECT 5, CASE MAP(ARRAY[1], ARRAY['x'])
                   WHEN MAP(ARRAY[1], ARRAY['x']) THEN 'hit' ELSE 'miss' END
            UNION ALL SELECT 6, CASE 1 WHEN 1 THEN 'one' ELSE 'other' END
            """
        )
    )


@register(
    "x69_least_nan_propagation",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'NaN'), (2, 'NaN'), (3, '1E0'), (4, NULL),
        (5, 'NaN'), (6, '-2E0')
    ) AS t(i, expected)
    """,
)
def x69_least_nan_propagation(spark, sf_dir):
    """Differential certification of the round-13 least()-NaN closure
    (_rewrite_least_greatest_nulls' NaN arm): Trino's least/greatest
    return NaN when ANY argument is NaN; Spark orders NaN LARGEST, so
    its least() silently skipped a NaN argument (least(NaN, 1.0) was
    1.0) while greatest() agreed by accident of the same ordering.
    The NaN arm fires only for all-knowable-double arguments (an
    unconditional isnan would ANSI-error on string/date calls) and
    sits after the NULL guard (row 4 — argument null checks precede
    comparison).  Values render through the x55 varchar path so the
    oracle can pin 'NaN' as text (DuckDB's least has its own NaN
    ordering — a different contract).

    Reference parity: Trino least/greatest NaN propagation (docs:
    'returns NaN if any argument is NaN', Trino 363+), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i,
                   CAST(least(CAST('NaN' AS DOUBLE), 1.0E0) AS VARCHAR) AS v
            UNION ALL SELECT 2,
                   CAST(greatest(CAST('NaN' AS DOUBLE), 1.0E0) AS VARCHAR)
            UNION ALL SELECT 3, CAST(CAST(least(2.0E0, 1.0E0) AS DOUBLE)
                                     AS VARCHAR)
            UNION ALL SELECT 4,
                   CAST(least(CAST(NULL AS DOUBLE), CAST('NaN' AS DOUBLE))
                        AS VARCHAR)
            UNION ALL SELECT 5,
                   CAST(least(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE))
                        AS VARCHAR)
            UNION ALL SELECT 6, CAST(CAST(least(5.0E0, -2.0E0, 7.0E0)
                                          AS DOUBLE) AS VARCHAR)
            """
        )
    )


@register(
    "x70_complex_nullif",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 2), (2, NULL), (3, 1), (4, 2), (5, NULL), (6, 1), (7, NULL)
    ) AS t(i, expected)
    """,
)
def x70_complex_nullif(spark, sf_dir):
    """Differential certification of the round-13 complex-nullif
    closure (_rewrite_complex_nullif): Trino's nullif returns NULL
    only on a DECIDED-true equality — an undecided (NULL) comparison
    returns the first argument — where Spark's nullif desugared to its
    null-conflating equality (nullif(ARRAY[1,NULL], ARRAY[1,NULL]) was
    NULL, Trino keeps the array → size 2, row 1) and on MAP operands
    was a hard INVALID_ORDERING_TYPE error (rows 5/6 — reachability +
    semantics).  Outputs project to sizes/fields (the graded window
    bars complex top-level columns); the oracle pins expected scalars
    as literals.

    Reference parity: Trino nullif over the EQUAL operator
    (three-valued), text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i,
                   cardinality(nullif(ARRAY[1, NULL], ARRAY[1, NULL])) AS v
            UNION ALL SELECT 2, cardinality(nullif(ARRAY[1, 2], ARRAY[1, 2]))
            UNION ALL SELECT 3, cardinality(nullif(ARRAY[1], ARRAY[2]))
            UNION ALL SELECT 4,
                   IF(nullif(ROW(2, NULL), ROW(2, NULL)) IS NULL, NULL, 2)
            UNION ALL SELECT 5, cardinality(nullif(
                   MAP(ARRAY[1], ARRAY['a']), MAP(ARRAY[1], ARRAY['a'])))
            UNION ALL SELECT 6, cardinality(nullif(
                   MAP(ARRAY[1], ARRAY['a']), MAP(ARRAY[1], ARRAY['b'])))
            UNION ALL SELECT 7, nullif(1, 1)
            """
        )
    )


@register(
    "x71_decimal_avg_semantics",
    oracle="""
    SELECT CAST(l_returnflag AS VARCHAR) AS grp,
           CAST((200 * SUM(CAST(l_quantity AS BIGINT)) + COUNT(l_quantity))
                // (2 * COUNT(l_quantity)) AS BIGINT) AS v
    FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_returnflag
    UNION ALL
    SELECT grp, v FROM (VALUES
        ('ties_up', CAST(2 AS BIGINT)),
        ('thirds', CAST(167 AS BIGINT)),
        ('neg_away', CAST(-2 AS BIGINT)),
        ('null_skip', CAST(2 AS BIGINT)),
        ('distinct', CAST(3 AS BIGINT))
    ) AS t(grp, v)
    """,
)
def x71_decimal_avg_semantics(spark, sf_dir):
    """Differential certification of the round-14 decimal-average
    closure (_rewrite_decimal_avg): Trino's ``avg(DECIMAL(p, s))``
    returns ``DECIMAL(p, s)`` rounded HALF_UP away from zero at the
    INPUT scale (DecimalAverageAggregation) where Spark widens the
    result to ``decimal(p+4, s+4)`` — a silent VALUE divergence on
    every Trino-valid decimal average (avg{0.01, 0.02} at scale 2:
    Trino 0.02, Spark 0.015000).  Results compare as scale-2 integers
    (the q0/a2 integer-scaled protocol).  The lineitem arm is
    data-dependent (per-returnflag averages of integral quantities);
    the VALUES arms pin the half-up tie (ties_up), the repeating
    expansion (thirds: 5.00/3 → 1.67), AWAY-from-zero on negatives
    (neg_away: avg{-0.01, -0.02} → -0.02), NULL skipping, and the
    DISTINCT path (avg(DISTINCT {0.01, 0.01, 0.04}) → 0.03).  The
    DuckDB oracle spells Trino's contract as exact integer math
    (DuckDB's own avg(DECIMAL) returns DOUBLE — a true differential).

    r15: the emission is the exact integer sum/count protocol, so the
    r14 CAST-wrap's s+4 double-rounding band is CLOSED for p ≤ 28,
    s ≤ 6 (tests/test_differential_semantics.py::
    test_decimal_avg_half_boundary_sweep pins the former band's edge
    cases head-on; wider types keep the wrap + documented band).

    Reference parity: Trino DecimalAverageAggregation HALF_UP at input
    type, text forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _catalog_column_types
    from mcp_trino_spark.sources.catalog import register_tables
    from mcp_trino_spark.trino_compat import translate

    register_tables(spark, sf_dir)
    return _asql(
        spark,
        sf_dir,
        translate(
            """
            SELECT CAST(l_returnflag AS VARCHAR) AS grp,
                   CAST(avg(CAST(CAST(l_quantity AS BIGINT)
                                 AS DECIMAL(10,2))) * 100 AS BIGINT) AS v
            FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_returnflag
            UNION ALL
            SELECT 'ties_up', CAST(avg(CAST(v AS DECIMAL(10,2))) * 100
                                   AS BIGINT)
            FROM (VALUES '0.01', '0.02') AS t(v)
            UNION ALL
            SELECT 'thirds',
                   CAST(avg(CAST(v AS DECIMAL(10,2))) * 100 AS BIGINT)
            FROM (VALUES '1.00', '2.00', '2.00') AS t(v)
            UNION ALL
            SELECT 'neg_away', CAST(avg(CAST(v AS DECIMAL(10,2))) * 100
                                    AS BIGINT)
            FROM (VALUES '-0.01', '-0.02') AS t(v)
            UNION ALL
            SELECT 'null_skip',
                   CAST(avg(TRY_CAST(v AS DECIMAL(10,2))) * 100 AS BIGINT)
            FROM (VALUES '0.01', 'x', '0.02') AS t(v)
            UNION ALL
            SELECT 'distinct',
                   CAST(avg(DISTINCT CAST(v AS DECIMAL(10,2))) * 100
                        AS BIGINT)
            FROM (VALUES '0.01', '0.01', '0.04') AS t(v)
            """,
            column_types=_catalog_column_types(spark),
        )
    )


@register(
    "x72_nested_complex_equality",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, NULL), (2, 'true'), (3, 'false'), (4, 'false'),
        (5, NULL), (6, NULL), (7, 'true'), (8, NULL),
        (9, 'true'), (10, NULL), (11, 'true'), (12, NULL),
        (13, NULL), (14, 'false'), (15, 'miss'), (16, NULL),
        (17, NULL), (18, 'false'), (19, 'true'), (20, 'true')
    ) AS t(i, expected)
    """,
)
def x72_nested_complex_equality(spark, sf_dir):
    """Differential certification of the round-14 NESTED three-valued
    equality closure (_eq_by_shape recursion): Trino's equal operators
    delegate to the ELEMENT type's equal operator at every level
    (Array/Row/MapEqualOperator), so a null two levels down makes the
    outermost comparison unknown — pre-x72 the r13 forms compared
    nested elements with Spark's null-conflating ``=`` inside the
    zip_with lambdas (ARRAY[ARRAY[1, NULL]] = itself returned TRUE;
    Trino says NULL), and rows eleven rounds of sweeps never reached
    depth 2.  Rows 1-14 pin =, 13 IN lists, 15 simple CASE, 16 nullif
    through array-of-array, row-of-array, row-of-row, map-of-array,
    array-of-row, array-of-map nests; 17 the triple nest; 18-20 the
    VOID-typed corners (empty/NULL literals) that were ANALYSIS errors
    before the common-type coercion wrap.  The oracle pins expected
    values as literals (DuckDB's nested comparison treats NULL as an
    equal value — a different contract).

    Reference parity: Trino ArrayEqualOperator / RowEqualOperator /
    MapEqualOperator recursive delegation, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(ARRAY[ARRAY[1, NULL]] = ARRAY[ARRAY[1, NULL]]
                                AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(ARRAY[ARRAY[1, 2]] = ARRAY[ARRAY[1, 2]]
                                     AS VARCHAR)
            UNION ALL SELECT 3, CAST(ARRAY[ARRAY[1, 2]] = ARRAY[ARRAY[1, 3]]
                                     AS VARCHAR)
            UNION ALL SELECT 4, CAST(ARRAY[ARRAY[1, NULL]] = ARRAY[ARRAY[2, NULL]]
                                     AS VARCHAR)
            UNION ALL SELECT 5, CAST(ROW(ARRAY[1, NULL]) = ROW(ARRAY[1, NULL])
                                     AS VARCHAR)
            UNION ALL SELECT 6, CAST(ROW(ROW(1, NULL)) = ROW(ROW(1, NULL))
                                     AS VARCHAR)
            UNION ALL SELECT 7, CAST(ROW(ROW(1, 2)) = ROW(ROW(1, 2)) AS VARCHAR)
            UNION ALL SELECT 8, CAST(MAP(ARRAY[1], ARRAY[ARRAY[1, NULL]])
                                     = MAP(ARRAY[1], ARRAY[ARRAY[1, NULL]])
                                     AS VARCHAR)
            UNION ALL SELECT 9, CAST(MAP(ARRAY[1], ARRAY[ARRAY[1, 2]])
                                     = MAP(ARRAY[1], ARRAY[ARRAY[1, 2]])
                                     AS VARCHAR)
            UNION ALL SELECT 10, CAST(ARRAY[ROW(1, NULL)] = ARRAY[ROW(1, NULL)]
                                      AS VARCHAR)
            UNION ALL SELECT 11, CAST(ARRAY[ROW(1, 2)] = ARRAY[ROW(1, 2)]
                                      AS VARCHAR)
            UNION ALL SELECT 12, CAST(ARRAY[MAP(ARRAY[1], ARRAY[NULL])]
                                      = ARRAY[MAP(ARRAY[1], ARRAY[NULL])]
                                      AS VARCHAR)
            UNION ALL SELECT 13, CAST(ARRAY[ARRAY[1, NULL]]
                                      IN (ARRAY[ARRAY[1, NULL]]) AS VARCHAR)
            UNION ALL SELECT 14, CAST(nullif(ARRAY[ARRAY[1, NULL]],
                                             ARRAY[ARRAY[1, NULL]]) IS NULL
                                      AS VARCHAR)
            UNION ALL SELECT 15, CASE ARRAY[ARRAY[1, NULL]]
                                      WHEN ARRAY[ARRAY[1, NULL]] THEN 'hit'
                                      ELSE 'miss' END
            UNION ALL SELECT 16, CAST(ARRAY[ARRAY[ARRAY[NULL]]]
                                      = ARRAY[ARRAY[ARRAY[NULL]]] AS VARCHAR)
            UNION ALL SELECT 17, CAST(ARRAY[ARRAY[1, 2], NULL]
                                      = ARRAY[ARRAY[1, 2], NULL] AS VARCHAR)
            UNION ALL SELECT 18, CAST(ARRAY[ARRAY[1, 2]] = ARRAY[ARRAY[1, 2, 3]]
                                      AS VARCHAR)
            UNION ALL SELECT 19, CAST(MAP(ARRAY[], ARRAY[])
                                      = MAP(ARRAY[], ARRAY[]) AS VARCHAR)
            UNION ALL SELECT 20, CAST(ROW(NULL, 2)
                                      <> ROW(MAP(ARRAY[1], ARRAY[2]), 3)
                                      AS VARCHAR)
            """
        )
    )


@register(
    "x73_nan_comparison_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'false'), (2, 'true'), (3, 'false'), (4, 'false'),
        (5, 'false'), (6, 'false'), (7, NULL), (8, NULL),
        (9, NULL), (10, 'true'), (11, 'true'), (12, 'false'),
        (13, 'true'), (14, 'false'), (15, 'true'), (16, 'false'),
        (17, 'true'), (18, 'miss'), (19, 'b'), (20, 'NaN'),
        (21, NULL), (22, 'false')
    ) AS t(i, expected)
    """,
)
def x73_nan_comparison_semantics(spark, sf_dir):
    """Differential certification of the round-14 NaN-comparison
    closure (_rewrite_double_nan_comparisons + the IN/simple-CASE/
    nullif float arms): Spark's comparison operators treat NaN as
    EQUAL to itself and LARGER than every value (``nan() = nan()`` →
    true, ``nan() > 1.0`` → true, ``1.0 < nan()`` → true) where
    Trino's DoubleOperators are IEEE Java — all false, and ``<>`` with
    NaN is true.  The conjunctive rewrite forms keep the raw
    comparison a top-level conjunct so Catalyst still pushes it into
    the scan (plan-guarded in the PushedFilters probe).  Rows 7-9 pin
    exact NULL propagation on the (NULL, NaN) pairings the naive
    conjunct form would decide false; 13-17 the IN-list chain; 18-19
    simple CASE; 20-21 nullif returning its first argument on the
    NaN=NaN pair (Spark said NULL); 22 the float arm of <= between
    NaNs.  The oracle pins literals: DuckDB's ``'NaN'::DOUBLE =
    'NaN'::DOUBLE`` is TRUE (total order) — a true differential.

    Reference parity: Trino DoubleOperators equal/notEqual/lessThan/
    lessThanOrEqual/greaterThan (Java IEEE primitives), text forwarded
    verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(nan() = nan() AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(nan() <> nan() AS VARCHAR)
            UNION ALL SELECT 3, CAST(nan() > 1.0E0 AS VARCHAR)
            UNION ALL SELECT 4, CAST(1.0E0 < nan() AS VARCHAR)
            UNION ALL SELECT 5, CAST(nan() >= nan() AS VARCHAR)
            UNION ALL SELECT 6, CAST(nan() < nan() AS VARCHAR)
            UNION ALL SELECT 7, CAST(CAST(NULL AS DOUBLE) > nan() AS VARCHAR)
            UNION ALL SELECT 8, CAST(nan() > CAST(NULL AS DOUBLE) AS VARCHAR)
            UNION ALL SELECT 9, CAST(CAST(NULL AS DOUBLE) = nan() AS VARCHAR)
            UNION ALL SELECT 10, CAST(2.0E0 > 1.0E0 AS VARCHAR)
            UNION ALL SELECT 11, CAST(infinity() > 1.0E300 AS VARCHAR)
            UNION ALL SELECT 12, CAST(nan() = 1.0E0 AS VARCHAR)
            UNION ALL SELECT 13, CAST(1.0E0 <> nan() AS VARCHAR)
            UNION ALL SELECT 14, CAST(nan() IN (nan(), 1.0E0) AS VARCHAR)
            UNION ALL SELECT 15, CAST(2.0E0 IN (nan(), 2.0E0) AS VARCHAR)
            UNION ALL SELECT 16, CAST(nan() IN (DOUBLE '1.5') AS VARCHAR)
            UNION ALL SELECT 17, CAST(nan() NOT IN (nan()) AS VARCHAR)
            UNION ALL SELECT 18, CASE nan() WHEN nan() THEN 'hit'
                                 ELSE 'miss' END
            UNION ALL SELECT 19, CASE 2.0E0 WHEN nan() THEN 'a'
                                 WHEN 2.0E0 THEN 'b' ELSE 'e' END
            UNION ALL SELECT 20, IF(isnan(nullif(nan(), nan())), 'NaN',
                                    'other')
            UNION ALL SELECT 21, CAST(nullif(DOUBLE '2.5', DOUBLE '2.5')
                                      AS VARCHAR)
            UNION ALL SELECT 22, CAST(nan() <= nan() AS VARCHAR)
            """
        )
    )


@register(
    "x74_nested_nan_equality",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'false'), (2, 'true'), (3, 'false'), (4, 'false'),
        (5, 'true'), (6, 'false'), (7, 'false'), (8, 'false'),
        (9, 'false'), (10, 'miss'), (11, 'true'), (12, 'false'),
        (13, NULL), (14, 'true')
    ) AS t(i, expected)
    """,
)
def x74_nested_nan_equality(spark, sf_dir):
    """Differential certification of the round-14 NESTED-NaN closure
    (the ``("double",)`` shape leaf in _eq_by_shape): Trino's
    Array/Row/MapEqualOperator delegate to DoubleOperators.equal per
    element, so ``ARRAY[nan()] = ARRAY[nan()]`` is FALSE (a decided
    unequal pair) — the x72 recursion's scalar lambda used Spark's
    NaN-equal ``x = y`` and said TRUE.  Rows cover array/row/map
    nests, depth 2, the decided-false-beats-unknown precedence (row 3:
    a NaN pair decides false even with a NULL pair present), IN /
    simple CASE / nullif routing, Infinity parity (row 5), and NULL
    propagation (row 13: only null pairs → unknown).  Pinned literals:
    DuckDB's nested comparison uses total order ('NaN' = 'NaN' true).

    Reference parity: Trino ArrayEqualOperator → DoubleOperators.equal
    delegation, text forwarded verbatim (internal/trino/client.go).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(ARRAY[nan()] = ARRAY[nan()] AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(ARRAY[1.5E0] = ARRAY[1.5E0] AS VARCHAR)
            UNION ALL SELECT 3, CAST(ARRAY[nan(), NULL] = ARRAY[nan(), NULL]
                                     AS VARCHAR)
            UNION ALL SELECT 4, CAST(ROW(nan()) = ROW(nan()) AS VARCHAR)
            UNION ALL SELECT 5, CAST(ARRAY[infinity()] = ARRAY[infinity()]
                                     AS VARCHAR)
            UNION ALL SELECT 6, CAST(MAP(ARRAY[1], ARRAY[nan()])
                                     = MAP(ARRAY[1], ARRAY[nan()]) AS VARCHAR)
            UNION ALL SELECT 7, CAST(ARRAY[ARRAY[nan()]] = ARRAY[ARRAY[nan()]]
                                     AS VARCHAR)
            UNION ALL SELECT 8, CAST(ARRAY[nan()] IN (ARRAY[nan()]) AS VARCHAR)
            UNION ALL SELECT 9, CAST(nullif(ARRAY[nan()], ARRAY[nan()]) IS NULL
                                     AS VARCHAR)
            UNION ALL SELECT 10, CASE ARRAY[nan()] WHEN ARRAY[nan()]
                                      THEN 'hit' ELSE 'miss' END
            UNION ALL SELECT 11, CAST(ROW(1, nan()) <> ROW(1, nan())
                                      AS VARCHAR)
            UNION ALL SELECT 12, CAST(ROW(NULL, nan()) = ROW(1, nan())
                                      AS VARCHAR)
            UNION ALL SELECT 13, CAST(ARRAY[NULL, 1.5E0] = ARRAY[NULL, 1.5E0]
                                      AS VARCHAR)
            UNION ALL SELECT 14, CAST(ARRAY[DOUBLE '2.5'] = ARRAY[CAST('2.5'
                                      AS DOUBLE)] AS VARCHAR)
            """
        )
    )


@register(
    "x75_nan_ordering_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'false'), (2, 'false'), (3, 'false'), (4, 'false'),
        (5, 'true'), (6, 'true'), (7, 'false'), (8, 'false'),
        (9, 'false'), (10, 'true'), (11, 'true'), (12, 'false'),
        (13, 'true'), (14, 'false')
    ) AS t(i, expected)
    """,
)
def x75_nan_ordering_semantics(spark, sf_dir):
    """Differential certification of the round-14 NESTED-NaN ordering
    closure (the ``("double",)`` arms of _array_ord_expr /
    _row_ord_expr): Trino's lexicographic scan finds the first
    NON-EQUAL pair via per-element DoubleOperators.equal (a NaN pair
    IS differing — equal is false) and decides via Java lessThan
    (anything vs NaN → false), where Spark's ``<>`` treated a NaN pair
    as equal (skipping it to decide on LATER positions — row 3) and
    its ordering ranks NaN largest (rows 1-2, 9, 12).  Rows 5-7, 10-11,
    13 pin the finite paths unchanged; row 14 Infinity-vs-NaN.  Pinned
    literals: DuckDB's nested ordering is total-order (NaN largest,
    NaN = NaN) — a true differential.

    Reference parity: Trino ArrayOperators.lessThan /
    RowComparisonOperators field scan (Java IEEE primitives), text
    forwarded verbatim (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(ARRAY[2.0E0] < ARRAY[nan()] AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(ARRAY[nan()] < ARRAY[2.0E0] AS VARCHAR)
            UNION ALL SELECT 3, CAST(ARRAY[nan(), 1.0E0] < ARRAY[nan(), 2.0E0]
                                     AS VARCHAR)
            UNION ALL SELECT 4, CAST(ARRAY[nan()] <= ARRAY[nan()] AS VARCHAR)
            UNION ALL SELECT 5, CAST(ARRAY[1.0E0] < ARRAY[2.0E0] AS VARCHAR)
            UNION ALL SELECT 6, CAST(ARRAY[1.0E0] <= ARRAY[1.0E0] AS VARCHAR)
            UNION ALL SELECT 7, CAST(ARRAY[1.0E0, 2.0E0] < ARRAY[1.0E0]
                                     AS VARCHAR)
            UNION ALL SELECT 8, CAST(ROW(nan(), 1.0E0) < ROW(nan(), 2.0E0)
                                     AS VARCHAR)
            UNION ALL SELECT 9, CAST(ROW(1.0E0) < ROW(nan()) AS VARCHAR)
            UNION ALL SELECT 10, CAST(ROW(1.0E0, 5) < ROW(2.0E0, 1)
                                      AS VARCHAR)
            UNION ALL SELECT 11, CAST(ROW(1, 2) <= ROW(1, 2) AS VARCHAR)
            UNION ALL SELECT 12, CAST(ROW(2.0E0) >= ROW(nan()) AS VARCHAR)
            UNION ALL SELECT 13, CAST(ARRAY[1.0E60] < ARRAY[infinity()]
                                      AS VARCHAR)
            UNION ALL SELECT 14, CAST(ARRAY[infinity()] < ARRAY[nan()]
                                      AS VARCHAR)
            """
        )
    )


@register(
    "x76_nan_membership_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'false'), (2, NULL), (3, 'false'), (4, 'true'),
        (5, NULL), (6, NULL), (7, '0'), (8, '2'),
        (9, '2'), (10, '1'), (11, 'true')
    ) AS t(i, expected)
    """,
)
def x76_nan_membership_semantics(spark, sf_dir):
    """Differential certification of the round-14 NaN-membership
    closure (_rewrite_nan_membership): Trino's contains /
    array_position / array_remove loop the per-element EQUAL operator
    (Java IEEE) — a NaN probe is NEVER equal, so contains is false
    (NULL only via the null-element contract, row 2), position is 0,
    and remove removes nothing — where Spark's equivalents match NaN
    against NaN.  Rows 3-6 and 8/10-11 pin the unchanged finite and
    null contracts.  ``arrays_overlap`` is documented residue (Trino
    implements it over the total-order comparator, not element-equal).
    Pinned literals: DuckDB's list_contains matches NaN (total order)
    — a true differential.

    Reference parity: Trino ArrayContains / ArrayPositionFunction /
    ArrayRemoveFunction equal-operator loops, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(contains(ARRAY[nan()], nan()) AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(contains(ARRAY[nan(), NULL], nan())
                                     AS VARCHAR)
            UNION ALL SELECT 3, CAST(contains(ARRAY[1.5E0], nan()) AS VARCHAR)
            UNION ALL SELECT 4, CAST(contains(ARRAY[1.5E0], 1.5E0) AS VARCHAR)
            UNION ALL SELECT 5, CAST(contains(ARRAY[1.5E0],
                                              CAST(NULL AS DOUBLE)) AS VARCHAR)
            UNION ALL SELECT 6, CAST(contains(CAST(NULL AS ARRAY(DOUBLE)),
                                              nan()) AS VARCHAR)
            UNION ALL SELECT 7, CAST(array_position(ARRAY[nan()], nan())
                                     AS VARCHAR)
            UNION ALL SELECT 8, CAST(array_position(ARRAY[1.5E0, 2.5E0],
                                                    2.5E0) AS VARCHAR)
            UNION ALL SELECT 9, CAST(cardinality(array_remove(
                                     ARRAY[nan(), 1.0E0], nan())) AS VARCHAR)
            UNION ALL SELECT 10, CAST(cardinality(array_remove(
                                      ARRAY[2.0E0, 1.0E0], 2.0E0)) AS VARCHAR)
            UNION ALL SELECT 11, CAST(contains(ARRAY[nan(), 3.0E0], 3.0E0)
                                      AS VARCHAR)
            """
        )
    )


@register(
    "x77_nan_subquery_semantics",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'false'), (2, 'true'), (3, 'false'), (4, NULL),
        (5, 'false'), (6, 'false'), (7, 'true'), (8, NULL),
        (9, 'false'), (10, 'true'), (11, 'false'), (12, 'false'),
        (13, 'false'), (14, 'false'), (15, 'true'), (16, 'false'),
        (17, 'false'), (18, 'true'), (19, 'false'), (20, 'true')
    ) AS t(i, expected)
    """,
)
def x77_nan_subquery_semantics(spark, sf_dir):
    """Differential certification of the round-15 analyzer-typed NaN
    closure (VERDICT r14 #3): Trino's DoubleOperators stay IEEE when
    the NaN reaches the operator through positions the x73 lexical
    pass could not type — BETWEEN bounds (rows 1-5, desugared into
    guarded comparison pairs by _rewrite_nan_between), IN-subquery
    membership (6-10, _rewrite_nan_in_subqueries' three-valued
    dispatch: false on a NaN probe, NULL only when the set has NULL
    elements), scalar-subquery comparison operands typed by the
    session analyzer's LIMIT-0 schema (11-12,
    _rewrite_nan_subquery_comparisons + execute._make_subquery_type),
    and quantified ordering over float sets (13-17: a NaN element
    poisons ALL thresholds and is blanked from ANY witnesses).  Rows
    18-20 pin the standard's vacuous empty-set cases closed the same
    round: `op ALL (empty)` is TRUE and `op ANY (empty)` FALSE — both
    previously UNKNOWN.  Spark said true for 1/3/5/6 (NaN-largest /
    NaN-equal through subquery operands) and NULL for 18-20.  The
    oracle pins literals: DuckDB's 'NaN'::DOUBLE compares total-order
    — a true differential.

    Reference parity: Trino DoubleOperators (Java IEEE) through
    ScalarSubquery/InPredicate/QuantifiedComparison/BetweenPredicate
    evaluation, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.execute import _make_subquery_type
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    s_nan = "(SELECT nan() AS x UNION ALL SELECT 1.0E0)"
    s_nan3 = "(SELECT nan() AS x UNION ALL SELECT 3.0E0)"
    s_null = "(SELECT CAST(NULL AS DOUBLE) AS x UNION ALL SELECT 1.0E0)"
    return spark.sql(
        translate(
            f"""
            SELECT 1 AS i, CAST(1.0E0 BETWEEN 0.0E0 AND nan() AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(1.0E0 NOT BETWEEN 0.0E0 AND nan()
                                     AS VARCHAR)
            UNION ALL SELECT 3, CAST(nan() BETWEEN 0.0E0 AND nan() AS VARCHAR)
            UNION ALL SELECT 4, CAST(CAST(NULL AS DOUBLE) BETWEEN 0.0E0
                                     AND nan() AS VARCHAR)
            UNION ALL SELECT 5, CAST(nan() BETWEEN nan() AND 2.0E0 AS VARCHAR)
            UNION ALL SELECT 6, CAST(nan() IN (SELECT x FROM {s_nan} t)
                                     AS VARCHAR)
            UNION ALL SELECT 7, CAST(nan() NOT IN (SELECT x FROM {s_nan} t)
                                     AS VARCHAR)
            UNION ALL SELECT 8, CAST(nan() IN (SELECT x FROM {s_null} t)
                                     AS VARCHAR)
            UNION ALL SELECT 9, CAST(2.0E0 IN (SELECT x FROM {s_nan} t)
                                     AS VARCHAR)
            UNION ALL SELECT 10, CAST(1.0E0 IN (SELECT x FROM {s_nan} t)
                                      AS VARCHAR)
            UNION ALL SELECT 11, CAST(nan() > (SELECT max(x) FROM
                                      (SELECT 1.0E0 AS x UNION ALL
                                       SELECT 2.0E0) t) AS VARCHAR)
            UNION ALL SELECT 12, CAST((SELECT max(x) FROM {s_nan3} t) = nan()
                                      AS VARCHAR)
            UNION ALL SELECT 13, CAST(nan() > ALL (SELECT x FROM
                                      (SELECT 1.0E0 AS x) t) AS VARCHAR)
            UNION ALL SELECT 14, CAST(1.0E0 < ALL (SELECT x FROM {s_nan3} t)
                                      AS VARCHAR)
            UNION ALL SELECT 15, CAST(1.0E0 < ANY (SELECT x FROM {s_nan3} t)
                                      AS VARCHAR)
            UNION ALL SELECT 16, CAST(1.0E0 < ANY (SELECT x FROM
                                      (SELECT nan() AS x) t) AS VARCHAR)
            UNION ALL SELECT 17, CAST(nan() >= ANY (SELECT x FROM {s_nan3} t)
                                      AS VARCHAR)
            UNION ALL SELECT 18, CAST(1.0E0 < ALL (SELECT x FROM
                                      (SELECT 2.0E0 AS x) t WHERE false)
                                      AS VARCHAR)
            UNION ALL SELECT 19, CAST(1 < ANY (SELECT x FROM
                                      (SELECT 2 AS x) t WHERE false)
                                      AS VARCHAR)
            UNION ALL SELECT 20, CAST(NULL > ALL (SELECT x FROM
                                      (SELECT 2 AS x) t WHERE false)
                                      AS VARCHAR)
            """,
            subquery_type=_make_subquery_type(spark),
        )
    )


@register(
    "x78_in_subquery_null_semantics",
    oracle="""
    SELECT 1 AS i,
           CAST(2 IN (SELECT x FROM (VALUES (NULL),(1)) t(x)) AS VARCHAR) AS a,
           CAST(1 IN (SELECT x FROM (VALUES (NULL),(1)) t(x)) AS VARCHAR) AS b,
           CAST(2 NOT IN (SELECT x FROM (VALUES (NULL),(1)) t(x)) AS VARCHAR) AS c,
           CAST(1 NOT IN (SELECT x FROM (VALUES (NULL),(1)) t(x)) AS VARCHAR) AS d,
           CAST(2 IN (SELECT x FROM (VALUES (1)) t(x)) AS VARCHAR) AS e,
           CAST(2 NOT IN (SELECT x FROM (VALUES (1)) t(x)) AS VARCHAR) AS f,
           CAST(CAST(NULL AS INT) IN (SELECT x FROM (VALUES (1)) t(x)) AS VARCHAR) AS g,
           CAST(CAST(NULL AS INT) IN (SELECT x FROM (VALUES (1)) t(x) WHERE false) AS VARCHAR) AS h,
           CAST(CAST(NULL AS INT) NOT IN (SELECT x FROM (VALUES (1)) t(x) WHERE false) AS VARCHAR) AS i2
    """,
)
def x78_in_subquery_null_semantics(spark, sf_dir):
    """Projected IN-subquery three-valued semantics
    (_rewrite_in_subquery_null_semantics, r15): Spark's projected
    InSubquery is an existence join that is NOT null-aware on the
    build side — ``SELECT 2 IN (SELECT x …)`` over {NULL, 1} returned
    FALSE, and the projected ``NOT IN`` spelling ALSO returned FALSE
    (Catalyst boolean-simplifies the negation into the anti-join
    machinery) — where the standard, Trino, AND DuckDB all say NULL.
    The rewrite dispatches through a CASE keeping the positive
    InSubquery intact: match → true, NULL probe → empty-set-aware
    NULL, miss over a NULL-bearing set → NULL, else false (NOT IN
    swaps the decided arms).  Unlike the NaN entries this oracle is
    DuckDB-NATIVE — DuckDB's IN already implements the standard, so
    the differential is computed live, not pinned literals.

    Reference parity: Trino InPredicate three-valued evaluation via
    the per-element EQUAL operator, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    spark.sql(
        "SELECT CAST(NULL AS INT) AS x UNION ALL SELECT 1"
    ).createOrReplaceTempView("x78_nullset")
    spark.sql("SELECT 1 AS x").createOrReplaceTempView("x78_plainset")
    spark.sql("SELECT 1 AS x WHERE false").createOrReplaceTempView(
        "x78_emptyset"
    )
    try:
        df = spark.sql(
            translate(
                """
                SELECT 1 AS i,
                       CAST(2 IN (SELECT x FROM x78_nullset) AS VARCHAR) AS a,
                       CAST(1 IN (SELECT x FROM x78_nullset) AS VARCHAR) AS b,
                       CAST(2 NOT IN (SELECT x FROM x78_nullset)
                            AS VARCHAR) AS c,
                       CAST(1 NOT IN (SELECT x FROM x78_nullset)
                            AS VARCHAR) AS d,
                       CAST(2 IN (SELECT x FROM x78_plainset) AS VARCHAR) AS e,
                       CAST(2 NOT IN (SELECT x FROM x78_plainset)
                            AS VARCHAR) AS f,
                       CAST(CAST(NULL AS INT) IN (SELECT x FROM x78_plainset)
                            AS VARCHAR) AS g,
                       CAST(CAST(NULL AS INT) IN (SELECT x FROM x78_emptyset)
                            AS VARCHAR) AS h,
                       CAST(CAST(NULL AS INT) NOT IN
                            (SELECT x FROM x78_emptyset) AS VARCHAR) AS i2
                """
            )
        )
        rows, schema = df.collect(), df.schema
    finally:
        # drop the probe views — a shared driver session must not leak
        # them into later entries' column-type maps (the r14 lesson)
        for v in ("x78_nullset", "x78_plainset", "x78_emptyset"):
            spark.catalog.dropTempView(v)
    return spark.createDataFrame(rows, schema)


@register(
    "x79_equality_quantifiers",
    oracle="""
    SELECT 1 AS i,
           CAST(1 = ALL (SELECT x FROM (VALUES (1),(1)) t(x)) AS VARCHAR) AS a,
           CAST(1 = ALL (SELECT x FROM (VALUES (1),(2)) t(x)) AS VARCHAR) AS b,
           CAST(1 = ALL (SELECT x FROM (VALUES (1),(NULL)) t(x)) AS VARCHAR) AS c,
           CAST(1 = ALL (SELECT x FROM (VALUES (1),(2),(NULL)) t(x)) AS VARCHAR) AS d,
           CAST(1 = ALL (SELECT x FROM (VALUES (1)) t(x) WHERE false) AS VARCHAR) AS e,
           CAST(1 <> ANY (SELECT x FROM (VALUES (1),(1)) t(x)) AS VARCHAR) AS f,
           CAST(1 <> ANY (SELECT x FROM (VALUES (1),(2)) t(x)) AS VARCHAR) AS g,
           CAST(1 <> ANY (SELECT x FROM (VALUES (1),(NULL)) t(x)) AS VARCHAR) AS h,
           CAST(1 <> SOME (SELECT x FROM (VALUES (1)) t(x) WHERE false) AS VARCHAR) AS i2,
           CAST(CAST(NULL AS INT) = ALL (SELECT x FROM (VALUES (1)) t(x) WHERE false) AS VARCHAR) AS j
    """,
)
def x79_equality_quantifiers(spark, sf_dir):
    """Equality quantifiers ``= ALL`` and ``<> ANY/SOME`` (r15):
    previously a loud TrinoCompatError, though both are valid Trino —
    the rewrite completes the full quantifier × operator matrix.
    ``x = ALL (S)``: TRUE on empty; FALSE when any non-null element
    differs (min/max over the set pin both ends — one value can only
    equal both when all non-null elements are that value); UNKNOWN
    when all non-null elements match but a NULL is present (null-
    degrade via the count guard).  ``<> ANY`` is the exact three-
    valued negation (∃≠ ≡ ¬∀=), safe to spell as NOT(...) because the
    form carries only scalar subqueries — not the InSubquery whose
    negation Catalyst reroutes through anti-join semantics (x78's
    lesson).  On analyzer-certified float sets a NaN element decides
    FALSE (Trino's NaN equals nothing), emitted as one more conjunct.
    DuckDB implements the standard quantifiers natively, so the
    oracle is the direct spelling — a live differential.

    Reference parity: Trino QuantifiedComparisonExpression
    evaluation, text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import translate

    return spark.sql(
        translate(
            """
            SELECT 1 AS i,
                   CAST(1 = ALL (SELECT x FROM (VALUES (1),(1)) t(x))
                        AS VARCHAR) AS a,
                   CAST(1 = ALL (SELECT x FROM (VALUES (1),(2)) t(x))
                        AS VARCHAR) AS b,
                   CAST(1 = ALL (SELECT x FROM (VALUES (1),(NULL)) t(x))
                        AS VARCHAR) AS c,
                   CAST(1 = ALL (SELECT x FROM (VALUES (1),(2),(NULL)) t(x))
                        AS VARCHAR) AS d,
                   CAST(1 = ALL (SELECT x FROM (VALUES (1)) t(x) WHERE false)
                        AS VARCHAR) AS e,
                   CAST(1 <> ANY (SELECT x FROM (VALUES (1),(1)) t(x))
                        AS VARCHAR) AS f,
                   CAST(1 <> ANY (SELECT x FROM (VALUES (1),(2)) t(x))
                        AS VARCHAR) AS g,
                   CAST(1 <> ANY (SELECT x FROM (VALUES (1),(NULL)) t(x))
                        AS VARCHAR) AS h,
                   CAST(1 <> SOME (SELECT x FROM (VALUES (1)) t(x)
                        WHERE false) AS VARCHAR) AS i2,
                   CAST(CAST(NULL AS INT) = ALL (SELECT x FROM (VALUES (1))
                        t(x) WHERE false) AS VARCHAR) AS j
            """
        )
    )


@register(
    "x80_array_minmax_nan",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'NaN'), (2, 'NaN'), (3, '1.0'), (4, NULL),
        (5, '3.0'), (6, 'NaN'), (7, NULL), (8, '2.0')
    ) AS t(i, expected)
    """,
)
def x80_array_minmax_nan(spark, sf_dir):
    """array_min/array_max NaN propagation (r15): Trino's docs pin
    "returns NaN if the array contains NaN" for both functions (the
    NaN program of Trino 393) — Spark's NaN-largest ordering made
    ``array_min(ARRAY[nan(), 1])`` return 1 (array_max coincided).
    Knowably-double arrays (x47 shape contract) gain an isnan arm in
    the existing null-containment guard, NULL arm first (preserving
    the driver-certified x51 precedence on mixed NULL+NaN arrays —
    rows 4/7).  Rows 3/5/8 pin the unchanged finite paths, 6 the
    array_max coincidence.  Pinned-literal oracle: DuckDB's
    list_min/list_aggregate NaN ordering is its own contract — a
    true differential.

    Reference parity: Trino ArrayMinFunction/ArrayMaxFunction NaN
    contract (docs functions/array), text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(array_min(ARRAY[nan(), 1.0E0]) AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(array_max(ARRAY[nan(), 1.0E0]) AS VARCHAR)
            UNION ALL SELECT 3, CAST(array_min(ARRAY[2.0E0, 1.0E0]) AS VARCHAR)
            UNION ALL SELECT 4, CAST(array_min(ARRAY[1.0E0, NULL, nan()])
                                     AS VARCHAR)
            UNION ALL SELECT 5, CAST(array_max(ARRAY[2.0E0, 3.0E0]) AS VARCHAR)
            UNION ALL SELECT 6, CAST(array_max(ARRAY[nan(), nan()]) AS VARCHAR)
            UNION ALL SELECT 7, CAST(array_max(CAST(NULL AS ARRAY(DOUBLE)))
                                     AS VARCHAR)
            UNION ALL SELECT 8, CAST(array_min(ARRAY[3.0E0, 2.0E0])
                                     AS VARCHAR)
            """
        )
    )


@register(
    "x81_double_zero_division",
    oracle="""
    SELECT i, expected AS v FROM (VALUES
        (1, 'Infinity'), (2, '-Infinity'), (3, '-Infinity'), (4, 'NaN'),
        (5, 'NaN'), (6, 'Infinity'), (7, NULL), (8, '2.5'),
        (9, 'NaN'), (10, 'NaN'), (11, '2.0'), (12, NULL), (13, 'Infinity')
    ) AS t(i, expected)
    """,
)
def x81_double_zero_division(spark, sf_dir):
    """Double division/modulus by zero (r15,
    _rewrite_double_div_mod_zero): Trino's DoubleOperators are IEEE
    Java — ``5e0/0e0`` is Infinity, ``-5e0/0e0`` and ``5e0/-0e0``
    -Infinity (the negative-zero divisor carries sign), ``0e0/0e0``
    and ``mod(x, 0e0)`` NaN, with NO error — where Spark under ANSI
    threw DIVIDE_BY_ZERO / REMAINDER_BY_ZERO on the same valid Trino
    SQL: a HARD-ERROR divergence, not a silent one.  Knowably-double
    operands (x47) gain a zero-divisor dispatch keeping the plain
    division on the hot path; integer division by zero errors in BOTH
    engines and is untouched (row 12 pins NULL via try there).  The
    oracle pins literals: DuckDB nulls double division by zero — a
    true differential.

    Reference parity: Trino DoubleOperators divide/modulus (Java IEEE
    primitives), text forwarded verbatim
    (internal/trino/client.go:284-291).
    """
    from mcp_trino_spark.trino_compat import install_compat_functions, translate

    install_compat_functions(spark)
    return spark.sql(
        translate(
            """
            SELECT 1 AS i, CAST(5.0E0 / 0.0E0 AS VARCHAR) AS v
            UNION ALL SELECT 2, CAST(-5.0E0 / 0.0E0 AS VARCHAR)
            UNION ALL SELECT 3, CAST(5.0E0 / -0.0E0 AS VARCHAR)
            UNION ALL SELECT 4, CAST(0.0E0 / 0.0E0 AS VARCHAR)
            UNION ALL SELECT 5, CAST(nan() / 0.0E0 AS VARCHAR)
            UNION ALL SELECT 6, CAST(infinity() / 0.0E0 AS VARCHAR)
            UNION ALL SELECT 7, CAST(CAST(NULL AS DOUBLE) / 0.0E0 AS VARCHAR)
            UNION ALL SELECT 8, CAST(5.0E0 / 2.0E0 AS VARCHAR)
            UNION ALL SELECT 9, CAST(mod(5.0E0, 0.0E0) AS VARCHAR)
            UNION ALL SELECT 10, CAST(5.0E0 % 0.0E0 AS VARCHAR)
            UNION ALL SELECT 11, CAST(5.0E0 % 3.0E0 AS VARCHAR)
            UNION ALL SELECT 12, CAST(try(5 / 0) AS VARCHAR)
            UNION ALL SELECT 13, CAST(2.0E0 + 4.0E0 / 0.0E0 AS VARCHAR)
            """
        )
    )
