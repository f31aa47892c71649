"""Deduplication operators for LLM training-data pipelines — SURVEY §2.10
(L1, L2) plus SimHash and n-gram-Jaccard variants.

Beyond the reference surface (mandated extension, repo BASELINE.json
"north_star").  Design rules for 100 TB:

- Exact dedup is a hash-groupBy on md5(text) — shuffle carries one row
  per distinct hash, never the texts twice.
- MinHash/LSH emits (band_key → doc) pairs and self-joins per band, so
  candidate generation is an equi-join, not an all-pairs cross join;
  work scales with Σ bucket², controlled by band width.
- All hashes are md5-derived (identical on every engine/worker) — no
  engine-native hash() whose value differs across systems.
- Pair outputs are canonicalized (doc_a < doc_b) and DISTINCT'd so band
  collisions don't duplicate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mcp_trino_spark.operators._util import T
from mcp_trino_spark.registry import register

# LSH layout: NUM_BANDS bands × ROWS_PER_BAND minhashes per band.
# 8×2 at threshold ~ (1/8)^(1/2) ≈ 0.35 Jaccard — tuned loose so the
# synthetic near-dup docs in testdata collide.
NUM_BANDS = 8
ROWS_PER_BAND = 2
SHINGLE_LEN = 8


@register(
    "l1_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def l1_exact_dedup(spark, sf_dir):
    """Exact dedup: keep the min doc_id per distinct text.

    groupBy(md5) rather than dropDuplicates(text): the shuffle key is a
    32-byte hash instead of the document body, and the winner choice
    (min id) is deterministic — dropDuplicates keeps an arbitrary row.
    """
    (docs,) = T(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


@register(
    "l2_minhash_lsh_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             substr(text, CAST(pos AS INTEGER), {SHINGLE_LEN}) AS shingle
      FROM documents, LATERAL unnest(range(1, GREATEST(length(text) - {SHINGLE_LEN - 1}, 1) + 1)) AS u(pos)
    ),
    mh AS (
      SELECT doc_id, band, row_i,
             MIN(substr(md5(shingle || '#' || band || '_' || row_i), 1, 16)) AS minhash
      FROM sh,
           LATERAL unnest(range(0, {NUM_BANDS})) AS b(band),
           LATERAL unnest(range(0, {ROWS_PER_BAND})) AS r(row_i)
      GROUP BY doc_id, band, row_i
    ),
    bands AS (
      SELECT doc_id, band, STRING_AGG(minhash, '|' ORDER BY row_i) AS band_key
      FROM mh GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def l2_minhash_lsh_pairs(spark, sf_dir):
    """MinHash + LSH near-duplicate candidate pairs.

    shingle → NUM_BANDS×ROWS_PER_BAND md5 minhashes → band keys →
    per-band self-equi-join.  The min over fixed-width lowercase-hex
    strings is the numeric min, so MIN(varchar) is a valid minhash
    accumulator on both engines.  At 100 TB the band join is an ordinary
    hash join on band_key; skewed buckets (boilerplate shingles) are
    handled by AQE skew-join or by capping bucket size upstream.
    """
    (docs,) = T(spark, sf_dir, "documents")
    n = F.greatest(F.length("text") - (SHINGLE_LEN - 1), F.lit(1))
    sh = (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(1), n)).alias("pos"))
        .select("doc_id", F.expr(f"substr(text, pos, {SHINGLE_LEN})").alias("shingle"))
        .distinct()
    )
    hashes = sh.select(
        "doc_id",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.explode(F.sequence(F.lit(0), F.lit(ROWS_PER_BAND - 1))).alias("row_i"),
        "shingle",
    ).select(
        "doc_id",
        "band",
        "row_i",
        F.substring(
            F.md5(
                F.concat(
                    F.col("shingle"),
                    F.lit("#"),
                    F.col("band").cast("string"),
                    F.lit("_"),
                    F.col("row_i").cast("string"),
                )
            ),
            1,
            16,
        ).alias("h"),
    )
    mh = hashes.groupBy("doc_id", "band", "row_i").agg(F.min("h").alias("minhash"))
    bands = mh.groupBy("doc_id", "band").agg(
        F.array_join(F.array_sort(F.collect_list(F.struct("row_i", "minhash"))).minhash, "|").alias(
            "band_key"
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "l2b_simhash",
    oracle="""
    WITH words AS (
      SELECT DISTINCT doc_id, w
      FROM documents, LATERAL unnest(string_split(lower(text), ' ')) AS t(w)
      WHERE length(w) > 0
    ),
    bits AS (
      SELECT doc_id, bit_i,
             CASE WHEN (
               (strpos('0123456789abcdef', substr(md5(w), 1 + bit_i // 4, 1)) - 1)
               // (CASE bit_i % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)
             ) % 2 = 1 THEN 1 ELSE -1 END AS vote
      FROM words, LATERAL unnest(range(0, 16)) AS b(bit_i)
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN bit_sum > 0 THEN CAST(power(2, bit_i) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash16
    FROM (
      SELECT doc_id, bit_i, SUM(vote) AS bit_sum FROM bits GROUP BY doc_id, bit_i
    ) s
    GROUP BY doc_id
    """,
)
def l2b_simhash(spark, sf_dir):
    """16-bit SimHash per document from distinct lowercase words.

    Each word's md5 supplies 16 hash bits (4 hex chars); per-bit ±1
    votes are summed and the sign pattern becomes the fingerprint.  All
    arithmetic is md5 + integer ops → engine-independent.  Scale: one
    explode (words × 16 bits) then two hash aggregations on doc_id.
    """
    (docs,) = T(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    bits = words.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit_i"),
        "w",
    ).select(
        "doc_id",
        "bit_i",
        F.when(
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.expr("substr(md5(w), 1 + CAST(bit_i / 4 AS INT), 1)"),
                    )
                    - 1
                ).cast("int")
                / F.expr(
                    "CASE CAST(bit_i % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"
                ).cast("int")
            ).cast("int")
            % 2
            == 1,
            1,
        )
        .otherwise(-1)
        .alias("vote"),
    )
    bit_sums = bits.groupBy("doc_id", "bit_i").agg(F.sum("vote").alias("bit_sum"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("bit_sum") > 0, F.pow(F.lit(2.0), F.col("bit_i")).cast("bigint")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash16")
    )


@register(
    "l2c_ngram_jaccard",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id, lang,
             substr(text, CAST(pos AS INTEGER), 5) AS g
      FROM documents, LATERAL unnest(range(1, GREATEST(length(text) - 4, 1) + 1)) AS u(pos)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b
        ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.n_grams + sb.n_grams - i.n_common), 9) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - i.n_common) >= 0.4
    """,
)
def l2c_ngram_jaccard(spark, sf_dir):
    """Exact character-5-gram Jaccard similarity for doc pairs ≥ 0.4,
    blocked by language.

    The inverted-index join (gram → docs) computes |A∩B| without an
    all-pairs product; |A∪B| derives from per-doc gram counts.  This is
    the exact verifier that LSH candidates (l2) feed into at scale —
    here run over same-language blocks directly.
    """
    (docs,) = T(spark, sf_dir, "documents")
    n = F.greatest(F.length("text") - 4, F.lit(1))
    grams = (
        docs.select(
            "doc_id", "lang", "text", F.explode(F.sequence(F.lit(1), n)).alias("pos")
        )
        .select("doc_id", "lang", F.expr("substr(text, pos, 5)").alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("n_common"))
            ).alias("j"),
        )
    )
    return jac.filter(F.col("j") >= 0.4).select(
        "doc_a", "doc_b", F.round(F.col("j"), 9).alias("jaccard")
    )
