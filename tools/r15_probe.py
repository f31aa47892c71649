"""Round-15 optimization probes — measure candidate plan shapes against
the current ones at sf0.1 before touching any operator.

Usage: python tools/r15_probe.py [probe ...]
Probes: minhash l2c_grams l27_assign l36 l38_spans
Each probe times current vs candidate with the noop sink, min of 3,
and asserts the candidate's rows are IDENTICAL (sorted collect compare
at sf0.01) before timing at sf0.1.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mcp_trino_spark.operators._util import T, spread  # noqa: E402
from mcp_trino_spark.operators.opcache import (  # noqa: E402
    persist_tracked,
    release_all_operator_caches,
)
from mcp_trino_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def clock(spark, label, build, sf_dir, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        build(sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        release_all_operator_caches()
        spark.catalog.clearCache()
    print(f"{label}: {best:.3f}s")
    return best


def same_rows(spark, a, b, sf_dir):
    ra = sorted(map(str, a(sf_dir).collect()))
    rb = sorted(map(str, b(sf_dir).collect()))
    release_all_operator_caches()
    spark.catalog.clearCache()
    assert ra == rb, f"row mismatch: {len(ra)} vs {len(rb)}"
    print(f"  rows identical ({len(ra)})")


# --- candidate: minhash signatures via HOFs (no explode, no groupBy) ---

from mcp_trino_spark.operators.llm_dedup import (  # noqa: E402
    NUM_BANDS,
    ROWS_PER_BAND,
    SHINGLE_LEN,
    _N_MD5,
    _band_pairs_from_signatures,
    _mh_windows,
    minhash_signatures_plan,
)


def minhash_signatures_hof(docs):
    n = F.greatest(F.length("text") - (SHINGLE_LEN - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda pos: F.substring("text", pos, F.lit(SHINGLE_LEN)),
    )
    def md5_lane(j):
        tag = F.lit(f"#{j}")
        return lambda s: F.md5(F.concat(s, tag))

    staged = docs.select(
        "doc_id",
        *[
            F.transform(sh, md5_lane(j)).alias(f"m{j}")
            for j in range(_N_MD5)
        ],
    )
    return staged.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col(f"m{j}"), lambda m: F.substring(m, start, 8))
            ).alias(f"h{h}")
            for h, j, start in _mh_windows()
        ],
    )


def probe_minhash(spark):
    def cur(sf):
        (docs,) = T(spark, sf, "documents")
        return minhash_signatures_plan(spread(docs))

    def cand(sf):
        (docs,) = T(spark, sf, "documents")
        return minhash_signatures_hof(spread(docs))

    same_rows(spark, cur, cand, SF_SMALL)
    clock(spark, "minhash sigs CURRENT (explode+groupBy)", cur, SF_BIG)
    clock(spark, "minhash sigs HOF (projection only)", cand, SF_BIG)

    def cur_pairs(sf):
        (docs,) = T(spark, sf, "documents")
        return _band_pairs_from_signatures(minhash_signatures_plan(spread(docs)))

    def cand_pairs(sf):
        (docs,) = T(spark, sf, "documents")
        return _band_pairs_from_signatures(minhash_signatures_hof(spread(docs)))

    same_rows(spark, cur_pairs, cand_pairs, SF_SMALL)
    clock(spark, "l2 pairs CURRENT", cur_pairs, SF_BIG)
    clock(spark, "l2 pairs HOF", cand_pairs, SF_BIG)


# --- candidate: l2c gram frame via array_distinct (no distinct shuffle) ---


def l2c_grams_current(docs):
    ws = F.split(F.lower("text"), " ")
    n_idx = F.greatest(F.size(ws) - 2, F.lit(0))
    idx = F.when(n_idx >= 1, F.sequence(F.lit(1), n_idx)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select("doc_id", "lang", ws.alias("ws"), F.explode(idx).alias("i"))
        .select(
            "doc_id",
            "lang",
            F.concat_ws(
                " ",
                F.element_at("ws", F.col("i")),
                F.element_at("ws", F.col("i") + 1),
                F.element_at("ws", F.col("i") + 2),
            ).alias("g"),
        )
        .distinct()
    )


def l2c_grams_hof(docs):
    ws = F.col("ws")
    n_idx = F.greatest(F.size(ws) - 2, F.lit(0))
    idx = F.when(n_idx >= 1, F.sequence(F.lit(1), n_idx)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(ws, i),
            F.element_at(ws, i + 1),
            F.element_at(ws, i + 2),
        ),
    )
    return docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    ).select("doc_id", "lang", F.explode(F.array_distinct(grams)).alias("g"))


def probe_l2c_grams(spark):
    def cur(sf):
        (docs,) = T(spark, sf, "documents")
        return l2c_grams_current(spread(docs))

    def cand(sf):
        (docs,) = T(spark, sf, "documents")
        return l2c_grams_hof(spread(docs))

    same_rows(spark, cur, cand, SF_SMALL)
    clock(spark, "l2c grams CURRENT (distinct shuffle)", cur, SF_BIG)
    clock(spark, "l2c grams HOF (array_distinct)", cand, SF_BIG)


# --- candidate: l27 centroid assignment without crossJoin+window ---


def probe_l27_assign(spark):
    from mcp_trino_spark.operators.llm_similarity import cosine

    def corpus_cents(sf):
        (emb,) = T(spark, sf, "embeddings")
        base = spread(emb).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        corpus = base.unionAll(
            base.select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.transform(F.col("embedding"), lambda x: x + 0.01).alias(
                    "embedding"
                ),
            )
        )
        cents = corpus.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
        )
        return corpus, cents

    def cur(sf):
        from pyspark.sql import Window

        corpus, cents = corpus_cents(sf)
        w = Window.partitionBy("vec_id").orderBy(
            F.col("sim").desc(), F.col("cent_id").asc()
        )
        return (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn("sim", cosine(F.col("embedding"), F.col("cv")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cent_id", "embedding")
        )

    def cand(sf):
        corpus, cents = corpus_cents(sf)
        carr = cents.agg(
            F.array_sort(
                F.collect_list(F.struct("cent_id", "cv"))
            ).alias("cents")
        )
        best = F.array_max(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    cosine(F.col("embedding"), c["cv"]).alias("sim"),
                    (-c["cent_id"]).alias("ncid"),
                ),
            )
        )
        return (
            corpus.crossJoin(F.broadcast(carr))
            .select("vec_id", (-best["ncid"]).alias("cent_id"), "embedding")
        )

    same_rows(spark, cur, cand, SF_SMALL)
    clock(spark, "l27 assign CURRENT (crossJoin+window)", cur, SF_BIG)
    clock(spark, "l27 assign HOF (argmax projection)", cand, SF_BIG)


# --- candidate: l38 span frame via HOF filter (no posexplode, no distinct) ---


def l38_spans_current(docs):
    from mcp_trino_spark.operators.llm_dedup import anchored_spans

    return anchored_spans(docs).distinct()


def l38_spans_hof(docs):
    from mcp_trino_spark.operators.llm_dedup import SUBSTR_W

    ws = F.split(F.lower("text"), " ")
    spans = F.transform(
        F.filter(
            F.sequence(F.lit(0), F.size(F.col("ws")) - 1),
            lambda i: (
                F.substring(F.md5(F.element_at(F.col("ws"), i + 1)), 1, 1) == "0"
            )
            & (i + SUBSTR_W <= F.size(F.col("ws"))),
        ),
        lambda i: F.array_join(F.slice(F.col("ws"), i + 1, SUBSTR_W), " "),
    )
    return docs.select("doc_id", ws.alias("ws")).select(
        "doc_id", F.explode(F.array_distinct(spans)).alias("span")
    ).select("doc_id", F.md5("span").alias("fp"), "span")


def probe_l38_spans(spark):
    def cur(sf):
        (docs,) = T(spark, sf, "documents")
        return l38_spans_current(spread(docs))

    def cand(sf):
        (docs,) = T(spark, sf, "documents")
        return l38_spans_hof(spread(docs))

    same_rows(spark, cur, cand, SF_SMALL)
    clock(spark, "l38 spans CURRENT (posexplode+distinct)", cur, SF_BIG)
    clock(spark, "l38 spans HOF (filter+array_distinct)", cand, SF_BIG)


PROBES = {
    "minhash": probe_minhash,
    "l2c_grams": probe_l2c_grams,
    "l27_assign": probe_l27_assign,
    "l38_spans": probe_l38_spans,
}


def main():
    spark = get_spark("r15_probe")
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        print(f"== {n} ==")
        PROBES[n](spark)


if __name__ == "__main__":
    main()
