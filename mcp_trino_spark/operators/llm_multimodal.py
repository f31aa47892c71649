"""Multimodal columns + the Python UDF surface — SURVEY §2.10 (L9, L10).

Multimodal policy: image/audio/video payloads are opaque ``binary``
columns with typed metadata alongside.  The decode / feature-extract
steps run as Arrow-batched pandas functions over ``mapInPandas`` — the
image/audio codecs aren't in this container, so the codec call itself
is stubbed behind ``decode_stub`` (deterministic fake), while the
Spark-side plumbing that actually matters at 100 TB — schema, batch
iteration, partition-parallel UDF execution — is real and tested.

The reference itself exposes no UDF mechanism (Trino built-ins only
pass through); this is the mandated extension surface, mapped onto
PySpark's native UDF stack (pandas_udf / mapInPandas).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from mcp_trino_spark.operators._util import T, spread
from mcp_trino_spark.registry import register


@register(
    "l9_multimodal_passthrough",
    oracle="""
    SELECT e.label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(len(e.embedding) AS BIGINT)) AS BIGINT) AS total_dims,
           COUNT(DISTINCT d.lang) AS n_langs
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    GROUP BY e.label
    """,
)
def l9_multimodal_passthrough(spark, sf_dir):
    """Array + JSON/opaque columns survive joins and aggregations as
    first-class values (no serialization cliff: arrays stay columnar
    through Tungsten rows and Arrow batches)."""
    emb, docs = T(spark, sf_dir, "embeddings", "documents")
    return (
        emb.join(docs, emb.vec_id == docs.doc_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.size("embedding").cast("bigint")).cast("bigint").alias("total_dims"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --- multimodal pipeline over opaque binary ---------------------------------

#: Output schema of the feature extractor — fixed and typed, the contract
#: a real decoder would also satisfy.
MM_FEATURE_SCHEMA = STypes.StructType(
    [
        STypes.StructField("doc_id", STypes.LongType()),
        STypes.StructField("n_bytes", STypes.LongType()),
        STypes.StructField("byte_sum", STypes.LongType()),
        STypes.StructField("first_byte", STypes.IntegerType()),
        STypes.StructField("width", STypes.IntegerType()),
        STypes.StructField("height", STypes.IntegerType()),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """STUB for the image/audio decode step.

    Real deployments replace this with e.g. PIL/libsndfile; those libs
    aren't in this container, so it returns deterministic fake metadata
    derived from the bytes (so tests are stable and the full pipeline
    shape is exercised).  Raise NotImplementedError for real decoding.
    """
    if payload is None:
        # NULL payload → NULL features (matching the SQL oracle, where
        # every octet_length-derived column of a NULL input is NULL —
        # zeros here would be a fabricated decode of nothing)
        return {"n_bytes": None, "byte_sum": None, "first_byte": None,
                "width": None, "height": None}
    n = len(payload)
    return {
        "n_bytes": n,
        "byte_sum": int(sum(payload)),
        "first_byte": payload[0] if n else -1,
        # deterministic fake dimensions in lieu of a real codec:
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → feature frame out.

    Runs once per partition batch on executors — the shape a real
    GPU/codec stage would take (per-batch setup amortized, columnar
    transfer both ways)."""
    cols = [f.name for f in MM_FEATURE_SCHEMA.fields]
    for pdf in batches:
        if not len(pdf):
            # a zero-row Arrow batch would make pd.DataFrame([]) have NO
            # feature columns and the reindex below raise KeyError
            continue
        feats = pdf["payload"].map(decode_stub)
        out = pd.DataFrame(list(feats))
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[cols]


@register(
    "l9b_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(t) AS BIGINT) AS n_bytes,
           CAST(octet_length(t) % 640 + 1 AS INTEGER) AS width,
           CAST((octet_length(t) * 7) % 480 + 1 AS INTEGER) AS height
    FROM (SELECT doc_id, encode(text) AS t FROM documents) s
    """,
)
def l9b_multimodal_features(spark, sf_dir):
    """End-to-end multimodal pipeline on synthetic payloads.

    documents.text is encoded to a ``binary`` column standing in for an
    image payload; features are extracted by an Arrow-batched
    ``mapInPandas`` stage.  byte_sum/first_byte are Python-side only
    (exercised in unit tests); the oracle checks the size-derived
    fields end-to-end.
    """
    (docs,) = T(spark, sf_dir, "documents")
    # spread before the Python stage: single-partition input would pin
    # the whole Arrow/pandas pipeline to one core
    payloads = spread(docs).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = payloads.mapInPandas(_extract_features, MM_FEATURE_SCHEMA)
    return feats.select("doc_id", "n_bytes", "width", "height")


@register(
    "l9c_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             CAST(FLOOR(LEAST(CAST(octet_length(encode(text)) AS DOUBLE) / 64, 16)) AS INTEGER)
               AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, CAST(i * 64 AS INTEGER) AS frame_offset
    FROM p, LATERAL unnest(range(0, GREATEST(n_frames - 1, 0) + 1)) AS u(i)
    """,
)
def l9c_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing for video-like payloads: each payload
    expands to every k-th 'frame offset' (stub for decoded frames).
    Demonstrates the explode-with-bounded-fanout pattern that keeps
    row-size under control when a 100 MB video becomes N rows."""
    (docs,) = T(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    n_frames = F.least(F.length("payload") / 64, F.lit(16)).cast("int")
    return payloads.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_offset", F.col("frame_idx") * 64)


# --- UDF surface demo (L10) -------------------------------------------------


@F.pandas_udf(STypes.LongType())
def tokenize_count_udf(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) tokenizer UDF — the declared UDF
    surface.  A row-at-a-time @udf would be 10-100× slower; at 100 TB
    the difference is the job.

    Uses the SHARED TOKEN_REGEX (llm_text), whose explicit whitespace
    class makes Python re, Java regex and RE2 agree (\\s alone differs
    across all three); NULL text stays NULL (str.count yields NaN and a
    plain int64 cast would crash the job) — Int64 keeps the hole."""
    from mcp_trino_spark.operators.llm_text import TOKEN_REGEX

    return texts.str.count(TOKEN_REGEX).astype("Int64")


def _l10_oracle() -> str:
    from mcp_trino_spark.operators.llm_text import TOKEN_REGEX

    return f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_tokens
    FROM documents
    """


@register("l10_udf_tokenizer", oracle=_l10_oracle())
def l10_udf_tokenizer(spark, sf_dir):
    """pandas UDF tokenizer checked against the same regex evaluated by
    the oracle — demonstrates that the Python-UDF path produces results
    identical to engine-native evaluation."""
    (docs,) = T(spark, sf_dir, "documents")
    return spread(docs).select("doc_id", tokenize_count_udf(F.col("text")).alias("n_tokens"))


@register(
    "l10b_udtf_word_counts",
    oracle="""
    SELECT doc_id, w AS word, COUNT(*) AS cnt
    FROM documents, LATERAL unnest(string_split(lower(text), ' ')) AS t(w)
    WHERE length(w) > 0
    GROUP BY doc_id, w
    """,
)
def l10b_udtf_word_counts(spark, sf_dir):
    """Python UDTF (table-valued function) — the third leg of the UDF
    surface (scalar UDF / pandas UDF / UDTF, SURVEY L10).  One input row
    expands to one output row per distinct word, via LATERAL join in
    SQL, exactly how Trino exposes table functions.  Row-fanout happens
    executor-side (no collect); each task streams its partition through
    the Python worker.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, cnt: bigint")
    class WordCounts:
        def eval(self, text: str):
            from collections import Counter

            if text:
                for w, c in Counter(
                    t for t in text.lower().split(" ") if t
                ).items():
                    yield w, c

    spark.udtf.register("word_counts", WordCounts)
    (docs,) = T(spark, sf_dir, "documents")
    # spread BEFORE the Python fan-out: the raw single-file view would
    # pin the whole UDTF stage to one task (the exact hazard l9b/l10
    # guard against); register the spread frame as the LATERAL source
    spread(docs).createOrReplaceTempView("documents_spread")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.cnt
        FROM documents_spread d, LATERAL word_counts(d.text) t
        """
    )


@register(
    "l10c_grouped_agg_udf",
    oracle="""
    SELECT source,
           ROUND(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 6) AS geomean_chars
    FROM documents WHERE n_chars > 0
    GROUP BY source
    """,
)
def l10c_grouped_agg_udf(spark, sf_dir):
    """Grouped-aggregate pandas UDF (the Python-UDAF surface): geometric
    mean of document lengths per source.  Arrow hands each group's
    column to one vectorized numpy call; usable in groupBy().agg and
    over windows — the remaining leg of the UDF taxonomy next to
    scalar/pandas-scalar (l10), UDTF (l10b), grouped-map (l12),
    mapInPandas (l9b) and applyInPandasWithState (streaming t3b).
    """
    import numpy as np

    @F.pandas_udf("double")
    def geomean(chars: pd.Series) -> float:
        # sort before reducing: group values arrive in shuffle order, and
        # float summation is order-dependent — sorting makes the result
        # deterministic across runs (cross-engine agreement then rests on
        # the ROUND(…,6) margin, same policy as the a11 stats oracles)
        logs = np.sort(np.log(chars.to_numpy(dtype="float64")))
        return float(np.exp(logs.mean()))

    (docs,) = T(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.round(geomean(F.col("n_chars")), 6).alias("geomean_chars"))
    )
