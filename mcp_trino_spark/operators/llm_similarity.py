"""Embedding similarity search — SURVEY §2.10 (L3, L4) plus an
IVF-bucketed scale variant and embedding-cosine near-dup.

Design for 100 TB / billions of vectors:
- Brute-force top-k broadcasts the query vector (bytes, not rows) and
  runs as a scan + TakeOrderedAndProject — no shuffle of the corpus.
- The IVF variant clusters once (here: deterministic seed centroids),
  stores cluster_id as a partition-prunable column, and probes only the
  nearest cluster(s) — the standard ANN recall/cost dial.
- Dot products accumulate left-to-right over the array on both engines
  (list order is defined), so values hash-match exactly after a
  float→double cast; ROUND(…,9) guards interpolation ULPs.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F

from mcp_trino_spark.operators._util import T, spread
from mcp_trino_spark.registry import register

#: DuckDB-side exact twin of the Spark dot/norm expressions, kept in one
#: place so every oracle uses the identical accumulation.
_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)}) / "
        f"(({_NORM.format(a=a)}) * ({_NORM.format(a=b)}))"
    )


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential accumulation (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@register(
    "l3_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 9) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
    """,
)
def l3_cosine_pairs(spark, sf_dir):
    """Pairwise cosine within label blocks (sampled to every 10th vector
    — the full quadratic blow-up is exactly what l4b's IVF avoids)."""
    (emb,) = T(spark, sf_dir, "embeddings")
    # spread BEFORE the self-join: the sampled side is small enough to
    # auto-broadcast, so without it every pairwise cosine runs at the
    # single-file scan's parallelism (one core)
    # norm() hoisted below the self-join (r15): evaluated once per
    # vector instead of once per pair — the join is a Project barrier,
    # so the pre-join alias can't be inlined back into the per-pair
    # expression.  Bit-exact: the same per-vector double feeds the same
    # (dot / (na * nb)) tree.
    sampled = (
        spread(emb)
        .filter(F.col("vec_id") % 10 == 0)
        .withColumn("nrm", norm(F.col("embedding")))
    )
    a = sampled.alias("a")
    b = sampled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                9,
            ).alias("cos_sim"),
        )
    )


@register(
    "l4_topk_similarity",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND({_cosine_sql('e.embedding', 'q.qv')}, 9) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC NULLS LAST, e.vec_id ASC
    LIMIT 10
    """,
)
def l4_topk_similarity(spark, sf_dir):
    """Brute-force cosine top-k against the vec_id=0 query vector.

    The query vector joins in as a broadcast single-row relation; the
    corpus is scanned once and TakeOrderedAndProject keeps per-partition
    heaps of k — the exact-baseline ANN shape that scales linearly.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    # norm(qv) rides the broadcast row (r15): the old per-row cosine
    # re-folded the query vector's norm for every corpus row.
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), norm(F.col("embedding")).alias("qn")
    )
    return (
        spread(emb.filter(F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("qv"))
                / (norm(F.col("embedding")) * F.col("qn")),
                9,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "l4b_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    assign AS (
      SELECT e.vec_id, e.label, e.embedding, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cosine_sql('e.embedding', 'c.cv')} DESC, c.cent_id ASC) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    clustered AS (SELECT vec_id, label, embedding, cent_id FROM assign WHERE rn = 1),
    qc AS (SELECT cent_id, embedding FROM clustered WHERE vec_id = 0)
    SELECT x.vec_id, x.cent_id,
           ROUND({_cosine_sql('x.embedding', 'qc.embedding')}, 9) AS cos_sim
    FROM clustered x JOIN qc ON x.cent_id = qc.cent_id
    WHERE x.vec_id <> 0
    ORDER BY cos_sim DESC NULLS LAST, x.vec_id ASC
    LIMIT 10
    """,
)
def l4b_ivf_topk(spark, sf_dir):
    """IVF-style ANN: assign every vector to its nearest of 8 seed
    centroids (vec_id < 8, deterministic stand-in for trained k-means),
    then search only the query's cluster.

    At scale: centroids broadcast; assignment is a map-only pass; the
    cluster id becomes a storage partition key so a probe prunes ~7/8 of
    the corpus before any distance math.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    emb = spread(emb)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    # Assignment as a PROJECTION over one collected centroid-array row
    # (r15 — the same rewrite semdedup_plan carries, see there for the
    # argmax↔row_number equivalence): no corpus×k row explosion, no
    # vec_id window shuffle.  Norms are hoisted: norm(cv) rides the
    # centroid structs, norm(embedding) is a below-join alias evaluated
    # once per corpus row (bit-exact — same doubles, same division tree).
    carr = cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cent_id", "cv", norm(F.col("cv")).alias("cn")))
        ).alias("cents")
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (dot(F.col("embedding"), c["cv"]) / (F.col("nrm") * c["cn"])).alias(
                    "sim"
                ),
                (-c["cent_id"]).alias("ncid"),
            ),
        )
    )
    clustered = (
        emb.withColumn("nrm", norm(F.col("embedding")))
        .crossJoin(F.broadcast(carr))
        .select(
            "vec_id", "label", "embedding", (-best["ncid"]).alias("cent_id"), "nrm"
        )
    )
    # the assignment pipeline feeds both the query-side lookup and the
    # probe join — persist + materialize so one job's subtrees don't
    # recompute (or race) the assignment scan (same lesson as the LSH
    # band cache in llm_dedup)
    from mcp_trino_spark.operators.opcache import persist_tracked

    clustered = persist_tracked(clustered)
    clustered.count()
    qc = clustered.filter(F.col("vec_id") == 0).select(
        F.col("cent_id").alias("q_cent"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    return (
        clustered.join(F.broadcast(qc), clustered.cent_id == F.col("q_cent"))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "cent_id",
            F.round(
                dot(F.col("embedding"), F.col("qv")) / (F.col("nrm") * F.col("qn")),
                9,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "l3b_embedding_neardup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01)
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 9) AS cos_sim
    FROM corpus a JOIN corpus b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} > 0.99
    """,
)
def l3b_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cos > 0.99) — candidate
    generation by sign-random-hyperplane LSH, then exact verification.
    The embedding-space analogue of MinHash dedup (l2), with the same
    scale shape:

    1. Signatures: 16 fixed random hyperplanes (seeded numpy, broadcast
       as literals — KB-sized) → 16 sign bits per vector, computed
       JVM-side in one narrow map pass.
    2. Banding: 8 bands × 2 bits.  A cos ≥ 0.99 pair (angle ≤ 8.1°)
       disagrees on one hyperplane w.p. θ/π ≈ 0.026, so it collides in
       any given band w.p. ≈ 0.949 and misses ALL 8 bands w.p. ≈ 5e-11
       — candidate recall is exhaustively verified exact in the local
       gate at every SF (deterministic: fixed seed).
    3. Candidate join on (band, key, label): only the NARROW signature
       table (vec_id, band, key, label) self-joins; work is Σ bucket²,
       never corpus², and the 64-float embeddings stay out of the
       shuffle.
    4. Exact verify: distinct candidate pairs join embeddings back by
       vec_id (hash join on the id) and keep cos > 0.99 — LSH only
       proposes, the cosine decides, so the output equals the oracle's
       label-blocked quadratic join.

    The testdata has no natural near-dups (max same-label cosine ≈ 0.51),
    which would make the check vacuous — so the corpus unions in a
    deterministically perturbed copy of itself (each vector + 0.01 on
    every coordinate, cos ≈ 0.997 to its original; IEEE-identical
    arithmetic on both engines).  Every original↔perturbed pair must
    survive the LSH bands for the oracle to match, so the comparison
    verifies candidate recall, not just the verify filter.
    """
    import numpy as np

    (emb,) = T(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    emb = base.unionAll(
        base.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            "label",
            F.transform(F.col("embedding"), lambda x: x + 0.01).alias("embedding"),
        )
    )

    dim = 64  # embeddings table schema (TESTDATA.md)
    n_planes, n_bands = 16, 8
    planes = np.random.RandomState(42).normal(size=(n_planes, dim))
    plane_lits = F.array(
        *[F.array(*[F.lit(float(v)) for v in p]) for p in planes]
    )
    bits = F.transform(
        plane_lits, lambda h: (dot(F.col("embedding"), h) >= 0).cast("int")
    )
    band_keys = [
        F.concat_ws(
            "",
            *[F.element_at(F.col("bits"), i + 1) for i in range(b * 2, b * 2 + 2)],
        ).alias(f"k{b}")
        for b in range(n_bands)
    ]
    sigs = (
        emb.withColumn("bits", bits)
        .select("vec_id", "label", *band_keys)
        .select(
            "vec_id",
            "label",
            F.posexplode(F.array(*[F.col(f"k{b}") for b in range(n_bands)])).alias(
                "band", "key"
            ),
        )
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    # norms hoisted below the joins (r15): once per vector, not per
    # candidate pair — bit-exact, see l3_cosine_pairs.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        norm(F.col("embedding")).alias("nrm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        norm(F.col("embedding")).alias("nrm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn(
            "sim",
            dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")),
        )
        .filter(F.col("sim") > 0.99)
        .select("vec_a", "vec_b", F.round(F.col("sim"), 9).alias("cos_sim"))
    )


@register("l11_kmeans_embeddings")  # rows-only: iterative algorithm (SURVEY §2.10)
def l11_kmeans_embeddings(spark, sf_dir, k: int = 8, iters: int = 3):
    """Distributed Lloyd's k-means over the embedding column.

    The canonical iterative-algorithm shape on Spark: per iteration the
    DATA never moves to the driver — assignment (argmin over k broadcast
    centroids) and the centroid update (posexplode → per-(cluster,dim)
    mean → regroup) are distributed; only the k×dim centroid matrix (a
    few KB, metadata-sized) is collected and re-broadcast as literals.
    Deterministic: init = embeddings of vec_id 0..k-1, fixed iteration
    count, no RNG.  At 100 TB: identical loop, centroids still KB-sized;
    the assignment scan dominates and parallelizes linearly.

    The centroid means accumulate in exact decimal (dsum pattern), not
    F.avg over raw doubles: double partials merge in shuffle-fetch
    completion order, which varies run to run — a last-ULP centroid
    wobble could flip boundary vectors between clusters and break the
    determinism this docstring promises.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    emb = spread(emb).select("vec_id", "embedding")

    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]

    def assign(df, centroids):
        cent_arr = F.array(
            *[F.array(*[F.lit(v) for v in c]) for c in centroids]
        )
        dists = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with(c, F.col("embedding").cast("array<double>"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return df.withColumn(
            "cluster", F.array_position(dists, F.array_min(dists)).cast("int")
        )

    for _ in range(iters):
        assigned = assign(emb, cents)
        new_cents = (
            assigned.select("cluster", F.posexplode(F.col("embedding").cast("array<double>")))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("col").cast("decimal(28,12)")).cast("double")
                    / F.count("col")
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("centroid"))
            .collect()
        )
        by_cluster = {r["cluster"]: list(r["centroid"]) for r in new_cents}
        cents = [by_cluster.get(c + 1, cents[c]) for c in range(k)]

    return assign(emb, cents).select("vec_id", "cluster")


@register(
    "l12_grouped_normalize",
    oracle="""
    WITH un AS (
      SELECT label, vec_id, CAST(r.i - 1 AS INTEGER) AS pos,
             CAST(embedding[CAST(r.i AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    q AS (SELECT label, vec_id, pos, x, CAST(x AS DECIMAL(18,12)) AS qx FROM un),
    stats AS (
      SELECT label, pos, COUNT(*) AS n,
             CAST(SUM(qx) AS DOUBLE) / COUNT(*) AS mu,
             CAST(SUM(qx * qx) AS DOUBLE) / COUNT(*) AS ex2
      FROM q GROUP BY label, pos
    )
    SELECT q.vec_id, q.label, q.pos,
           ROUND((q.x - s.mu)
                 / NULLIF(sqrt(GREATEST(s.ex2 - s.mu * s.mu, 0)), 0), 6) AS z
    FROM q JOIN stats s ON q.label = s.label AND q.pos = s.pos
    """,
)
def l12_grouped_normalize(spark, sf_dir):
    """Per-label z-score normalization of embedding dimensions via
    applyInPandas (grouped-map) — the custom-operator escape hatch for
    per-group logic the built-ins can't express (here deliberately
    expressible, so the Arrow path is exactly verifiable against SQL).

    Cross-engine exactness (registry.py doctrine — no post-hoc ROUND
    heals last-ULP float divergence): the group stats use the
    exact-decimal protocol on BOTH sides — inputs quantized once to
    DECIMAL(18,12) (within the double→decimal exact range), mean and
    second moment accumulated in exact decimal (the squares are exact
    decimal products, never re-quantized), variance = E[x²] − mu² with
    a 0 floor.  numpy's pairwise-summation mean / two-pass std vs
    DuckDB's sequential AVG / Welford STDDEV_POP differ in last ULPs,
    which the 6-decimal round cannot reliably absorb; the decimal route
    is bit-identical (verified cell-for-cell at sf0.01: 32k/32k).

    Scale: groups hash-partition by label; the z computation stays
    vectorized numpy; only the per-dimension stats walk the Decimal
    path (64 × n ops per group).  Skewed groups are the caveat at
    100 TB — for giant groups switch to the two-pass SQL form the
    oracle uses.
    """
    import math
    from fractions import Fraction

    import numpy as np
    import pandas as pd

    (emb,) = T(spark, sf_dir, "embeddings")
    emb = spread(emb)

    TEN12 = 10 ** 12
    TEN24 = 10 ** 24

    def q12_int(x: float) -> int:
        """round-half-even of x·10¹², computed EXACTLY via the double's
        integer ratio — bit-identical to DECIMAL(18,12) quantization
        (a float·1e12 product would double-round ~5e-4 of values)."""
        p, q = x.as_integer_ratio()
        m, r = divmod(p * TEN12, q)
        r2 = r * 2
        if r2 > q or (r2 == q and (m & 1)):
            m += 1
        return m

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["embedding"].values).astype("float64")
        n, d = mat.shape
        mu = np.empty(d)
        sigma = np.empty(d)
        for j in range(d):
            ms = [q12_int(float(x)) for x in mat[:, j]]
            # Fraction→float is a single correct rounding, matching
            # DuckDB's one-step DECIMAL→DOUBLE conversion (int(S) then
            # /1e12 would round twice)
            mu[j] = float(Fraction(sum(ms), TEN12)) / n
            ex2 = float(Fraction(sum(m * m for m in ms), TEN24)) / n
            var = max(ex2 - mu[j] * mu[j], 0.0)
            sigma[j] = math.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sigma == 0, np.nan, (mat - mu) / sigma)
        # round half-even per element via Python's correctly-rounded
        # round() (np.round scales by 1e6 and double-rounds), matching
        # the oracle's ROUND on values that (as binary rationals) never
        # sit exactly on a decimal half-boundary
        flat = z.ravel()
        zr = np.fromiter(
            (v if v != v else round(v, 6) for v in flat.tolist()),
            dtype="float64",
            count=flat.size,
        )
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].values.repeat(d),
                "label": pdf["label"].values.repeat(d),
                "pos": np.tile(np.arange(d), n),
                "z": zr.ravel(),
            }
        )

    out = emb.select("vec_id", "label", "embedding").groupBy("label").applyInPandas(
        normalize, "vec_id bigint, label int, pos int, z double"
    )
    # sigma == 0 comes back as float NaN through Arrow; the SQL oracle's
    # NULLIF(sigma, 0) yields NULL — normalize NaN → NULL for parity
    return out.withColumn(
        "z", F.when(F.isnan("z"), F.lit(None).cast("double")).otherwise(F.col("z"))
    )


@register(
    "l25_batch_ann",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT q.query_id, e.vec_id, e.label,
             ROUND({_cosine_sql('e.embedding', 'q.qv')}, 9) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id >= 8
    ),
    ranked AS (
      SELECT query_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, label, cos_sim, rnk FROM ranked WHERE rnk <= 10
    """,
)
def l25_batch_ann(spark, sf_dir):
    """Batched multi-query ANN — the serving shape: a small batch of
    query vectors (here the 8 vecs with vec_id < 8), each wanting its
    top-10 neighbors, answered in ONE corpus scan.

    Scale design: the query batch broadcasts (KB), the corpus is
    scanned once and scored against all queries JVM-side, and the
    rank-≤-k window triggers Spark's WindowGroupLimit pushdown
    (asserted in tests/test_plans.py): each input partition keeps only
    its local top-k PER QUERY before the shuffle, so the exchange
    carries ≤ k × n_queries × n_partitions narrow rows, not
    corpus × n_queries.  Ordering is on the ROUNDED score with a
    vec_id tiebreak, so ranks are engine-deterministic.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    # norms hoisted (r15): norm(qv) rides the broadcast query rows;
    # norm(embedding) is a below-join alias, once per corpus row instead
    # of once per (row × query).  Bit-exact, see l3_cosine_pairs.
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
    )
    scored = (
        spread(emb.filter(F.col("vec_id") >= 8))
        .withColumn("nrm", norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("qv")) / (F.col("nrm") * F.col("qn")),
                9,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)


@register(
    "l27_semdedup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01)
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM corpus WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, cent_id, embedding FROM (
        SELECT c.vec_id, k.cent_id, c.embedding,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_cosine_sql('c.embedding', 'k.cv')} DESC,
                                           k.cent_id ASC) AS rn
        FROM corpus c CROSS JOIN cents k
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE {_cosine_sql('a.embedding', 'b.embedding')} > 0.99
    )
    SELECT x.vec_id, x.cent_id, d.vec_id IS NULL AS is_kept
    FROM assigned x LEFT JOIN dropped d ON x.vec_id = d.vec_id
    """,
)
def l27_semdedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then drop any vector
    whose cosine to a LOWER-ID vector in the SAME cluster exceeds the
    threshold — the cluster granularity is what bounds the otherwise
    quadratic pair search, which is exactly the published algorithm's
    scale story (k ≈ √n clusters keeps per-cluster work ~n).

    Spark shape: centroid assignment is a broadcast cross join + one
    row_number (map-side; centroids here are seed vectors vec_id<8, the
    deterministic stand-in for trained k-means — l11 provides training).
    The within-cluster pair join shuffles only (vec_id, cent_id,
    embedding) on cent_id; at real scale cent_id has k ≈ √n values, so
    AQE splits the skewiest clusters.  Keep/drop is a LEFT ANTI-style
    membership flag, deterministic (lowest vec_id in a dup group wins).

    As in l3b, the corpus unions a +0.01-perturbed copy of itself so
    genuine near-dups exist (cos ≈ 0.997 to the original, IEEE-identical
    on both engines); every perturbed vector must then be dropped and
    every original kept, making the check non-vacuous end-to-end.
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = base.unionAll(
        base.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x + 0.01).alias("embedding"),
        )
    )
    cents = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    return semdedup_plan(corpus, cents)


def semdedup_plan(corpus, cents):
    """The SemDeDup engine shared by l27 and the k-scaled probe in
    tools/scaling_check.py: assign each vector to its nearest broadcast
    centroid, then drop any vector whose cosine to a lower-id vector in
    the same cluster exceeds 0.99.  ``corpus`` needs (vec_id,
    embedding); ``cents`` (cent_id, cv) must stay broadcast-sized
    (k x dim — for SemDeDup's contract k grows with n, keeping cluster
    sizes bounded, so k x dim stays KB-to-MB at any corpus size)."""
    # Assignment as a PROJECTION, not a window (r15): collapse the
    # broadcast-sized centroid frame to ONE array row, cross-join it in
    # (broadcast, no row multiplication), and take the argmax with
    # array_max over (sim, -cent_id) structs — the same winner the old
    # row_number() over (sim DESC, cent_id ASC) picked, without
    # exploding corpus×k rows through a vec_id window shuffle
    # (measured 2.04 s → 0.67 s for the assignment stage at sf0.1,
    # identical rows; end-to-end l27 is dominated by the pair join, so
    # its headline moves little — the win is the removed corpus×k
    # explode + window sort at scale).  array_sort fixes collect_list's
    # order so the argmax scan is deterministic.  The persist+count
    # below stays: a no-persist trial re-ran the scan+assignment three
    # times concurrently and measured 3.31 s vs 2.72 s end-to-end.
    # Hoist the norms out of the cosine loops (r15, guide §4.2): array
    # HOFs are CodegenFallback (interpreted), so cosine(a, b) evaluated
    # per (row × centroid) and per pair pays THREE interpreted array
    # folds where only the dot product actually varies.  norm(cv) rides
    # the collected centroid structs; norm(embedding) is an alias
    # referenced more than once, which CollapseProject leaves
    # un-inlined — one fold per row, not per centroid.  Bit-exact: the
    # same doubles flow into the same (dot / (na * nb)) tree, only the
    # re-computation is removed.
    carr = cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cent_id", "cv", norm(F.col("cv")).alias("cn")))
        ).alias("cents")
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (dot(F.col("embedding"), c["cv"]) / (F.col("nrm") * c["cn"])).alias(
                    "sim"
                ),
                (-c["cent_id"]).alias("ncid"),
            ),
        )
    )
    assigned = (
        corpus.withColumn("nrm", norm(F.col("embedding")))
        .crossJoin(F.broadcast(carr))
        .select("vec_id", (-best["ncid"]).alias("cent_id"), "embedding", "nrm")
    )
    # three consumers (pair self-join a/b + the final keep/drop join):
    # persist + materialize so the scan+assignment runs once instead of
    # three concurrent times (llm_dedup's LSH cache lesson)
    from mcp_trino_spark.operators.opcache import persist_tracked

    assigned = persist_tracked(assigned)
    assigned.count()
    a = assigned.alias("a")
    b = assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cent_id") == F.col("b.cent_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            > 0.99
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cent_id",
        F.col("is_dropped").isNull().alias("is_kept"),
    )


@register(
    "l36_embedding_outliers",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, CAST(u.i AS INTEGER) AS dim,
             round(CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE) * 1000000)
               / 1000000 AS val
      FROM embeddings,
           LATERAL unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (
      SELECT label, dim,
             CAST(SUM(CAST(round(val * 1000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1000000 AS c
      FROM q GROUP BY label, dim
    ),
    d2 AS (
      SELECT q.vec_id, q.label,
             CAST(SUM(CAST(round((q.val - c.c) * (q.val - c.c) * 1000000000000)
                           AS BIGINT)) AS DOUBLE) / 1e12 AS dist2
      FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
      GROUP BY q.vec_id, q.label
    ),
    dist AS (SELECT vec_id, label, sqrt(dist2) AS dist FROM d2),
    stats AS (
      SELECT label,
             CAST(SUM(CAST(round(dist * 1000000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1e9 AS mean_dist,
             sqrt(
               CAST(SUM(CAST(round(dist * dist * 1000000000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1e9
               - (CAST(SUM(CAST(round(dist * 1000000000) AS BIGINT)) AS DOUBLE)
                  / COUNT(*) / 1e9)
                 * (CAST(SUM(CAST(round(dist * 1000000000) AS BIGINT)) AS DOUBLE)
                    / COUNT(*) / 1e9)
             ) AS std_dist
      FROM dist GROUP BY label
    )
    SELECT d.vec_id, d.label,
           ROUND(d.dist, 6) AS dist,
           ROUND((d.dist - s.mean_dist) / s.std_dist, 6) AS z
    FROM dist d JOIN stats s ON s.label = d.label
    WHERE (d.dist - s.mean_dist) / s.std_dist >= 1.5
    """,
)
def l36_embedding_outliers(spark, sf_dir):
    """Embedding-space outlier detection: distance of each vector to
    its OWN label's centroid, z-scored within the label — the
    mislabeled/corrupt-embedding screen a training pipeline runs before
    contrastive fine-tuning (an outlier either carries a wrong label or
    a degenerate embedding).

    Scale shape: posexplode to (label, dim) → centroid aggregate
    (labels×dims rows — KB-sized, broadcast back), one (vec_id)
    aggregate for distances, one tiny per-label stats frame broadcast
    for the z-score.  Two real shuffles, both with map-side partials;
    embeddings never self-join.

    Cross-engine exactness: every aggregate uses the integer-scaled
    protocol (registry.isum's pattern) — inputs quantized to 1e-6
    (identical IEEE doubles both engines), per-dim sums / distance²
    sums / moment sums all exact BIGINT arithmetic, final divisions
    identical doubles.  Plain double SUMs would differ in the last ULPs
    by add order (SURVEY §5.2 hazard list).
    """
    (emb,) = T(spark, sf_dir, "embeddings")
    return embedding_outliers_plan(spread(emb))


def embedding_outliers_plan(emb):
    """The outlier engine shared by l36 and the 10x probe in
    tools/scaling_check.py: per-label centroid (tiny agg, broadcast) ->
    per-vector distance (one agg) -> per-label z-score (tiny agg,
    broadcast) -> scan-side filter.  ``emb`` needs (vec_id, label,
    embedding).  All aggregates use the integer-scaled exact protocol
    (see l36's docstring)."""
    m6, m12, m9 = 1_000_000, 10 ** 12, 10 ** 9
    q = (
        emb
        .select(
            "vec_id",
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim0", "v"
            ),
        )
        .select(
            "vec_id",
            "label",
            (F.col("dim0") + 1).alias("dim"),
            (F.round(F.col("v") * m6) / m6).alias("val"),
        )
    )
    cent = q.groupBy("label", "dim").agg(
        (
            F.sum(F.round(F.col("val") * m6).cast("bigint")).cast("double")
            / F.count("*")
            / m6
        ).alias("c")
    )
    diff2 = (F.col("val") - F.col("c")) * (F.col("val") - F.col("c"))
    d2 = (
        q.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            (
                F.sum(F.round(diff2 * m12).cast("bigint")).cast("double")
                / F.lit(float(m12))
            ).alias("dist2")
        )
    )
    dist = d2.select("vec_id", "label", F.sqrt("dist2").alias("dist"))
    mean_d = (
        F.sum(F.round(F.col("dist") * m9).cast("bigint")).cast("double")
        / F.count("*")
        / m9
    )
    mean_d2 = (
        F.sum(F.round(F.col("dist") * F.col("dist") * m9).cast("bigint")).cast(
            "double"
        )
        / F.count("*")
        / m9
    )
    stats = dist.groupBy("label").agg(
        mean_d.alias("mean_dist"),
        F.sqrt(mean_d2 - mean_d * mean_d).alias("std_dist"),
    )
    z = (F.col("dist") - F.col("mean_dist")) / F.col("std_dist")
    return (
        dist.join(F.broadcast(stats), "label")
        .filter(z >= 1.5)
        .select(
            "vec_id",
            "label",
            F.round("dist", 6).alias("dist"),
            F.round(z, 6).alias("z"),
        )
    )
