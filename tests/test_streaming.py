"""Structured Streaming twins == batch operators (SURVEY §2.9 T1-T5).

Each streaming op is drained with trigger(availableNow=True) into a
memory sink and compared row-for-row against the batch formulation on
the same sf0.001 events data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mcp_trino_spark import registry
from mcp_trino_spark.streaming import ops as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _tmpdir():
    os.makedirs("/root/repo/.tmp", exist_ok=True)


def rows_set(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_t1_tumbling_stream_matches_batch(spark):
    got = S.run_to_memory(
        S.t1_tumbling_stream(S.events_stream(spark, SF_DIR)), "t1_mem"
    )
    want = registry.queries()["t1_tumbling_window"](spark, SF_DIR)
    cols = ["hour_start", "n_events", "sum_value"]
    assert rows_set(got, cols) == rows_set(want, cols)


def test_t2_sliding_stream_matches_batch(spark):
    got = S.run_to_memory(
        S.t2_sliding_stream(S.events_stream(spark, SF_DIR)), "t2_mem"
    )
    want = registry.queries()["t2_sliding_window"](spark, SF_DIR)
    cols = ["w_start", "n_events"]
    assert rows_set(got, cols) == rows_set(want, cols)


def test_t3_session_stream_matches_batch(spark):
    got = S.run_to_memory(
        S.t3_session_stream(S.events_stream(spark, SF_DIR)), "t3_mem"
    )
    want = registry.queries()["t3_sessionization"](spark, SF_DIR)
    # Same sessions → same per-user (n_events, session_value) multisets;
    # batch ids are ordinals, streaming ids are window bounds, so compare
    # the session content, not the labels.
    got_s = sorted(
        (r["user_id"], r["n_events"], round(r["session_value"], 6))
        for r in got.collect()
    )
    want_s = sorted(
        (r["user_id"], r["n_events"], round(r["session_value"], 6))
        for r in want.collect()
    )
    assert got_s == want_s


def test_t4_dedup_stream_matches_batch(spark):
    got = S.run_to_memory(
        S.t4_dedup_stream(S.events_stream(spark, SF_DIR)), "t4_mem",
        output_mode="append",
    )
    want = registry.queries()["t4_event_dedup"](spark, SF_DIR)
    # dropDuplicatesWithinWatermark keeps an arbitrary first-seen row per
    # key (source order), while the batch twin keeps the ts-min row; the
    # deduped *key sets* must agree, and counts per key must be 1.
    got_keys = sorted(
        (r["user_id"], r["event_type"]) for r in got.collect()
    )
    want_keys = sorted(
        (r["user_id"], r["event_type"]) for r in want.collect()
    )
    assert len(got_keys) == len(want_keys)
    assert set(got_keys) == set(want_keys)


def test_t5_watermark_drops_late_data(spark):
    """T5 late-data policy: with a tight watermark and out-of-order
    input, late rows beyond the bound are excluded from finalized
    windows (append mode emits only watermark-finalized windows)."""
    got = S.run_to_memory(
        S.t1_tumbling_stream(S.events_stream(spark, SF_DIR), watermark="0 seconds"),
        "t5_mem",
        output_mode="append",
    )
    batch = registry.queries()["t1_tumbling_window"](spark, SF_DIR)
    # append-mode can only emit windows the watermark has closed — a
    # subset of the batch windows, and every emitted window must match
    # the batch aggregate exactly (file order == ts order in testdata
    # only approximately, so emitted counts may be partial for windows
    # that were still open; just check emitted ⊆ batch window starts).
    got_starts = {r["hour_start"] for r in got.collect()}
    batch_starts = {r["hour_start"] for r in batch.collect()}
    assert got_starts <= batch_starts


def test_t3b_custom_stateful_sessions(spark):
    """applyInPandasWithState sessionizer: emitted (closed) sessions ==
    batch sessions minus each user's final (still-open) session."""
    got = S.run_to_memory(
        S.t3b_custom_stateful_sessions(S.events_stream(spark, SF_DIR)),
        "t3b_mem",
        output_mode="append",
    )
    batch = registry.queries()["t3_sessionization"](spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    want = (
        batch.withColumn("max_sid", F.max("session_id").over(w))
        .filter(F.col("session_id") < F.col("max_sid"))
    )
    got_s = sorted(
        (r["user_id"], r["n_events"], round(r["session_value"], 6))
        for r in got.collect()
    )
    want_s = sorted(
        (r["user_id"], r["n_events"], round(r["session_value"], 6))
        for r in want.collect()
    )
    assert got_s == want_s


def test_t7_stream_stream_join_matches_batch(spark):
    """Stream-stream time-bounded join == the same join on the batch
    table (availableNow drains everything, so no row is late)."""
    got = S.run_to_memory(
        S.t7_stream_stream_join(S.events_stream(spark, SF_DIR)),
        "t7_mem",
        output_mode="append",
    )
    from mcp_trino_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    want = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select("purchase_id", "click_id")
    got_pairs = sorted((r["purchase_id"], r["click_id"]) for r in got.collect())
    want_pairs = sorted((r["purchase_id"], r["click_id"]) for r in want.collect())
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0


def test_foreach_batch_sink(spark):
    """foreachBatch sink: every source row lands in the per-batch
    parquet output exactly once."""
    import shutil

    out = "/root/repo/.tmp/feb_out"
    shutil.rmtree(out, ignore_errors=True)
    n_batches = S.run_foreach_batch_to_parquet(
        S.events_stream(spark, SF_DIR).select("event_id", "user_id", "value"), out
    )
    assert n_batches >= 1
    from mcp_trino_spark.sources.catalog import load_table

    written = spark.read.parquet(out)
    n_src = load_table(spark, SF_DIR, "events").count()
    assert written.count() == n_src
    assert written.select("event_id").distinct().count() == n_src


def test_checkpoint_recovery_exactly_once(spark):
    """Checkpointed restart: a file-source stream drained to a parquet
    sink, stopped, given MORE input files, and restarted with the SAME
    checkpoint must (a) resume from the recorded offset — no reprocess
    of batch-A files — and (b) end with exactly A∪B in the sink.  This
    is the durability contract a 100 TB ingest pipeline leans on."""
    import shutil

    from pyspark.sql import functions as F

    base = "/root/repo/.tmp/ckpt_recovery"
    src, sink, ckpt = f"{base}/src", f"{base}/sink", f"{base}/ckpt"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(src, exist_ok=True)

    from mcp_trino_spark.sources.catalog import load_table

    full = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    a = full.filter(F.col("event_id") % 2 == 0)
    b = full.filter(F.col("event_id") % 2 == 1)
    a.write.mode("overwrite").parquet(f"{src}/batch_a")

    schema = spark.read.parquet(f"{src}/batch_a").schema

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", True)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    drain()
    n_a = spark.read.parquet(sink).count()
    assert n_a == a.count()

    # second wave lands, stream restarts from the checkpoint
    b.write.mode("overwrite").parquet(f"{src}/batch_b")
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == full.count()  # exactly-once: no dupes, no gaps
    assert rows_set(got, ["event_id"]) == rows_set(
        full.select("event_id"), ["event_id"]
    )


def test_t10c_pattern_stream_matches_batch(spark):
    """Streaming MATCH_RECOGNIZE == batch matcher when everything
    arrives (single availableNow drain)."""
    got = S.run_to_memory(
        S.t10c_pattern_stream(S.events_stream(spark, SF_DIR)),
        "t10c_mem",
        output_mode="append",
    )
    want = registry.queries()["t10b_match_recognize_funnel"](spark, SF_DIR)
    cols = ["user_id", "match_no", "n_views", "n_clicks",
            "first_view_eid", "purchase_eid"]
    assert rows_set(got, cols) == rows_set(want, cols)
    assert got.count() > 0


def test_t10c_pattern_stream_incremental_batches(spark):
    """Cross-batch incrementality: the same events split into 3
    time-ordered files and drained one file per micro-batch must produce
    the SAME matches — matches spanning batch boundaries come from
    buffered state.  (Time-ordered chunks: eager emission requires
    in-event-time-order batch progression — see the operator docstring;
    a time-partitioned ingest delivers exactly this.)"""
    import shutil

    from pyspark.sql import Window

    from mcp_trino_spark.sources.catalog import load_table

    base = "/root/repo/.tmp/t10c_chunks"
    shutil.rmtree(base, ignore_errors=True)
    full = load_table(spark, SF_DIR, "events")
    chunked = full.withColumn(
        "chunk", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 4):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{base}/chunk_{i}")
        )
    schema = spark.read.parquet(f"{base}/chunk_1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    got = S.run_to_memory(
        S.t10c_pattern_stream(stream), "t10c_inc_mem", output_mode="append"
    )
    want = registry.queries()["t10b_match_recognize_funnel"](spark, SF_DIR)
    cols = ["user_id", "n_views", "n_clicks", "first_view_eid", "purchase_eid"]
    # match_no may differ in emission order bookkeeping; content must not
    assert rows_set(got, cols) == rows_set(want, cols)


def test_t10d_watermarked_pattern_stream(spark):
    """Watermark-gated streaming matcher: drained over 3 time-ordered
    micro-batches, every emitted match is a batch match (no spurious
    emissions), and every batch match finalized by the pre-last-batch
    watermark MUST have been emitted (gating delays, it must not drop)."""
    import shutil

    from pyspark.sql import Window

    from mcp_trino_spark.sources.catalog import load_table

    base = "/root/repo/.tmp/t10d_chunks"
    shutil.rmtree(base, ignore_errors=True)
    full = load_table(spark, SF_DIR, "events")
    chunked = full.withColumn(
        "chunk", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 4):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{base}/chunk_{i}")
        )
    schema = spark.read.parquet(f"{base}/chunk_1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    got = S.run_to_memory(
        S.t10d_pattern_stream_watermarked(stream), "t10d_mem",
        output_mode="append",
    )
    want = registry.queries()["t10b_match_recognize_funnel"](spark, SF_DIR)
    cols = ["user_id", "n_views", "n_clicks", "first_view_eid", "purchase_eid"]
    got_set = set(rows_set(got, cols))
    want_set = set(rows_set(want, cols))
    assert got_set <= want_set

    # watermark before the LAST batch = max ts of chunks 1-2 minus 10 min;
    # matches whose purchase row is older than that must have emitted
    import datetime

    t12_max = (
        chunked.filter(F.col("chunk") <= 2).agg(F.max("ts").alias("m")).first()["m"]
    )
    wm = t12_max - datetime.timedelta(minutes=10)
    ev_ts = {r["event_id"]: r["ts"] for r in full.select("event_id", "ts").collect()}
    must_emit = {w for w in want_set if ev_ts[w[4]] < wm}
    assert must_emit <= got_set
    assert len(got_set) > 0


def test_t10d_emits_without_further_rows_for_key(spark):
    """A key whose funnel completed in an EARLY batch and never appears
    again must still emit once other keys advance the watermark — the
    EventTimeTimeout contract (NoTimeout would strand the match in
    state forever)."""
    import datetime
    import shutil

    base = "/root/repo/.tmp/t10d_timeout"
    shutil.rmtree(base, ignore_errors=True)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(eid, ts, uid, et, 1.0, "{}") for eid, ts, uid, et in rows],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)
    # chunk 1: user 1's complete funnel; user 1 never appears again
    mk([(1, t0, 1, "view"), (2, t0 + m, 1, "click"),
        (3, t0 + 2 * m, 1, "purchase")]).coalesce(1).write.parquet(f"{base}/c1")
    # chunks 2-3: user 2 drives the watermark far past user 1's purchase
    mk([(10, t0 + 3 * h, 2, "view")]).coalesce(1).write.parquet(f"{base}/c2")
    mk([(11, t0 + 6 * h, 2, "view")]).coalesce(1).write.parquet(f"{base}/c3")

    schema = spark.read.parquet(f"{base}/c1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    got = S.run_to_memory(
        S.t10d_pattern_stream_watermarked(stream), "t10d_to_mem",
        output_mode="append",
    )
    rows = got.collect()
    assert [(r["user_id"], r["n_views"], r["n_clicks"], r["first_view_eid"],
             r["purchase_eid"]) for r in rows] == [(1, 1, 1, 1, 3)]


def test_t3b_cross_chunk_disorder(spark, tmp_path):
    """Review fix: applyInPandasWithState delivers a key's micro-batch
    as MULTIPLE Arrow chunks in shuffle order.  With tiny chunks and
    deliberately disordered input, the sessionizer must still produce
    the globally-sorted sessions (per-chunk sorting emitted an
    end-before-start session here)."""
    import pandas as pd

    # one user, events at hours 0, 2, 1 (written in that DISORDER) —
    # sorted, that is two sessions: {0h, 1h?}... gaps: 0h→1h = 1h ≥ 30min
    # → sessions [0h], [1h], [2h]; the stream closes the first two
    h = 3_600_000_000_000  # ns per hour
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 7],
            "event_type": ["view"] * 4,
            "ts": pd.to_datetime([0, 2 * h, 1 * h, 3 * h]),
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}"] * 4,
        }
    )
    src = tmp_path / "disorder"
    src.mkdir()
    spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).coalesce(1).write.parquet(str(src / "events.parquet"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        got = S.run_to_memory(
            S.t3b_custom_stateful_sessions(S.events_stream(spark, str(src))),
            "t3b_disorder_mem",
            output_mode="append",
        )
        rows = sorted(
            (r["start_us"], r["end_us"], r["n_events"], r["session_value"])
            for r in got.collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    us_h = 3_600_000_000
    # closed sessions: [0h] and [1h] and [2h] — the 3h session stays open
    assert rows == [
        (0, 0, 1, 1.0),
        (1 * us_h, 1 * us_h, 1, 3.0),
        (2 * us_h, 2 * us_h, 1, 2.0),
    ]


def test_l38_contamination_stream_matches_batch(spark):
    """Streaming exact-substring contamination screen == the same
    stateless kernel on the batch read: eval docs are prefixes of two
    real corpus documents (guaranteed shared anchored spans), and the
    stream drains with NO state store (append mode, stream-static
    broadcast join)."""
    from pyspark.sql import functions as F

    from mcp_trino_spark.operators.llm_dedup import anchored_spans
    from mcp_trino_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # eval set: the first 40 words of two corpus docs — verbatim spans
    # by construction (anchors are content-defined, so prefixes share
    # every anchored window that fits)
    eval_docs = (
        docs.filter(F.col("doc_id").isin(1, 2))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.array_join(F.slice(F.split("text", " "), 1, 40), " ").alias(
                "text"
            ),
        )
    )
    eval_static = spark.createDataFrame(
        eval_docs.collect(), "doc_id long, text string"
    )

    got = S.run_to_memory(
        S.l38_contamination_stream(
            S.documents_stream(spark, SF_DIR), eval_static
        ),
        "l38_mem",
        output_mode="append",
    )
    idx = (
        anchored_spans(eval_static)
        .select(F.col("fp").alias("e_fp"), F.col("span").alias("e_span"))
        .distinct()
    )
    hits = anchored_spans(docs)
    expected = (
        hits.join(
            F.broadcast(idx),
            (hits["fp"] == idx["e_fp"]) & (hits["span"] == idx["e_span"]),
        )
        .select("doc_id", "span")
    )
    assert rows_set(got, ["doc_id", "span"]) == rows_set(
        expected, ["doc_id", "span"]
    )
    # the screen actually fires: both seeded docs are flagged
    flagged = {r["doc_id"] for r in got.select("doc_id").distinct().collect()}
    assert {1, 2} <= flagged


def test_t16_qdigest_stream_matches_batch_contract(spark):
    """Streaming qdigest rollup (t16): per-(event_type, window) KB
    state, emitted quantiles obey the batch sketch's rank-error
    contract against EXACT per-window quantiles, and the running count
    is conserved exactly.  The stream and batch sketches may cluster
    differently (different merge boundaries), so the comparison is the
    documented rank bound — the same gate the batch property suite
    pins — not bit equality."""
    import bisect

    from mcp_trino_spark.functions.qdigest import DEFAULT_K
    from mcp_trino_spark.sources.catalog import load_table

    got = S.run_to_memory(
        S.t16_qdigest_stream(S.events_stream(spark, SF_DIR), window_s=3600),
        "t16_mem",
        output_mode="append",
    )
    # latest row per key = the window's final estimate under the drain
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "win_start_s")
    final = (
        got.withColumn("max_n", F.max("n").over(w))
        .filter(F.col("n") == F.col("max_n"))
        .collect()
    )
    assert final, "stream emitted nothing"

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        ((F.col("ts_ns") / (3600 * 1_000_000_000)).cast("long") * 3600)
        .alias("win_start_s"),
        "value",
    )
    exact = {}
    for r in ev.collect():
        if r["value"] is not None:
            exact.setdefault(
                (r["event_type"], r["win_start_s"]), []
            ).append(float(r["value"]))
    assert len(final) == len(exact)  # every window emitted exactly once

    for row in final:
        vals = sorted(exact[(row["event_type"], row["win_start_s"])])
        assert row["n"] == len(vals)  # count conserved exactly
        # merged-sketch rank-error contract: 2 passes -> 2*(2/K) slack
        slack = 4.0 / DEFAULT_K + 1.0 / len(vals)
        for q, est in ((0.5, row["p50"]), (0.9, row["p90"]), (0.99, row["p99"])):
            lo = bisect.bisect_left(vals, est) / len(vals)
            hi = bisect.bisect_right(vals, est) / len(vals)
            assert lo - slack <= q <= hi + slack, (
                row["event_type"], row["win_start_s"], q, est, lo, hi
            )


def test_t16_null_values_do_not_inflate_counts(spark, tmp_path):
    """ADVICE r10: Arrow surfaces NULL doubles to pandas as NaN, which
    passed the old `is not None` filter — build_sketch dropped them
    but the running count still included them, overstating `n` and
    breaking count conservation on NULL-bearing inputs.  A NULL-heavy
    parquet stream must emit n = non-NULL count exactly."""
    import pandas as pd

    src = str(tmp_path / "null_events")
    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * 10,
            "ts_ns": [1_000_000_000 * i for i in range(10)],
            "value": [1.0, None, 2.0, None, 3.0, None, 4.0, 5.0, None, 6.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    got = S.run_to_memory(
        S.t16_qdigest_stream(stream, window_s=3600),
        "t16_null_mem",
        output_mode="append",
    ).collect()
    assert len(got) == 1
    assert got[0]["n"] == 6  # six non-NULL values, NaN-laundered NULLs excluded
    assert got[0]["p50"] is not None


def test_repetition_filters_stream_matches_batch(spark):
    """Streaming Gopher repetition scoring == the batch groupBy plan on
    the same corpus: the stream computes per-row Counters in a
    stateless Arrow projection (append mode, no state store), the
    batch plan computes the identical integers via per-doc counts —
    both divide the same exact ints, so doubles compare bit-exact."""
    from mcp_trino_spark.operators.llm_text import repetition_filters_plan
    from mcp_trino_spark.sources.catalog import load_table

    got = S.run_to_memory(
        S.repetition_filters_stream(S.documents_stream(spark, SF_DIR)),
        "l40_mem",
        output_mode="append",
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = repetition_filters_plan(docs).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    got_t = [tuple(r) for r in sorted(got.collect(), key=key)]
    want_t = [tuple(r) for r in sorted(want, key=key)]
    assert len(got_t) == len(want_t) > 0
    assert got_t == want_t


def test_pii_scan_stream_matches_batch(spark):
    """Streaming PII scan == the batch plan on the same corpus — the
    twin IS the batch projection applied to the streaming frame
    (stateless codegen, append mode), so equality is bit-exact
    integer counts."""
    from mcp_trino_spark.operators.llm_text import pii_scan_plan
    from mcp_trino_spark.sources.catalog import load_table

    got = S.run_to_memory(
        S.pii_scan_stream(S.documents_stream(spark, SF_DIR)),
        "l41_mem",
        output_mode="append",
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = pii_scan_plan(docs).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    got_t = [tuple(r) for r in sorted(got.collect(), key=key)]
    want_t = [tuple(r) for r in sorted(want, key=key)]
    assert len(got_t) == len(want_t) > 0
    assert got_t == want_t
