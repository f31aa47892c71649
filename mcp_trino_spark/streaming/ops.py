"""Structured Streaming twins of the batch time-series operators (SURVEY §2.9).

The reference has no streaming layer (Trino is batch MPP — verified: no
watermark/window/state code anywhere under reference internal/); these
twins are the Spark-native extension the survey declares for T1-T5.
Each takes a *streaming* DataFrame with the events schema and returns
the transformed streaming DataFrame; the batch operators in
``operators/timeseries.py`` remain the graded (oracle-checked) surface,
and ``tests/test_streaming.py`` proves stream==batch on the testdata.

Scale notes (100 TB / continuous ingest):
- Every aggregation keys on a time window (+ user_id for sessions), so
  state is bounded per key and expired by the watermark — no unbounded
  state growth.
- ``withWatermark`` bounds late data (T5): events later than the bound
  are dropped deterministically instead of growing state forever.
- File source here stands in for Kafka/Kinesis; the transformations are
  source-agnostic (swap ``readStream.format``).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Late-data bound (T5): state for a window is kept until the watermark
#: passes window_end + this delay, then finalized and freed.
DEFAULT_WATERMARK = "10 minutes"

SESSION_GAP = "30 minutes"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a file-source stream (schema from the batch read).

    Mirrors sources/catalog.load_table: the parquet stores ns-precision
    int64 ``ts``; expose TimestampType ``ts`` (µs) + exact ``ts_ns``.
    """
    from mcp_trino_spark.sources.catalog import normalize_events, table_path

    path = table_path(sf_dir, "events")
    # same defensive conf as load_table: Spark <=4.0 refuses the nanos
    # parquet type without it (newer Spark ignores it)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # a Spark-written table (events.parquet/part-*.parquet): the
        # directory IS the stream source.  pathGlobFilter matches LEAF
        # file names, so filtering the parent by the directory's
        # basename would match zero files and drain an empty stream —
        # silent data loss, not an error.
        df = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file table: the file source requires a directory, so
        # stream the parent filtered down to this file
        df = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(os.path.dirname(path))
        )
    return normalize_events(df)


def t1_tumbling_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of t1_tumbling_window: hourly counts/sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "n_events", "sum_value")
    )


def t2_sliding_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of t2_sliding_window: hourly windows every 30 min."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("event_id").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def t3_session_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of t3_sessionization via native session_window.

    session_window merges events whose gap < SESSION_GAP into one
    growing window per user — the stateful form of the batch
    lag+cumsum rewrite.  Boundary semantics align exactly: a gap >=
    SESSION_GAP starts a new session in session_window, in the batch
    lag+cumsum form (timeseries.py t3), and in the custom stateful
    sessionizer below, all computed at µs precision.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def t4_dedup_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of t4_event_dedup: ONE event per
    (user, type, minute) within the watermark horizon.

    Semantics are dropDuplicatesWithinWatermark's, which differ from
    the batch twin in two honest ways: the survivor is the
    first-ARRIVED row (the batch twin keeps the (ts, event_id)-minimum
    — equal only when the source is time-ordered), and two duplicates
    whose arrivals are separated by more than the watermark are BOTH
    emitted (the dedup state has expired — that expiry is exactly what
    bounds state at 100 TB; exact global dedup belongs to the batch
    path).  The parity test therefore compares key sets, not survivor
    identities.
    """
    return (
        events.withColumn("minute", F.date_trunc("minute", F.col("ts")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute"])
        .select("event_id", "user_id", "event_type", "value")
    )


def t3b_custom_stateful_sessions(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Custom stateful sessionizer via applyInPandasWithState — the
    escape hatch for session semantics session_window can't express
    (here: plain 30-min gap, so the result is checkable against t3).

    Per user, the open session lives in GroupState as
    (start_us, last_us, n_events, sum_value); each micro-batch collects
    ALL its chunks, globally sorts by event time, folds them in, emits
    every session CLOSED by a gap, and keeps the still-open session in
    state.  The global sort is load-bearing: applyInPandasWithState
    delivers a key's rows as an ITERATOR of Arrow chunks split at
    maxRecordsPerBatch in shuffle order — sorting each chunk
    independently would interleave cross-chunk time disorder into
    corrupted sessions (t10c/t10d merge-sort for the same reason).
    State is per-key and O(1) — the shape that scales to any key
    cardinality.  (A production variant adds EventTimeTimeout to flush
    the open session when the watermark passes; kept append-only here
    for determinism.)

    Note on ``watermark``: retained in the signature for parity with the
    other twins but NOT applied — under GroupStateTimeout.NoTimeout
    Spark's flatMapGroupsWithState neither drops late rows nor expires
    state from a watermark, so declaring one would only mislead callers
    into assuming a late-data bound (t10d is the variant with real
    event-time finalization).
    """
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    GAP_US = 1_800_000_000  # µs, matching batch t3 and session_window

    def sessionize(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = None
        closed = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values("ts_ns")
            for ts_ns, value in zip(batch["ts_ns"], batch["value"]):
                ts_us = int(ts_ns) // 1000  # µs: see batch t3's precision note
                if start_us is None:
                    start_us, last_us, n, total = ts_us, ts_us, 0, 0.0
                elif ts_us - last_us >= GAP_US:
                    closed.append((user_id, start_us, last_us, n, total))
                    start_us, last_us, n, total = ts_us, ts_us, 0, 0.0
                last_us = ts_us
                n += 1
                total += float(value)
        if start_us is None:
            state.remove()
        else:
            state.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "end_us", "n_events", "session_value"],
            )

    return (
        # slim projection BEFORE the state shuffle: the sessionizer reads
        # ts_ns and value only — shipping props/event_type through the
        # exchange and Arrow conversion would pay for bytes never touched
        events.select("user_id", "ts_ns", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=(
                "user_id bigint, start_us bigint, end_us bigint, "
                "n_events bigint, session_value double"
            ),
            stateStructType="start_us bigint, last_us bigint, n bigint, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table and return it
    as a batch DataFrame.  availableNow processes everything currently in
    the source then stops — the batch-parity execution mode.
    """
    import shutil
    import tempfile

    spark = sdf.sparkSession
    if checkpoint_dir is None:
        # repo-relative (not hard-coded) and created on demand — the
        # sibling parquet runner does the same makedirs
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".tmp",
        )
        os.makedirs(base, exist_ok=True)
        ckpt = tempfile.mkdtemp(prefix=f"ckpt-{name}-", dir=base)
    else:
        ckpt = checkpoint_dir
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if checkpoint_dir is None:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def t7_stream_stream_join(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the clicks
    by the same user in the preceding 10 minutes.

    Both sides are watermarked and the join condition carries an
    explicit event-time bound, so Spark can expire buffered state for
    rows that can no longer match — the two requirements that make a
    stream-stream join runnable indefinitely (unbounded state
    otherwise).  At scale the join partitions by user_id; state per key
    is bounded by the 10-minute window.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("purchase_id", "purchase_value", "click_id", "p_user")


def run_foreach_batch_to_parquet(sdf: DataFrame, out_dir: str) -> int:
    """Drain a stream through foreachBatch into parquet — the sink shape
    for destinations without a native streaming writer (JDBC upserts,
    MERGE targets).  Each micro-batch arrives as a normal DataFrame with
    its batch id (exactly-once when the write is idempotent on that id).
    Returns the number of batches written.
    """
    import os
    import shutil
    import tempfile

    batches = set()  # a set: Structured Streaming may retry a batch id

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        batches.add(batch_id)

    os.makedirs("/root/repo/.tmp", exist_ok=True)
    ckpt = tempfile.mkdtemp(prefix="ckpt-feb-", dir="/root/repo/.tmp")
    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return len(batches)


def t10c_pattern_stream(events: DataFrame) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: the t10b funnel (``V+ C+ P`` per user)
    as an incremental stateful operator (applyInPandasWithState).

    Incremental soundness: for patterns whose FINAL symbol consumes
    exactly one row, a completed greedy match is final under AFTER MATCH
    SKIP PAST LAST ROW — no later row can extend it — PROVIDED batches
    arrive in event-time order per key (each batch's rows all at-or-after
    the previous batch's).  Within a batch, rows are merged into the
    buffer and re-sorted, so intra-batch disorder is fine; CROSS-batch
    disorder is the one thing eager emission cannot absorb (a
    yet-earlier V arriving after a match was emitted should have
    extended it — Flink CEP holds matches back until the watermark for
    exactly this reason).  The production hardening is watermark-gated
    emission (state.getCurrentWatermarkMs; emit only matches whose span
    closed before the watermark) at the price of never emitting the
    final open tail — the same append-mode trade t3b documents.  Kept
    eager + NoTimeout here for batch-parity determinism.

    State per user: (ts µs, event_id, symbol) for rows since the last
    emitted match, pruned to the suffix after the last non-funnel symbol
    (a match span is contiguous, so nothing at or before a '0' can join
    a future match).  What remains is exactly the rows that could still
    extend into a match — state a pattern matcher cannot do without.
    This operator runs with NoTimeout for batch-parity determinism, so
    an abandoned key's suffix state is retained; t10d is the variant
    that arms an event-time timeout to evict abandoned keys.
    """
    import re
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rx = re.compile("A+B+C")  # V+ C+ P in the matcher's 1-char alphabet
    sym_col = (
        F.when(F.col("event_type") == "view", "A")
        .when(F.col("event_type") == "click", "B")
        .when(F.col("event_type") == "purchase", "C")
        .otherwise("0")
    )
    slim = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        sym_col.alias("sym"),
    )

    def matcher(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ts_l, eid_l, syms, n_matches = state.get
            ts_l, eid_l = list(ts_l), list(eid_l)
        else:
            ts_l, eid_l, syms, n_matches = [], [], "", 0
        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["ts_us"].astype("int64"), pdf["event_id"].astype("int64"),
                    pdf["sym"])
            )
        merged = sorted(
            list(zip(ts_l, eid_l, syms)) + rows, key=lambda r: (r[0], r[1])
        )
        ts_l = [r[0] for r in merged]
        eid_l = [r[1] for r in merged]
        syms = "".join(r[2] for r in merged)

        out = []
        consumed = 0
        for m in rx.finditer(syms):
            s, e = m.start(), m.end()
            n_matches += 1
            span = syms[s:e]
            out.append(
                (
                    user_id,
                    n_matches,
                    span.count("A"),
                    span.count("B"),
                    eid_l[s],       # pattern starts with V: first view
                    eid_l[e - 1],   # final symbol is the purchase row
                )
            )
            consumed = e
        ts_l, eid_l, syms = ts_l[consumed:], eid_l[consumed:], syms[consumed:]
        # prune provably-dead prefix: a match span is contiguous and can
        # never contain the unmatched symbol, so (under the in-order
        # precondition) everything at or before the LAST '0' can never
        # join a future match — without this, any key whose stream
        # contains non-funnel events accumulates state forever
        dead = syms.rfind("0")
        if dead >= 0:
            ts_l, eid_l, syms = ts_l[dead + 1:], eid_l[dead + 1:], syms[dead + 1:]
        state.update((ts_l, eid_l, syms, n_matches))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "match_no", "n_views", "n_clicks",
                         "first_view_eid", "purchase_eid"],
            )

    return (
        slim.groupBy("user_id")
        .applyInPandasWithState(
            matcher,
            outputStructType=(
                "user_id bigint, match_no bigint, n_views bigint, "
                "n_clicks bigint, first_view_eid bigint, purchase_eid bigint"
            ),
            stateStructType=(
                "ts_us array<bigint>, eid array<bigint>, syms string, "
                "n_matches bigint"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def t10d_pattern_stream_watermarked(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Watermark-gated streaming MATCH_RECOGNIZE — the out-of-order-safe
    variant of t10c.

    Soundness without the in-order precondition: rows later than the
    watermark bound are dropped by Spark before the operator; every row
    that will ever arrive therefore has event time ≥ the current
    watermark.  So the buffer prefix with ts < watermark is FINAL — no
    future row can land inside it — and matching runs on exactly that
    prefix each batch.  Completed matches emit; unconsumed prefix rows
    stay buffered (they may extend with suffix rows later, e.g. a
    pending ``V+ C+`` waiting for its ``P``); provably-dead rows
    (at or before the last non-funnel symbol in the finalized region)
    are pruned.  The cost of the guarantee is latency — a match emits
    only once the watermark passes its last row — and the final open
    tail never emits, the same append-mode trade as t3b.  This is the
    Flink-CEP-style discipline; t10c is the low-latency variant for
    in-order feeds.

    Emission does NOT depend on the key receiving more input: an
    EventTimeTimeout is armed for the newest buffered row, so a key
    whose funnel completed in an early batch still flushes when OTHER
    keys advance the watermark.
    """
    import re
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rx = re.compile("A+B+C")
    sym_col = (
        F.when(F.col("event_type") == "view", "A")
        .when(F.col("event_type") == "click", "B")
        .when(F.col("event_type") == "purchase", "C")
        .otherwise("0")
    )
    slim = events.withWatermark("ts", watermark).select(
        "user_id",
        F.col("ts"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        sym_col.alias("sym"),
    )

    def matcher(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ts_l, eid_l, syms, n_matches = state.get
            ts_l, eid_l = list(ts_l), list(eid_l)
        else:
            ts_l, eid_l, syms, n_matches = [], [], "", 0
        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["ts_us"].astype("int64"), pdf["event_id"].astype("int64"),
                    pdf["sym"])
            )
        merged = sorted(
            list(zip(ts_l, eid_l, syms)) + rows, key=lambda r: (r[0], r[1])
        )
        wm_us = state.getCurrentWatermarkMs() * 1000
        # the finalized region: strictly before the watermark
        n_final = 0
        while n_final < len(merged) and merged[n_final][0] < wm_us:
            n_final += 1
        final = merged[:n_final]
        syms_final = "".join(r[2] for r in final)

        out = []
        consumed = 0
        for m in rx.finditer(syms_final):
            s, e = m.start(), m.end()
            n_matches += 1
            span = syms_final[s:e]
            out.append(
                (user_id, n_matches, span.count("A"), span.count("B"),
                 final[s][1], final[e - 1][1])
            )
            consumed = e
        keep = final[consumed:]
        # dead prefix within the finalized remainder: nothing at or
        # before its last '0' can join a future (contiguous) match
        keep_syms = "".join(r[2] for r in keep)
        dead = keep_syms.rfind("0")
        if dead >= 0:
            keep = keep[dead + 1:]
        unfinalized = merged[n_final:]
        keep = keep + unfinalized
        if keep:
            state.update((
                [r[0] for r in keep],
                [r[1] for r in keep],
                "".join(r[2] for r in keep),
                n_matches,
            ))
            if unfinalized:
                # re-invoke at the EARLIEST point new finalization can
                # happen: the watermark passing the OLDEST unfinalized
                # row.  Arming at the newest row would hold an
                # already-complete early match hostage to a stray later
                # event (hours of avoidable emission latency); without
                # any timer a key absent from later batches never runs
                # again and its finalized matches never emit.
                oldest_ms = unfinalized[0][0] // 1000
                state.setTimeoutTimestamp(
                    max(oldest_ms + 1, state.getCurrentWatermarkMs() + 1)
                )
            # else: every buffered row is already finalized and
            # unmatched (e.g. 'AB' awaiting a future 'C') — only NEW
            # data can change the outcome, so no timer: arming wm+1
            # would busy-wake the key on every batch forever
        elif n_matches:
            # empty buffer: keep only the match counter (cheap), no wakeup
            state.update(([], [], "", n_matches))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "match_no", "n_views", "n_clicks",
                         "first_view_eid", "purchase_eid"],
            )

    return (
        slim.groupBy("user_id")
        .applyInPandasWithState(
            matcher,
            outputStructType=(
                "user_id bigint, match_no bigint, n_views bigint, "
                "n_clicks bigint, first_view_eid bigint, purchase_eid bigint"
            ),
            stateStructType=(
                "ts_us array<bigint>, eid array<bigint>, syms string, "
                "n_matches bigint"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table as a file-source stream (schema from the batch
    read) — the continuous-crawl-ingest stand-in for the streaming
    contamination screen (swap ``readStream.format`` for Kafka)."""
    from mcp_trino_spark.sources.catalog import table_path

    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )


def l38_contamination_stream(
    docs_stream: DataFrame, eval_docs: DataFrame
) -> DataFrame:
    """Streaming exact-substring contamination screen — the continuous
    form of l38's anchored-window machinery pointed at a FIXED eval
    set: every incoming document's anchored 8-word spans join a
    (tiny, broadcast) index of the eval set's spans; a hit means the
    document verbatim-contains an eval-set passage and must be
    quarantined before training.  Exactly the day-2 shape of l16/l37:
    the eval side is KB-MB and static, the corpus side streams.

    Scale/streaming design: ``anchored_spans`` is STATELESS (split,
    posexplode, filter, projection — per-row ops legal on a streaming
    DataFrame), the eval index broadcasts, and the join is stateless
    stream-static — so the query runs in APPEND mode with NO state
    store at all: nothing to watermark, nothing to grow.  Emits one
    row per (doc_id, span) hit occurrence; dedup/aggregation is the
    consumer's choice (a downstream batch job or a keyed state op).
    ``tests/test_streaming.py`` proves stream==batch on the same
    corpus (the certified-batch twin is the same kernel l38 builds
    its pair index from).
    """
    from mcp_trino_spark.operators.llm_dedup import anchored_spans

    idx = (
        anchored_spans(eval_docs)
        .select(F.col("fp").alias("e_fp"), F.col("span").alias("e_span"))
        .distinct()
    )
    hits = anchored_spans(docs_stream)
    return (
        hits.join(
            F.broadcast(idx),
            (hits["fp"] == idx["e_fp"]) & (hits["span"] == idx["e_span"]),
        )
        .select("doc_id", "span")
    )


def t16_qdigest_stream(events: DataFrame, window_s: int = 600) -> DataFrame:
    """Streaming quantile monitoring via mergeable qdigest sketches —
    the continuous twin of a21's two-level batch build (beyond the
    reference; Trino's qdigest family is batch-only there).

    Per (event_type, tumbling ``window_s`` window), GroupState holds
    ONE sketch — (vs array, ws array, running count), ≤ K centroids
    regardless of how many events the window sees — and each
    micro-batch folds its values in by ``merge_sketches`` (associative
    and merge-order invariant, functions/qdigest.py), then emits the
    window's CURRENT quantiles as an append row stamped with the
    running count.  The latest row per key (max ``n``) is the window's
    most-recent estimate; under availableNow's single batch it IS the
    final one.  This is the ingest-monitoring shape: per-key state is
    KB-bounded (the sketch), so key cardinality — not event volume —
    sizes the state store, and the emitted quantiles carry the same
    rank-error contract the batch sketch certifies
    (tests/test_qdigest.py).

    Kept on GroupStateTimeout.NoTimeout like t3b: rows are never
    dropped and state never expires mid-drain, so the stream==batch
    comparison is deterministic; a production variant adds
    EventTimeTimeout to finalize windows the watermark has passed and
    to bound state to live windows only.
    """
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mcp_trino_spark.functions.qdigest import (
        build_sketch,
        merge_sketches,
        value_at_quantile,
    )

    win_ns = int(window_s) * 1_000_000_000

    def fold(
        key: Tuple[str, int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        event_type, win_start_s = key
        if state.exists:
            vs, ws, n = state.get
            sketch = list(zip(vs, ws))
        else:
            sketch, n = [], 0
        vals: list = []
        for pdf in pdfs:
            # dropna, not an `is not None` filter: Arrow surfaces NULL
            # doubles to pandas as NaN, which passes a None check —
            # build_sketch would drop them but `n` would still count
            # them, overstating the emitted running count and breaking
            # count conservation on NULL-bearing inputs.
            vals.extend(float(v) for v in pdf["value"].dropna())
        if vals:
            sketch = merge_sketches([sketch, build_sketch(vals)])
            n += len(vals)
        if not sketch:
            state.remove()
            return
        state.update((
            [v for v, _ in sketch], [w for _, w in sketch], n,
        ))
        yield pd.DataFrame(
            [(
                event_type,
                int(win_start_s),
                n,
                value_at_quantile(sketch, 0.5),
                value_at_quantile(sketch, 0.9),
                value_at_quantile(sketch, 0.99),
            )],
            columns=["event_type", "win_start_s", "n", "p50", "p90", "p99"],
        )

    keyed = events.select(
        "event_type",
        ((F.col("ts_ns") / win_ns).cast("long") * int(window_s)).alias(
            "win_start_s"
        ),
        "value",
    )
    return keyed.groupBy("event_type", "win_start_s").applyInPandasWithState(
        fold,
        outputStructType=(
            "event_type string, win_start_s bigint, n bigint, "
            "p50 double, p90 double, p99 double"
        ),
        stateStructType="vs array<double>, ws array<long>, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def repetition_filters_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming Gopher repetition filters — l40's quality statistics
    computed per incoming document (continuous crawl-ingest scoring,
    the day-2 shape of every repetition screen: score at ingest,
    quarantine before the doc reaches the training pool).

    Scale/streaming design: the statistics are functions of ONE
    document, so the whole computation is a STATELESS Arrow-batched
    projection (a pandas UDF building per-row line/word Counters) —
    append mode, no state store, nothing to watermark.  The batch
    plan (operators/llm_text.repetition_filters_plan) computes the
    identical integers via combiner-friendly groupBy counts — the
    better shape when documents are huge and a single row's text
    dominates a task — and ``tests/test_streaming.py`` proves
    stream == batch on the same corpus.
    """
    import pandas as pd
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    def _stats_impl(texts):
        rows = []
        for t in texts:
            t = t or ""
            total = max(len(t), 1)
            lines = [ln for ln in t.split("\n") if ln]
            lc = Counter(lines)
            n_lines = max(len(lines), 1)
            dup_lines = sum(c for c in lc.values() if c > 1)
            dup_chars = sum(c * len(ln) for ln, c in lc.items() if c > 1)
            words = [w for w in t.lower().split(" ") if w]
            wc = Counter(words)
            cov = 0
            if wc:
                _, w = min((-c, w) for w, c in wc.items())
                cov = wc[w] * len(w)
            dlf = dup_lines / n_lines
            dcf = dup_chars / total
            twf = cov / total
            rows.append((dlf, dcf, twf, dcf > 0.3 or twf > 0.2))
        return pd.DataFrame(
            rows,
            columns=[
                "dup_line_frac", "dup_line_char_frac",
                "top_word_char_frac", "flagged",
            ],
        )

    _stats_impl.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    rep_stats = pandas_udf(
        _stats_impl,
        "struct<dup_line_frac:double, dup_line_char_frac:double,"
        " top_word_char_frac:double, flagged:boolean>",
    )

    s = docs_stream.select("doc_id", rep_stats(F.col("text")).alias("r"))
    return s.select("doc_id", "r.*")


def pii_scan_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming PII surface scan — l41's per-document counts and
    quarantine flag at crawl-ingest time (score before the document
    reaches the training pool).

    Scale/streaming design: the batch plan is ALREADY a stateless
    whole-stage-codegen projection (regexp_count per pattern, zero
    shuffles), so the streaming twin IS the batch plan applied to the
    streaming frame — append mode, no state store, no watermark, and
    bit-exact stream == batch by construction (integer counts).  This
    is the cheapest possible streaming screen: no Python, no Arrow
    boundary, pure JVM codegen per micro-batch."""
    from mcp_trino_spark.operators.llm_text import pii_scan_plan

    return pii_scan_plan(docs_stream)
