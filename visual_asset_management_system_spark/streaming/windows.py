"""Event-time streaming operators: watermarked windows + stateful sessions.

The reference's streaming layer is stateless CDC (SURVEY §2.9 — no
event-time semantics at all); these operators are the *additive*
capabilities a training-data pipeline needs over the ``events`` stream:

- ``windowed_event_counts`` — tumbling event-time aggregation with a
  watermark: late rows beyond the watermark are dropped, in-flight
  windows are held in state until the watermark passes their end.
  At 100 TB-rate the state is bounded by (watermark horizon ×
  distinct keys), not by stream length — that is the entire point of
  declaring the watermark.
- ``sessionize_stateful`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session assembly with explicit
  state (the pending open session), emitting sessions as their closing
  gap is observed. This is the engine's pattern for operators Spark's
  built-in windowing can't express.

Batch mirrors of both exist as oracle-backed queries
(q_events_tumbling, q_events_sessionize) — the streaming forms reuse
the same semantics so a kappa replay matches the batch result.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: schema of the events change stream (file/kafka source)
EVENTS_STREAM_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "value double, ts timestamp"
)

SESSION_GAP_S = 1800  # 30 min — matches the batch q_events_sessionize


def read_events_stream(spark, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("json")
        .load(events_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) event-time counts with
    late-data handling.

    Append-mode output: a window row is emitted exactly once, when the
    watermark passes its end; rows later than the watermark are dropped
    (the documented late-data contract, replacing the reference's
    implicit last-writer-wins). With a slide, each event lands in
    window/slide overlapping windows (batch mirror: q_events_hopping);
    state grows by the same factor, still bounded by the watermark
    horizon.
    """
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
# STATE-SCHEMA COMPATIBILITY: these applyInPandasWithState schemas
# changed in round 7 (array<double> second-carriers -> array<long>
# microsecond-carriers; NoTimeout -> EventTimeTimeout). Spark persists
# the state schema inside the streaming checkpoint, so a checkpoint
# written by the previous schema CANNOT be resumed by this code —
# discard the checkpoint directory (replaying the source rebuilds the
# state; every stateful operator here is replay-idempotent by test)
# or run the old binary to drain it first. Applies equally to
# SEQ_STATE_SCHEMA below.
SESSION_STATE_SCHEMA = "ts array<long>, vals array<double>"


def _ts_us(s: pd.Series) -> pd.Series:
    """Event-time column → int64 epoch-MICROseconds. Integers, not
    float seconds: at 2024-era epochs float64 ulp is ~400 ns, so a
    float-second carrier drifts emitted timestamps sub-microsecond off
    the true event time and breaks exact kappa-replay parity with the
    batch mirrors for non-second-aligned events. Microseconds are the
    native precision of both Spark TimestampType and the parquet sink,
    so the int carrier is lossless end-to-end."""
    return s.astype("datetime64[us]").astype("int64")


def _session_row(user_id, s: list[tuple[int, float]]) -> dict:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(s[0][0], unit="us"),
        "session_end": pd.Timestamp(s[-1][0], unit="us"),
        "n_events": len(s),
        "sum_value": float(sum(v for _, v in s)),
    }


def _sessionize_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-user session assembly: merge pending events with the batch,
    emit every session closed by a ≥gap silence, keep the trailing open
    session in state with an event-time timeout at its closing gap.
    Timestamps ride as int64 epoch-microseconds (see _ts_us — exact,
    unlike a float-second carrier)."""
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed last_event + gap with no new events: the
        # open session is CLOSED by definition — emit it and free the
        # state (no on-time event can ever extend it: anything passing
        # the watermark filter now starts a new session)
        ts_list, val_list = state.get
        state.remove()
        yield pd.DataFrame([_session_row(user_id, list(zip(ts_list, val_list)))])
        return
    rows: list[tuple[int, float]] = []
    if state.exists:
        ts_list, val_list = state.get
        rows.extend(zip(ts_list, val_list))
    for pdf in pdfs:
        rows.extend(zip(_ts_us(pdf["ts"]).tolist(), pdf["value"].tolist()))
    rows.sort()

    gap_us = SESSION_GAP_S * 1_000_000
    sessions: list[list[tuple[int, float]]] = [[]]
    for ts, val in rows:
        if sessions[-1] and ts - sessions[-1][-1][0] > gap_us:
            sessions.append([])
        sessions[-1].append((ts, val))

    closed, open_session = sessions[:-1], sessions[-1]
    if open_session:
        state.update(
            ([t for t, _ in open_session], [v for _, v in open_session])
        )
        expiry_ms = open_session[-1][0] // 1000 + SESSION_GAP_S * 1000 + 1
        state.setTimeoutTimestamp(
            max(expiry_ms, state.getCurrentWatermarkMs() + 1)
        )
    else:
        state.remove()

    out = [_session_row(user_id, s) for s in closed]
    if out:
        yield pd.DataFrame(out)


def sessionize_stateful(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user sessionization with an explicit pending-session state.

    State size is O(open sessions WITHIN the gap horizon), independent
    of stream length AND of silent-user cardinality: the input is
    watermarked and the operator runs under EventTimeTimeout, so a
    trailing open session is emitted as closed — and its state freed —
    once the watermark passes ``last_event + gap``, exactly when a
    later event could no longer extend it. Emission is still
    event-time-deterministic (no wall clock): the same event stream
    replays to the same sessions, matching the batch mirror
    (q_events_sessionize) including trailing sessions. Rows later than
    the watermark are dropped — the module's uniform late-data
    contract."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_events_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-id projection of an at-least-once event stream.

    Replayed S3/queue deliveries (the reference's SQS redrive /
    at-least-once contract, sqsBucketSync.py:1017-1122) duplicate
    events; downstream aggregations must not double-count them.
    ``dropDuplicatesWithinWatermark`` keeps the seen-id state only for
    the watermark horizon — state is O(horizon × arrival rate),
    independent of stream length, which is what makes the operator
    viable at 100 TB-rate (a plain ``dropDuplicates`` on a stream keys
    state by every id ever seen and grows without bound).

    A duplicate arriving later than the watermark horizon is NOT
    dropped — the contract is effectively-once within the horizon,
    exactly the replay window at-least-once sources actually have.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """availableNow run of any streaming DF into a parquet sink."""
    return (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_streams(
    purchases: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "6 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    same-user click in the preceding ``attribution_window``.

    The canonical Structured Streaming two-stream join: BOTH sides are
    watermarked and the join condition bounds the two event-times
    against each other, which is exactly what lets the engine evict
    buffered state — a click older than (watermark + window) can never
    match a future purchase and is dropped. Without the time bound the
    state would grow with stream length; with it, state is
    O(rate × (window + watermark)) per side regardless of how long the
    streams run. Inner join in append mode: a pair is emitted once,
    when both sides have arrived.

    Batch mirror with a full DuckDB oracle: q_events_interval_join.
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    c = clicks.withWatermark("ts", watermark).alias("c")
    return p.join(
        c,
        F.expr(
            "p.user_id = c.user_id AND "
            "p.ts >= c.ts AND "
            f"p.ts <= c.ts + interval {attribution_window}"
        ),
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def start_trending_stream(
    spark,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
    watermark: str = "30 minutes",
    k: int = 3,
    min_prev: int = 5,
    trigger_once: bool = True,
    retain_windows: int | None = 2,
):
    """Streaming trending top-k: tumbling watermarked counts feed a
    per-window rate-of-change ranking as each window CLOSES (the
    streaming form of q_events_trending's batch mirror).

    Append mode emits every (window, type) row of a closed window in
    the same micro-batch — the watermark crossing closes them together
    — so the foreachBatch ranking always sees complete windows. Growth
    needs the PREVIOUS window's counts, which closed in an earlier
    batch: the closed-window counts are upserted into a maintained CDC
    merge sink (``sink_dir/counts``, the same idempotent
    partial-rewrite merge the search tables use, keyed on
    (window_start, event_type)) and each batch joins its windows
    against the store's predecessors (cur.window_start ==
    prev.window_end). The store is BOUNDED, not append-forever: rows
    whose window ended more than ``retain_windows`` windows before the
    oldest window closing in this batch can never be a growth
    predecessor again and are REMOVEd in the same merge (retain ≥ 2
    provably keeps every predecessor any future closing window can
    still need, because closed windows advance with the watermark), and
    ``compact_sink`` rewrites any partition the repeated merges have
    fragmented. An at-least-once replay re-merges identical rows —
    the CDC idempotence contract. State: the streaming agg holds only
    in-flight windows (watermark-bounded); the store is
    retain-horizon-sized, never raw events."""
    from .cdc import apply_cdc_batch, compact_sink, read_sink

    counts = windowed_event_counts(
        read_events_stream(spark, events_dir),
        window=window,
        watermark=watermark,
    )
    key_cols = ["window_start", "event_type"]

    def handle(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        closed = batch.select(
            "window_start", "window_end", "event_type", "n_events"
        )
        counts_dir = f"{sink_dir}/counts"
        upserts = closed.withColumn("event_name", F.lit("MODIFY"))
        events = upserts
        if retain_windows is not None:
            one = closed.limit(1).collect()[0]  # bounded: window length
            win_len = one["window_end"] - one["window_start"]
            mn = closed.agg(F.min("window_start")).collect()[0][0]
            horizon = mn - (retain_windows - 1) * win_len
            stale = read_sink(spark, counts_dir)
            if stale is not None:
                events = upserts.unionByName(
                    stale.filter(F.col("window_end") < F.lit(horizon))
                    .select(*closed.columns)
                    .withColumn("event_name", F.lit("REMOVE"))
                )

        def recompute(keys):
            return closed.join(keys, key_cols, "left_semi")

        apply_cdc_batch(events, recompute, counts_dir, key_cols)
        compact_sink(spark, counts_dir, max_files_per_partition=4)

        store = read_sink(spark, counts_dir)
        prev = store.select(
            F.col("window_end").alias("prev_end"),
            F.col("event_type").alias("prev_type"),
            F.col("n_events").alias("prev_n"),
        )
        from pyspark.sql import Window as W

        scored = (
            closed.join(
                prev,
                (F.col("window_start") == F.col("prev_end"))
                & (F.col("event_type") == F.col("prev_type")),
            )
            .filter(F.col("prev_n") >= min_prev)
            .withColumn(
                "growth",
                F.floor(
                    (
                        (F.col("n_events") - F.col("prev_n")).cast("double")
                        / F.col("prev_n")
                    )
                    * 1000000
                    + 0.5
                )
                / 1000000,
            )
        )
        wd = W.partitionBy("window_start").orderBy(
            F.desc("growth"), "event_type"
        )
        top = (
            scored.withColumn("rnk", F.row_number().over(wd).cast("int"))
            .filter(F.col("rnk") <= k)
            .select(
                "window_start", "event_type", "n_events", "prev_n",
                "growth", "rnk",
            )
        )
        top.write.mode("overwrite").parquet(
            f"{sink_dir}/trending/batch={batch_id}"
        )

    writer = counts.writeStream.outputMode("append").foreachBatch(
        handle
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SEQ_OUT_SCHEMA = (
    "user_id bigint, start_ts timestamp, end_ts timestamp, n_stages int"
)
SEQ_STATE_SCHEMA = "stage_ts array<long>"


def detect_sequences(
    events: DataFrame,
    pattern: tuple[str, ...] = ("view", "click", "purchase"),
    within_s: float = 3600.0,
    watermark: str = "30 minutes",
) -> DataFrame:
    """CEP-style ordered sequence detection (streaming funnel): emit a
    match whenever a user produces the pattern's stages in strictly
    increasing event-time order with the whole run inside ``within_s``
    of the first stage — the stateful streaming form of the batch
    funnel (q_events_funnel's stacked window minimums).

    Automaton semantics (deterministic, greedy-earliest,
    non-overlapping): per user the state is the current partial match's
    stage timestamps only — O(|pattern|), NOT an event buffer. Events
    are processed in event-time order within each micro-batch; a stage
    candidate must be strictly later than the previous stage, a run
    older than the window resets the automaton (re-trying the resetting
    event as a fresh first stage), and a completed match resets it for
    the next non-overlapping run. A cross-batch straggler older than an
    already-accepted stage cannot retroactively produce the earlier
    match — the documented arrival-order caveat every bounded-state CEP
    engine shares; late arrivals are bounded by the ``watermark``
    (dedup_events_stream's horizon contract).

    State EXPIRES: the input is watermarked and the operator runs under
    EventTimeTimeout, with each kept partial scheduled to time out once
    the watermark passes ``first_stage + within_s`` — at that point no
    admissible future event can extend the run (anything passing the
    watermark filter would reset it), so the state is dropped. Without
    this, a user who emits ``view`` and never converts holds state
    forever: O(|pattern|) per user but unbounded in users, the one
    leak that matters at 100 TB user cardinality. A partial already
    expired relative to the current watermark is dropped eagerly in
    the same pass."""
    within_us = int(round(within_s * 1_000_000))

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed first_stage + within_s with no new
            # events for this user: the partial can never complete
            state.remove()
            return
        (user_id,) = key
        partial: list[int] = []
        if state.exists:
            (stage_ts,) = state.get
            partial = list(stage_ts)
        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            rows.extend(
                zip(_ts_us(pdf["ts"]).tolist(), pdf["event_type"].tolist())
            )
        rows.sort()
        out = []
        for ts, etype in rows:
            if partial and ts - partial[0] > within_us:
                partial = []
            k = len(partial)
            if etype == pattern[k] and (k == 0 or ts > partial[-1]):
                partial.append(ts)
                if len(partial) == len(pattern):
                    out.append(
                        {
                            "user_id": user_id,
                            "start_ts": pd.Timestamp(partial[0], unit="us"),
                            "end_ts": pd.Timestamp(partial[-1], unit="us"),
                            "n_stages": len(pattern),
                        }
                    )
                    partial = []
        wm_ms = state.getCurrentWatermarkMs()
        # STRICT <: the match condition admits an event at exactly
        # ts == first_stage + within_s (reset uses strict >), and such
        # an event still passes the late filter when the watermark
        # equals that ms boundary — dropping at <= would silently miss
        # a completable sequence at the exact within_s boundary. The
        # registered timeout (deadline_ms + 1) stays > watermark, so
        # keeping the partial one extra tick cannot double-fire.
        if partial and (partial[0] + within_us) // 1000 < wm_ms:
            partial = []  # already expired — unreachable by any on-time event
        if partial:
            state.update((partial,))
            state.setTimeoutTimestamp((partial[0] + within_us) // 1000 + 1)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return events.withWatermark("ts", watermark).groupBy(
        "user_id"
    ).applyInPandasWithState(
        fn,
        outputStructType=SEQ_OUT_SCHEMA,
        stateStructType=SEQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
