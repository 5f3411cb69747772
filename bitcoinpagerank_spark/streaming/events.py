"""Streaming event analytics: ingestion, windowed aggregation, dedup,
sessionization.

Design notes (100 TB / unbounded framing):
- Every transformation below is written against a plain DataFrame and
  works identically on a batch read and a ``readStream`` — one logical
  plan, two execution modes. The batch catalog entries reuse them, so the
  DuckDB oracles that gate the batch path gate the streaming semantics
  too (same plan, availableNow trigger).
- Watermarks bound all state: windowed aggregates and dropDuplicates
  evict state older than the watermark, so steady-state memory is
  O(windows-in-flight), not O(stream length).
- The stateful sessionizer keeps ONE small fixed-width row per open
  session key and emits sessions as soon as they provably close (either
  a larger-than-gap silence inside a batch, or an event-time timeout
  when the watermark passes session_end + gap) — the streaming-native
  shape of the gap-and-islands batch query.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# schema of /root/testdata/sf*/events.parquet (TESTDATA.md); file streams
# require an explicit schema — no inference race on a growing directory
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)

DEFAULT_WATERMARK = "30 minutes"


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded parquet file stream over an events directory (or file).

    ``max_files_per_trigger`` caps each micro-batch; with the
    availableNow trigger it also splits a finite backlog into multiple
    batches, which is what lets the tests drive watermark advancement
    deterministically.
    """
    import os

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if os.path.isfile(path):
        # a single parquet FILE (the testdata layout): for a non-glob path
        # the file source pins basePath to the path itself, which must be a
        # directory — rewrite as a {name} glob (matches exactly this file)
        # and point basePath at the parent
        parent, name = os.path.split(path)
        reader = reader.option("basePath", parent)
        path = f"{parent}/{{{name}}}"
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Tumbling-window (n, sum_value) per event_type — streaming shape of
    the catalog's ev_tumbling_window. Watermark applied only when the
    input is streaming (a batch DataFrame ignores it anyway, but keeping
    the branch explicit documents that batch output is the complete set).
    """
    src = events.withWatermark("ts", watermark) if (
        watermark and events.isStreaming
    ) else events
    return (
        src.groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Exactly-once ingestion: drop replayed event_ids.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark horizon — the unbounded-key-set variant (plain
    dropDuplicates on a stream) grows state forever and is exactly the
    kind of operator that dies at 100 TB. Duplicates are therefore only
    guaranteed caught while their first occurrence is younger than the
    watermark, which matches at-least-once sources (replays are near in
    time to the original).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-user sessions via the built-in merging session window: events
    of one user belong to the same session while each is within ``gap``
    of the previous. Emits (user_id, session first/last event time,
    n_events, total_value); first/last are min/max event ts (not the
    gap-padded window end) so the batch output is oracle-comparable."""
    src = events.withWatermark("ts", watermark) if (
        watermark and events.isStreaming
    ) else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str | None = None,
) -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState).

    Why it exists next to session_aggregate: the built-in session window
    only supports aggregate outputs and append-on-watermark emission;
    a custom operator owns its state row and can (a) emit a session the
    moment a within-batch silence proves it closed, (b) carry arbitrary
    extra state (e.g. first/last event ids) later. State per open
    session is one fixed-width row (4 numbers), evicted on event-time
    timeout when the watermark passes last_event + gap.

    Only meaningful on a streaming DataFrame (watermark-driven); for
    batch use session_aggregate.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side dependency
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60 * 1_000_000)
    gap_ms = gap_us // 1000
    wm = watermark or f"{int(gap_minutes)} minutes"
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    state_schema = "start_us long, last_us long, n long, total double"

    def _emit(user_id: int, start_us: int, last_us: int, n: int, total: float):
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
            "total_value": round(total, 2),
        }

    def fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        closed: list[dict] = []
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            closed.append(_emit(user_id, start_us, last_us, n, total))
            state.remove()
        else:
            pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            cur = list(state.get) if state.exists else None
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if cur is None:
                    cur = [ts_us, ts_us, 0, 0.0]
                elif ts_us - cur[1] >= gap_us:
                    closed.append(_emit(user_id, *cur))
                    cur = [ts_us, ts_us, 0, 0.0]
                cur[1] = max(cur[1], ts_us)
                cur[2] += 1
                cur[3] += float(value)
            # trailing open session: park it in state; close it either on
            # a later batch's events or on event-time timeout
            wm_ms = state.getCurrentWatermarkMs()
            timeout_ms = cur[1] // 1000 + gap_ms
            if timeout_ms <= wm_ms:
                # watermark already passed the close point (late replay
                # of an old session) — close immediately
                closed.append(_emit(user_id, *cur))
                if state.exists:
                    state.remove()
            else:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", wm)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def materialize_stream(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain a finite streaming DataFrame with the availableNow trigger
    into an in-memory sink table and return it as a batch DataFrame.

    This is the test/driver harness path; production sinks use
    ``df.writeStream.format("parquet")`` (append mode) or foreachBatch
    against the TableStore with the same trigger semantics.
    """
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return df.sparkSession.table(name)


def sliding_counts(
    events: DataFrame,
    window_duration: str = "60 minutes",
    slide: str = "15 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window (n, sum_value) per event_type — each event lands in
    duration/slide overlapping windows (Spark expands that fan-out inside
    the window expression; state is still bounded by the watermark).
    Same batch/stream dual as ``windowed_counts``."""
    src = events.withWatermark("ts", watermark) if (
        watermark and events.isStreaming
    ) else events
    return (
        src.groupBy(F.window("ts", window_duration, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def followup_pairs(
    events: DataFrame,
    first_type: str = "view",
    then_type: str = "purchase",
    within: str = "12 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Funnel join: every ``then_type`` event matched to the same user's
    earlier ``first_type`` events within ``within`` —
    (user_id, first_id, then_id, gap_s).

    On a batch DataFrame this is a plain self-join. On a stream it is a
    stream-stream inner join: both sides watermarked (default = the
    ``within`` horizon) and the join condition time-ranged, which is what
    lets Spark evict buffered rows older than watermark + interval —
    the bounded-state contract stream-stream joins require.
    """
    wm = watermark or within
    a = events.where(F.col("event_type") == first_type).select(
        "user_id",
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"),
    )
    b = events.where(F.col("event_type") == then_type).select(
        F.col("user_id").alias("b_user_id"),
        F.col("event_id").alias("then_id"),
        F.col("ts").alias("then_ts"),
    )
    if events.isStreaming:
        a = a.withWatermark("first_ts", wm)
        b = b.withWatermark("then_ts", wm)
    cond = (
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("then_ts") > F.col("first_ts"))
        & (F.col("then_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond).select(
        "user_id",
        "first_id",
        "then_id",
        (F.unix_timestamp("then_ts") - F.unix_timestamp("first_ts")).alias("gap_s"),
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment",),
) -> DataFrame:
    """Stream-static enrichment: left-join each event against a broadcast
    dimension table (segment lookup). Works identically on a batch frame
    and a ``readStream`` — the static side is re-broadcast per micro-batch
    by Structured Streaming, so dimension updates between batches are
    picked up, and the join adds ZERO streaming state (no watermark
    needed: stream-static joins are stateless)."""
    d = F.broadcast(
        dim.select(F.col(on_right).alias(on_left), *dim_cols)
    )
    return events.join(d, on_left, "left")


def segment_totals(
    events: DataFrame,
    dim: DataFrame,
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """(segment, n, sum_value) — enrichment + one hash agg; unmatched
    users fall into the '(none)' segment. Batch/stream dual."""
    src = events.withWatermark("ts", watermark) if (
        watermark and events.isStreaming
    ) else events
    return (
        enrich_with_dim(src, dim)
        .groupBy(
            F.coalesce("c_mktsegment", F.lit("(none)")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
