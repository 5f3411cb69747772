"""Structured Streaming surface: file-stream ingestion, watermarked
windowed aggregation, bounded-state dedup, and both sessionizers.

Strategy: the events parquet is split into time-ordered files with
increasing mtimes; maxFilesPerTrigger=1 + the availableNow trigger turns
that into a deterministic sequence of micro-batches, so watermark
advancement (and therefore append-mode emission and event-time timeouts)
is reproducible. Batch equivalence is the core oracle: the streaming
plans are the same logical plans the DuckDB-checked batch catalog runs.
"""

from __future__ import annotations

import datetime as dt
import os
from collections import defaultdict
from pathlib import Path

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from bitcoinpagerank_spark.streaming import (
    dedup_stream,
    materialize_stream,
    read_event_stream,
    session_aggregate,
    sessionize_stateful,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"
_NAME_SEQ = [0]


def _sink_name(prefix: str) -> str:
    _NAME_SEQ[0] += 1
    return f"{prefix}_{_NAME_SEQ[0]}"


def _split_events(tmp_path: Path, k: int = 3, duplicate_first: bool = False) -> Path:
    """Write the sf0.001 events as k time-ordered parquet files with
    strictly increasing mtimes (the file source's arrival order)."""
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    d = tmp_path / "events_src"
    d.mkdir()
    n = t.num_rows
    base = 1_700_000_000
    parts = []
    for i in range(k):
        lo, hi = i * n // k, (i + 1) * n // k
        parts.append((f"part-{i:03d}.parquet", t.slice(lo, hi - lo)))
    if duplicate_first:
        # replay of the first chunk arriving last — same event_ids
        parts.append(("part-replay.parquet", parts[0][1]))
    for j, (name, chunk) in enumerate(parts):
        p = d / name
        pq.write_table(chunk, p)
        os.utime(p, (base + j, base + j))
    return d


def _batch_events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


SESSION_COLS = ["user_id", "session_start", "session_end", "n_events", "total_value"]


def _py_sessions(spark, gap: dt.timedelta):
    """Pure-python gap-and-islands oracle over the full events table."""
    by_user = defaultdict(list)
    for r in _batch_events(spark).select("user_id", "ts", "value").collect():
        by_user[r["user_id"]].append((r["ts"], r["value"]))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        cur = None  # [start, last, n, total]
        for ts, v in evs:
            if cur is not None and ts - cur[1] >= gap:
                out.append((u, cur[0], cur[1], cur[2], round(cur[3], 2)))
                cur = None
            if cur is None:
                cur = [ts, ts, 0, 0.0]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += v
        out.append((u, cur[0], cur[1], cur[2], round(cur[3], 2)))
    return sorted(out)


def test_stream_windowed_counts_equals_batch(spark, tmp_path):
    src = _split_events(tmp_path, k=3)
    stream = windowed_counts(read_event_stream(spark, str(src)))
    got = materialize_stream(stream, _sink_name("win_complete"), "complete")
    want = windowed_counts(_batch_events(spark))
    cols = ["window_start", "window_end", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_append_emits_only_watermark_finalized_windows(spark, tmp_path):
    src = _split_events(tmp_path, k=3)
    delay = dt.timedelta(minutes=30)
    stream = windowed_counts(
        read_event_stream(spark, str(src), max_files_per_trigger=1),
        watermark="30 minutes",
    )
    got = materialize_stream(stream, _sink_name("win_append"), "append")
    cols = ["window_start", "window_end", "event_type", "n", "sum_value"]
    batch = _rows(windowed_counts(_batch_events(spark)), cols)
    max_ts = _batch_events(spark).agg({"ts": "max"}).first()[0]
    final_wm = max_ts - delay
    want = [r for r in batch if r[1] <= final_wm]  # window_end <= watermark
    assert _rows(got, cols) == want
    assert 0 < len(want) < len(batch)  # non-vacuous: something withheld


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    src = _split_events(tmp_path, k=3, duplicate_first=True)
    deduped = dedup_stream(read_event_stream(spark, str(src)), watermark="40 days")
    got = materialize_stream(deduped, _sink_name("dedup"), "append")
    n_src = _batch_events(spark).count()
    assert got.count() == n_src  # replayed chunk fully dropped
    ids = [r[0] for r in got.select("event_id").collect()]
    assert len(set(ids)) == len(ids) == n_src


def test_session_aggregate_batch_matches_python_oracle(spark):
    got = _rows(
        session_aggregate(_batch_events(spark), gap="30 minutes"), SESSION_COLS
    )
    assert got == _py_sessions(spark, dt.timedelta(minutes=30))


def test_sessionize_stateful_stream(spark, tmp_path):
    gap = dt.timedelta(minutes=30)
    src = _split_events(tmp_path, k=3)
    stream = sessionize_stateful(
        read_event_stream(spark, str(src), max_files_per_trigger=1),
        gap_minutes=30.0,
    )
    got = _rows(
        materialize_stream(stream, _sink_name("sessions"), "append"), SESSION_COLS
    )
    oracle = _py_sessions(spark, gap)
    # every emitted session is a true session, exact on all fields
    assert set(got) <= set(oracle)
    # non-final sessions all close (next session's first event forces it);
    # a user's final session closes iff the final watermark passed its
    # timeout. final watermark = max event ts - watermark delay (the
    # no-data micro-batch after the last file fires remaining timeouts).
    max_ts = _batch_events(spark).agg({"ts": "max"}).first()[0]
    final_wm = max_ts - gap
    last_per_user = {}
    for s in oracle:
        if s[0] not in last_per_user or s[1] > last_per_user[s[0]][1]:
            last_per_user[s[0]] = s
    want = sorted(
        s
        for s in oracle
        if s != last_per_user[s[0]] or s[2] + gap <= final_wm
    )
    assert got == want
    assert 0 < len(want) < len(oracle)


def test_catalog_streaming_entries_present():
    from bitcoinpagerank_spark.plans.catalog import oracle_sql, queries

    q = queries()
    for name in ("ev_sessions", "ev_stream_tumbling", "ev_stream_dedup"):
        assert name in q
    assert "ev_sessions" in oracle_sql()


def test_stream_sliding_counts_equals_batch(spark, tmp_path):
    from bitcoinpagerank_spark.streaming import sliding_counts

    src = _split_events(tmp_path, k=3)
    stream = sliding_counts(read_event_stream(spark, str(src)))
    got = materialize_stream(stream, _sink_name("slide_complete"), "complete")
    want = sliding_counts(_batch_events(spark))
    cols = ["window_start", "window_end", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)
    # every event lands in duration/slide = 4 windows
    n_events = _batch_events(spark).count()
    assert want.agg({"n": "sum"}).first()[0] == 4 * n_events


def test_stream_followup_join_equals_batch(spark, tmp_path):
    from bitcoinpagerank_spark.streaming import followup_pairs

    src = _split_events(tmp_path, k=3)
    stream = followup_pairs(read_event_stream(spark, str(src), max_files_per_trigger=1))
    got = materialize_stream(stream, _sink_name("followup"), "append")
    want = followup_pairs(_batch_events(spark))
    cols = ["user_id", "first_id", "then_id", "gap_s"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0
    # python oracle: brute-force funnel over the raw events
    evs = _batch_events(spark).select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    views = [(r["user_id"], r["event_id"], r["ts"]) for r in evs
             if r["event_type"] == "view"]
    buys = [(r["user_id"], r["event_id"], r["ts"]) for r in evs
            if r["event_type"] == "purchase"]
    wanted = sorted(
        (u, fid, tid, int(bts.timestamp()) - int(fts.timestamp()))
        for (u, fid, fts) in views
        for (bu, tid, bts) in buys
        if bu == u and fts < bts <= fts + dt.timedelta(hours=12)
    )
    assert _rows(got, cols) == wanted


def test_stream_to_tablestore_exactly_once(spark, tmp_path):
    from bitcoinpagerank_spark.sources.tablestore import TableStore
    from bitcoinpagerank_spark.streaming import (
        read_event_stream,
        stream_to_tablestore,
    )

    src = _split_events(tmp_path, k=3)
    store = TableStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    manifest = stream_to_tablestore(
        read_event_stream(spark, str(src), max_files_per_trigger=1),
        store, "events_sink", ckpt,
    )
    n_src = _batch_events(spark).count()
    assert len(manifest["batches"]) == 3
    assert sum(b["rows"] for b in manifest["batches"]) == n_src
    table = store.read_table(store.table_path("events_sink"))
    assert table.count() == n_src

    # restart over the same checkpoint: no new data -> no new batches
    manifest2 = stream_to_tablestore(
        read_event_stream(spark, str(src), max_files_per_trigger=1),
        store, "events_sink", ckpt,
    )
    assert manifest2 == manifest
    assert store.read_table(store.table_path("events_sink")).count() == n_src

    # a NEW run (fresh checkpoint) against the same table starts again
    # at batch_id 0 — the (run, batch_id) guard must let it append
    # instead of swallowing it
    before = store.read_table(store.table_path("events_sink")).count()
    d2 = tmp_path / "events_one"
    d2.mkdir()
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF_DIR}/events.parquet").slice(0, 10)
    pq.write_table(t, d2 / "part-000.parquet")
    manifest3 = stream_to_tablestore(
        read_event_stream(spark, str(d2)), store, "events_sink",
        str(tmp_path / "ckpt2"),
    )
    assert len(manifest3["batches"]) == len(manifest["batches"]) + 1
    assert store.read_table(store.table_path("events_sink")).count() == before + 10


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    from bitcoinpagerank_spark.streaming import materialize_stream, read_event_stream
    from bitcoinpagerank_spark.streaming.events import segment_totals

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    dim = spark.read.parquet(f"{sf}/customer.parquet")
    batch = {tuple(r) for r in segment_totals(events, dim).collect()}
    streamed = materialize_stream(
        segment_totals(read_event_stream(spark, f"{sf}/events.parquet"), dim),
        "t_enrich_seg",
        "complete",
    )
    assert {tuple(r) for r in streamed.collect()} == batch
    assert len(batch) > 1  # join is non-vacuous: several segments present


def test_gapfill_materializes_empty_buckets(spark):
    from bitcoinpagerank_spark.plans import catalog

    rows = catalog.queries()["ev_gapfill"](spark, "/root/testdata/sf0.001")
    data = rows.collect()
    zeros = [r for r in data if r["n"] == 0]
    assert zeros, "expected at least one gap-filled zero bucket"
    # dense grid: every (bucket, type) combination present exactly once
    import itertools
    buckets = {r["hour_bucket"] for r in data}
    types = {r["event_type"] for r in data}
    assert len(data) == len(buckets) * len(types)
