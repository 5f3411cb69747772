"""Streaming sink into the TableStore (foreachBatch).

The production shape of ``materialize_stream``'s memory sink: every
micro-batch is appended to a TableStore table and recorded in the
store's JSON manifest keyed by batch_id. Exactly-once composition:

- Structured Streaming's checkpoint gives at-least-once foreachBatch
  invocation with a monotonically increasing ``batch_id``;
- the manifest's committed-batch set makes the append idempotent — a
  replayed batch_id (failure between the table append and the streaming
  commit) is skipped, so the table never double-counts. With the
  Iceberg backend the append itself is a snapshot commit, giving the
  same guarantee table-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.tablestore import TableStore


def stream_to_tablestore(
    df: DataFrame,
    store: TableStore,
    name: str,
    checkpoint_dir: str,
) -> dict:
    """Drain a (finite) streaming DataFrame into ``store``/``name`` with
    the availableNow trigger; returns the final manifest. Long-running
    deployments call ``.start()`` without awaitTermination via the same
    writer shape."""
    # idempotence is keyed by (run, batch_id) — the Delta txn-appId
    # pattern: a replay WITHIN a run (same checkpoint) is skipped, while
    # a new run (fresh checkpoint) starting again at batch 0 appends
    # normally instead of being silently swallowed
    run = checkpoint_dir.rstrip("/")

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        manifest = store.read_manifest() or {"table": name, "batches": []}
        done = {(b.get("run"), b["batch_id"]) for b in manifest["batches"]}
        if (run, batch_id) in done:  # replayed micro-batch: committed
            return
        n = batch_df.count()
        loc = store.append_table(batch_df, name)
        manifest["batches"].append(
            {"run": run, "batch_id": int(batch_id), "rows": int(n),
             "locator": loc}
        )
        store.write_manifest(manifest)

    q = (
        df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read_manifest() or {"table": name, "batches": []}
