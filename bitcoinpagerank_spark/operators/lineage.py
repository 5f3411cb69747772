"""Per-iteration lineage helpers shared by the iterate loops.

Every iterative operator (PageRank, WCC, LPA, k-core, HITS) runs exactly
one job per iteration; tagging that job with a unique group lets the
driver read the iteration's shuffle read/write bytes back from the app
status store (the same data the UI/REST API serves — available with the
UI server disabled), fulfilling the north-star's "per-partition lineage
(edge counts, delta-L1, shuffle bytes)" wording without an extra listener
or event-log pass.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# unique job-group token per loop instance, so getJobIdsForGroup never
# picks up a previous run's jobs in the same session; locked because
# concurrent driver threads (e.g. SCC's overlapped fwd/bwd closures)
# draw tokens from the same counter
import threading

_SEQ = [0]
_SEQ_LOCK = threading.Lock()


def next_group(prefix: str, iteration: int) -> str:
    with _SEQ_LOCK:
        _SEQ[0] += 1
        return f"{prefix}_{_SEQ[0]}_it{iteration}"


@contextmanager
def job_group(spark: SparkSession, group: str, desc: str) -> Iterator[None]:
    spark.sparkContext.setJobGroup(group, desc)
    try:
        yield
    finally:
        spark.sparkContext.setJobGroup(None, None)


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that RESETS Catalyst's size estimate.

    ``localCheckpoint`` truncates the physical lineage but carries the
    plan's ESTIMATED statistics into the resulting LogicalRDD
    (``LogicalRDD.fromDataset`` → ``rewriteStatsAndConstraints``), and
    the size-only estimator multiplies child sizes at every join/union
    (``SizeInBytesOnlyStatsPlanVisitor.default``). In an iterate loop
    whose round plan references the previous checkpoint k ≥ 2 times, the
    estimate's DIGIT COUNT therefore compounds ×k per round — after tens
    of rounds Catalyst planning drowns in million-digit BigInteger
    products (observed: Louvain level-2 planning pinning a driver core
    for minutes on a 155-vertex graph; sizeInBytes had 945 digits after
    only 6 rounds). PageRank never showed it because its round plan
    references ranks once (linear digit growth).

    Fix: materialize the frame in the block cache first — the checkpoint
    then inherits the cache's REAL byte size, resetting the estimate to
    ground truth every round. Costs one extra vertex-sized cache pass
    per round; the cache also serves as the checkpoint action's input,
    so the plan itself still runs once. Any ``observe()`` on ``df``
    fires during the materializing count()."""
    cached = df.persist()
    try:
        cached.count()  # materialize cache (fires observe metrics)
        return cached.localCheckpoint(eager=True)
    finally:
        cached.unpersist()


def group_shuffle_bytes(spark: SparkSession, group: str) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages of
    the jobs tagged with ``group``; (0, 0) if the status surface is
    unavailable (the lineage row is then still written, just without
    byte counts)."""
    try:
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        store = sc._jsc.sc().statusStore()  # noqa: SLF001 — public status data
        read = write = 0
        for jid in tracker.getJobIdsForGroup(group):
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in list(jinfo.stageIds):
                try:
                    sd = store.lastStageAttempt(int(sid))
                except Exception:
                    continue  # evicted or still pending
                read += int(sd.shuffleReadBytes())
                write += int(sd.shuffleWriteBytes())
        return read, write
    except Exception:
        return 0, 0
