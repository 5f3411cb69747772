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

from pyspark.sql import SparkSession

# unique job-group token per loop instance, so getJobIdsForGroup never
# picks up a previous run's jobs in the same session
_SEQ = [0]


def next_group(prefix: str, iteration: int) -> str:
    _SEQ[0] += 1
    return f"{prefix}_{_SEQ[0]}_it{iteration}"


@contextmanager
def job_group(spark: SparkSession, group: str, desc: str) -> Iterator[None]:
    spark.sparkContext.setJobGroup(group, desc)
    try:
        yield
    finally:
        spark.sparkContext.setJobGroup(None, None)


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
