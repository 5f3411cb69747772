"""Interleaved one-JVM A/B: doc_token_ids array path vs token-row path
feeding minhash/LSH/simhash (round-7 optimization evidence).

A = minhash/simhash over doc_token_ids(docs, dictionary) (collect_list
    arrays, the pre-r7 shape)
B = the same aggregates over exploded (id, tid) rows (r7 shape)

Asserts identical results (sorted rows) once, then times REPS
interleaved A/B/A/B... and prints medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bitcoinpagerank_spark.session import get_spark  # noqa: E402
from bitcoinpagerank_spark.functions.text import token_dictionary, tokens_col  # noqa: E402
from bitcoinpagerank_spark.operators.dedup import (  # noqa: E402
    doc_token_ids,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)

REPS = int(os.environ.get("AB_REPS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="tid_rows_ab", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def tids_arrays():
        return doc_token_ids(docs, dictionary=token_dictionary(docs))

    def tid_rows():
        toks = docs.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens_col(F.col("text"))).alias("token"),
        )
        return toks.join(token_dictionary(docs), "token").select(
            "id", F.col("tid").cast("long").alias("tid")
        )

    cases = {
        "minhash": lambda src: minhash_signatures(src(), k=8).count(),
        "lsh_pairs": lambda src: lsh_candidate_pairs(
            minhash_signatures(src(), k=8), bands=4
        ).count(),
        "simhash64": lambda src: simhash(src(), bits=64).count(),
    }

    # equivalence check once per case
    for name in ("minhash", "simhash64"):
        fn = minhash_signatures if name == "minhash" else simhash
        kw = {"k": 8} if name == "minhash" else {"bits": 64}
        a = sorted(map(tuple, fn(tids_arrays(), **kw).collect()))
        b = sorted(map(tuple, fn(tid_rows(), **kw).collect()))
        assert a == b, f"{name}: A/B results differ"
        print(f"{name}: results identical ({len(a)} rows)", flush=True)

    for case, thunk in cases.items():
        ta, tb = [], []
        for _ in range(REPS):
            t0 = time.monotonic(); thunk(tids_arrays); ta.append(time.monotonic() - t0)
            t0 = time.monotonic(); thunk(tid_rows); tb.append(time.monotonic() - t0)
        print(
            f"{case}: arrays median={statistics.median(ta):.3f}s "
            f"rows median={statistics.median(tb):.3f}s "
            f"ratio={statistics.median(tb)/statistics.median(ta):.3f} "
            f"(A={[round(x,3) for x in ta]} B={[round(x,3) for x in tb]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
