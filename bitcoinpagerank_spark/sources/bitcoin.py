"""Deterministic synthetic tx/txin/txout tables (FIXTURES.md §3).

Schemas from the reference's positional-CSV comments:
  tx    (id bigint, hash string)                      PrepareFirstJoin.java:68-70
  txin  (id, tx_idx, prev_out, prev_out_index, tx_id) PrepareFirstJoin.java:40-51
  txout (id, tx_idx, address, value, type, tx_id)     PrepareSecondJoin.java:71-76

Generation (seedless pure arithmetic, FIXTURES.md §3): ``n_tx`` txs with
hash ``h{id:06d}``; tx t has 1 + t%3 outputs over an 80-address pool (so
addresses repeat → parallel edges to dedup); ~5% of outputs get the literal
``unknown`` address (exercises the P3 blacklist filter); each tx t>0 has
one input per output of tx t-1, referencing (prev hash, out idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_ADDRESSES = 80


def _n_out(t: int) -> int:
    return 1 + t % 3


def _address(t: int, j: int) -> str:
    k = (t * 7 + j * 13) % N_ADDRESSES
    if (t * 31 + j) % 20 == 0:  # ~5% unknown
        return "unknown"
    return f"a{k:04d}"


def generate_bitcoin_tables(
    spark: SparkSession, n_tx: int = 100
) -> tuple[DataFrame, DataFrame, DataFrame]:
    tx_rows, txin_rows, txout_rows = [], [], []
    out_id = in_id = 0
    for t in range(n_tx):
        tx_rows.append((t, f"h{t:06d}"))
        for j in range(_n_out(t)):
            txout_rows.append(
                (out_id, j, _address(t, j), 1000 + t * 10 + j, "pubkey", t)
            )
            out_id += 1
        if t > 0:
            for j in range(_n_out(t - 1)):
                txin_rows.append((in_id, j, f"h{t-1:06d}", j, t))
                in_id += 1
    tx = spark.createDataFrame(tx_rows, "id long, hash string")
    txin = spark.createDataFrame(
        txin_rows,
        "id long, tx_idx int, prev_out string, prev_out_index long, tx_id long",
    )
    txout = spark.createDataFrame(
        txout_rows,
        "id long, tx_idx int, address string, value long, type string, tx_id long",
    )
    return tx, txin, txout
