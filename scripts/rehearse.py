"""Rehearse the driver's CORRECTNESS check locally: run catalog queries in
Spark and their oracle SQL in DuckDB on the same parquet tables, compare
row multisets (columns aligned by name, floats canonicalized — the same
shape the driver records in CORRECTNESS_r{N}.json).

Usage:
  python scripts/rehearse.py                       # first-50 window @ sf0.01
  python scripts/rehearse.py emb_ann_ivf ...       # specific entries
  SF_DIR=/root/testdata/sf0.001 python scripts/rehearse.py --all
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from bitcoinpagerank_spark.plans import catalog  # noqa: E402
from bitcoinpagerank_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(row[i]) for i in order) for row in data)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    q = catalog.queries()
    sql_map = catalog.oracle_sql()
    if args:
        names = args
    elif "--all" in sys.argv:
        names = list(q)
    else:
        names = list(q)[:50]  # the driver's window

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark(
        app_name="rehearse", master="local[16]", shuffle_partitions=16
    )
    bad = 0
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = q[name](spark, sf_dir)
            scols = sdf.columns
            sdata = [tuple(r) for r in sdf.collect()]
            sql = sql_map.get(name)
            if sql is None:
                print(f"{name}: rows-only ({len(sdata)} rows) "
                      f"[{time.monotonic() - t0:.1f}s]")
                continue
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            ddata = res.fetchall()
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(sdata) == len(ddata)
            ok_hash = ok_schema and rows(scols, sdata) == rows(dcols, ddata)
            status = "GREEN" if (ok_schema and ok_rows and ok_hash) else "RED"
            if status == "RED":
                bad += 1
            print(f"{name}: {status} spark={len(sdata)} duck={len(ddata)} "
                  f"schema={ok_schema} hash={ok_hash} "
                  f"[{time.monotonic() - t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    print(f"done: {len(names)} entries, {bad} red/error")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
