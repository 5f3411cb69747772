"""Driver-contract rehearsal: run every catalog query in Spark and its
oracle SQL in DuckDB on the same parquet tables; compare row multisets
(columns aligned by name, floats canonicalized) — the same shape of check
the driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pytest

from bitcoinpagerank_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in data
    )


ORACLED = sorted(catalog.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_data = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    got = _rows(spark_cols, spark_data)
    want = _rows(duck_cols, duck_data)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert got == want, f"{name}: value mismatch (first diff: "


def test_rows_only_queries_run(spark):
    for name, fn in catalog.queries().items():
        if name in catalog.oracle_sql():
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
