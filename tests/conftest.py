from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bitcoinpagerank_spark.session import get_spark  # noqa: E402

# hand graphs (FIXTURES.md §5)
G_LINE = [(1, 2), (2, 3)]
G_CYCLE = [(1, 2), (2, 3), (3, 1)]
G_STAR = [(1, 2), (1, 3), (1, 4), (1, 5)]
G_TRI = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
G_TWO_CC = [(1, 2), (2, 1), (3, 4)]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


def edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src_id long, dst_id long"
    )
