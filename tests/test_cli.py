"""The spark-submit CLI surface, driven as a real subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

from conftest import G_TRI, edges_df
from oracles import triangles_oracle


def _cli(args: list[str], timeout: int = 240) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "bitcoinpagerank_spark", *args,
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "PYTHONPATH": str(REPO)}, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-1500:]
    return out.stdout.strip().splitlines()[-1]


def test_cli_pagerank_and_triangles(spark, tmp_path):
    edges = edges_df(spark, G_TRI)
    path = str(tmp_path / "edges")
    edges.write.parquet(path)

    tri = json.loads(_cli(["triangles", "--input", path]))
    assert tri["triangles"] == triangles_oracle(G_TRI) == 1

    ranks_out = str(tmp_path / "ranks")
    pr = json.loads(_cli([
        "pagerank", "--input", path, "--output", ranks_out,
        "--max-iter", "50",
    ]))
    assert pr["converged"] is True
    assert abs(pr["total_mass"] - 1.0) < 1e-9
    got = {r["id"]: r["score"] for r in spark.read.parquet(ranks_out).collect()}
    assert set(got) == {1, 2, 3}


def test_cli_rejects_bad_command():
    out = subprocess.run(
        [sys.executable, "-m", "bitcoinpagerank_spark", "bogus", "--input", "x"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": str(REPO)}, cwd=str(REPO),
    )
    assert out.returncode != 0
    assert "invalid choice" in out.stderr
