"""CLI smoke: count → query → sketch subcommands in subprocesses (each
owns its own local Ray session, independent of the test session)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "ocm_ray", *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=REPO)


@pytest.fixture(scope="module")
def small_seq():
    from ocm_ray.data.sequences import ensure_sequences

    return ensure_sequences(300, seed=42, n_files=4)


def test_cli_count_query_roundtrip(small_seq, tmp_path):
    sk = str(tmp_path / "cli.sk")
    r = _run(["count", "-c", "-n", "2", "-w", "16384", "--nh", "3",
              "--input", small_seq, "-o", sk, "--num-cpus", "4",
              "--checkpoint-dir", str(tmp_path / "ck")])
    assert r.returncode == 0, r.stderr[-500:]
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["rounds"] == 2 and meta["n_items"] > 0
    assert os.path.exists(str(tmp_path / "ck" / "round-01.sk"))

    # query with the reference whitespace text format
    qf = str(tmp_path / "q.txt")
    with open(qf, "w") as f:
        f.write("1 10\n2 5\n99999999 1\n")
    out = str(tmp_path / "out.csv")
    r = _run(["query", "-f", sk, "-q", qf, "--item-col", "token",
              "-o", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-500:]
    df = pd.read_csv(out)
    assert list(df.columns) == ["token", "true_count", "estimated_count"]
    assert len(df) == 3
    assert df.loc[df.token == 99999999, "estimated_count"].iloc[0] >= 0


def test_cli_sketch_kinds(small_seq, tmp_path):
    out = str(tmp_path / "hll.sk")
    r = _run(["sketch", "--kind", "hll", "-p", "12", "--input", small_seq,
              "-o", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-500:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["estimate"] > 1000

    from ocm_ray.sketches import MergeableSketch

    sk = MergeableSketch.from_bytes(open(out, "rb").read())
    assert type(sk).__name__ == "HyperLogLog"


def test_cli_missing_input(tmp_path):
    r = _run(["count", "--input", "/nonexistent-dir", "-o",
              str(tmp_path / "x.sk"), "--num-cpus", "2"])
    assert r.returncode == 2
    assert "no parquet files" in r.stderr
