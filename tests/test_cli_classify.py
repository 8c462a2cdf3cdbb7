"""classify subcommand: train (label from --pos-values) → score →
filter, each in its own subprocess Ray session."""
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "ocm_ray", *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=REPO)


@pytest.fixture(scope="module")
def labeled_docs(tmp_path_factory):
    rng = np.random.default_rng(11)
    good, bad = ["fact", "prose", "clean", "cite"], ["spam", "click", "buy"]
    rows = []
    for i in range(80):
        pool = good if i % 2 == 0 else bad
        rows.append({
            "doc_id": i,
            "text": " ".join(rng.choice(pool + ["the", "and"], size=30)),
            "source": "wiki" if i % 2 == 0 else "web",
        })
    path = str(tmp_path_factory.mktemp("cls") / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False), path)
    return path


def test_cli_classify_train_score_filter(labeled_docs, tmp_path):
    model = str(tmp_path / "nb.npz")
    r = _run(["classify", "train", "--input", labeled_docs, "--model", model,
              "--pos-values", "wiki", "--key-col", "source",
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["n_pos_docs"] == 40 and meta["n_neg_docs"] == 40
    assert meta["vocab_size"] == 9

    scores_dir = str(tmp_path / "scores")
    r = _run(["classify", "score", "--input", labeled_docs, "--model", model,
              "-o", scores_dir, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    scores = pq.read_table(scores_dir).to_pandas().sort_values("doc_id")
    assert len(scores) == 80
    # separable corpus: the classifier recovers the source split
    assert (scores["nb_keep"].to_numpy()
            == (scores["doc_id"].to_numpy() % 2 == 0)).all()

    kept_dir = str(tmp_path / "kept")
    r = _run(["classify", "filter", "--input", labeled_docs, "--model",
              model, "-o", kept_dir, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    kept = pq.read_table(kept_dir).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(0, 80, 2))
    assert set(kept.columns) == {"doc_id", "text", "source"}


def test_cli_curate_with_classifier(labeled_docs, tmp_path):
    """curate subcommand composes the trained model as the stage-1.5
    quality filter: only the positive-class docs reach the sink."""
    model = str(tmp_path / "nb.npz")
    r = _run(["classify", "train", "--input", labeled_docs, "--model", model,
              "--pos-values", "wiki", "--key-col", "source",
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]

    out_dir = str(tmp_path / "curated")
    r = _run(["curate", "--input", labeled_docs, "-o", out_dir,
              "--quality-min", "0.0", "--near-dup-threshold", "1.01",
              "--classifier", model, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_input"] == 80 and summary["n_after_quality"] == 40
    got = pq.read_table(out_dir).to_pandas()
    assert sorted(got["doc_id"]) == list(range(0, 80, 2))


def test_cli_report(labeled_docs):
    """report subcommand: one-JSON corpus health summary with exact
    counts (80 docs, 30 words each, planted source mix)."""
    r = _run(["report", "--input", labeled_docs, "--tiers",
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 80 and rep["n_tokens"] == 80 * 30
    assert rep["sources"] == {"web": 40, "wiki": 40}
    assert rep["min_tokens"] == 30 and rep["max_tokens"] == 30
    assert rep["exact_dup_surplus"] == 0
    assert sum(rep["ppl_tiers"].values()) == 80


def test_cli_classify_lr_train_score_filter(labeled_docs, tmp_path):
    """--kind lr trains the logistic model; score/filter sniff the LR
    artifact and separate the planted corpus perfectly."""
    model = str(tmp_path / "lr.npz")
    r = _run(["classify", "train", "--kind", "lr", "--input", labeled_docs,
              "--model", model, "--pos-values", "wiki",
              "--key-col", "source", "--dim", "4096", "--epochs", "30",
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["kind"] == "lr" and meta["dim"] == 4096
    assert meta["final_logloss"] < 0.6

    out = str(tmp_path / "scored")
    r = _run(["classify", "score", "--input", labeled_docs,
              "--model", model, "-o", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    scored = pq.read_table(out).to_pandas()
    assert set(scored.columns) == {"doc_id", "lr_logit", "lr_keep"}
    # planted corpus: evens are wiki/positive
    assert (scored["lr_keep"] == (scored["doc_id"] % 2 == 0)).all()

    out2 = str(tmp_path / "filtered")
    r = _run(["classify", "filter", "--input", labeled_docs,
              "--model", model, "-o", out2, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    kept = pq.read_table(out2).to_pandas()
    assert set(kept["doc_id"]) == set(range(0, 80, 2))
