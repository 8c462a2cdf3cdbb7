"""Distributed logistic-regression quality classifier: exact gradient
parity vs a driver-side recomputation, separable-corpus convergence,
partition invariance, bigram features, and the save/load round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=400, seed=3):
    """Separable planted corpus: positives carry 'fine' words,
    negatives 'junk' words, both mixed with shared filler."""
    rng = np.random.default_rng(seed)
    filler = np.array([f"w{i}" for i in range(200)])
    rows = []
    for i in range(n):
        words = list(filler[rng.integers(0, len(filler), 12)])
        pos = i % 2 == 0
        marker = [f"fine{rng.integers(0, 5)}" if pos
                  else f"junk{rng.integers(0, 5)}"
                  for _ in range(4)]
        rows.append({"doc_id": i, "text": " ".join(words + marker),
                     "label": pos})
    return pd.DataFrame(rows)


def _local_reference(df, dim, epochs, lr, l2, bigrams=False,
                     lowercase=True):
    """Driver-side full-batch GD with the SAME feature/gradient math,
    computed over the whole corpus at once (no blocks, no tree)."""
    import pyarrow as pa

    from ocm_ray.ops.classifier import _lr_flat_features, _lr_logits

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    wfeat, lens, bfeat, blens = _lr_flat_features(
        tbl.column("text"), dim, bigrams, lowercase)
    y = df["label"].to_numpy().astype(np.float64)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        z, tot = _lr_logits(w, b, wfeat, lens, bfeat, blens)
        p = 0.5 * (1.0 + np.tanh(0.5 * z))
        r = p - y
        rw = np.where(tot > 0, r / np.maximum(tot, 1), 0.0)
        grad = np.bincount(wfeat, weights=np.repeat(rw, lens),
                           minlength=dim)
        if blens.sum():
            grad += np.bincount(bfeat, weights=np.repeat(rw, blens),
                                minlength=dim)
        w = w - lr * (grad / len(y) + l2 * w)
        b = b - lr * float(r.sum()) / len(y)
    return w, b


def test_distributed_training_matches_local_reference():
    import ray.data as rd

    from ocm_ray.ops.classifier import train_lr_classifier

    df = _corpus()
    dim = 1 << 12
    model = train_lr_classifier(rd.from_pandas(df).repartition(7),
                                dim=dim, epochs=3, lr=2.0, l2=1e-4)
    w_ref, b_ref = _local_reference(df, dim, epochs=3, lr=2.0, l2=1e-4)
    # partial-gradient tree folds differ from one flat sum only by
    # float addition order
    np.testing.assert_allclose(model.w, w_ref, rtol=0, atol=1e-12)
    assert abs(model.b - b_ref) < 1e-12


def test_partition_invariance_and_convergence():
    import ray.data as rd

    from ocm_ray.ops.classifier import lr_scores, train_lr_classifier

    df = _corpus(seed=11)
    kw = dict(dim=1 << 12, epochs=30, lr=5.0, l2=1e-6)
    m1 = train_lr_classifier(rd.from_pandas(df).repartition(3), **kw)
    m2 = train_lr_classifier(rd.from_pandas(df).repartition(13), **kw)
    np.testing.assert_allclose(m1.w, m2.w, atol=1e-9)
    # a separable corpus must be fully separated
    hist = []
    m3 = train_lr_classifier(rd.from_pandas(df).repartition(5),
                             history=hist, **kw)
    assert hist[-1][1] < hist[0][1]     # loss decreased
    out = lr_scores(rd.from_pandas(df), m3).to_pandas() \
        .merge(df[["doc_id", "label"]], on="doc_id")
    assert (out["lr_keep"] == out["label"]).all()


def test_bigram_features_separate_word_identical_docs():
    import ray.data as rd

    from ocm_ray.ops.classifier import lr_scores, train_lr_classifier

    # positives and negatives use the SAME word multiset; only adjacency
    # differs — word-only LR cannot separate them, bigram LR can
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        text = "new york city tour" if pos else "york new tour city"
        rows.append({"doc_id": i, "text": text, "label": pos})
    df = pd.DataFrame(rows)
    kw = dict(dim=1 << 12, epochs=40, lr=5.0, l2=0.0)
    m_words = train_lr_classifier(rd.from_pandas(df), bigrams=False, **kw)
    m_bi = train_lr_classifier(rd.from_pandas(df), bigrams=True, **kw)
    s_words = lr_scores(rd.from_pandas(df), m_words).to_pandas() \
        .merge(df[["doc_id", "label"]], on="doc_id")
    s_bi = lr_scores(rd.from_pandas(df), m_bi).to_pandas() \
        .merge(df[["doc_id", "label"]], on="doc_id")
    assert np.allclose(s_words["lr_logit"], s_words["lr_logit"].iloc[0])
    assert (s_bi["lr_keep"] == s_bi["label"]).all()


def test_filter_and_save_load_roundtrip(tmp_path):
    import ray.data as rd

    from ocm_ray.ops.classifier import (LRModel, lr_filter, lr_scores,
                                        train_lr_classifier)

    df = _corpus(n=200, seed=7)
    model = train_lr_classifier(rd.from_pandas(df).repartition(4),
                                dim=1 << 12, epochs=30, lr=5.0)
    path = str(tmp_path / "lr_model.npz")
    model.save(path)
    loaded = LRModel.load(path)
    np.testing.assert_array_equal(model.w, loaded.w)
    assert (loaded.b, loaded.dim, loaded.bigrams, loaded.lowercase) \
        == (model.b, model.dim, model.bigrams, model.lowercase)
    kept = lr_filter(rd.from_pandas(df), loaded).to_pandas()
    want = lr_scores(rd.from_pandas(df), model).to_pandas()
    assert set(kept["doc_id"]) == set(want.loc[want["lr_keep"], "doc_id"])
    assert set(kept.columns) == set(df.columns)   # passthrough filter
