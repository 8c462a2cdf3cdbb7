"""Retrieval / decontamination operators (`ops/retrieval.py`):
eval-set k-gram decontamination and distributed BM25, each checked
against a by-hand pure-Python reference on small corpora."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

pytestmark = pytest.mark.usefixtures("ray_session")


def _py_grams(text, k):
    ws = text.lower().split(" ")
    return [tuple(ws[i:i + k]) for i in range(len(ws) - k + 1)]


def test_decontaminate_by_hand():
    from ocm_ray.ops.retrieval import decontaminate

    eval_docs = pd.DataFrame({
        "doc_id": [100, 101],
        "text": ["the quick brown fox", "jumps over lazy dogs"],
    })
    train = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a clean document with no overlap at all",
            "we saw the quick brown fox yesterday",   # shares 2 grams
            "quick brown fox jumps over lazy dogs",   # heavy overlap
            "tiny",                                   # 0 grams (< k words)
        ],
    })
    out = (decontaminate(rd.from_pandas(train, override_num_blocks=2),
                         rd.from_pandas(eval_docs), k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    ev = set()
    for t in eval_docs["text"]:
        ev.update(_py_grams(t, 3))
    for _, r in out.iterrows():
        grams = _py_grams(train.loc[train.doc_id == r.doc_id, "text"].iloc[0], 3)
        assert r.n_grams == len(grams)
        assert r.n_contaminated == sum(g in ev for g in grams)
        assert bool(r.contaminated) == (r.n_contaminated > 0)
    assert out.contaminated.tolist() == [False, True, True, False]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    """Reference BM25 (Lucene idf), per-doc scores."""
    toks = [d.lower().split(" ") for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    scores = [0.0] * n
    for t in sorted(set(x.lower() for x in terms)):
        df = sum(t in d for d in toks)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, d in enumerate(toks):
            tf = d.count(t)
            scores[i] += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(d) / avgdl))
    return scores


def test_bm25_matches_pure_python():
    from ocm_ray.ops.retrieval import bm25_scores

    docs = ["the cat sat on the mat",
            "dogs and cats living together",
            "the dog chased the cat up a tree",
            "completely unrelated text about parquet files",
            "cat cat cat cat"]
    df = pd.DataFrame({"doc_id": np.arange(5), "text": docs})
    got = (bm25_scores(rd.from_pandas(df, override_num_blocks=3),
                       ["cat", "dog"]).to_pandas()
           .set_index("doc_id")["score"])
    want = _py_bm25(docs, ["cat", "dog"])
    for i, w in enumerate(want):
        if w > 0:
            assert got[i] == pytest.approx(w, rel=1e-12), i
        else:
            assert i not in got.index


def test_bm25_topk_order_and_ties():
    from ocm_ray.ops.retrieval import bm25_topk

    # identical docs -> identical scores; tie-break must be doc_id asc
    df = pd.DataFrame({"doc_id": [5, 3, 9, 1],
                       "text": ["same words here"] * 4})
    out = bm25_topk(rd.from_pandas(df, override_num_blocks=4),
                    ["same"], topk=3).to_pandas()
    assert out["doc_id"].tolist() == [1, 3, 5]
    assert out["score"].nunique() == 1


def test_decontaminate_partition_invariance():
    """Same flags regardless of block layout (stateless map contract)."""
    from ocm_ray.ops.retrieval import decontaminate

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(200)]
    train = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
    ev = pd.DataFrame({"doc_id": [0], "text": [texts[17]]})

    outs = []
    for nb in (1, 7):
        o = (decontaminate(rd.from_pandas(train, override_num_blocks=nb),
                           rd.from_pandas(ev), k=5)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert bool(outs[0].loc[17, "contaminated"])
    assert outs[0].contaminated.sum() >= 1
