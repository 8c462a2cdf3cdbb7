"""BPE vocabulary training + encoding (Sennrich et al. 2016): the
classic hand example, exact partition invariance, inference ==
training segmentation, roundtrip, and the actor-pool encode stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus_df(word_counts):
    """One doc per word occurrence (so distributed word counts are
    exercised, not trivially one block)."""
    rows = []
    i = 0
    for w, c in word_counts.items():
        for _ in range(c):
            rows.append({"doc_id": f"d{i:05d}", "text": w})
            i += 1
    return pd.DataFrame(rows)


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _train(df, nparts=4, **kw):
    import ray.data

    from ocm_ray.ops.text import train_bpe

    return train_bpe(ray.data.from_pandas(df).repartition(nparts), **kw)


def test_bpe_sennrich_example():
    """The ACL'16 running example: with {low:5, lower:2, newest:6,
    widest:3} the first merges are (e,s) -> (es,t) -> (est,</w>)."""
    out = _train(_corpus_df(SENNRICH), vocab_size=30)
    assert out["merges"][:3] == [("e", "s"), ("es", "t"),
                                 ("est", "</w>")]
    assert "est</w>" in out["vocab"]
    assert out["n_words"] == 4


def test_bpe_partition_invariance_exact():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "lowes", "lowest",
             "newest", "widest", "wide", "low"]
    wc = {w: int(rng.integers(1, 40)) for w in vocab}
    a = _train(_corpus_df(wc), nparts=1, vocab_size=60)
    b = _train(_corpus_df(wc), nparts=7, vocab_size=60)
    assert a["merges"] == b["merges"]
    assert a["vocab"] == b["vocab"]


def test_bpe_inference_matches_training_and_roundtrips():
    from ocm_ray.ops.text import bpe_segment_word, train_bpe

    out = _train(_corpus_df(SENNRICH), vocab_size=26)
    ranks = {tuple(m): i for i, m in enumerate(out["merges"])}
    # training words: every piece must be in the learned vocab + EOW
    legal = set(out["vocab"]) | {"</w>"}
    for w in SENNRICH:
        pieces = bpe_segment_word(w, ranks)
        assert "".join(pieces) == w + "</w>"          # roundtrip
        assert all(p in legal for p in pieces), (w, pieces)
    # an OOV word still roundtrips (falls back toward characters)
    pieces = bpe_segment_word("slowest", ranks)
    assert "".join(pieces) == "slowest</w>"


def test_bpe_encode_documents_stage():
    import ray.data

    from ocm_ray.ops.text import (bpe_encode_documents, bpe_segment_word,
                                  train_bpe)

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["low lower newest", "widest low low", ""],
    })
    train_df = _corpus_df(SENNRICH)
    merges = _train(train_df, vocab_size=30)["merges"]
    ds = ray.data.from_pandas(df).repartition(2)
    out = bpe_encode_documents(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for _, r in out.iterrows():
        words = df.loc[df.doc_id == r.doc_id, "text"].iloc[0].split(" ")
        want = [p for w in words for p in bpe_segment_word(w, ranks)]
        assert r.pieces == " ".join(want), r.doc_id
        assert r.n_pieces == len(want)


def test_bpe_on_real_documents_table():
    """End-to-end over the sf0.001 documents parquet: vocab learned,
    every encoded doc reconstructs its text modulo the EOW markers."""
    import ray.data

    from ocm_ray.ops.text import bpe_encode_documents, train_bpe

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    out = train_bpe(ds, vocab_size=300)
    assert len(out["merges"]) > 50
    enc = bpe_encode_documents(ds.limit(50), out["merges"]).to_pandas()
    orig = ds.limit(50).to_pandas()
    merged = enc.merge(orig, on="doc_id")
    for _, r in merged.iterrows():
        rebuilt = r.pieces.replace(" ", "").replace("</w>", " ").rstrip(" ")
        assert rebuilt == r.text.rstrip(" "), r.doc_id
