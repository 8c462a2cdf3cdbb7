"""NumpyMLPEncoder: a REAL .npz-artifact model through the pluggable
``encode_fn`` slot — actor-pool embedding with a once-per-actor load
proof, then the ANN index and hybrid retrieval consuming its vectors
end to end (the swap path a torch/ONNX encoder would take)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=400, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)]
    return pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(n)],
        "text": [" ".join(rng.choice(vocab, 20)) for _ in range(n)],
    })


def test_mlp_encoder_actor_pool_and_load_once(tmp_path):
    import ray.data

    from ocm_ray.ops.text import (NumpyMLPEncoder, embed_texts,
                                  save_numpy_mlp)

    path = save_numpy_mlp(str(tmp_path / "mlp.npz"), nfeat=1024, hid=32,
                          dim=16, seed=3)
    log = str(tmp_path / "loads.log")
    enc = NumpyMLPEncoder(path, load_log=log)
    assert enc.load_count == 0  # lazy — nothing read until first call

    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(8)
    out = (embed_texts(ds, dim=16, encode_fn=enc, batch_size=50,
                       concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(df)
    got = np.stack(out["embedding"].to_numpy())

    # exact-model parity: a driver-side forward pass of the SAME
    # artifact reproduces the actor-pool embeddings (tiny tolerance —
    # BLAS blocking may differ between 50-row and 400-row matmuls)
    local = NumpyMLPEncoder(path)
    want = local(df.sort_values("doc_id")["text"].tolist())
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert local.load_count == 1
    local(["again"])  # second call: cached, no reload
    assert local.load_count == 1

    # once per ACTOR, not per batch: 8 batches flowed through <= 2
    # actors, and the artifact was np.load-ed exactly once per pid
    # (the driver-side `local` has no load_log, so only actors appear)
    pids = open(log).read().split()
    assert 1 <= len(pids) <= 2
    assert len(set(pids)) == len(pids)


def test_mlp_encoder_ann_and_hybrid(tmp_path):
    import ray.data

    from ocm_ray.ops.retrieval import hybrid_search
    from ocm_ray.ops.similarity import lsh_topk, build_ann_index
    from ocm_ray.ops.text import (NumpyMLPEncoder, embed_texts,
                                  save_numpy_mlp)

    path = save_numpy_mlp(str(tmp_path / "mlp.npz"), nfeat=1024, hid=32,
                          dim=16, seed=3)
    enc = NumpyMLPEncoder(path)

    df = _corpus(n=200, seed=6)
    # planted target: lexically and semantically the query itself
    query = "w1 w2 w3 w4 w5"
    df.loc[len(df)] = {"doc_id": "hit", "text": query + " " + query}
    ds = ray.data.from_pandas(df).repartition(4)

    emb = embed_texts(ds, dim=16, encode_fn=enc, concurrency=2) \
        .materialize()

    # persisted ANN index over the MLP vectors; query with the same model
    idx = str(tmp_path / "ann")
    build_ann_index(emb, idx, bits=6)
    row = emb.take(5)[4]
    qv = np.asarray(row["embedding"], dtype=np.float64)
    res = lsh_topk(None, qv[None, :], k=3, multiprobe=2,
                   id_col="doc_id", index_dir=idx)
    assert res.iloc[0]["vec_id"] == row["doc_id"]  # self at rank 0
    assert res.iloc[0]["sim"] > 0.9999

    # hybrid retrieval reranks with the artifact model end to end
    out = hybrid_search(ds, query, topk=5, recall_k=30, dim=16,
                        encode_fn=enc)
    assert out.iloc[0]["doc_id"] == "hit"
    assert out.iloc[0]["cosine"] > 0.99


def test_mlp_encoder_non_pow2_and_seed(tmp_path):
    """Every W1 row must be reachable for a NON-power-of-two feature
    width (the bucket is hash % nfeat, not a bitmask that would leave
    rows dead), and seedseed must actually change the word hashing."""
    import numpy as np

    from ocm_ray.ops.text import NumpyMLPEncoder, save_numpy_mlp

    path = save_numpy_mlp(str(tmp_path / "odd.npz"), nfeat=1000, hid=8,
                          dim=4, seed=1)
    enc = NumpyMLPEncoder(path)
    texts = [f"t{i} u{i} v{i}" for i in range(4000)]
    feats = enc.featurize(texts)
    hit = feats.sum(axis=0) > 0
    # 12k word hashes over 1000 buckets: a bitmask bug leaves ~2/3 of
    # the rows permanently cold; modulo reaches (nearly) all of them
    assert hit.mean() > 0.99, f"only {hit.sum()}/1000 buckets reachable"

    other = NumpyMLPEncoder(path, seedseed=42)
    assert not np.allclose(enc(texts[:50]), other(texts[:50])), \
        "seedseed must change the hashed features"
