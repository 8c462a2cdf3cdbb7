"""epoch_shuffle — deterministic driver-bounded global shuffle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _df(n=5000):
    rng = np.random.default_rng(2)
    return pd.DataFrame({
        "doc_id": [f"d{i:06d}" for i in range(n)],
        "payload": rng.integers(0, 1 << 30, n),
    })


def _shuffled(df, seed, nparts, n_shards=16):
    import ray.data

    from ocm_ray.ops.sampling import epoch_shuffle

    ds = ray.data.from_pandas(df).repartition(nparts)
    return epoch_shuffle(ds, seed=seed, n_shards=n_shards).to_pandas()


def test_epoch_shuffle_is_permutation_and_deterministic():
    df = _df()
    a = _shuffled(df, seed=1, nparts=4)
    # permutation: same multiset of rows
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        df.sort_values("doc_id").reset_index(drop=True))
    # identical order across runs AND input partitionings
    b = _shuffled(df, seed=1, nparts=9)
    pd.testing.assert_frame_equal(a, b)
    c = _shuffled(df.sample(frac=1.0, random_state=7), seed=1, nparts=3)
    pd.testing.assert_frame_equal(a, c)


def test_epoch_shuffle_seeds_give_independent_orders():
    df = _df(2000)
    a = _shuffled(df, seed=1, nparts=4)
    b = _shuffled(df, seed=2, nparts=4)
    assert (a.doc_id.to_numpy() != b.doc_id.to_numpy()).mean() > 0.99
    # and genuinely scrambles the input order
    assert (a.doc_id.to_numpy() != df.doc_id.to_numpy()).mean() > 0.99
    # rank correlation with input order ~ 0 (|rho| < 0.1 at n=2000)
    pos = {d: i for i, d in enumerate(df.doc_id)}
    ranks = np.array([pos[d] for d in a.doc_id])
    rho = np.corrcoef(np.arange(len(ranks)), ranks)[0, 1]
    assert abs(rho) < 0.1, rho


def test_epoch_shuffle_matches_direct_key_sort():
    """The output order must equal sorting all rows by the documented
    shuffle key — the spec a resume must be able to re-derive."""
    from ocm_ray.core.hashing import wanghash
    from ocm_ray.engine.tokens import hash_string_array
    import pyarrow as pa

    df = _df(1500)
    got = _shuffled(df, seed=5, nparts=5)
    h = hash_string_array(pa.array(df.doc_id))
    key = wanghash(h ^ wanghash(np.array([5], dtype=np.uint64))[0])
    want = df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
