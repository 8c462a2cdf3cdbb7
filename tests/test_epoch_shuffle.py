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


def test_prepare_epoch_pipeline(tmp_path):
    """End-to-end epoch export: deterministic (same seed -> byte-equal
    packed rows), exclusion drops the planted eval overlap, token
    conservation holds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocm_ray.pipelines.pretraining import prepare_epoch

    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 1000, int(rng.integers(20, 60)),
                         dtype=np.int32) for _ in range(300)]
    tbl = pa.table({
        "doc_id": [f"d{i:04d}" for i in range(300)],
        "tokens": pa.array([s.tolist() for s in seqs], pa.list_(pa.int32())),
    })
    src = tmp_path / "seqs"
    src.mkdir()
    pq.write_table(tbl, src / "part0.parquet")
    # eval set = 30 of the training sequences under different ids
    ev = pa.table({
        "doc_id": [f"e{i}" for i in range(30)],
        "tokens": pa.array([s.tolist() for s in seqs[:30]],
                           pa.list_(pa.int32())),
    })
    evp = tmp_path / "eval"
    evp.mkdir()
    pq.write_table(ev, evp / "part0.parquet")

    def run(out, seed):
        return prepare_epoch(str(src), str(out), seq_len=128, seed=seed,
                             exclude_path=str(evp))

    s1 = run(tmp_path / "ep1", seed=1)
    assert s1["n_docs_in"] == 300 and s1["n_docs_excluded"] == 30
    surviving = sum(len(s) for s in seqs[30:])
    # drop_remainder: at most seq_len-1 tokens lost per output block
    assert s1["n_tokens_packed"] <= surviving
    assert s1["n_tokens_packed"] == s1["n_rows_packed"] * 128

    s2 = run(tmp_path / "ep2", seed=1)
    a = pq.read_table(tmp_path / "ep1").to_pandas()
    b = pq.read_table(tmp_path / "ep2").to_pandas()
    assert len(a) == len(b) == s1["n_rows_packed"]
    for x, y in zip(a.input_ids, b.input_ids):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    s3 = run(tmp_path / "ep3", seed=2)
    c = pq.read_table(tmp_path / "ep3").to_pandas()
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a.input_ids, c.input_ids))


def test_token_budget_sample():
    """Per-group token budgets: achieved lands within one bucket mass
    above the budget, membership is deterministic and MONOTONE in the
    budget, unbudgeted groups keep/drop per default_keep."""
    import ray.data

    from ocm_ray.ops.sampling import token_budget_sample

    rng = np.random.default_rng(6)
    n = 6000
    df = pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "source": rng.choice(["web", "code", "books"], n,
                             p=[0.6, 0.25, 0.15]),
        "n_tok": rng.integers(50, 500, n),
    })
    totals = df.groupby("source").n_tok.sum()
    budgets = {"web": int(totals.web * 0.3), "code": int(totals.code * 0.8)}

    def run(budgets, nparts=5, **kw):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out, summary = token_budget_sample(ds, budgets, bucket_bits=10,
                                           **kw)
        return out.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True), summary

    out, summary = run(budgets)
    got = out.groupby("source").n_tok.sum()
    bucket_mass = {g: totals[g] / (1 << 10) for g in totals.index}
    for g, b in budgets.items():
        assert summary[g]["achieved"] == got[g]
        assert b <= got[g] <= b + 4 * bucket_mass[g] + 500, (g, b, got[g])
    # unbudgeted group kept whole by default...
    assert got["books"] == totals["books"]
    # ...and dropped with default_keep=False
    out2, _ = run(budgets, default_keep=False)
    assert "books" not in set(out2.source)

    # determinism across partitionings
    out3, _ = run(budgets, nparts=11)
    pd.testing.assert_frame_equal(out, out3)

    # monotone nesting: doubling web's budget keeps a superset
    big = dict(budgets, web=budgets["web"] * 2)
    out4, _ = run(big)
    small_ids = set(out[out.source == "web"].doc_id)
    big_ids = set(out4[out4.source == "web"].doc_id)
    assert small_ids < big_ids
