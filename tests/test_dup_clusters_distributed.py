"""Distributed connected components (``dup_clusters_ds``): exact parity
with the driver union-find on both plans, both id types, pathological
graph shapes (long paths, cliques, stars), partition invariance, and
logarithmic round counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _labels(df):
    return (df.sort_values("doc_id").reset_index(drop=True)
            .astype(np.int64))


def _run_ds(pairs, **kw):
    import ray.data as rd

    from ocm_ray.ops.dedup import dup_clusters_ds

    reps = kw.pop("reps", 6)
    return dup_clusters_ds(rd.from_pandas(pairs).repartition(reps),
                           **kw).to_pandas()


def _mixed_graph(seed=11, n=2500, m=3500):
    """Random sparse graph + a 300-path + a 40-clique + 2-node islands —
    every shape the star rounds treat differently."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    path = np.arange(10_000, 10_300)
    cl = np.arange(20_000, 20_040)
    ci, cj = np.triu_indices(len(cl), k=1)
    pairs = pd.DataFrame({
        "a": np.concatenate([a, path[:-1], cl[ci], [30_000, 30_002]]),
        "b": np.concatenate([b, path[1:], cl[cj], [30_001, 30_003]]),
    })
    return pairs[pairs.a != pairs.b].reset_index(drop=True)


def test_distributed_matches_union_find_mixed_graph():
    from ocm_ray.ops.dedup import dup_clusters

    pairs = _mixed_graph()
    want = _labels(dup_clusters(pairs))
    got = _labels(_run_ds(pairs, distributed=True, n_shards=8))
    pd.testing.assert_frame_equal(want, got)
    # clique + path + islands resolved to their min members
    lab = dict(zip(got["doc_id"], got["cluster_id"]))
    assert lab[10_299] == 10_000 and lab[20_039] == 20_000
    assert lab[30_001] == 30_000 and lab[30_003] == 30_002


def test_partition_and_shard_invariance():
    from ocm_ray.ops.dedup import dup_clusters

    pairs = _mixed_graph(seed=5)
    want = _labels(dup_clusters(pairs))
    for reps, shards in [(1, 4), (11, 16), (3, 1)]:
        got = _labels(_run_ds(pairs, reps=reps, distributed=True,
                              n_shards=shards))
        pd.testing.assert_frame_equal(want, got)


def test_string_ids_and_duplicate_edges():
    from ocm_ray.ops.dedup import dup_clusters

    pairs = _mixed_graph(seed=9).astype(str)
    pairs = pairs.map(lambda x: f"d{int(x):06d}")
    # duplicate + reversed edges must not change the components
    dup = pd.concat([pairs, pairs.head(500),
                     pairs.tail(300).rename(columns={"a": "b", "b": "a"})],
                    ignore_index=True)
    want = dup_clusters(pairs).sort_values("doc_id").reset_index(drop=True)
    got = (_run_ds(dup, distributed=True, n_shards=4)
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(want, got)


def test_long_path_converges_logarithmically():
    """A 4096-node path is the diameter-adversarial case: plain label
    propagation would need 4096 rounds; the star rounds need ~log2(n).
    Convergence beyond 2*log2(n)+4 iterations would mean the alternation
    lost its contraction — fail loudly rather than just slowly."""
    import ocm_ray.ops.dedup as dd

    n = 4096
    pairs = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    calls = []
    orig = dd._edge_signature
    try:
        dd._edge_signature = lambda e: calls.append(1) or orig(e)
        got = _labels(_run_ds(pairs, distributed=True, n_shards=4))
    finally:
        dd._edge_signature = orig
    assert (got["cluster_id"] == 0).all() and len(got) == n
    assert len(calls) <= 2 * 12 + 4


def test_auto_dispatch_cap_and_forced_plans():
    import ray.data as rd

    from ocm_ray.ops.dedup import dup_clusters, dup_clusters_ds

    pairs = pd.DataFrame({"a": [1, 2, 10, 20, 2], "b": [2, 3, 11, 21, 7]})
    want = _labels(dup_clusters(pairs))
    # DataFrame input, under the cap -> driver plan (still a Dataset out)
    out_lo = dup_clusters_ds(pairs, max_broadcast=10)
    assert isinstance(out_lo, rd.Dataset)
    pd.testing.assert_frame_equal(want, _labels(out_lo.to_pandas()))
    # over the cap -> distributed plan, byte-same labels
    out_hi = dup_clusters_ds(pairs, max_broadcast=2, n_shards=2)
    pd.testing.assert_frame_equal(want, _labels(out_hi.to_pandas()))
    # extra columns (jaccard/sim) are ignored on both plans
    pairs2 = pairs.assign(jaccard=0.5)
    pd.testing.assert_frame_equal(
        want, _labels(dup_clusters_ds(pairs2, distributed=True,
                                      n_shards=2).to_pandas()))


def test_empty_and_self_loop_pairs():
    from ocm_ray.ops.dedup import dup_clusters_ds

    empty = pd.DataFrame({"a": pd.array([], dtype=np.int64),
                          "b": pd.array([], dtype=np.int64)})
    assert dup_clusters_ds(empty).count() == 0
    # forced-distributed empty input short-circuits (n_pairs == 0)
    assert dup_clusters_ds(empty, distributed=True,
                           n_shards=2).count() == 0
    # self-loops carry no connectivity; a lone real edge still resolves
    pairs = pd.DataFrame({"a": [5, 5, 7], "b": [5, 6, 7]})
    got = _labels(dup_clusters_ds(pairs, distributed=True,
                                  n_shards=2).to_pandas())
    assert dict(zip(got["doc_id"], got["cluster_id"])) == {5: 5, 6: 5}
    # ALL-self-loop pairs: zero connectivity after filtering — the
    # distributed plan must return empty, not crash on the
    # schema-less all-empty exchange (review finding, reproduced)
    loops = pd.DataFrame({"a": [5, 9], "b": [5, 9]})
    assert dup_clusters_ds(loops, distributed=True,
                           n_shards=2).count() == 0


def test_lazy_pairs_input_executes_once():
    """A lazy pairs upstream must execute exactly ONCE: the dispatch
    count, schema inference, and round 1's exchange are separate
    consumers, so dup_clusters_ds pins the edge set with one
    materialize() on entry. Marker files count block executions."""
    import ray.data as rd

    from ocm_ray.ops.dedup import dup_clusters, dup_clusters_ds

    import glob
    import os

    runs_path = "/tmp/cc_lazy_runs_marker"
    for f in glob.glob(f"{runs_path}.*"):
        os.remove(f)

    def gen(batch):
        # one marker file per (block, execution); a second execution of
        # block 0 would see its own marker and fail the run count below
        i = int(batch["id"][0])
        with open(f"{runs_path}.{i}", "a") as fh:
            fh.write("x\n")
        a = batch["id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"a": a, "b": a + 1})

    lazy = rd.range(64, override_num_blocks=2).map_batches(
        gen, batch_size=None, batch_format="pandas")
    got = _labels(dup_clusters_ds(lazy, distributed=True,
                                  n_shards=2).to_pandas())
    want = _labels(dup_clusters(
        pd.DataFrame({"a": np.arange(64, dtype=np.int64),
                      "b": np.arange(1, 65, dtype=np.int64)})))
    pd.testing.assert_frame_equal(want, got)
    for f in glob.glob(f"{runs_path}.*"):
        with open(f) as fh:
            assert len(fh.readlines()) == 1, \
                "lazy pairs input executed more than once"
        os.remove(f)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=50),
       st.integers(1, 4))
def test_hypothesis_parity_with_union_find(edges, shards_pow):
    """Any small random multigraph (duplicates, self-loops, both edge
    orientations) resolves to the same min-member labels on the
    distributed plan as the driver union-find — self-loop-only rows
    excluded from both sides (documented deviation)."""
    from ocm_ray.ops.dedup import dup_clusters, dup_clusters_ds

    pairs = pd.DataFrame({"a": [a for a, _ in edges],
                          "b": [b for _, b in edges]}) \
        .astype(np.int64)
    real = pairs[pairs.a != pairs.b].reset_index(drop=True)
    want = _labels(dup_clusters(real)) if len(real) else \
        pd.DataFrame({"doc_id": [], "cluster_id": []}).astype(np.int64)
    got_ds = _run_ds(pairs, reps=3, distributed=True,
                     n_shards=1 << shards_pow)
    got = _labels(got_ds) if len(got_ds) else \
        pd.DataFrame({"doc_id": [], "cluster_id": []}).astype(np.int64)
    pd.testing.assert_frame_equal(want, got)


def test_checkpointed_rounds_kill_and_resume(tmp_path):
    """A crash mid-run resumes from the last completed round: kill the
    loop after round 1 via an injected signature fault, restart with
    the same checkpoint_dir, and get labels identical to an
    uncheckpointed run — without re-running the completed rounds."""
    import ocm_ray.ops.dedup as dd

    pairs = _mixed_graph(seed=21)
    want = _labels(dd.dup_clusters(pairs))
    ck = str(tmp_path / "cc_ckpt")

    calls = []
    orig = dd._edge_signature

    def crashing(e):
        calls.append(1)
        # the input fingerprint + round-0 and round-1 signatures pass,
        # then the run "dies" (len: 1 fingerprint + 2 round sigs)
        if len(calls) == 4:
            raise RuntimeError("injected crash")
        return orig(e)

    dd._edge_signature = crashing
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            _run_ds(pairs, distributed=True, n_shards=4,
                    checkpoint_dir=ck)
    finally:
        dd._edge_signature = orig
    import json
    import os

    meta = json.load(open(os.path.join(ck, "meta.json")))
    crashed_round = meta["round"]
    assert crashed_round >= 0

    # resume: must start past the checkpointed round, not at 0
    resumed_rounds = []
    def counting(e):
        resumed_rounds.append(1)
        return orig(e)

    dd._edge_signature = counting
    try:
        got = _labels(_run_ds(pairs, distributed=True, n_shards=4,
                              checkpoint_dir=ck))
    finally:
        dd._edge_signature = orig
    pd.testing.assert_frame_equal(want, got)
    # uncheckpointed from-scratch takes N rounds; the resume must take
    # strictly fewer signature calls than fingerprint + N
    fresh_rounds = []
    dd._edge_signature = lambda e: fresh_rounds.append(1) or orig(e)
    try:
        pd.testing.assert_frame_equal(
            want, _labels(_run_ds(pairs, distributed=True, n_shards=4)))
    finally:
        dd._edge_signature = orig
    assert len(resumed_rounds) < len(fresh_rounds) + 1

    # a different pair set must refuse the stale checkpoint
    other = _mixed_graph(seed=22)
    with pytest.raises(ValueError, match="DIFFERENT pair set"):
        _run_ds(other, distributed=True, n_shards=4, checkpoint_dir=ck)
