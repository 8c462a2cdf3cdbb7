"""Property-based tests for the MergeableSketch contract (SURVEY §5.4 item 2,
north-rule requirement: merge(merge(a,b),c) == merge(a,merge(b,c)))."""

import numpy as np
import pytest

from ocm_ray.sketches.base import MergeableSketch, merge_all
from ocm_ray.sketches.countmin import CountMin, OfflineCountMin


def _zipf_stream(n=20000, vocab=2000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=vocab).astype(np.uint64)


def _state_equal(a, b):
    aa, bb = a._arrays(), b._arrays()
    return all(np.array_equal(aa[k], bb[k]) for k in aa)


FACTORIES = [
    lambda: CountMin(10, 3, 137, conservative=False),
    lambda: CountMin(10, 3, 137, conservative=True),
    lambda: OfflineCountMin(10, 3, 137),
    lambda: OfflineCountMin(10, 3, 137, conservative=True),
]


@pytest.mark.parametrize("factory", FACTORIES)
def test_merge_associative_commutative(factory):
    stream = _zipf_stream()
    chunks = np.array_split(stream, 3)
    sks = []
    for c in chunks:
        s = factory()
        s.update(c)
        sks.append(s)

    def build(order):
        fresh = []
        for c in chunks:
            s = factory()
            s.update(c)
            fresh.append(s)
        a, b, c = (fresh[i] for i in order)
        return a.merge(b).merge(c)

    left = build((0, 1, 2))
    # associativity: a+(b+c)
    fresh = []
    for c in chunks:
        s = factory()
        s.update(c)
        fresh.append(s)
    right = fresh[0].merge(fresh[1].merge(fresh[2]))
    assert _state_equal(left, right)
    # commutativity
    assert _state_equal(left, build((2, 0, 1)))
    # identity
    ident = factory()
    assert _state_equal(left, build((0, 1, 2)).merge(ident))


@pytest.mark.parametrize("factory", FACTORIES)
def test_serialization_roundtrip(factory):
    s = factory()
    s.update(_zipf_stream(5000))
    blob = s.to_bytes()
    s2 = MergeableSketch.from_bytes(blob)
    assert type(s2) is type(s)
    assert _state_equal(s, s2)
    assert s2._params() == s._params()


@pytest.mark.parametrize("factory", FACTORIES)
def test_preaggregated_update_equivalent(factory):
    """update(items) == update(unique, counts) — the in-batch combiner
    cannot change any sketch's state."""
    stream = _zipf_stream(8000, seed=11)
    a = factory()
    a.update(stream)
    uniq, cnt = np.unique(stream, return_counts=True)
    b = factory()
    b.update(uniq.astype(np.uint64), cnt)
    assert _state_equal(a, b)


def test_one_sided_error_any_partitioning():
    stream = _zipf_stream(50000, vocab=5000, seed=3)
    uniq, cnt = np.unique(stream, return_counts=True)
    for nparts in (1, 2, 8, 64):
        merged = merge_all(
            [_upd(CountMin(10, 3, 137, conservative=True), p)
             for p in np.array_split(stream, nparts)]
        )
        est = merged.estimate(uniq)
        assert (est >= cnt).all()


def test_epsilon_bound_vanilla():
    """err ≤ εN for ≥ (1−δ) of queries, ε=e/w, δ=e^−nh (Cormode-Muthukrishnan)."""
    stream = _zipf_stream(100000, vocab=20000, seed=5)
    s = CountMin(12, 5, 137)
    s.update(stream)
    uniq, cnt = np.unique(stream, return_counts=True)
    err = s.estimate(uniq) - cnt
    n = s.total_items
    eps, delta = s.epsilon(), np.exp(-s.nh)
    assert (err >= 0).all()
    assert (err > eps * n).mean() <= max(delta, 0.01)


def _upd(s, items):
    s.update(items)
    return s
