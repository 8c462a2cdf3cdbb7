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


def test_cm_intersection_vs_exact_sets():
    """operator&= semantics (ccm.h:393-400): common items keep ≥ min of
    their per-stream counts; exclusive items mostly vanish."""
    from ocm_ray.sketches import CountMin

    rng = np.random.default_rng(2)
    a_items = np.arange(0, 3000, dtype=np.uint64)          # [0, 3000)
    b_items = np.arange(2000, 5000, dtype=np.uint64)       # [2000, 5000)
    ca = rng.integers(1, 50, len(a_items))
    cb = rng.integers(1, 50, len(b_items))
    sa, sb = CountMin(16, 5), CountMin(16, 5)
    sa.update(a_items, ca)
    sb.update(b_items, cb)
    inter = sa.intersect(sb)  # in-place on sa
    common = np.arange(2000, 3000, dtype=np.uint64)
    true_min = np.minimum(ca[2000:], cb[:1000])
    assert (inter.estimate(common) >= true_min).all()
    only_a = np.arange(0, 2000, dtype=np.uint64)
    assert (inter.estimate(only_a) == 0).mean() > 0.9


def test_countmin_pow2_morris_semantics():
    """PowerOfTwo updater (update.h:35-84): est = 2^(v-1); combine law
    max+(equal); empty cells stay empty through merges; estimates track
    truth within Morris-counter tolerance."""
    from ocm_ray.sketches import MergeableSketch, merge_all
    from ocm_ray.sketches.countmin import CountMinPow2

    items = np.arange(64, dtype=np.uint64)
    true_n = 4096
    sk = CountMinPow2(16, 5)
    for _ in range(4):
        sk.update(items, np.full(len(items), true_n // 4))
    est = sk.estimate(items).astype(np.float64)
    # the reference's est_count(v)=2^(v-1) with increment prob 2^-v gives
    # E[2^v] ≈ n, i.e. E[est] ≈ n/2 (verified against a per-occurrence
    # simulation of update.h's exact rule); Morris spread is ~one octave
    assert (est >= true_n / 16).all() and (est <= true_n * 4).all()
    assert 0.25 * true_n < est.mean() < 1.0 * true_n

    # distributed build via combine merge
    parts = []
    for _ in range(4):
        p = CountMinPow2(16, 5)
        p.update(items, np.full(len(items), true_n // 4))
        parts.append(p)
    merged = merge_all(parts)
    est_m = merged.estimate(items).astype(np.float64)
    # combine = max+(equal) is the reference's own crude merge ("Not
    # rigorous", update.h:76) — it under-adds relative to a true sum;
    # assert order-of-magnitude sanity only
    assert 0.0625 * true_n <= est_m.mean() < 2.0 * true_n
    # untouched keys estimate 0 (empty cells merged to 0, not 1)
    absent = np.arange(10**6, 10**6 + 1000, dtype=np.uint64)
    assert (merged.estimate(absent) == 0).mean() > 0.95
    back = MergeableSketch.from_bytes(merged.to_bytes())
    assert (back.estimate(items) == merged.estimate(items)).all()
