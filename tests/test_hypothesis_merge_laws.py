"""Hypothesis property tests for the north-rule merge laws: for random
streams and random partitionings, order-free sketches are bit-identical
to the unpartitioned build, and merges are associative/commutative."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocm_ray.sketches import (BloomFilter, CountMin, HyperLogLog, SetSketch,
                              merge_all)

streams = st.lists(st.integers(min_value=0, max_value=2**40), min_size=0,
                   max_size=400)


def _build(factory, parts):
    out = []
    for p in parts:
        s = factory()
        s.update(np.array(p, dtype=np.uint64))
        out.append(s)
    return out


def _split(xs, cuts):
    idx = sorted(set(min(c, len(xs)) for c in cuts))
    parts, prev = [], 0
    for c in idx + [len(xs)]:
        parts.append(xs[prev:c])
        prev = c
    return parts


@settings(max_examples=40, deadline=None)
@given(streams, st.lists(st.integers(0, 400), max_size=5))
def test_partition_invariance_order_free(xs, cuts):
    parts = _split(xs, cuts)
    from ocm_ray.sketches import CountingBottomKMinHash

    # (ProbMinHash is deliberately absent: its draws are keyed by an
    # element's TOTAL weight, so unit-weight occurrence streams are not
    # partition-splittable; its merge law over disjoint nonzeros is
    # pinned in test_round4.py instead.)
    for factory, state in [
        (lambda: CountMin(8, 3), "core"),
        (lambda: HyperLogLog(6), "registers"),
        (lambda: BloomFilter(10, 3), "words"),
        (lambda: SetSketch.byte(16), "core"),
        (lambda: CountingBottomKMinHash(8), "counts"),
        (lambda: CountingBottomKMinHash(8), "values"),
    ]:
        whole = factory()
        whole.update(np.array(xs, dtype=np.uint64))
        merged = merge_all(_build(factory, parts))
        assert np.array_equal(getattr(whole, state), getattr(merged, state))


@settings(max_examples=25, deadline=None)
@given(streams, streams, streams)
def test_merge_associative_commutative(a, b, c):
    factory = lambda: CountMin(8, 3, conservative=True)

    def m(*orders):
        sks = _build(factory, orders)
        acc = sks[0]
        for s in sks[1:]:
            acc.merge(s)
        return acc.core

    left = m(a, b, c)
    # associativity
    sks = _build(factory, [a, b, c])
    right = sks[0].merge(sks[1].merge(sks[2])).core
    assert np.array_equal(left, right)
    # commutativity
    assert np.array_equal(left, m(c, a, b))


@settings(max_examples=40, deadline=None)
@given(streams)
def test_conservative_one_sided_always(xs):
    s = CountMin(6, 3, conservative=True)
    arr = np.array(xs, dtype=np.uint64)
    s.update(arr)
    if len(arr):
        uniq, cnt = np.unique(arr, return_counts=True)
        assert (s.estimate(uniq) >= cnt).all()
