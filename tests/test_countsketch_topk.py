"""CountSketch (unbiased two-sided) and TopK (Misra-Gries) tests."""

import numpy as np
import pytest

from ocm_ray.sketches import CountSketch, MergeableSketch, TopK, merge_all


def _zipf(n=200_000, vocab=20_000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=vocab).astype(np.uint64)


def test_countsketch_unbiased_two_sided():
    stream = _zipf()
    uniq, cnt = np.unique(stream, return_counts=True)
    cs = CountSketch(14, 5)
    cs.update(stream)
    est = cs.estimate(uniq)
    err = est - cnt
    # two-sided: errors on both sides, near-zero mean (unbiased)
    assert (err > 0).any() and (err < 0).any()
    assert abs(err.mean()) < 2.0
    # heavy hitters recovered accurately
    heavy = cnt >= 1000
    assert np.abs(err[heavy]).max() < 0.02 * cnt[heavy].min() + 50


def test_countsketch_merge_partition_invariant():
    stream = _zipf(50_000)
    merged = merge_all([_upd(CountSketch(12, 3), p)
                        for p in np.array_split(stream, 8)])
    whole = CountSketch(12, 3)
    whole.update(stream)
    assert np.array_equal(merged.core, whole.core)


def test_countsketch_roundtrip():
    cs = CountSketch(10, 3)
    cs.update(_zipf(10_000))
    cs2 = MergeableSketch.from_bytes(cs.to_bytes())
    assert np.array_equal(cs.core, cs2.core)


def _upd(s, items):
    s.update(items)
    return s


def test_topk_finds_heavy_hitters():
    stream = _zipf(500_000, vocab=100_000)
    uniq, cnt = np.unique(stream, return_counts=True)
    order = np.argsort(-cnt)
    true_top10 = set(uniq[order[:10]].tolist())
    tk = TopK(256)
    for p in np.array_split(stream, 16):
        tk.update(p)
    keys, counts = tk.top(50)
    assert true_top10 <= set(keys.tolist())
    # MG bounds: count ≤ true ≤ count + err
    true_map = dict(zip(uniq.tolist(), cnt.tolist()))
    err = int(tk.err[0])
    for k, c in zip(keys.tolist(), counts.tolist()):
        t = true_map[k]
        assert c <= t <= c + err, (k, c, t, err)
    assert err <= len(stream) // 256


def test_topk_merge():
    stream = _zipf(200_000, vocab=50_000, seed=9)
    parts = np.array_split(stream, 4)
    merged = merge_all([_upd(TopK(512), p) for p in parts])
    uniq, cnt = np.unique(stream, return_counts=True)
    top5 = set(uniq[np.argsort(-cnt)[:5]].tolist())
    keys, _ = merged.top(20)
    assert top5 <= set(keys.tolist())
    # merged error ≤ sum of part errors ≤ N/capacity summed
    assert int(merged.err[0]) <= len(stream) // 512 * 4 + 4
    s2 = MergeableSketch.from_bytes(merged.to_bytes())
    assert np.array_equal(merged.keys, s2.keys)


def test_mulmod61_matches_python_ints():
    from ocm_ray.sketches.countsketch import _P61, _mulmod61

    rng = np.random.default_rng(0)
    p = int(_P61)
    a = rng.integers(0, p, 2000, dtype=np.uint64)
    x = rng.integers(0, p, 2000, dtype=np.uint64)
    got = _mulmod61(a, x)
    expect = np.array([(int(ai) * int(xi)) % p for ai, xi in zip(a, x)],
                      dtype=np.uint64)
    assert (got == expect).all()


def test_countsketch4w_estimate_merge_subtract():
    from ocm_ray.sketches import CountSketch4W, MergeableSketch, merge_all

    rng = np.random.default_rng(1)
    items = rng.integers(0, 1 << 40, 3000, dtype=np.uint64)
    counts = rng.integers(1, 200, 3000)
    sk = CountSketch4W(16, 7)
    sk.update(items, counts)
    est = sk.estimate(items)
    # two-sided unbiased: mean abs error small vs epsilon·L2 scale
    err = np.abs(est - counts)
    assert np.median(err) <= 2
    assert (err < counts.max()).all()

    # merge = concat of streams
    parts = []
    for lo in range(0, 3000, 750):
        p = CountSketch4W(16, 7)
        p.update(items[lo:lo + 750], counts[lo:lo + 750])
        parts.append(p)
    merged = merge_all(parts)
    assert np.array_equal(merged.core, sk.core)

    # linear deletion: removing a slice recovers the complement sketch
    sk2 = CountSketch4W(16, 7)
    sk2.update(items, counts)
    sk2.subtract_items(items[:1000], counts[:1000])
    only_rest = CountSketch4W(16, 7)
    only_rest.update(items[1000:], counts[1000:])
    assert np.array_equal(sk2.core, only_rest.core)

    back = MergeableSketch.from_bytes(sk.to_bytes())
    assert np.array_equal(back.estimate(items[:50]), sk.estimate(items[:50]))


def test_countsketch4w_l2_and_dot():
    from ocm_ray.sketches import CountSketch4W

    rng = np.random.default_rng(2)
    n = 5000
    items = np.arange(n, dtype=np.uint64)
    ca = rng.integers(1, 100, n)
    cb = rng.integers(1, 100, n)
    a, b = CountSketch4W(16, 7), CountSketch4W(16, 7)
    a.update(items, ca)
    b.update(items, cb)
    true_l2 = float(np.sqrt((ca.astype(np.float64) ** 2).sum()))
    assert abs(a.l2est() - true_l2) / true_l2 < 0.05
    true_dot = float((ca.astype(np.float64) * cb).sum())
    assert abs(a.dot_product(b) - true_dot) / true_dot < 0.05
