"""HyperBitBit (hbb.h) + PStableSketcher (rnla.h:341-463) — the last two
vendored sketch rows without an implementation.

HyperBitBit is order-dependent (no associative merge), so parity is
against its own sequential reference kernel plus estimate-quality and
ordered-stream checks. The p-stable sketch is LINEAR, so merge laws are
exact equalities.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


# --------------------------------------------------------------- HyperBitBit

def test_hbb_vectorized_matches_sequential_bit_exact():
    """The epoch-loop batch kernel must reproduce the item-at-a-time
    hbb.h:28-38 transition exactly — including mid-batch rollovers —
    at every batch split."""
    from ocm_ray.sketches.hbb import HyperBitBit

    rng = np.random.default_rng(11)
    items = rng.integers(0, 500_000, size=120_000, dtype=np.uint64)

    ref = HyperBitBit()
    ref.update_sequential(items)
    assert ref.logn > 5  # the stream is large enough to roll over

    for nsplit in (1, 3, 17):
        hb = HyperBitBit()
        for chunk in np.array_split(items, nsplit):
            hb.update(chunk)
        assert (hb.logn, hb.s1, hb.s2) == (ref.logn, ref.s1, ref.s2)


def test_hbb_estimate_tracks_cardinality():
    """hbb.h:41-44 estimator: 2^(logn + 5.8 + popcount(s1)/32). The
    sketch is 17 bytes, so only coarse accuracy is promised — assert
    within 2x at three decades (deterministic: fixed seed/codec)."""
    from ocm_ray.sketches.hbb import HyperBitBit

    for true_n in (10_000, 100_000, 1_000_000):
        hb = HyperBitBit()
        hb.update(np.arange(true_n, dtype=np.uint64))
        est = hb.estimate()
        assert true_n / 2 <= est <= true_n * 2, (true_n, est)


def test_hbb_duplicate_drift_is_bounded_and_converges():
    """Re-seen items after a rollover re-OR bits into the new s1 (true
    of hbb.h too — the state is order-dependent), so duplicates drift
    the estimate, but boundedly: once no item's rank clears the final
    logn threshold anew, repetition is a fixed point."""
    from ocm_ray.sketches.hbb import HyperBitBit

    distinct = np.arange(50_000, dtype=np.uint64)
    once = HyperBitBit()
    once.update(distinct)
    thrice = HyperBitBit()
    thrice.update(np.concatenate([distinct] * 3))
    assert thrice.estimate() <= 2 * once.estimate()
    ten = HyperBitBit()
    ten.update(np.concatenate([distinct] * 10))
    assert (ten.logn, ten.s1, ten.s2) == (thrice.logn, thrice.s1, thrice.s2)


def test_hbb_save_load_and_dataset_stream(tmp_path):
    import ray.data

    from ocm_ray.sketches.hbb import HyperBitBit, hyperbitbit_estimate

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 80_000, size=60_000, dtype=np.uint64)
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"user": vals.astype(np.int64)}))
    hb = hyperbitbit_estimate(ds, "user")

    direct = HyperBitBit()
    # dataset block order == insertion order for a single from_arrow block
    direct.update(vals)
    assert (hb.logn, hb.s1, hb.s2) == (direct.logn, direct.s1, direct.s2)

    p = tmp_path / "hbb.npz"
    hb.save(str(p))
    back = HyperBitBit.load(str(p))
    assert (back.logn, back.s1, back.s2) == (hb.logn, hb.s1, hb.s2)
    assert back.estimate() == hb.estimate()


# ----------------------------------------------------------- PStableSketcher

def test_pstable_linear_merge_exact():
    """rnla.h:389-410: += / -= are cell-wise on same-seed sketches —
    compress(a + b) must equal compress(a) + compress(b) exactly."""
    from ocm_ray.sketches.rnla import pstable_compress

    rng = np.random.default_rng(3)
    a = rng.normal(size=4000)
    b = rng.normal(size=4000)
    sa = pstable_compress(a, destdim=8, ntables=7)
    sb = pstable_compress(b, destdim=8, ntables=7)
    sab = pstable_compress(a + b, destdim=8, ntables=7)
    np.testing.assert_allclose(sa + sb, sab, rtol=1e-9, atol=1e-9)
    # associativity of the merge is addition's
    np.testing.assert_allclose((sa + sb) + sab, sa + (sb + sab))


def test_pstable_l1_norm_estimate_destdim1():
    """With destdim=1 each row is exactly Cauchy(||x||_1), so the median
    over tables recovers the L1 norm (median |Cauchy| = 1). Deterministic
    draws -> a fixed tolerance is a real assertion, not flake control."""
    from ocm_ray.sketches.rnla import pstable_compress, pstable_norm

    rng = np.random.default_rng(9)
    for seed in (137, 777):
        x = rng.normal(size=20_000) * rng.integers(1, 5, size=20_000)
        sk = pstable_compress(x, destdim=1, ntables=65, seedseed=seed)
        est = pstable_norm(sk)
        true = float(np.abs(x).sum())
        assert 0.6 * true <= est <= 1.6 * true, (seed, est, true)


def test_pstable_difference_estimates_l1_distance():
    """Linearity + 1-stability: the sketch of (a - b) is the difference
    of sketches, and its norm estimates ||a - b||_1 — near pairs must
    score far below distant pairs."""
    from ocm_ray.sketches.rnla import pstable_compress, pstable_norm

    rng = np.random.default_rng(21)
    base = rng.normal(size=10_000)
    near = base + rng.normal(scale=0.01, size=10_000)
    far = rng.normal(size=10_000)
    sk = {k: pstable_compress(v, destdim=1, ntables=33)
          for k, v in (("base", base), ("near", near), ("far", far))}
    d_near = pstable_norm(sk["base"] - sk["near"])
    d_far = pstable_norm(sk["base"] - sk["far"])
    assert d_near < d_far / 10
    true_near = float(np.abs(base - near).sum())
    assert 0.5 * true_near <= d_near <= 2.0 * true_near


def test_pstable_union_size_and_geometry_guard():
    from ocm_ray.sketches.rnla import (pstable_compress, pstable_norm,
                                       pstable_union_size)

    rng = np.random.default_rng(4)
    a = np.abs(rng.normal(size=5000))
    b = np.abs(rng.normal(size=5000))
    sa = pstable_compress(a, destdim=1, ntables=33)
    sb = pstable_compress(b, destdim=1, ntables=33)
    # union of two non-negative streams: norm of the sum
    est = pstable_union_size(sa, sb)
    assert est == pstable_norm(sa + sb)
    true = float(np.abs(a + b).sum())
    assert 0.6 * true <= est <= 1.6 * true
    with pytest.raises(ValueError, match="geometry"):
        pstable_union_size(sa, pstable_compress(a, destdim=2, ntables=33))


def test_pstable_draws_are_thresholded_and_deterministic():
    """The thresholded-Cauchy redraw (rnla.h:30-35) must cap |coef| at
    absmax, and the whole transform must be a pure function of
    (seedseed, geometry)."""
    from ocm_ray.core.hashing import derive_seeds
    from ocm_ray.sketches.rnla import _cauchy_cells, pstable_compress

    cell, c = _cauchy_cells(0, 200_000, derive_seeds(3, 137), 16, 50.0)
    assert np.abs(c).max() <= 50.0
    assert cell.min() >= 0 and cell.max() < 16
    x = np.ones(512)
    np.testing.assert_array_equal(pstable_compress(x, 4, 5),
                                  pstable_compress(x, 4, 5))


# ------------------------------------------------------------------ SparseHLL

def test_sparse_hll_register_exact_vs_dense():
    """sparse.h contract: the sparse pair list scattered dense must be
    BIT-IDENTICAL to a dense HLL fed the same stream (same hash, same
    index/rank split), at any batch split, and the merge law holds."""
    from ocm_ray.sketches.hll import HyperLogLog, SparseHLL

    rng = np.random.default_rng(17)
    # small distinct set (the sparse regime): ~500 of m=16384 registers
    items = rng.integers(0, 500, size=3000, dtype=np.uint64)

    dense = HyperLogLog(p=14)
    dense.update(items)
    for nsplit in (1, 4):
        sp = SparseHLL(p=14)
        for chunk in np.array_split(items, nsplit):
            sp.update(chunk)
        np.testing.assert_array_equal(sp.to_dense().registers,
                                      dense.registers)
        assert sp.estimate() == dense.estimate()

    # merge(a, b) == sketch(a + b), and the sparse state stays compact
    a, b = items[:1500], items[1500:]
    sa, sb = SparseHLL(p=14), SparseHLL(p=14)
    sa.update(a)
    sb.update(b)
    sa.merge(sb)
    np.testing.assert_array_equal(sa.to_dense().registers, dense.registers)
    assert sa.n_registers_set() <= 500
    assert sa.nbytes < dense.registers.nbytes  # the point of sparse

    # sparse.h max_p contract: rank 64-p+1 must fit the 6 value bits,
    # so p < 2 (rank up to 63+1) would overflow into the index bits —
    # refused at construction rather than silently corrupting
    import pytest

    with pytest.raises(ValueError, match="p >= 2"):
        SparseHLL(p=1)
    SparseHLL(p=2)  # boundary is legal

    # mixed algebra vs a dense sketch + roundtrip
    from ocm_ray.sketches.base import MergeableSketch

    assert sa.jaccard_index(dense) == 1.0 or \
        abs(sa.jaccard_index(dense) - 1.0) < 1e-9
    back = MergeableSketch.from_bytes(sa.to_bytes())
    np.testing.assert_array_equal(back.encoded, sa.encoded)


def test_sparse_hll_in_grouped_build():
    """Per-key sparse sketches through the registry build path — the
    use case sparse registers exist for."""
    import pyarrow as pa
    import ray.data

    from ocm_ray.engine.build import grouped_sketches
    from ocm_ray.sketches.hll import HyperLogLog, SparseHLL

    rng = np.random.default_rng(23)
    n = 20_000
    tbl = pa.table({
        "source": [f"s{i % 40}" for i in range(n)],
        "token": rng.integers(0, 500, n),
    })
    ds = ray.data.from_arrow(tbl).repartition(6)
    per_key = grouped_sketches(ds, "source", lambda: SparseHLL(p=12),
                               column="token")
    dense_per_key = grouped_sketches(ds, "source",
                                     lambda: HyperLogLog(p=12),
                                     column="token")
    assert set(per_key) == set(dense_per_key) and len(per_key) == 40
    for k, sp in per_key.items():
        np.testing.assert_array_equal(sp.to_dense().registers,
                                      dense_per_key[k].registers)
