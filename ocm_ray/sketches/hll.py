"""HyperLogLog — mergeable cardinality sketch.

Behavioral contract from the reference's vendored ``hll.h`` (SURVEY §2.3):
``m = 2^p`` uint8 registers; ``add``: register index = top ``p`` bits of the
64-bit hash, register value = (number of leading zeros of the remaining
``64-p`` bits) + 1, kept as a running max (``hll.h:827-840``); ``addh``
hashes through WangHash first (``hll.h:842-845``); **merge = element-wise
max** (``hll.h:957-985``); relative error ``1.03896/√m`` (``hll.h:737-739``).

Estimators (``hll.h:60-64`` enumerates ORIGINAL / ERTL_IMPROVED /
ERTL_MLE; the vendored default is the Ertl family, ``hll.h:203``):

* ``"ertl_improved"`` (default) — Ertl's improved raw estimator (public
  algorithm: Ertl, "New cardinality estimation algorithms for
  HyperLogLog sketches", 2017, §5): bias-free across the whole range via
  the ``sigma``/``tau`` corrections on the register histogram — no
  hard-switched linear-counting / large-range patches.
* ``"original"`` — the classic Flajolet-Fuss-Gandouet-Meunier estimator
  with linear-counting small-range correction, kept behind a flag for
  comparison (carries the classic mid-range bias every modern HLL
  removed).

``update`` is fully vectorized (numpy); exact integer bit-length is
computed via 32-bit log2 halves (float64 log2 is exact for ints < 2^53).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 → 0)."""
    hi = (x >> U64(32)).astype(np.float64)
    lo = (x & U64(0xFFFFFFFF)).astype(np.float64)
    out = np.zeros(x.shape, dtype=np.int64)
    m_hi = hi > 0
    with np.errstate(divide="ignore"):
        out[m_hi] = 32 + np.floor(np.log2(hi[m_hi])).astype(np.int64) + 1
        m_lo = (~m_hi) & (lo > 0)
        out[m_lo] = np.floor(np.log2(lo[m_lo])).astype(np.int64) + 1
    return out


def _ertl_sigma(x: float) -> float:
    """Ertl 2017 Alg. 5: sigma(x) = x + sum_{k≥1} x^(2^k) · 2^(k-1)."""
    if x == 1.0:
        return float("inf")
    y, z = 1.0, x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _ertl_tau(x: float) -> float:
    """Ertl 2017 Alg. 6: tau(x) = (1/3)·(1 − x − sum corrections)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y, z = 1.0, 1.0 - x
    while True:
        x = np.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


@register_sketch
class HyperLogLog(MergeableSketch):
    kind = "hll"

    def __init__(self, p: int = 14, seedseed: int = 137, prehashed: bool = False,
                 estimator: str = "ertl_improved"):
        assert estimator in ("ertl_improved", "original")
        self.p = int(p)
        self.seedseed = int(seedseed)
        self.prehashed = bool(prehashed)
        self.estimator = estimator
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # ---- update ------------------------------------------------------------
    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        # counts are irrelevant for cardinality — duplicates are free.
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        # duplicates can't change a max-register — dedupe before hashing
        # (Zipf batches shrink ~30x; unique-sort is cheaper than the hash)
        if items.size > 4096:
            items = np.unique(items)
        h = items if self.prehashed else wanghash(items ^ U64(self.seedseed))
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        rest = h << U64(self.p)  # top 64-p bits of the remainder, left-aligned
        rank = (64 - _bit_length_u64(rest >> U64(self.p)) - self.p + 1).astype(np.uint8)
        # rest>>p == low 64-p bits; leading zeros within that field + 1
        np.maximum.at(self.registers, idx, rank)

    # ---- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        if self.estimator == "ertl_improved":
            return self._estimate_ertl()
        return self._estimate_original()

    def _estimate_ertl(self) -> float:
        """Ertl 2017 §5 improved raw estimator over the register
        histogram C[0..q+1] (q = 64 − p): unbiased across the whole
        range, no switched corrections."""
        q = 64 - self.p
        m = float(self.m)
        C = np.bincount(self.registers, minlength=q + 2).astype(np.float64)
        z = m * _ertl_tau(1.0 - C[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + C[k])
        z += m * _ertl_sigma(C[0] / m)
        if z == 0 or not np.isfinite(z):
            return 0.0
        alpha_inf = 1.0 / (2.0 * np.log(2.0))
        return float(alpha_inf * m * m / z)

    def _estimate_original(self) -> float:
        regs = self.registers.astype(np.float64)
        m = float(self.m)
        if self.p >= 7:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        else:
            alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(self.p, 0.7213 / (1 + 1.079 / m))
        e = alpha * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        elif e > (1 / 30.0) * 2**64:
            e = -(2**64) * np.log(1.0 - e / 2**64)
        return float(e)

    def relative_error(self) -> float:
        return 1.03896 / np.sqrt(self.m)

    # ---- set algebra (``hll.h:1124-1160``) ---------------------------------
    def union_size(self, other: "HyperLogLog") -> float:
        u = self.empty_like()
        np.maximum(self.registers, other.registers, out=u.registers)
        return u.estimate()

    def jaccard_index(self, other: "HyperLogLog") -> float:
        us = self.union_size(other)
        if us <= 0:
            return 0.0
        inter = self.estimate() + other.estimate() - us
        return max(0.0, inter / us)

    # ---- merge / io --------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p and self.seedseed == other.seedseed \
            and self.prehashed == other.prehashed, "geometry mismatch"
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def compress(self, new_p: int) -> "HyperLogLog":
        """Fold registers down to a smaller precision (``hll.h:902-910``),
        adjusting for the ``d = p - new_p`` index bits that move into the
        rank field: an old register at index ``i = (j << d) | t`` with
        value ``r`` contributes new-rank ``d + r`` when ``t == 0`` (the
        moved bits are all zero, so the old leading-zero run extends) and
        ``d - bit_length(t) + 1`` otherwise (the run stops inside the
        moved bits — independent of ``r``). This makes the fold
        REGISTER-EXACT vs a natively built ``new_p`` sketch over the same
        items, hence a valid merge target for mixed-precision unions."""
        assert new_p <= self.p
        out = HyperLogLog(new_p, self.seedseed, self.prehashed,
                          self.estimator)
        d = self.p - new_p
        if d == 0:
            out.registers = self.registers.copy()
            return out
        regs = self.registers.reshape(1 << new_p, 1 << d)
        set_mask = regs > 0
        t = np.arange(1, 1 << d, dtype=np.int64)
        tb = np.floor(np.log2(t)).astype(np.int64) + 1  # bit_length(t)
        cand = np.zeros(regs.shape, dtype=np.int64)
        cand[:, 0] = np.where(set_mask[:, 0],
                              regs[:, 0].astype(np.int64) + d, 0)
        cand[:, 1:] = np.where(set_mask[:, 1:], (d - tb + 1)[None, :], 0)
        out.registers = cand.max(axis=1).astype(np.uint8)
        return out

    def _params(self) -> Dict:
        return dict(p=self.p, seedseed=self.seedseed, prehashed=self.prehashed,
                    estimator=self.estimator)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"registers": self.registers}


@register_sketch
class SparseHLL(MergeableSketch):
    """Sparse-register HLL (the vendored ``sparse.h`` ``SparseHLL`` /
    ``SparseHLL32`` contract): registers stored as sorted encoded pairs
    ``(index << 6) | value`` (``sparse.h:19-27`` — value in the low
    SHIFT=6 bits, so a plain max over an index's encodings IS the
    register max), not a dense ``2^p`` byte array. The representation
    for SMALL sets — per-key sketches over millions of keys are mostly
    tiny, and 9-ish bytes per NONZERO register beats ``m`` bytes per
    key until ~m/8 registers are hit (the caller densifies past that,
    as in the reference, which keeps SparseHLL a query/conversion-time
    object: ``sparse.h``'s constructor takes a dense ``hll_t``).

    Index/rank math is shared verbatim with :class:`HyperLogLog`
    (same hash, same bit split), so ``to_dense()`` is REGISTER-EXACT
    against a dense sketch fed the same items — tested. Merge =
    keep-max per index over the union of pair lists (associative /
    commutative / idempotent like the dense max-merge)."""

    kind = "sparse_hll"
    SHIFT = np.uint64(6)   # sparse.h:19 — low 6 bits carry the value

    def __init__(self, p: int = 14, seedseed: int = 137,
                 prehashed: bool = False,
                 estimator: str = "ertl_improved"):
        # rank reaches 64 - p + 1 and must fit the low SHIFT=6 bits of
        # the encoding (sparse.h's max_p contract) — p < 2 would let the
        # value overflow into the index bits and silently corrupt state
        if int(p) < 2:
            raise ValueError(f"SparseHLL needs p >= 2 (got {p}): "
                             "rank 64-p+1 must fit 6 bits")
        self.p = int(p)
        self.seedseed = int(seedseed)
        self.prehashed = bool(prehashed)
        self.estimator = estimator
        self.m = 1 << self.p
        self.encoded = np.empty(0, dtype=np.uint64)  # sorted, unique idx

    # ---- update ------------------------------------------------------------
    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        if items.size > 4096:
            items = np.unique(items)
        h = items if self.prehashed else wanghash(items ^ U64(self.seedseed))
        idx = h >> U64(64 - self.p)
        rest = h << U64(self.p)
        rank = (64 - _bit_length_u64(rest >> U64(self.p))
                - self.p + 1).astype(np.uint64)
        enc = (idx << self.SHIFT) | rank
        self._absorb(enc)

    def _absorb(self, enc: np.ndarray) -> None:
        """Fold encoded pairs into the sorted-unique state: one sort,
        keep the max encoding per index (== max value, by layout)."""
        both = np.sort(np.concatenate([self.encoded, enc]))
        idx = both >> self.SHIFT
        last = np.concatenate([idx[1:] != idx[:-1], [True]])
        self.encoded = both[last]

    # ---- conversions / estimate ---------------------------------------------
    def to_dense(self) -> HyperLogLog:
        """Scatter the pairs into a dense sketch (``sparse.h``'s
        conversion direction inverted); register-exact vs a dense HLL
        fed the same stream."""
        out = HyperLogLog(self.p, self.seedseed, self.prehashed,
                          self.estimator)
        if len(self.encoded):
            out.registers[(self.encoded >> self.SHIFT).astype(np.int64)] = \
                (self.encoded & ((U64(1) << self.SHIFT) - U64(1))).astype(np.uint8)
        return out

    def estimate(self) -> float:
        return self.to_dense().estimate()

    def n_registers_set(self) -> int:
        return int(len(self.encoded))

    # ---- set algebra (sparse.h jaccard/union vs dense or sparse) -----------
    def union_size(self, other) -> float:
        o = other.to_dense() if isinstance(other, SparseHLL) else other
        return self.to_dense().union_size(o)

    def jaccard_index(self, other) -> float:
        o = other.to_dense() if isinstance(other, SparseHLL) else other
        return self.to_dense().jaccard_index(o)

    # ---- merge / io ---------------------------------------------------------
    def merge(self, other: "SparseHLL") -> "SparseHLL":
        assert self.p == other.p and self.seedseed == other.seedseed \
            and self.prehashed == other.prehashed, "geometry mismatch"
        self._absorb(other.encoded)
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, seedseed=self.seedseed,
                    prehashed=self.prehashed, estimator=self.estimator)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"encoded": self.encoded}
