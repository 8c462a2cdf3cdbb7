"""HyperMinHash — cardinality + Jaccard in one HLL-sized sketch.

Behavioral contract from the vendored ``hmh.h`` (``hmh.h:273-360``) and
the public HyperMinHash paper (Yu & Weber, 2017): ``2^p`` registers of
16 bits, each packing ``(lzc << r) | rem`` where

* ``lzc``  = leading-zero count of the index-stripped first hash + 1
  (``hmh.h:343-346``: ``clz(((h1<<1)|1) << (p-1)) + 1`` — the HLL rank);
* ``rem``  = low ``r`` bits of an independent second hash (the MinHash
  fingerprint fraction);
* update keeps the elementwise MAX of encoded registers
  (``hmh.h:349-352``), so **merge = elementwise max** — exactly
  mergeable, same as HLL.

Estimators:

* cardinality (``hmh.h:365-397``): the MinHash-portion harmonic sum
  ``2^(2p) / Σ_i 2^(-lzc_i)·(2M − rem_i)/M`` (M = 2^r − 1), falling back
  to the HLL estimator over the lzc parts below the reference's
  ``1024·2^p`` threshold (we use the Ertl improved estimator where the
  reference uses Ertl MLE — same family);
* Jaccard (``hmh.h:507-518``): matched nonzero registers, minus the
  expected chance collisions. We use the paper's estimator
  ``J = (C − E[collisions]) / n_comparable`` with E computed numerically
  from the two cardinalities (register-rank distribution × uniform
  ``rem`` collision), rather than the reference's scaled-bias variant —
  a documented, simpler-to-verify choice from the same paper.

All operations are vectorized numpy; the two hashes are WangHash
chained (the engine's single hash family).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch
from ocm_ray.sketches.hll import HyperLogLog, _bit_length_u64

U64 = np.uint64
_H2SEED = 0x9E3779B97F4A7C15


@register_sketch
class HyperMinHash(MergeableSketch):
    kind = "hmh"

    def __init__(self, p: int = 14, r: int = 10, seedseed: int = 137):
        assert 2 <= p <= 32 and 1 <= r <= 10  # (6-bit lzc + r) fits uint16
        self.p = int(p)
        self.r = int(r)
        self.seedseed = int(seedseed)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint16)

    # ---- update ------------------------------------------------------------
    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        if items.size > 4096:          # duplicates cannot move a max
            items = np.unique(items)
        h1 = wanghash(items ^ U64(self.seedseed))
        h2 = wanghash(h1 ^ U64(_H2SEED))
        idx = (h1 >> U64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            v = ((h1 << U64(1)) | U64(1)) << U64(self.p - 1)
        lzc = (U64(65) - _bit_length_u64(v).astype(U64))  # clz + 1
        reg = ((lzc << U64(self.r))
               | (h2 & U64((1 << self.r) - 1))).astype(np.uint16)
        np.maximum.at(self.registers, idx, reg)

    # ---- cardinality -------------------------------------------------------
    def _lzc(self) -> np.ndarray:
        return (self.registers >> np.uint16(self.r)).astype(np.int64)

    def _mh_sum(self, regs: np.ndarray) -> float:
        lzc = (regs >> np.uint16(self.r)).astype(np.float64)
        rem = (regs & np.uint16((1 << self.r) - 1)).astype(np.float64)
        M = float((1 << self.r) - 1)
        return float(np.sum((2.0 * M - rem) / M * np.exp2(-lzc)))

    def _estimate_regs(self, regs: np.ndarray) -> float:
        s = self._mh_sum(regs)
        est = float(np.exp2(2 * self.p)) / s if s > 0 else 0.0
        if est < 1024.0 * self.m:      # hmh.h:365-369 small-range switch
            hl = HyperLogLog(self.p, self.seedseed)
            hl.registers = (regs >> np.uint16(self.r)).astype(np.uint8)
            est = hl.estimate()
        return est

    def estimate(self) -> float:
        return self._estimate_regs(self.registers)

    def union_size(self, other: "HyperMinHash") -> float:
        self._check(other)
        return self._estimate_regs(np.maximum(self.registers, other.registers))

    # ---- jaccard -----------------------------------------------------------
    def _expected_collisions(self, n: float, m: float) -> float:
        """Numeric expected chance register collisions between sketches
        of cardinalities n and m: per register, the rank distributions
        P(rank = k | λ items) collide with probability Σ p_k(λa)·p_k(λb),
        scaled by the uniform rem-collision probability 2^-r."""
        if n <= 0 or m <= 0:
            return 0.0
        la, lb = n / self.m, m / self.m
        ks = np.arange(0, 66 - self.p, dtype=np.float64)

        def pk(lam):
            # P(max rank ≤ k) over Poisson(lam) items ≈ exp(-lam·2^-k)
            F = np.exp(-lam * np.exp2(-ks))
            return np.diff(np.concatenate([[0.0], F]))

        coll = float((pk(la)[1:] * pk(lb)[1:]).sum())  # rank ≥ 1 both sides
        return self.m * coll * float(np.exp2(-self.r))

    def jaccard_index(self, other: "HyperMinHash") -> float:
        self._check(other)
        a, b = self.registers, other.registers
        nz = (a > 0) | (b > 0)
        nc = int(nz.sum())
        if nc == 0:
            return 0.0
        cc = int(((a == b) & (a > 0)).sum())
        ec = self._expected_collisions(self.estimate(), other.estimate())
        return max(0.0, (cc - ec) / nc)

    def intersection_size(self, other: "HyperMinHash") -> float:
        return self.jaccard_index(other) * self.union_size(other)

    # ---- merge / io --------------------------------------------------------
    def _check(self, other: "HyperMinHash") -> None:
        assert (self.p, self.r, self.seedseed) == \
               (other.p, other.r, other.seedseed), "geometry mismatch"

    def merge(self, other: "HyperMinHash") -> "HyperMinHash":
        self._check(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, r=self.r, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"registers": self.registers}
