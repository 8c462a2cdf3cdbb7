"""B-bit one-permutation MinHash (the vendored ``bbmh.h``
``BBitMinHasher`` contract; public algorithms: Li & König 2010 b-bit
minwise hashing, Li-Owen-Zhang one-permutation hashing).

``2^p`` buckets partition one hash permutation; each bucket keeps the
MINIMUM remaining-bit hash of the items routed to it ⇒ **merge =
elementwise min** (exactly mergeable, test-verified identical to
building from the union stream). Stored state is the full 64-bit
minimum per bucket; the ``b``-bit quantization happens at comparison
time (``bbmh.h`` finalizes to b bits for storage — an encoding
optimization, not a semantic; keeping full mins lets one sketch serve
any ``b``).

* Jaccard: fraction of buckets whose b-bit signatures match, corrected
  for chance collisions ``J = (m − c) / (1 − c)`` with ``c = 2^-b``
  (the b-bit minwise estimator); buckets empty on both sides are
  excluded, empty-on-one-side counts as mismatch.
* Cardinality: method-of-moments on the normalized bucket minima
  (per-bucket ``E[min] = 1/(n/k + 1)`` ⇒ ``n̂ = k·(k/Σu − 1)``) — the
  harmonic-estimate family of ``bbmh.h:60-83``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64
_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


@register_sketch
class BBitMinHash(MergeableSketch):
    kind = "bbmh"

    def __init__(self, p: int = 10, b: int = 8, seedseed: int = 137):
        assert 1 <= b <= 32
        self.p = int(p)
        self.b = int(b)
        self.seedseed = int(seedseed)
        self.k = 1 << self.p
        self.minvals = np.full(self.k, _EMPTY, dtype=np.uint64)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        if items.size > 4096:          # duplicates cannot move a min
            items = np.unique(items)
        h = wanghash(items ^ U64(self.seedseed))
        bucket = (h >> U64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            val = h << U64(self.p)     # remaining bits, left-aligned
        np.minimum.at(self.minvals, bucket, val)

    # ---- estimators --------------------------------------------------------
    def cardinality_estimate(self) -> float:
        u = self.minvals.astype(np.float64) / np.float64(2.0**64)
        s = float(u.sum())
        if s <= 0:
            return float("inf")
        return max(0.0, self.k * (self.k / s - 1.0))

    def jaccard_index(self, other: "BBitMinHash", b: Optional[int] = None) -> float:
        self._check(other)
        b = self.b if b is None else int(b)
        a_m, b_m = self.minvals, other.minvals
        both_empty = (a_m == _EMPTY) & (b_m == _EMPTY)
        use = ~both_empty
        n = int(use.sum())
        if n == 0:
            return 0.0
        # the LOWEST b bits of the min hash (uniform regardless of the
        # min's magnitude — the Li-König b-bit signature; the min VALUE
        # itself concentrates near 0, so high bits would false-match)
        # stored values are (h << p), so shift the zero-fill back out
        # before taking the low b bits of the minimizing item's hash
        mask = U64((1 << b) - 1)
        sig_a = (a_m >> U64(self.p)) & mask
        sig_b = (b_m >> U64(self.p)) & mask
        match = (sig_a == sig_b) & use & (a_m != _EMPTY) & (b_m != _EMPTY)
        m = float(match.sum()) / n
        c = float(np.exp2(-b))
        return max(0.0, (m - c) / (1.0 - c))

    def union_size(self, other: "BBitMinHash") -> float:
        self._check(other)
        u = self.empty_like()
        np.minimum(self.minvals, other.minvals, out=u.minvals)
        return u.cardinality_estimate()

    def intersection_size(self, other: "BBitMinHash") -> float:
        return self.jaccard_index(other) * self.union_size(other)

    # ---- merge / io --------------------------------------------------------
    def _check(self, other: "BBitMinHash") -> None:
        assert (self.p, self.seedseed) == (other.p, other.seedseed), \
            "geometry mismatch"

    def merge(self, other: "BBitMinHash") -> "BBitMinHash":
        self._check(other)
        np.minimum(self.minvals, other.minvals, out=self.minvals)
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, b=self.b, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"minvals": self.minvals}
