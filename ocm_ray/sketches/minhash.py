"""Bottom-k MinHash — mergeable set-similarity / cardinality sketch.

Behavioral contract from the vendored ``mh.h`` (SURVEY §2.3):
``RangeMinHash`` keeps the k smallest distinct hash values of the set
(``mh.h:121-130``); merge = k-smallest of the union; ``jaccard`` from the
shared bottom-k of the union (``mh.h:186,276``); cardinality estimated
from the k-th order statistic (``mh.h:106,335-361``).

Vectorized from scratch: ``np.partition`` over the union of the current
state and the new batch's unique hashes."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64


@register_sketch
class BottomKMinHash(MergeableSketch):
    kind = "bottomk"

    def __init__(self, k: int = 1024, seedseed: int = 137, prehashed: bool = False):
        self.k = int(k)
        self.seedseed = int(seedseed)
        self.prehashed = bool(prehashed)
        self.values = np.empty(0, dtype=U64)  # sorted ascending, ≤ k distinct hashes

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        h = items if self.prehashed else wanghash(items ^ U64(self.seedseed))
        cand = np.unique(h)  # sorted distinct
        if cand.size > self.k:
            cand = cand[: self.k]
        self.values = np.unique(np.concatenate([self.values, cand]))[: self.k]

    def merge(self, other: "BottomKMinHash") -> "BottomKMinHash":
        assert (self.k, self.seedseed) == (other.k, other.seedseed), "geometry mismatch"
        self.values = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return self

    # ---- estimators --------------------------------------------------------
    def cardinality_estimate(self) -> float:
        """(k−1) scaled by the k-th smallest hash (uniform order statistic)."""
        n = len(self.values)
        if n < self.k:
            return float(n)  # saw fewer than k distinct values — exact
        kth = float(self.values[self.k - 1]) + 1.0
        return (self.k - 1) * (2.0**64) / kth

    def jaccard(self, other: "BottomKMinHash") -> float:
        """|bottom-k(A∪B) ∩ A ∩ B| / k (the standard bottom-k estimator)."""
        union = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        if union.size == 0:
            return 1.0
        inter = np.intersect1d(union, self.values, assume_unique=True)
        inter = np.intersect1d(inter, other.values, assume_unique=True)
        return len(inter) / len(union)

    def _params(self) -> Dict:
        return dict(k=self.k, seedseed=self.seedseed, prehashed=self.prehashed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"values": self.values}
