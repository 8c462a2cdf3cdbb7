"""Flajolet-Martin probabilistic counting (the vendored ``pc.h``
contract): ``PCSA`` — n bitmap registers; each item routes to register
``h % n`` and ORs in the one-hot mask ``R(h/n) = ~v & (v+1)`` (the
lowest cleared bit — geometrically distributed, the FM ρ-bit);
**merge = bitwise OR** (``pc.h:60-63``); estimate
``n · 1.292808 · 2^mean(r)`` with ``r`` = trailing-ones count per
register (``pc.h:72-113``; 1.292808 = 1/φ, Flajolet-Martin 1985 — the
public algorithm). ``ProbabilisticCounter`` is the single-register
variant (``pc.h:21-42``).

Engine adaptation: items are pre-hashed through WangHash (the engine's
one hash; the reference uses wyhash here — a hash-function swap, not a
semantic change), ``n`` is forced to a power of two so routing is a
mask, and everything is numpy (OR-scatter + vectorized trailing-ones).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch
from ocm_ray.sketches.hll import _bit_length_u64

U64 = np.uint64


def _lowest_zero_mask(v: np.ndarray) -> np.ndarray:
    """R(x) = ~x & (x+1): one-hot mask of the lowest CLEARED bit."""
    with np.errstate(over="ignore"):
        return ~v & (v + U64(1))


@register_sketch
class PCSA(MergeableSketch):
    kind = "pcsa"

    def __init__(self, p: int = 8, seedseed: int = 137):
        self.p = int(p)          # log2 of the register count
        self.seedseed = int(seedseed)
        self.n = 1 << self.p
        self.registers = np.zeros(self.n, dtype=np.uint64)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        if items.size > 4096:            # duplicates can't move an OR
            items = np.unique(items)
        h = wanghash(items ^ U64(self.seedseed))
        ind = (h & U64(self.n - 1)).astype(np.int64)
        np.bitwise_or.at(self.registers, ind,
                         _lowest_zero_mask(h >> U64(self.p)))

    def _r(self) -> np.ndarray:
        """Trailing-ones count per register (= index of lowest 0 bit)."""
        return _bit_length_u64(_lowest_zero_mask(self.registers)) - 1

    def estimate(self) -> float:
        mean = float(self._r().mean())
        return self.n * 1.292808 * float(np.exp2(mean))

    def merge(self, other: "PCSA") -> "PCSA":
        assert (self.p, self.seedseed) == (other.p, other.seedseed), \
            "geometry mismatch"
        self.registers |= other.registers
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"registers": self.registers}


@register_sketch
class ProbabilisticCounter(MergeableSketch):
    """Single-register FM counter (``pc.h:21-42``): OR of lowest-zero
    masks; estimate = R(sketch) · 1.292808."""

    kind = "probcounter"

    def __init__(self, seedseed: int = 137):
        self.seedseed = int(seedseed)
        self.sketch = np.zeros(1, dtype=np.uint64)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        h = wanghash(items ^ U64(self.seedseed))
        masks = _lowest_zero_mask(h)
        self.sketch[0] |= np.bitwise_or.reduce(masks)

    def estimate(self) -> float:
        return float(_lowest_zero_mask(self.sketch)[0]) * 1.292808

    def merge(self, other: "ProbabilisticCounter") -> "ProbabilisticCounter":
        assert self.seedseed == other.seedseed, "geometry mismatch"
        self.sketch |= other.sketch
        return self

    def _params(self) -> Dict:
        return dict(seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"sketch": self.sketch}
