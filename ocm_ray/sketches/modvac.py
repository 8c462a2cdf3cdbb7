"""ModSketch (``mod.h``) and VACSketch (``vac.h``) — the last two
vendored sketch families.

**ModSketch** (``mod.h:14-66`` ``modsketch_t``): deterministic
mod-sampling of the hash domain — keep ``h / m`` for every item hash
with ``h ≡ 0 (mod m)`` (pow2 ``m`` via the SizePow2Policy, so rem/quot
are mask/shift). Merge = set union (``final_type`` union semantics);
``reduce(factor)`` (``mod.h:37-63``) coarsens to a larger modulus by
keeping quotients divisible by the factor — sketches at different
resolutions become mergeable after reducing to the common coarser one.
Distinct-count estimate = ``|set| · m`` (each distinct item is sampled
with probability 1/m). Deviation: flat sorted uint64 arrays instead of
a flat_hash_set — identical contents, vectorized membership.

**VACSketch** (``vac.h:16-58``): a stack of ``n`` base sketches where
an update lands in levels ``0 .. min(ctz(r)+1, n)-1`` — level i sees a
~2^-i subsample. Documented deviation: the reference draws ``r`` from a
thread-local RNG (``vac.h:38`` — order- and thread-dependent, so two
builds of the same data disagree); the engine derives it from the ITEM
hash (``wang(x ^ salt)``), making level assignment a pure function of
the item — partition-invariant, bit-exact mergeable, and the level-i
population becomes a deterministic 2^-i subsample of the DISTINCT
items (the same consistency choice as ``sketches/cws.py``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64
_VAC_SALT = U64(0xC2B2AE3D27D4EB4F)


@register_sketch
class ModSketch(MergeableSketch):
    """Mod-sampled distinct sketch (``mod.h:modsketch_t``)."""

    kind = "mod"

    def __init__(self, log2_mod: int = 10, seedseed: int = 137):
        self.log2_mod = int(log2_mod)
        self.seedseed = int(seedseed)
        self.quots = np.empty(0, dtype=U64)   # sorted distinct quotients

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        h = wanghash(items ^ U64(self.seedseed))
        m_mask = U64((1 << self.log2_mod) - 1)
        sel = h[(h & m_mask) == U64(0)] >> U64(self.log2_mod)
        if len(sel):
            self.quots = np.union1d(self.quots, sel)

    def merge(self, other: "ModSketch") -> "ModSketch":
        assert (self.log2_mod, self.seedseed) == \
            (other.log2_mod, other.seedseed), "geometry mismatch"
        self.quots = np.union1d(self.quots, other.quots)
        return self

    def reduce(self, log2_factor: int) -> "ModSketch":
        """Coarsen to modulus ``m << log2_factor`` (``mod.h:37-63``,
        pow2 branch): keep quotients whose low bits are zero."""
        assert log2_factor >= 0
        if log2_factor == 0:
            # fresh sketch like every other factor — returning self
            # aliased would let mutations of the "reduced" sketch corrupt
            # the source only in the factor-0 case
            out = ModSketch(self.log2_mod, self.seedseed)
            out.quots = self.quots.copy()
            return out
        out = ModSketch(self.log2_mod + log2_factor, self.seedseed)
        mask = U64((1 << log2_factor) - 1)
        keep = self.quots[(self.quots & mask) == U64(0)]
        out.quots = keep >> U64(log2_factor)
        return out

    # ---- estimators --------------------------------------------------------
    def n_sampled(self) -> int:
        return int(len(self.quots))

    def cardinality_estimate(self) -> float:
        return float(len(self.quots)) * (1 << self.log2_mod)

    def jaccard(self, other: "ModSketch") -> float:
        """Exact Jaccard of the deterministic subsamples — an unbiased
        estimator of the full distinct-set Jaccard."""
        assert (self.log2_mod, self.seedseed) == \
            (other.log2_mod, other.seedseed)
        inter = len(np.intersect1d(self.quots, other.quots,
                                   assume_unique=True))
        union = len(self.quots) + len(other.quots) - inter
        return inter / union if union else 1.0

    def _params(self) -> Dict:
        return dict(log2_mod=self.log2_mod, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"quots": self.quots}


def vac_levels(items: np.ndarray, n_levels: int,
               seedseed: int = 137) -> np.ndarray:
    """Per-item VAC level count: ``min(ctz(wang(x ^ salt ^ seed)) + 1,
    n)`` — the item lands in base sketches ``0 .. level-1``."""
    items = np.asarray(items).astype(U64, copy=False)
    h = wanghash(items ^ _VAC_SALT ^ U64(seedseed))
    # ctz via isolating the lowest set bit; h == 0 -> full depth
    low = (h & (~h + U64(1))).astype(np.float64)
    ctz = np.where(h == 0, 64, np.log2(np.maximum(low, 1.0))).astype(np.int64)
    return np.minimum(ctz + 1, n_levels)


@register_sketch
class VACSketch(MergeableSketch):
    """Stack of ``n`` base sketches over geometrically-subsampled
    streams (``vac.h:VACSketch``); base kind is any registered
    mergeable sketch."""

    kind = "vac"

    def __init__(self, n_levels: int = 4, base_kind: str = "hll",
                 base_params: Optional[Dict] = None, seedseed: int = 137):
        from ocm_ray.sketches.base import sketch_class

        self.n_levels = int(n_levels)
        self.base_kind = base_kind
        self.base_params = dict(base_params or {})
        self.seedseed = int(seedseed)
        cls = sketch_class(base_kind)
        self.bases: List[MergeableSketch] = [
            cls(**self.base_params) for _ in range(self.n_levels)]

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        lvl = vac_levels(items, self.n_levels, self.seedseed)
        for i, b in enumerate(self.bases):
            sub = lvl > i
            if sub.any():
                b.update(items[sub],
                         None if counts is None else
                         np.asarray(counts)[sub])

    def merge(self, other: "VACSketch") -> "VACSketch":
        assert (self.n_levels, self.base_kind, self.seedseed) == \
            (other.n_levels, other.base_kind, other.seedseed), \
            "geometry mismatch"
        for a, b in zip(self.bases, other.bases):
            a.merge(b)
        return self

    # ---- estimators --------------------------------------------------------
    def level_estimates(self) -> List[float]:
        """Level-corrected distinct estimates: level i sees each
        distinct item with prob 2^-i (i < n-1; the last level absorbs
        the tail so its factor is the same as its index)."""
        out = []
        for i, b in enumerate(self.bases):
            est = b.estimate() if hasattr(b, "estimate") else \
                b.cardinality_estimate()
            out.append(float(est) * (1 << i))
        return out

    def estimate(self) -> float:
        """Combined estimate: the shallowest level is unbiased and
        lowest-variance for cardinality (deeper levels exist for the
        reduced-memory / weighted couplings of ``mult.h``)."""
        return self.level_estimates()[0]

    # serialization: flatten base states
    def _params(self) -> Dict:
        return dict(n_levels=self.n_levels, base_kind=self.base_kind,
                    base_params=self.base_params, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        out = {}
        for i, b in enumerate(self.bases):
            for k, v in b._arrays().items():
                out[f"b{i}_{k}"] = v
        return out

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        for i, b in enumerate(self.bases):
            b._set_arrays({k[len(f"b{i}_"):]: v for k, v in arrays.items()
                           if k.startswith(f"b{i}_")})
