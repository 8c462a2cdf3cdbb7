"""SetSketch (Ertl 2021) — the mergeable set sketch bridging MinHash and
HyperLogLog: geometric-spaced registers support BOTH cardinality (HLL-like
harmonic estimator) and similarity (MinHash-like joint α/β estimation)
from one max-mergeable state.

Clean-room reimplementation of the GSS ``SetSketch`` class of the vendored
reference (``include/setsketch.h:537-775``; presets ``setsketch.h:776-800``;
``g_b`` ``setsketch.h:187-189``): per (item, register) the generator draws
X_j ~ Exp(a) and sets K_j = clamp(0, q+1, trunc(1 − log_b X_j)); the
sketch register is the max over items; merge = elementwise max;
cardinality = m·(1−1/b)/(ln b · a · Σ b^(−K_i)) (``setsketch.h:683-687``);
α/β from register > / < counts through ``g_b`` (``setsketch.h:698-713``)
give Jaccard and union size of two sketches.

DEVIATION (documented, estimator-level parity like HLL/bbmh — SURVEY
§5.4): the reference realizes the m iid Exp(a) draws per item as order
statistics through a lazy Fisher–Yates shuffle over wyhash
(``setsketch.h:617-646``) so a scalar stream can stop early once a draw
cannot beat the current register minimum. The engine draws the SAME iid
Exp(a) register values directly from the counter-based WangHash codec —
distribution-identical and batch-vectorizable (one (items × m) matrix per
cache-sized chunk), deterministic given (item, seedseed), but not
bit-identical to the C++ stream. There is no binary-interop contract for
this sketch. Cost is O(m) per DISTINCT item (items are deduped first;
multiplicity is irrelevant to a set sketch).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ocm_ray.core.hashing import derive_seeds, wanghash
from ocm_ray.sketches.base import (MergeableSketch, dedupe_counts,
                                   register_sketch)

U64 = np.uint64


@register_sketch
class SetSketch(MergeableSketch):
    """Generalized (geometric) set sketch.

    Parameters mirror the reference presets (``setsketch.h:776-800``):
    the default is ByteSetS (b=1.2, a=20, q=254 → uint8 registers); use
    :meth:`nibble` / :meth:`short` for the NibbleSetS / ShortSetS
    presets. ``m`` is the register count (accuracy ~ 1/sqrt(m) for both
    cardinality and Jaccard).
    """

    kind = "setsketch"

    def __init__(self, m: int = 512, b: float = 1.2, a: float = 20.0,
                 q: int = 254, seedseed: int = 137):
        assert q >= 1 and m >= 16
        self.m, self.b, self.a, self.q = int(m), float(b), float(a), int(q)
        self.seedseed = int(seedseed)
        dtype = np.uint8 if q + 1 <= 255 else \
            (np.uint16 if q + 1 <= 65535 else np.int64)
        self.core = np.zeros(self.m, dtype=dtype)
        self.n_items = np.zeros(1, dtype=np.int64)
        self._seeds = derive_seeds(self.m, self.seedseed ^ 0x5E75E7C4)

    # presets -------------------------------------------------------------
    @classmethod
    def byte(cls, m: int = 512, seedseed: int = 137) -> "SetSketch":
        """ByteSetS (``setsketch.h:786-791``)."""
        return cls(m, b=1.2, a=20.0, q=254, seedseed=seedseed)

    @classmethod
    def nibble(cls, m: int = 512, seedseed: int = 137) -> "SetSketch":
        """NibbleSetS (``setsketch.h:776-780``): b=e, a=5e-4, q=14."""
        return cls(m, b=float(np.e), a=5e-4, q=14, seedseed=seedseed)

    @classmethod
    def short(cls, m: int = 512, seedseed: int = 137) -> "SetSketch":
        """ShortSetS (``setsketch.h:793-798``): b=1.001, a=0.25."""
        return cls(m, b=1.001, a=0.25, q=65534, seedseed=seedseed)

    # update --------------------------------------------------------------
    def _k_matrix(self, items: np.ndarray) -> np.ndarray:
        """(n, m) register values for each item: K = clamp(0, q+1,
        trunc(1 − log_b X)), X = −ln(U)/a ~ Exp(a) per (item, register).
        (Equivalent to counting thresholds exp(−a·b^(1−k)) ≤ U —
        property-tested; the direct log form benches faster than a
        searchsorted over the 255 thresholds.)"""
        h = wanghash(items[:, None] ^ self._seeds[None, :])
        u = (h.astype(np.float64) + 1.0) / np.float64(2.0**64)  # (0, 1]
        with np.errstate(divide="ignore"):
            x = -np.log(u) / self.a
            k = np.trunc(1.0 - np.log(x) / np.log(self.b))
        return np.clip(k, 0, self.q + 1).astype(np.int64)

    def update(self, items: np.ndarray,
               counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] += int(cnt.sum())
        # cache-sized chunks, like the minhash signature kernel
        step = max(1, (1 << 19) // self.m)
        core = self.core.astype(np.int64)
        for lo in range(0, len(uniq), step):
            k = self._k_matrix(uniq[lo:lo + step])
            np.maximum(core, k.max(axis=0), out=core)
        self.core = core.astype(self.core.dtype)

    # estimators ----------------------------------------------------------
    def _harmean(self, regs: Optional[np.ndarray] = None) -> float:
        r = self.core if regs is None else regs
        return float(np.power(self.b, -r.astype(np.float64)).sum())

    def estimate(self) -> float:
        """Cardinality (``setsketch.h:683-687``)."""
        num = self.m * (1.0 - 1.0 / self.b) / (np.log(self.b) * self.a)
        hm = self._harmean()
        return float(num / hm) if hm > 0 else float("inf")

    def union_size(self, other: "SetSketch") -> float:
        self._check(other)
        num = self.m * (1.0 - 1.0 / self.b) / (np.log(self.b) * self.a)
        hm = self._harmean(np.maximum(self.core, other.core))
        return float(num / hm) if hm > 0 else float("inf")

    def _g_b(self, frac: float) -> float:
        return (1.0 - self.b ** (-frac)) / (1.0 - 1.0 / self.b)

    def alpha_beta(self, other: "SetSketch") -> Tuple[float, float]:
        """(α, β) ≈ (|A∖B|, |B∖A|) / |A∪B| from register comparisons
        (``setsketch.h:698-704``)."""
        self._check(other)
        ngt = int((self.core > other.core).sum())
        nlt = int((self.core < other.core).sum())
        return self._g_b(ngt / self.m), self._g_b(nlt / self.m)

    def jaccard(self, other: "SetSketch") -> float:
        """J(A, B); α+β ≥ 1 ⇒ treated as disjoint
        (``alpha_beta_mu``, ``setsketch.h:708-713``)."""
        a, b = self.alpha_beta(other)
        return 0.0 if a + b >= 1.0 else max(0.0, 1.0 - a - b)

    def shared_registers(self, other: "SetSketch") -> int:
        self._check(other)
        return int((self.core == other.core).sum())

    # protocol ------------------------------------------------------------
    def _check(self, other: "SetSketch") -> None:
        assert (self.m, self.b, self.a, self.q, self.seedseed) == \
               (other.m, other.b, other.a, other.q, other.seedseed), \
               "SetSketch parameter mismatch"

    def merge(self, other: "SetSketch") -> "SetSketch":
        self._check(other)
        self.core = np.maximum(self.core, other.core)
        self.n_items = self.n_items + other.n_items
        return self

    def _params(self) -> Dict:
        return dict(m=self.m, b=self.b, a=self.a, q=self.q,
                    seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"core": self.core, "n_items": self.n_items}
