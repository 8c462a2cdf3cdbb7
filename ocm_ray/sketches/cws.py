"""ICWS weighted MinHash — mergeable weighted-Jaccard sketch (CWS).

Behavioral contract from the vendored ``mult.h`` (SURVEY §2.3): the
``cws::CWSamples`` parameter block (``mult.h:25-40``) draws, per hash
slot, ``r ~ Gamma(2,1)``, ``c ~ Gamma(2,1)``, ``b ~ U(0,1)`` — exactly
the parameterization of Ioffe's Consistent Weighted Sampling (ICWS,
"Improved Consistent Sampling, Weighted Minhash and L1 Sketching",
ICDM 2010), which the rest of ``mult.h`` wires into weighted sketch
adapters. This module implements ICWS proper, vectorized:

    per permutation j and element x with weight w > 0:
        r, c ~ Gamma(2,1),  beta ~ U(0,1)      (functions of (j, x))
        t      = floor(ln w / r + beta)
        ln y   = r * (t - beta)
        ln a   = ln c - ln y - r
    signature_j = (argmin_x ln a, t of that x)

    P[sig_j(A) == sig_j(B)] = J_w(A,B) = sum_x min(w_A, w_B)
                                       / sum_x max(w_A, w_B)

Documented deviation from the reference: ``CWSamples`` pre-draws its
Gamma/uniform variates into ``(nhist, histsz)`` tables from one
``mt19937_64`` stream; the engine derives them per ``(permutation,
element)`` from the seeded WangHash chain (five uniforms → two
Gamma(2,1) via −ln(u·u'), one beta). Distribution-identical, and
element-consistent across partitions — the property the mergeable-UDAF
contract needs (the same (j, x) always sees the same draws, so the
merge of partial argmins equals the argmin over the union).

Merge contract: ``update`` treats ``counts`` as the element's FINAL
weight. Updates over DISJOINT element sets (or repeated updates of the
same element with the same weight) merge exactly: min-of-mins == min
over the union. An element whose weight is SPLIT across partitions
must be pre-aggregated first — the engine's grouped count tables
(``ops/agg.grouped_sum``, ``engine/build.shard_token_counts``) provide
exactly that shape, one final (key, weight) row per element.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, dedupe_counts, register_sketch

U64 = np.uint64

# xor constants splitting one element hash into 5 independent streams
_C = [U64(0x9E3779B97F4A7C15), U64(0xBF58476D1CE4E5B9),
      U64(0x94D049BB133111EB), U64(0xD6E8FEB86659FD93),
      U64(0xA5A5A5A5A5A5A5A5)]
_INV64 = 1.0 / 2.0**64


def _u01(h: np.ndarray) -> np.ndarray:
    """uint64 hash → uniform in (0, 1] (offset by 1 ulp-ish so ln() is
    finite at h == 0)."""
    return (h.astype(np.float64) + 1.0) * _INV64


@register_sketch
class WeightedMinHash(MergeableSketch):
    """ICWS sketch state: per permutation the running min ``ln a`` with
    its (element, t) payload; weighted-Jaccard estimate = fraction of
    matching (element, t) slots."""

    kind = "cws"
    # counts = FINAL weight, not additive occurrences (module docstring):
    # combiners must deliver each element's weight in ONE update
    weight_additive = False

    CHUNK = 1 << 16  # elements per kernel chunk (perm × chunk matrix ≤ ~4 MB)

    def __init__(self, num_perm: int = 64, seedseed: int = 137):
        self.num_perm = int(num_perm)
        self.seedseed = int(seedseed)
        self.ln_a = np.full(self.num_perm, np.inf, dtype=np.float64)
        self.elem = np.zeros(self.num_perm, dtype=U64)
        self.t = np.zeros(self.num_perm, dtype=np.int64)
        # mt19937_64 per-permutation seeds (the reference's own seed
        # scheme, include/ocm.h:273-274) — xor-deriving them from j
        # aliases nearby seedseeds (j ^ s permutes within 2^ceil(log2 P)
        # blocks), mt19937_64 streams do not
        from ocm_ray.core.hashing import derive_seeds
        self._perm_seeds = derive_seeds(self.num_perm, self.seedseed)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        if counts is None:
            items, counts = dedupe_counts(items)
        w = np.asarray(counts, dtype=np.float64)
        pos = w > 0
        if not pos.all():
            items, w = items[pos], w[pos]
        lnw = np.log(w)
        # chunk the (num_perm × n) matrices to cache size (CLAUDE.md r4)
        step = max(1, self.CHUNK // self.num_perm)
        for lo in range(0, len(items), step):
            self._update_chunk(items[lo:lo + step], lnw[lo:lo + step])

    def _update_chunk(self, items: np.ndarray, lnw: np.ndarray) -> None:
        base = wanghash(items[None, :] ^ self._perm_seeds[:, None])  # P×n
        u = [_u01(wanghash(base ^ c)) for c in _C]
        r = -np.log(u[0]) - np.log(u[1])       # Gamma(2,1)
        lnc = np.log(-np.log(u[2]) - np.log(u[3]))
        beta = u[4] * (1.0 - 1e-16)            # U(0,1), strictly < 1
        t = np.floor(lnw[None, :] / r + beta)
        ln_y = r * (t - beta)
        ln_a = lnc - ln_y - r
        j = np.argmin(ln_a, axis=1)
        rows = np.arange(self.num_perm)
        cand = ln_a[rows, j]
        better = cand < self.ln_a
        self.ln_a[better] = cand[better]
        self.elem[better] = items[j[better]]
        self.t[better] = t[rows, j][better].astype(np.int64)

    def merge(self, other: "WeightedMinHash") -> "WeightedMinHash":
        assert (self.num_perm, self.seedseed) == \
            (other.num_perm, other.seedseed), "geometry mismatch"
        better = other.ln_a < self.ln_a
        self.ln_a[better] = other.ln_a[better]
        self.elem[better] = other.elem[better]
        self.t[better] = other.t[better]
        return self

    # ---- estimators --------------------------------------------------------
    def matching_slots(self, other: "WeightedMinHash") -> int:
        """Number of permutations whose (element, t) samples agree —
        the integer numerator of the J_w estimate (deterministic given
        seeds, so exactly assertable)."""
        return int(((self.elem == other.elem) & (self.t == other.t)).sum())

    def weighted_jaccard(self, other: "WeightedMinHash") -> float:
        return self.matching_slots(other) / self.num_perm

    def _params(self) -> Dict:
        return dict(num_perm=self.num_perm, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"ln_a": self.ln_a, "elem": self.elem, "t": self.t}
