"""ProbMinHash — weighted-set minwise sampling (the vendored ``pmh.h``
``jp::PMinHasher`` contract, ``/root/reference/include/pmh.h:80-145``;
public algorithm family: Moulton & Jiang 2018 "Maximally consistent
sampling and the Jaccard index of probability distributions", Ertl 2020
"ProbMinHash").

Per register ``j`` and per nonzero element ``(index, weight)`` the
reference draws an exponential ``-log(U(WyHash(seed_j ^ bits(weight))))
/ weight`` (``pmh.h:101-108``) and stores the INDEX of the argmin draw
(``pmh.h:110-135``). ``argmin`` over ``Exp(w_i)`` draws selects element
``i`` with probability ``w_i / Σw`` — a consistent weighted sample per
register. Two sketches' registers match with probability equal to the
weighted Jaccard ``Σ min(a_i,b_i) / Σ max(a_i,b_i)`` whenever the two
sets agree on their intersection weights (the draws are keyed by the
WEIGHT BITS, ``pmh.h:105`` ``seed ^= reinterpret(x)``, so shared
(index, weight) pairs share draws exactly — including the reference's
quirk that two DIFFERENT indices with equal weights reuse one draw
stream; preserved here).

Engine deviations (documented, same policy as SetSketch/ICWS):

* the uniform draw comes from the engine codec —
  ``U = (WangHash(weight_bits ^ seed_j) + 1) · 2^-64`` — instead of the
  reference's wy::WyHash-seeded ``std::uniform_real_distribution``
  stream (distribution-identical, not bit-identical);
* register seeds derive from the engine's ``mt19937_64`` chain
  (``derive_seeds``) rather than wyhash's RNG;
* unlike the one-shot vector hasher, each register keeps ``(min draw,
  argmin index)`` so partial sketches over DISJOINT nonzero subsets
  **min-merge exactly** (mergeable-UDAF contract): building from any
  partitioning of the nonzeros is bit-identical to one pass
  (property-tested). Ties (equal draws, i.e. equal weights) break to
  the smaller index — the reference's strict-less first-wins scan over
  ascending indices does the same (``pmh.h:126-131``).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import derive_seeds, wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64
_INF = np.inf


@register_sketch
class ProbMinHash(MergeableSketch):
    kind = "pmh"
    # counts = FINAL weight (draws are keyed by the weight's bit
    # pattern): combiners must deliver each element's weight in ONE
    # update — see MergeableSketch.weight_additive
    weight_additive = False

    def __init__(self, n_regs: int = 128, seedseed: int = 137):
        self.n_regs = int(n_regs)
        self.seedseed = int(seedseed)
        self.seeds = derive_seeds(self.n_regs, self.seedseed)
        self.minval = np.full(self.n_regs, _INF, dtype=np.float64)
        self.argmin = np.full(self.n_regs, -1, dtype=np.int64)

    # ---- update -------------------------------------------------------------
    def update(self, indices: np.ndarray,
               weights: Optional[np.ndarray] = None) -> None:
        """Fold a batch of nonzero ``(index, weight)`` pairs of ONE
        weighted set into the registers. ``weights=None`` means all-1
        (unweighted set semantics). Fully vectorized; the (nnz x n_regs)
        draw matrix is chunked to cache size (CLAUDE.md rule 4 — the
        hash makes several passes over it)."""
        idx = np.asarray(indices, dtype=np.int64)
        w = np.ones(len(idx), np.float64) if weights is None else \
            np.asarray(weights, dtype=np.float64)
        keep = w > 0
        if not keep.all():
            idx, w = idx[keep], w[keep]
        if idx.size == 0:
            return
        # ascending index order => np.argmin's first-wins tie break is
        # the smallest index (reference pmh.h:126-131 scan order)
        order = np.argsort(idx, kind="stable")
        idx, w = idx[order], w[order]
        chunk = max(1, (1 << 19) // self.n_regs)
        for lo in range(0, len(idx), chunk):
            ic, wc = idx[lo:lo + chunk], w[lo:lo + chunk]
            draws = self._draws(wc)                     # (nnz, n_regs)
            pos = np.argmin(draws, axis=0)
            best = draws[pos, np.arange(self.n_regs)]
            cand_idx = ic[pos]
            better = (best < self.minval) | \
                ((best == self.minval) & (cand_idx < self.argmin))
            self.minval[better] = best[better]
            self.argmin[better] = cand_idx[better]

    def _draws(self, weights: np.ndarray) -> np.ndarray:
        """(nnz, n_regs) ``Exp(w)`` draws keyed by (weight bits, register
        seed) — the reference's ``hash(value, seeds_[j])``."""
        vb = weights.view(U64)
        key = wanghash(vb[:, None] ^ self.seeds[None, :])
        u = (key.astype(np.float64) + 1.0) * 2.0 ** -64     # (0, 1]
        return -np.log(u) / weights[:, None]

    # ---- estimators ----------------------------------------------------------
    def similarity(self, other: "ProbMinHash") -> float:
        """Fraction of registers selecting the same element — estimates
        the weighted Jaccard when the sets agree on intersection
        weights (see module docstring); both-empty registers excluded."""
        self._check(other)
        filled = (self.argmin >= 0) | (other.argmin >= 0)
        n = int(filled.sum())
        if n == 0:
            return 0.0
        same = (self.argmin == other.argmin) & filled
        return float(same.sum()) / n

    def sample(self) -> np.ndarray:
        """The per-register consistent weighted sample (selected element
        indices; -1 = register never updated) — ``pmh.h``'s return
        value."""
        return self.argmin.copy()

    # ---- merge / io ----------------------------------------------------------
    def merge(self, other: "ProbMinHash") -> "ProbMinHash":
        self._check(other)
        take = (other.minval < self.minval) | \
            ((other.minval == self.minval) & (other.argmin < self.argmin)
             & (other.argmin >= 0))
        self.minval[take] = other.minval[take]
        self.argmin[take] = other.argmin[take]
        return self

    def _check(self, other: "ProbMinHash") -> None:
        assert (self.n_regs, self.seedseed) == \
            (other.n_regs, other.seedseed), "geometry mismatch"

    def _params(self) -> Dict:
        return dict(n_regs=self.n_regs, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"minval": self.minval, "argmin": self.argmin}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.minval = arrays["minval"]
        self.argmin = arrays["argmin"]
