"""t-digest (Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests") — mergeable quantile sketch with relative accuracy at the tails.

Merging-digest variant with the k1 scale function
``k(q) = (δ / 2π) · asin(2q − 1)``: clusters near q=0/1 are kept tiny, so
tail quantiles are near-exact. State = (means, weights) centroid arrays +
an unmerged buffer; ``merge`` concatenates centroid sets and re-compresses
— associative within the accuracy bound (cluster boundaries may differ by
grouping, like every randomized/greedy mergeable summary).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.sketches.base import MergeableSketch, register_sketch


@register_sketch
class TDigest(MergeableSketch):
    kind = "tdigest"

    def __init__(self, delta: int = 100, buffer_size: int = 8192):
        self.delta = int(delta)
        self.buffer_size = int(buffer_size)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list = []
        self._buf_w: list = []
        self._buf_n = 0

    # ---- scale function ----------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        if self._buf_n == 0 and len(self.means) <= self.delta:
            return
        v = np.concatenate([self.means] + self._buf_v) if self._buf_v else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_v, self._buf_w, self._buf_n = [], [], 0
        if v.size == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = float(w.sum())
        # Vectorized k-space bucketing: cut the sorted mass wherever the
        # scale function crosses an integer — every resulting cluster has
        # k-span ≤ 1 (the t-digest size invariant), with no per-item loop.
        cum = np.cumsum(w)
        k_edges = np.arange(np.floor(-self.delta / 4) + 1, np.ceil(self.delta / 4), 1.0)
        q_edges = (np.sin(k_edges * (2 * np.pi / self.delta)) + 1.0) / 2.0
        cuts = np.searchsorted(cum, q_edges * total, side="left")
        starts = np.unique(np.concatenate([[0], cuts[(cuts > 0) & (cuts < v.size)]]))
        self.weights = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(v * w, starts) / self.weights

    # ---- update ------------------------------------------------------------
    def update_values(self, values: np.ndarray,
                      weights: Optional[np.ndarray] = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(values)
        values = values[mask]
        if values.size == 0:
            return
        w = (np.ones_like(values) if weights is None
             else np.asarray(weights, dtype=np.float64)[mask])
        if weights is not None:
            # zero/negative weights would produce 0/0 = NaN cluster means
            # in _compress and permanently poison the digest
            pos = w > 0
            if not pos.all():
                values, w = values[pos], w[pos]
                if values.size == 0:
                    return
        self._buf_v.append(values)
        self._buf_w.append(w)
        self._buf_n += values.size
        if self._buf_n >= self.buffer_size:
            self._compress()

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        self.update_values(np.asarray(items, dtype=np.float64),
                           None if counts is None else counts)

    # ---- queries -----------------------------------------------------------
    @property
    def n(self) -> float:
        return float(self.weights.sum() + sum(float(w.sum()) for w in self._buf_w))

    def quantile(self, q):
        """Vector q → ndarray; scalar q → float (family contract shared
        with KLL.quantile and DDSketch.quantile)."""
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
        elif self.means.size == 1:
            out = np.full(qs.shape, self.means[0])
        else:
            w = self.weights
            cum = np.cumsum(w) - w / 2.0
            ranks = qs * float(w.sum())
            out = np.interp(ranks, cum, self.means)
        return out if np.ndim(q) else float(out[0])

    def rank(self, values) -> np.ndarray:
        self._compress()
        xs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        w = self.weights
        cum = np.cumsum(w) - w / 2.0
        return np.interp(xs, self.means, cum) / float(w.sum())

    # ---- merge / io --------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta, "geometry mismatch"
        other._compress()
        self._buf_v.append(other.means)
        self._buf_w.append(other.weights)
        self._buf_n += other.means.size
        self._compress()
        return self

    def _params(self) -> Dict:
        return dict(delta=self.delta, buffer_size=self.buffer_size)

    def _arrays(self) -> Dict[str, np.ndarray]:
        self._compress()
        return {"means": self.means, "weights": self.weights}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.means = arrays["means"]
        self.weights = arrays["weights"]
        self._buf_v, self._buf_w, self._buf_n = [], [], 0
