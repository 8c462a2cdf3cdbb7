"""DDSketch — relative-error quantile sketch (the vendored ``dd.h``
family's behavioral contract; public algorithm: Masson, Rim & Lee,
"DDSketch: A fast and fully-mergeable quantile sketch with
relative-error guarantees", VLDB 2019).

Log-spaced buckets: value x > 0 lands in bucket ``ceil(log_gamma(x))``
with ``gamma = (1+alpha)/(1-alpha)``; any value read back from a bucket
midpoint is within relative error ``alpha`` of the original. Counts are
plain integers per bucket ⇒ **merge = aligned bucket-count addition**
(exactly mergeable — the property that makes it a per-partition UDAF
state). Negative values go to a mirrored store, zeros to a scalar
counter. A collapsing store caps memory: when the bucket span exceeds
``max_bins`` the LOWEST buckets fold into one (preserves upper-quantile
accuracy, the standard collapse rule).

Implementation is vectorized numpy end-to-end: one log + bincount per
batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.sketches.base import MergeableSketch, register_sketch


def _fold(counts: np.ndarray, offset: int, idx: np.ndarray,
          add: np.ndarray, max_bins: int):
    """Add ``add[i]`` at bucket index ``idx[i]`` into (counts, offset),
    growing/collapsing as needed. Returns (counts, offset)."""
    if len(idx) == 0:
        return counts, offset
    if len(counts) == 0:
        # empty store: span from the incoming indices ALONE — including
        # the phantom [offset, offset-1] span would anchor lo/hi at 0 and
        # force a spurious collapse for all-negative (x<1) or
        # all-large-positive index ranges
        lo, hi = int(idx.min()), int(idx.max())
    else:
        lo = int(min(idx.min(), offset))
        hi = int(max(idx.max(), offset + len(counts) - 1))
    if hi - lo + 1 > max_bins:
        lo = hi - max_bins + 1  # collapse lowest buckets into bin lo
    new = np.zeros(hi - lo + 1, dtype=np.int64)
    if len(counts):
        src_lo = offset - lo
        if src_lo >= 0:
            new[src_lo:src_lo + len(counts)] += counts
        else:  # old low buckets collapse into the new lowest bin
            new[0] += counts[: -src_lo].sum()
            new[: len(counts) + src_lo] += counts[-src_lo:]
    tgt = np.maximum(idx - lo, 0)  # incoming below-range values collapse too
    new += np.bincount(tgt, weights=add, minlength=len(new)).astype(np.int64)
    return new, lo


@register_sketch
class DDSketch(MergeableSketch):
    kind = "ddsketch"

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.gamma = (1 + self.alpha) / (1 - self.alpha)
        self._lg = np.log(self.gamma)
        self.pos = np.zeros(0, dtype=np.int64)
        self.pos_offset = np.zeros(1, dtype=np.int64)
        self.neg = np.zeros(0, dtype=np.int64)
        self.neg_offset = np.zeros(1, dtype=np.int64)
        self.zero_count = np.zeros(1, dtype=np.int64)
        self.n_items = np.zeros(1, dtype=np.int64)

    def _indices(self, x: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(x) / self._lg).astype(np.int64)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        x = np.asarray(items, dtype=np.float64).ravel()
        if x.size == 0:
            return
        w = np.ones(len(x), dtype=np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        finite = np.isfinite(x)
        x, w = x[finite], w[finite]
        self.n_items[0] += int(w.sum())
        zero = x == 0
        self.zero_count[0] += int(w[zero].sum())
        p = x > 0
        if p.any():
            self.pos, off = _fold(self.pos, int(self.pos_offset[0]),
                                  self._indices(x[p]), w[p], self.max_bins)
            self.pos_offset[0] = off
        n = x < 0
        if n.any():
            self.neg, off = _fold(self.neg, int(self.neg_offset[0]),
                                  self._indices(-x[n]), w[n], self.max_bins)
            self.neg_offset[0] = off

    def _bucket_value(self, idx: np.ndarray) -> np.ndarray:
        # midpoint of (gamma^(i-1), gamma^i]: 2·gamma^i / (gamma+1)
        return 2.0 * np.power(self.gamma, idx.astype(np.float64)) / (self.gamma + 1)

    def quantile(self, q):
        """Value(s) at quantile(s) q ∈ [0,1]; each within relative error
        alpha of the true order statistic. Vector q → ndarray; scalar q
        → float (family contract shared with KLL/TDigest)."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        total = int(self.n_items[0])
        if total == 0:
            return np.full(len(qs), np.nan) if np.ndim(q) else float("nan")
        # global ascending value order: negatives (desc bucket idx), zeros,
        # positives (asc bucket idx)
        neg_idx = np.arange(len(self.neg))[::-1] + int(self.neg_offset[0])
        neg_counts = self.neg[::-1]
        vals = np.concatenate([
            -self._bucket_value(neg_idx),
            np.zeros(1),
            self._bucket_value(np.arange(len(self.pos)) + int(self.pos_offset[0])),
        ])
        counts = np.concatenate([neg_counts, self.zero_count,
                                 self.pos]).astype(np.int64)
        cum = np.cumsum(counts)
        ranks = np.clip((qs * (total - 1)).astype(np.int64), 0, total - 1)
        sel = np.searchsorted(cum, ranks + 1)
        out = vals[np.minimum(sel, len(vals) - 1)]
        return out if np.ndim(q) else float(out[0])

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert (self.alpha, self.max_bins) == (other.alpha, other.max_bins), \
            "geometry mismatch"
        if len(other.pos):
            idx = np.arange(len(other.pos)) + int(other.pos_offset[0])
            self.pos, off = _fold(self.pos, int(self.pos_offset[0]),
                                  idx, other.pos, self.max_bins)
            self.pos_offset[0] = off
        if len(other.neg):
            idx = np.arange(len(other.neg)) + int(other.neg_offset[0])
            self.neg, off = _fold(self.neg, int(self.neg_offset[0]),
                                  idx, other.neg, self.max_bins)
            self.neg_offset[0] = off
        self.zero_count += other.zero_count
        self.n_items += other.n_items
        return self

    def _params(self) -> Dict:
        return dict(alpha=self.alpha, max_bins=self.max_bins)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"pos": self.pos, "pos_offset": self.pos_offset,
                "neg": self.neg, "neg_offset": self.neg_offset,
                "zero_count": self.zero_count, "n_items": self.n_items}
