"""HeavyKeeper — heavy-hitter sketch with exponential-decay eviction.

Behavioral contract from the vendored ``hk.h`` (``include/hk.h:171-270``,
SURVEY §2.3): ``nh`` subtables of ``2^p`` cells, each cell holding a
(fingerprint, count) pair; per occurrence of item x at its cell in each
row —

* empty cell → store (fp(x), 1);
* fingerprint match → count + 1 (saturating);
* mismatch → with probability ``b^-count`` decay the resident count by 1
  (``hk.h:147-155,193-200``); a count reaching 0 hands the cell to x with
  count 1;

query = max count over rows whose fingerprint matches (``hk.h:213-226``);
merge: same fingerprint → counts add, different → the larger count minus
the smaller keeps its fingerprint (``hk.h:231-262``). ``b`` defaults to
1.08 (the HeavyKeeper paper's value, ``hk.h:46-47``).

Engine adaptation (documented deviation, same family as the batched
conservative CM kernel): updates arrive pre-aggregated as (unique, count)
tables, so the per-occurrence decay loop is simulated exactly but in
aggregate — between decay successes the probability is CONSTANT, so the
number of occurrences consumed until the next success is Geometric(b^-C);
the vectorized loop advances every contended cell one success at a time
and terminates after at most (resident count + 1) successes per cell,
usually 1. Randomness is a counter-mode WangHash stream (deterministic,
seed-pinned — same result on every worker/retry). The fingerprint/count
cell packing of the reference is an internal layout optimization, not a
semantic; we store parallel count/fingerprint arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import derive_seeds, wanghash
from ocm_ray.sketches.base import MergeableSketch, dedupe_counts, register_sketch

U64 = np.uint64


@register_sketch
class HeavyKeeper(MergeableSketch):
    kind = "heavykeeper"

    def __init__(self, p: int = 14, nh: int = 4, b: float = 1.08,
                 fp_bits: int = 16, seedseed: int = 137):
        self.p = int(p)
        self.nh = int(nh)
        self.b = float(b)
        self.fp_bits = int(fp_bits)
        self.seedseed = int(seedseed)
        self.m = 1 << self.p
        self.counts = np.zeros((self.nh, self.m), dtype=np.int64)
        self.fps = np.zeros((self.nh, self.m), dtype=np.int64)
        self.seeds = derive_seeds(self.nh, self.seedseed)
        self.n_items = np.zeros(1, dtype=np.int64)
        self._ctr = np.zeros(1, dtype=np.int64)  # decay RNG counter (state)

    # ---- internals ---------------------------------------------------------
    def _pos_fp(self, items: np.ndarray, row: int):
        h = wanghash(items ^ U64(self.seeds[row]))
        pos = (h & U64(self.m - 1)).astype(np.int64)
        fp = ((h >> U64(self.p)) & U64((1 << self.fp_bits) - 1)).astype(np.int64)
        # avoid fp==0 aliasing with the empty-cell sentinel
        return pos, fp + 1

    def _uniform(self, k: int) -> np.ndarray:
        """k deterministic uniforms in (0, 1] from a counter-mode stream."""
        from ocm_ray.core.hashing import counter_uniforms

        return counter_uniforms(self._ctr, self.seedseed, k)

    def _decay(self, C: np.ndarray, n: np.ndarray):
        """Simulate n sequential mismatch occurrences against resident
        counts C. Returns (final_resident_count, taken_over, leftover)
        where leftover occurrences (post-takeover) belong to the new
        item."""
        C = C.copy()
        rem = n.astype(np.int64).copy()
        took = np.zeros(len(C), dtype=bool)
        while True:
            active = (rem > 0) & (C > 0) & ~took
            if not active.any():
                break
            idx = np.flatnonzero(active)
            pdec = np.power(self.b, -C[idx].astype(np.float64))
            u = self._uniform(len(idx))
            with np.errstate(divide="ignore", over="ignore"):
                # trials to first decay success ~ Geometric(pdec); inf
                # (pdec→0) simply means "no success within rem"
                G = np.where(pdec >= 1.0, 1.0,
                             np.ceil(np.log(u) / np.log1p(-pdec)))
            G = np.maximum(G, 1.0)  # first success needs ≥1 trial
            succ = G <= rem[idx]
            g_int = np.where(succ, G, 0).astype(np.int64)
            rem[idx] = np.where(succ, rem[idx] - g_int, 0)
            C[idx] -= succ.astype(np.int64)
            took[idx[succ & (C[idx] == 0)]] = True
        return C, took, rem

    # ---- update ------------------------------------------------------------
    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] += int(cnt.sum())
        for j in range(self.nh):
            pos, fp = self._pos_fp(uniq, j)
            # batch items sharing a cell are applied one per round, in
            # (cell, fp) order — deterministic sequential-per-cell semantics
            order = np.lexsort((fp, pos))
            p_s, f_s, c_s = pos[order], fp[order], cnt[order]
            start = np.concatenate([[True], p_s[1:] != p_s[:-1]])
            slot = np.arange(len(p_s)) - np.maximum.accumulate(
                np.where(start, np.arange(len(p_s)), 0))
            for r in range(int(slot.max()) + 1 if len(slot) else 0):
                sel = slot == r
                c, f, n = p_s[sel], f_s[sel], c_s[sel]
                cur_c = self.counts[j, c]
                cur_f = self.fps[j, c]
                empty = cur_c == 0
                match = (~empty) & (cur_f == f)
                clash = (~empty) & ~match
                if empty.any():
                    self.counts[j, c[empty]] = n[empty]
                    self.fps[j, c[empty]] = f[empty]
                if match.any():
                    self.counts[j, c[match]] = cur_c[match] + n[match]
                if clash.any():
                    newC, took, leftover = self._decay(cur_c[clash], n[clash])
                    cc = c[clash]
                    keepm = ~took
                    self.counts[j, cc[keepm]] = newC[keepm]
                    self.counts[j, cc[took]] = 1 + leftover[took]
                    self.fps[j, cc[took]] = f[clash][took]

    # ---- query -------------------------------------------------------------
    def estimate(self, items: np.ndarray) -> np.ndarray:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return np.zeros(0, dtype=np.int64)
        out = np.zeros(len(items), dtype=np.int64)
        for j in range(self.nh):
            pos, fp = self._pos_fp(items, j)
            hit = self.fps[j, pos] == fp
            np.maximum(out, np.where(hit, self.counts[j, pos], 0), out=out)
        return out

    # ---- merge / io --------------------------------------------------------
    def merge(self, other: "HeavyKeeper") -> "HeavyKeeper":
        """Cell-wise combine (``hk.h:231-262``): same fingerprint (or one
        side empty) → counts add; clash → larger count minus smaller,
        larger side's fingerprint (tie cancels the cell)."""
        assert (self.p, self.nh, self.fp_bits, self.seedseed) == \
               (other.p, other.nh, other.fp_bits, other.seedseed), "geometry mismatch"
        a_c, b_c = self.counts, other.counts
        compat = (self.fps == other.fps) | (a_c == 0) | (b_c == 0)
        new_counts = np.where(compat, a_c + b_c, np.abs(a_c - b_c))
        other_wins = np.where(compat, a_c == 0, b_c > a_c)
        new_fps = np.where(other_wins, other.fps, self.fps)
        new_fps[new_counts == 0] = 0
        self.counts, self.fps = new_counts, new_fps
        self.n_items += other.n_items
        self._ctr[0] = max(int(self._ctr[0]), int(other._ctr[0])) + 1
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, nh=self.nh, b=self.b, fp_bits=self.fp_bits,
                    seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"counts": self.counts, "fps": self.fps,
                "n_items": self.n_items, "_ctr": self._ctr}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.counts = arrays["counts"]
        self.fps = arrays["fps"]
        self.n_items = arrays["n_items"]
        self._ctr = arrays["_ctr"]


@register_sketch
class HeavyKeeperTopK(MergeableSketch):
    """HeavyKeeper + candidate-key tracking — the ``HeavyKeeperHeap``
    analogue (``hk.h:279-430``): the HK sketch estimates frequencies, a
    bounded key table remembers WHICH items are currently heavy (the
    sketch alone stores only fingerprints). Per batch: update the HK,
    re-estimate the union of tracked and incoming keys, keep the top
    ``capacity`` by estimate. Merge combines the HKs, then re-ranks the
    union of both candidate sets on the merged sketch."""

    kind = "heavykeeper_topk"

    def __init__(self, capacity: int = 128, p: int = 14, nh: int = 4,
                 b: float = 1.08, seedseed: int = 137):
        self.capacity = int(capacity)
        self.hk = HeavyKeeper(p, nh, b, seedseed=seedseed)
        self.keys = np.empty(0, dtype=U64)
        self.n_items = self.hk.n_items

    def _rerank(self, incoming: np.ndarray) -> None:
        cand = np.unique(np.concatenate([self.keys, incoming])) \
            if len(self.keys) or len(incoming) else incoming
        if len(cand) == 0:
            return
        est = self.hk.estimate(cand)
        order = np.lexsort((cand, -est))[: self.capacity]
        keep = order[est[order] > 0]
        self.keys = cand[np.sort(keep)]

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.hk.update(uniq, cnt)
        self.n_items = self.hk.n_items
        self._rerank(uniq)

    def top(self, k: Optional[int] = None):
        """(keys, estimated counts) sorted by estimate desc, key asc."""
        est = self.hk.estimate(self.keys) if len(self.keys) else \
            np.zeros(0, dtype=np.int64)
        order = np.lexsort((self.keys, -est))
        if k is not None:
            order = order[:k]
        return self.keys[order], est[order]

    def estimate(self, items: np.ndarray) -> np.ndarray:
        return self.hk.estimate(items)

    def merge(self, other: "HeavyKeeperTopK") -> "HeavyKeeperTopK":
        assert self.capacity == other.capacity, "geometry mismatch"
        self.hk.merge(other.hk)
        self.n_items = self.hk.n_items
        self._rerank(other.keys)
        return self

    def _params(self) -> Dict:
        return dict(capacity=self.capacity, p=self.hk.p, nh=self.hk.nh,
                    b=self.hk.b, seedseed=self.hk.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"keys": self.keys, **{f"hk_{k}": v
                                      for k, v in self.hk._arrays().items()}}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.keys = arrays["keys"]
        self.hk._set_arrays({k[3:]: v for k, v in arrays.items()
                             if k.startswith("hk_")})
        self.n_items = self.hk.n_items
