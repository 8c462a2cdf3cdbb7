"""MergeableSketch protocol — the UDAF contract every sketch honors.

The reference's vendored sketch library gives every state object the same
shape: a flat typed array + ``addh(uint64)`` + ``est/report()`` + binary
serialization + an associative merge (SURVEY §2.3). This module states that
contract once, in Python, for the Ray Data engine:

* ``update(items, counts)`` — absorb a batch of pre-hashed uint64 items
  (optionally pre-aggregated into ``(unique, count)`` pairs) using only
  vectorized numpy kernels;
* ``merge(other)`` — associative, commutative (property-tested) combine;
* ``to_bytes()/from_bytes()`` — self-describing serialization so partial
  sketches flow through the object store / Parquet checkpoints as plain
  binary columns;
* ``empty_like()`` — the merge identity, used by tree-merge reducers.

Sketches are deliberately plain Python objects holding numpy arrays: Ray
serializes them zero-copy via pickle5 buffers, and ``map_batches`` actor
pools keep one per worker.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, Optional, Type

import numpy as np

_REGISTRY: Dict[str, Type["MergeableSketch"]] = {}


def register_sketch(cls: Type["MergeableSketch"]) -> Type["MergeableSketch"]:
    """Class decorator: register under ``cls.kind`` for deserialization."""
    _REGISTRY[cls.kind] = cls
    return cls


def sketch_class(kind: str) -> Type["MergeableSketch"]:
    return _REGISTRY[kind]


class MergeableSketch:
    """Base class for mergeable sketch states (see module docstring)."""

    kind: str = "abstract"

    # False for sketches whose ``counts`` is an element's FINAL weight
    # (cws/pmh): update(x, w1) then update(x, w2) is NOT update(x, w1+w2)
    # for those, so combiners must never split one element's count across
    # two updates (CountCombiner consults this to disable its mid-stream
    # flush).
    weight_additive: bool = True

    # ---- subclass surface -------------------------------------------------
    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        """Absorb items (uint64 ndarray). ``counts`` (int64, same length)
        means each ``items[i]`` occurs ``counts[i]`` times (pre-aggregated
        batch update). Must be equivalent to repeating the item."""
        raise NotImplementedError

    def merge(self, other: "MergeableSketch") -> "MergeableSketch":
        """In-place associative merge; returns self."""
        raise NotImplementedError

    def _params(self) -> Dict[str, Any]:
        """JSON-serializable constructor params (reconstructs geometry)."""
        raise NotImplementedError

    def _arrays(self) -> Dict[str, np.ndarray]:
        """The state arrays to serialize."""
        raise NotImplementedError

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        for k, v in arrays.items():
            setattr(self, k, v)

    def empty_like(self) -> "MergeableSketch":
        """A fresh zero-state sketch with identical geometry (merge identity)."""
        return type(self)(**self._params())

    # ---- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        """Self-describing binary: one npz archive; params ride in a JSON
        side-array. Stable across processes/nodes (no pickle)."""
        buf = io.BytesIO()
        meta = json.dumps({"kind": self.kind, "params": self._params()})
        np.savez(
            buf,
            __meta__=np.frombuffer(meta.encode("utf-8"), dtype=np.uint8),
            **self._arrays(),
        )
        return buf.getvalue()

    @staticmethod
    def from_bytes(data: bytes) -> "MergeableSketch":
        with np.load(io.BytesIO(data)) as z:
            meta = json.loads(z["__meta__"].tobytes().decode("utf-8"))
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
        cls = sketch_class(meta["kind"])
        obj = cls(**meta["params"])
        obj._set_arrays(arrays)
        return obj

    # ---- conveniences -----------------------------------------------------
    def ensure_writable(self) -> "MergeableSketch":
        """Ray's object store deserializes numpy arrays as read-only
        (zero-copy pickle5 buffers). Call before mutating a sketch that
        came out of ``ray.get`` — copies only the frozen arrays."""
        self._set_arrays({
            k: (v.copy() if isinstance(v, np.ndarray) and not v.flags.writeable else v)
            for k, v in self._arrays().items()
        })
        return self

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self._arrays().values())

    def __repr__(self) -> str:  # pragma: no cover
        p = ", ".join(f"{k}={v}" for k, v in self._params().items())
        return f"{type(self).__name__}({p})"


def merge_all(sketches) -> MergeableSketch:
    """Fold a sequence of sketches into one (left fold; associative so any
    grouping is equivalent — property-tested)."""
    it = iter(sketches)
    acc = next(it)
    for s in it:
        acc.merge(s)
    return acc


def merge_sorted_counts(u1: np.ndarray, c1: np.ndarray,
                        u2: np.ndarray, c2: np.ndarray):
    """Merge two sorted (unique, count) runs into one (single sort pass +
    segment-sum; no second unique)."""
    u = np.concatenate([u1, u2])
    c = np.concatenate([c1, c2])
    if len(u) == 0:
        return u, c
    order = np.argsort(u, kind="stable")
    u, c = u[order], c[order]
    new_run = np.empty(len(u), dtype=bool)
    new_run[0] = True
    np.not_equal(u[1:], u[:-1], out=new_run[1:])
    starts = np.flatnonzero(new_run)
    return u[starts], np.add.reduceat(c, starts)


class CountCombiner:
    """Streaming in-shard combiner: folds every batch's items into one
    sorted (unique, count) table so the sketch sees ONE pre-aggregated
    update per shard instead of one scatter per batch. For a Zipf token
    domain this turns the sketch's random-access traffic from
    O(batches × vocab) into O(vocab) — the difference between a
    memory-bandwidth-bound and a compute-bound build. Domains with
    unbounded distincts (k-grams, hashes) are guarded by ``flush_limit``:
    when the table outgrows it, the sketch absorbs the counts and the
    table resets (still correct — sketch updates are multiset-additive).
    """

    DENSE_DOMAIN = 1 << 22  # ids below this use an O(1)-per-item dense array

    def __init__(self, sketch: Optional[MergeableSketch],
                 flush_limit: int = 1 << 22):
        self.sketch = sketch
        # final-weight sketches (cws/pmh): a mid-stream flush would split
        # an element's weight into two updates whose draws differ from
        # the total-weight draw. For them flush_limit stays a MEMORY cap
        # but crossing it is an ERROR (pre-aggregate weights upstream —
        # grouped count tables), never a silent flush and never a silent
        # unbounded table.
        self._weight_additive = sketch is None or sketch.weight_additive
        self.flush_limit = flush_limit
        self.uniq: Optional[np.ndarray] = None
        self.cnt: Optional[np.ndarray] = None
        self.dense: Optional[np.ndarray] = None  # counts indexed by token id

    def add(self, items: np.ndarray) -> None:
        if len(items) == 0:
            return
        if items.dtype.kind == "f":
            # value sketches (quantiles): no meaningful dedup — direct
            self.sketch.update(items)
            return
        mx = int(items.max())
        if mx < self.DENSE_DOMAIN and self.uniq is None:
            # dense path: one sequential bincount pass per batch — ~10-20x
            # cheaper than the sort-based unique for token-id domains
            bc = np.bincount(items.astype(np.int64, copy=False))
            if self.dense is None:
                self.dense = bc.astype(np.int64)
            else:
                if len(bc) > len(self.dense):
                    self.dense = np.concatenate(
                        [self.dense, np.zeros(len(bc) - len(self.dense), np.int64)])
                self.dense[:len(bc)] += bc
            return
        # generic path (unbounded domains: hashes, k-grams): sorted-run merge
        self._spill_dense()
        u, c = dedupe_counts(items)
        if self.uniq is None:
            self.uniq, self.cnt = u, c
        else:
            self.uniq, self.cnt = merge_sorted_counts(self.uniq, self.cnt, u, c)
        if len(self.uniq) > self.flush_limit:
            if not self._weight_additive:
                raise ValueError(
                    f"{type(self.sketch).__name__} takes FINAL weights "
                    f"(weight_additive=False): the combiner table exceeded "
                    f"flush_limit={self.flush_limit} and flushing would "
                    "split element weights across updates. Pre-aggregate "
                    "to one (element, total_weight) row per element "
                    "upstream (grouped count tables) or raise flush_limit.")
            self.flush()

    def _spill_dense(self) -> None:
        if self.dense is not None:
            nz = np.flatnonzero(self.dense)
            u, c = nz.astype(np.uint64), self.dense[nz]
            self.dense = None
            if self.uniq is None:
                self.uniq, self.cnt = u, c
            else:
                self.uniq, self.cnt = merge_sorted_counts(self.uniq, self.cnt, u, c)

    def flush(self) -> None:
        self._spill_dense()
        if self.uniq is not None and len(self.uniq):
            self.sketch.update(self.uniq, self.cnt)
        self.uniq = self.cnt = None

    def finish(self) -> MergeableSketch:
        self.flush()
        return self.sketch

    def drain_counts(self):
        """(unique, count) accumulated so far WITHOUT updating the sketch
        — used by the multi-round driver to cache shard counts across
        passes. Only valid if nothing has been flushed."""
        self._spill_dense()
        u, c = self.uniq, self.cnt
        self.uniq = self.cnt = None
        if u is None:
            u = np.empty(0, dtype=np.uint64)
            c = np.empty(0, dtype=np.int64)
        return u, c


def dedupe_counts(items: np.ndarray, counts: Optional[np.ndarray] = None):
    """Pre-aggregate a raw item stream into (unique, count) — the in-batch
    combiner every counting sketch uses before touching its arrays. With
    Zipfian token streams this shrinks per-batch scatter work by ~30x."""
    items = np.asarray(items)
    if counts is None:
        uniq, cnt = np.unique(items, return_counts=True)
        return uniq.astype(np.uint64, copy=False), cnt.astype(np.int64, copy=False)
    uniq, inv = np.unique(items, return_inverse=True)
    agg = np.bincount(inv, weights=np.asarray(counts, dtype=np.float64))
    return uniq.astype(np.uint64, copy=False), agg.astype(np.int64)
