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
