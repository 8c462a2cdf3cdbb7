"""Distributed sketch building over ``ray.data.Dataset``.

Two build paths, both producing ONE merged sketch from a token Dataset:

1. ``build_sketch`` (primary, scale path) — ``Dataset.streaming_split(P)``
   feeds P concurrent accumulator tasks; each task streams its shard's
   Arrow batches with backpressure and owns exactly one partial sketch
   (the "stateful stage" pattern: state allocated once per worker, not
   per batch), then the P partials — MBs each, independent of input size
   — are tree-merged with fan-in 8. No shuffle of token data ever happens:
   partial+merge is salted pre-aggregation by construction (SURVEY §4.2).

2. ``SketchAggregate`` — an ``AggregateFnV2`` UDAF so sketches compose
   with the native Dataset API: ``ds.aggregate(SketchAggregate(...))`` and
   per-key ``ds.groupby("source").aggregate(...)`` (per-source sketches).
   Ray Data executes this as per-block partials + tree combine.

Both paths are correctness-equivalent; the order-free sketches (vanilla
CM, HLL, Bloom, bottom-k, OCM passes) are bit-identical between them and
across any parallelism (property-tested).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import AggregateFnV2

from ocm_ray.engine.tokens import items_from_batch
from ocm_ray.sketches.base import MergeableSketch

SketchFactory = Callable[[], MergeableSketch]


def _default_parallelism() -> int:
    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, n)


# Accumulator tasks reserve half a CPU each: P consumers co-exist with the
# Dataset's read tasks on the same cores. Reserving a full CPU per consumer
# deadlocks a fully-subscribed cluster (consumers hold every slot, the read
# operator can never schedule, consumers wait on reads forever).
@ray.remote(num_cpus=0.5)
def _consume_split(it, factory: SketchFactory, column: str, kgram: int):
    sk = factory()
    for batch in it.iter_batches(batch_format="pyarrow", batch_size=None,
                                 prefetch_batches=2):
        sk.update(items_from_batch(batch, column, kgram))
    return sk


@ray.remote
def _merge_task(*sketches: MergeableSketch) -> MergeableSketch:
    acc = sketches[0].ensure_writable()
    for s in sketches[1:]:
        acc.merge(s)
    return acc


def tree_merge(refs: List[ray.ObjectRef], fanin: int = 8) -> MergeableSketch:
    """Reduce partial-sketch object refs with a fan-in-8 task tree —
    log_8(P) rounds; each round moves only sketch-sized objects."""
    refs = list(refs)
    while len(refs) > 1:
        refs = [_merge_task.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return ray.get(refs[0]).ensure_writable()


def build_sketch(ds: Dataset, factory: SketchFactory, column: str = "tokens",
                 parallelism: Optional[int] = None, kgram: int = 1) -> MergeableSketch:
    """Stream the Dataset through P accumulator tasks → tree-merged sketch."""
    p = parallelism or _default_parallelism()
    splits = ds.streaming_split(p, equal=False)
    refs = [_consume_split.remote(it, factory, column, kgram) for it in splits]
    return tree_merge(refs)


class SketchAggregate(AggregateFnV2):
    """Mergeable-sketch UDAF for the native aggregate/groupby API.

    ``ds.aggregate(SketchAggregate(factory, on="tokens"))`` →
    ``{name: serialized sketch bytes}``;
    ``ds.groupby("source").aggregate(...)`` → one sketch row per key.
    Finalized value is ``to_bytes()`` (self-describing; restore with
    ``MergeableSketch.from_bytes``).
    """

    def __init__(self, factory: SketchFactory, on: str = "tokens",
                 name: Optional[str] = None, kgram: int = 1):
        self._factory = factory
        self._kgram = kgram
        super().__init__(name or f"sketch({on})", zero_factory=factory,
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block) -> MergeableSketch:
        # V2 contract: produce a fresh partial per block; `combine` merges.
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        sk = self._factory()
        sk.update(items_from_batch(block, self.get_target_column(), self._kgram))
        return sk

    def combine(self, a: MergeableSketch, b: MergeableSketch) -> MergeableSketch:
        return a.ensure_writable().merge(b)

    def finalize(self, accumulator: MergeableSketch) -> bytes:
        return accumulator.to_bytes()


def grouped_sketches(ds: Dataset, key: str, factory: SketchFactory,
                     column: str = "tokens", kgram: int = 1) -> dict:
    """One merged sketch per value of ``key`` (e.g. per ``source``).

    Implemented as per-batch partial sketches per key inside
    ``map_batches`` (one row per key per block — classic salted
    pre-aggregation, so the shuffle moves sketch states, never tokens)
    followed by a small ``groupby().map_groups`` merge."""
    def partials(batch: pa.Table):
        out_keys, out_states = [], []
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        for kv in np.unique(keys):
            sub = batch.filter(pa.compute.equal(batch.column(key), kv))
            sk = factory()
            sk.update(items_from_batch(sub, column, kgram))
            out_keys.append(kv)
            out_states.append(sk.to_bytes())
        return pa.table({key: out_keys, "state": out_states})

    def merge_group(df):
        acc = MergeableSketch.from_bytes(df["state"].iloc[0]).ensure_writable()
        for blob in df["state"].iloc[1:]:
            acc.merge(MergeableSketch.from_bytes(blob))
        import pandas as pd

        return pd.DataFrame({key: [df[key].iloc[0]], "state": [acc.to_bytes()]})

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_group, batch_format="pandas")
        .take_all()
    )
    return {r[key]: MergeableSketch.from_bytes(r["state"]) for r in rows}
