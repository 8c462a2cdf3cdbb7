"""Distributed bucket-collision pair emission — the shared shuffle stage
of the near-dedup family (MinHash-LSH, SimHash banding, n-gram Jaccard).

The input is a compact *band table* Dataset with two columns:

    key : int64   (a well-mixed uint64 bucket key, viewed as int64)
    id  : any     (the document / vector id)

Two rows colliding on ``key`` are a candidate pair. The table is sharded
by the TOP bits of ``key`` (a prefix of the key — runs can never span
shards), shuffled once with ``groupby(shard)`` (a few dozen groups, so
the ~1 ms/group ``map_groups`` dispatch cost is irrelevant — CLAUDE.md
rule 3 bans map_groups over MANY groups, not few), and each shard runs
the vectorized sorted-run scan locally. Only (key, id) pairs — ~16 B/row
— ever move; signatures / fingerprints / embeddings stay where they were
computed. Driver memory is bounded by the EMITTED candidate set (output-
sized), never by the corpus.

At 100 TB scale ``n_shards`` should grow with the corpus so one shard's
band rows fit a worker (each shard ≈ rows × 16 B / n_shards).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

U64 = np.uint64


def _shard_bits(n_shards: int) -> int:
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
    return int(n_shards).bit_length() - 1


def add_shard_column(band_ds: Dataset, n_shards: int = 64,
                     key_col: str = "key") -> Dataset:
    """Append ``shard`` = top log2(n_shards) bits of the (uint64-viewed)
    key. Keys are wang-mixed hashes, so the prefix is uniform."""
    bits = _shard_bits(n_shards)

    def add(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).view(U64)
        shard = (k >> U64(64 - bits)).astype(np.int32) if bits else \
            np.zeros(len(k), np.int32)
        return batch.append_column("shard", pa.array(shard))

    return band_ds.map_batches(add, batch_format="pyarrow")


def _scan_runs(key: np.ndarray, max_bucket: Optional[int]):
    """Vectorized sorted-run scan: returns (row_i, row_j) index pairs of
    all within-run combinations (the candidate pairs of one shard)."""
    order = np.argsort(key, kind="stable")
    ks = key[order]
    run_start = np.concatenate([[True], ks[1:] != ks[:-1]])
    starts = np.flatnonzero(run_start)
    lens = np.diff(np.concatenate([starts, [len(ks)]]))
    ii_all, jj_all = [], []
    for s, l in zip(starts[lens > 1], lens[lens > 1]):
        if max_bucket is not None and l > max_bucket:
            continue  # skip degenerate mega-buckets (documented cap)
        grp = order[s:s + l]
        ii, jj = np.triu_indices(int(l), k=1)
        ii_all.append(grp[ii])
        jj_all.append(grp[jj])
    if not ii_all:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(ii_all), np.concatenate(jj_all)


def collision_pairs(band_ds: Dataset, n_shards: int = 64,
                    key_col: str = "key", id_col: str = "id",
                    max_bucket: Optional[int] = None) -> Dataset:
    """Candidate pairs (a, b) from key collisions, fully distributed.

    One ``groupby(shard)`` shuffle of the 16 B/row band table; per-shard
    vectorized run scan; pairs canonicalized a < b per row. Pairs found
    via multiple keys (bands) may repeat across shards — dedupe on the
    (small) candidate set downstream. ``max_bucket`` optionally skips
    pathological buckets (standard LSH practice at scale); ``None`` keeps
    every pair.
    """
    sharded = add_shard_column(band_ds, n_shards, key_col)

    def scan(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).view(U64)
        ii, jj = _scan_runs(key, max_bucket)
        ids = group.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        a = ids.take(pa.array(ii))
        b = ids.take(pa.array(jj))
        # canonicalize a < b elementwise (works for ints and strings)
        import pyarrow.compute as pc

        swap = pc.greater(a, b)
        lo = pc.if_else(swap, b, a)
        hi = pc.if_else(swap, a, b)
        return pa.table({"a": lo, "b": hi})

    return (sharded.groupby("shard")
            .map_groups(scan, batch_format="pyarrow"))


def collect_unique_pairs(cand: Dataset) -> pd.DataFrame:
    """Materialize the (output-sized) candidate set, dedupe, sort."""
    df = cand.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"a": [], "b": []})
    return (df.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
            .reset_index(drop=True))


def lookup_rows_for_ids(ds: Dataset, ids: np.ndarray, id_col: str) -> pa.Table:
    """Fetch the rows of ``ds`` whose ``id_col`` is in ``ids`` — broadcast
    the (small, candidate-sized) sorted id array once via ``ray.put`` and
    filter per batch with stateless tasks (no actor-pool startup cost);
    only matching rows come back (output-bounded)."""
    import pyarrow.compute as pc
    import ray

    ref = ray.put(np.sort(np.asarray(ids)))

    def keep_wanted(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)  # zero-copy from the shared object store
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(wanted))
        return batch.filter(mask)

    out = ds.map_batches(keep_wanted, batch_format="pyarrow")
    all_t = ray.get(out.to_arrow_refs())
    nonempty = [t for t in all_t if t.num_rows]
    if not (nonempty or all_t):
        return pa.table({})
    return pa.concat_tables(nonempty or all_t[:1], promote_options="default")
