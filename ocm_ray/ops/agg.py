"""Tree-structured grouped aggregation for *shrinkable* keyspaces.

Ray Data's native ``groupby().aggregate()`` executes a sort-based
all-to-all — measured 35.7s for a 6.2M-row partial-count table at sf0.1
where the per-block Arrow ``Table.group_by`` tree below takes 0.4s (85x).
The tree is correct whenever the aggregate is commutative+associative and
the key cardinality fits one block after dedup (token vocab, time
buckets, category keys):

    level 0: per-block Arrow group_by  (one row per key per block)
    level k: coalesce ``fanin`` blocks (repartition, no shuffle) and
             group_by again — block sizes collapse to ≤ |keys|
    final:   one block holds the exact grouped sums

For UNshrinkable keyspaces (near-unique keys, e.g. grouping by content
hash for exact dedup), the tree degenerates — use Ray's native groupby
there; it moves every row no matter what.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
from ray.data import Dataset


def _block_group_sum(keys: List[str], sum_cols: List[str]):
    def combine(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            # schema-less empty (rule 8b) — nothing to aggregate from
            return t
        # NOTE: a schema'd EMPTY block must still go through group_by:
        # the aggregate promotes int32 sums to int64 and reorders
        # columns to keys+sums, and passing the raw input schema
        # through would leave the repartition tree concatenating
        # blocks with conflicting schemas
        g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        cols = {k: g.column(k) for k in keys}
        for c in sum_cols:
            cols[c] = g.column(f"{c}_sum")
        return pa.table(cols)

    return combine


def grouped_sum(ds: Dataset, keys: List[str], sum_cols: List[str],
                fanin: int = 8, levels: int = 2) -> Dataset:
    """Exact grouped sums via the per-block tree (see module docstring).
    Returns a Dataset with columns ``keys + sum_cols`` (single block)."""
    if levels < 1:
        raise ValueError(f"levels must be >= 1 (got {levels}): levels=0 "
                         "would return un-collapsed multi-block partials")
    combine = _block_group_sum(keys, sum_cols)
    out = ds.map_batches(combine, batch_size=None, batch_format="pyarrow")
    width = fanin ** (levels - 1)
    while width >= 1:
        out = out.repartition(width).map_batches(
            combine, batch_size=None, batch_format="pyarrow")
        if width == 1:
            break
        width //= fanin
    return out


def grouped_topk(ds: Dataset, keys: List[str], rank_col: str, k: int,
                 tie_cols: List[str] | None = None, descending: bool = True,
                 fanin: int = 8, levels: int = 2) -> Dataset:
    """Exact top-k ROWS per key group, shuffle-free.

    Per-block top-k-per-key is a valid partial reducer (each row lives in
    exactly one block, so the global per-key top-k is contained in the
    union of per-block top-k's); blocks therefore shrink to ≤ k rows per
    key present, and the same repartition tree as :func:`grouped_sum`
    coalesces them. Collation is total and deterministic:
    ``rank_col`` (desc by default) then ``tie_cols`` asc — the SQL
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...) <= k`` result.
    Driver/output size is bounded by k × |keys|.
    """
    import numpy as np
    import pyarrow.compute as pc

    if levels < 1:
        raise ValueError(f"levels must be >= 1 (got {levels}): levels=0 "
                         "would return un-collapsed multi-block partials")
    tie_cols = tie_cols or []

    def sel(t: pa.Table) -> pa.Table:
        # Arrow-native (no pandas round-trip): sort_by + take PRESERVE
        # the input schema exactly, so empty passthrough blocks and
        # selected blocks can't diverge (int64-with-null → float64 and
        # large_string → string drift would break the repartition tree's
        # concat — the hazard _block_group_sum's NOTE documents)
        if t.num_rows == 0:
            return t
        order = [(c, "ascending") for c in keys] \
            + [(rank_col, "descending" if descending else "ascending")] \
            + [(c, "ascending") for c in tie_cols]
        t = t.sort_by(order)
        n = t.num_rows
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        for c in keys:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            a, b = col.slice(1), col.slice(0, n - 1)
            # null-aware boundary (SQL semantics: NULLs form ONE group):
            # change iff null-ness differs, or both non-null and unequal
            an, bn = pc.is_null(a), pc.is_null(b)
            neq = pc.fill_null(pc.not_equal(a, b), False)
            change = pc.or_(pc.xor(an, bn), neq)
            new_key[1:] |= change.to_numpy(zero_copy_only=False)
        run = np.cumsum(new_key) - 1
        pos = np.arange(n, dtype=np.int64)
        starts = pos[new_key]
        keep = (pos - starts[run]) < k
        return t.take(np.flatnonzero(keep))

    out = ds.map_batches(sel, batch_size=None, batch_format="pyarrow")
    width = fanin ** (levels - 1)
    while width >= 1:
        out = out.repartition(width).map_batches(
            sel, batch_size=None, batch_format="pyarrow")
        if width == 1:
            break
        width //= fanin
    return out
