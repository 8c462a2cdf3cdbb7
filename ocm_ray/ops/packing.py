"""Sequence packing — tokenized documents → fixed-length training rows.

The last mile of an LLM data pipeline: concatenate each block's token
lists (an EOS id between documents), slice into exactly-``seq_len``
rows, drop (or pad) the tail. Packing is PER BLOCK, with no carry-over
between blocks: that keeps the stage a stateless, order-free
``map_batches`` transform (any partitioning, any retry → same rows from
the same block), at the cost of at most one partial sequence of waste
per block — negligible when blocks hold thousands of documents, and the
price of not serializing the whole corpus through one stateful packer.

Everything is one numpy scatter per batch (the EOS interleave is a
vectorized index shift, not a per-doc loop).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def pack_batch(flat: np.ndarray, lens: np.ndarray, seq_len: int,
               eos_id: Optional[int], pad_id: int,
               drop_remainder: bool) -> np.ndarray:
    """(n_seq, seq_len) int32 from one block's flattened tokens."""
    flat = flat.astype(np.int32, copy=False)
    n_docs = len(lens)
    if eos_id is not None and n_docs:
        # vectorized interleave: every token shifts right by the number
        # of EOS markers before its document; gaps become EOS
        dst = np.arange(len(flat), dtype=np.int64) \
            + np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        out = np.full(len(flat) + n_docs, np.int32(eos_id))
        out[dst] = flat
        flat = out
    n_full = len(flat) // seq_len
    if drop_remainder or len(flat) == n_full * seq_len:
        return flat[: n_full * seq_len].reshape(n_full, seq_len)
    padded = np.full((n_full + 1) * seq_len, np.int32(pad_id))
    padded[: len(flat)] = flat
    return padded.reshape(n_full + 1, seq_len)


def pack_sequences(ds: Dataset, seq_len: int = 2048,
                   column: str = "tokens", eos_id: Optional[int] = None,
                   pad_id: int = 0, drop_remainder: bool = True,
                   batch_size: Optional[int] = 4096) -> Dataset:
    """tokens: list<int32> → ``input_ids: fixed_size_list<int32>[seq_len]``
    (+ ``n_tokens``: real tokens in the row, < seq_len only for a padded
    tail row)."""
    def pack(batch: pa.Table) -> pa.Table:
        from ocm_ray.engine.tokens import list_column_values

        flat, lens = list_column_values(batch, column)
        seqs = pack_batch(flat, lens, seq_len, eos_id, pad_id, drop_remainder)
        total = len(flat) + (len(lens) if eos_id is not None else 0)
        n_tok = np.full(len(seqs), seq_len, dtype=np.int32)
        if len(seqs) and not drop_remainder and total < seqs.size:
            n_tok[-1] = total - (len(seqs) - 1) * seq_len
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(seqs.ravel(), type=pa.int32()), seq_len)
        return pa.table({"input_ids": col,
                         "n_tokens": pa.array(n_tok)})

    return ds.map_batches(pack, batch_format="pyarrow",
                          batch_size=batch_size)
