"""Deduplication operators for training-data pipelines.

Five dedup modes, each expressed Ray-Data-first:

* exact        — content-hash groupby, keep min id (SQL-oracled in
                 ``__ray_entry__.dedup_exact``);
* MinHash-LSH  — shingle → minhash signature → banded bucketing →
                 candidate pairs → signature-Jaccard verify. The banding
                 shuffle moves only (band, hash, id) triples, never text;
* n-gram Jaccard — exact set-overlap verification of candidate pairs
                 (broadcast shingle sets at test scale; per-bucket joins
                 at cluster scale);
* SimHash      — 64-bit fingerprints, near-dups via Hamming banding;
* embedding    — cosine near-dup pairs via hyperplane-LSH buckets (or
                 brute force at small scale).

All signature math is vectorized numpy over exploded shingle arrays with
``np.minimum.reduceat`` segment reductions — no per-document Python in
the hot path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ocm_ray.core.hashing import derive_seeds, wanghash

U64 = np.uint64


# ---------------------------------------------------------------------------
# shingling + signatures


def _word_shingles(texts: List[str], k: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes, per-doc lengths): k-word shingles hashed to
    uint64 via chained WangHash over polars-hashed words."""
    import polars as pl

    s = pl.Series(texts).str.to_lowercase().str.split(" ")
    lens = s.list.len().to_numpy().astype(np.int64)
    flat = s.explode().hash(seed=137).to_numpy().astype(U64, copy=False)
    if k <= 1:
        return flat, lens
    n = len(flat)
    if n < k:
        return np.empty(0, U64), np.zeros(len(texts), np.int64)
    win = np.lib.stride_tricks.sliding_window_view(flat, k)
    acc = wanghash(win[:, 0])
    for j in range(1, k):
        acc = wanghash(acc ^ win[:, j])
    rowid = np.repeat(np.arange(len(lens)), lens)
    valid = rowid[: n - k + 1] == rowid[k - 1:]
    out_lens = np.maximum(lens - k + 1, 0)
    return acc[valid], out_lens


def minhash_signatures(texts: List[str], num_perm: int = 128,
                       shingle_k: int = 3, seedseed: int = 137) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix, fully
    vectorized: one wanghash + segment-min per permutation."""
    flat, lens = _word_shingles(texts, shingle_k)
    n_docs = len(lens)
    seeds = derive_seeds(num_perm, seedseed)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=U64)
    nonempty = lens > 0
    if flat.size == 0:
        return sig
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1][nonempty].astype(np.int64)
    for j, s in enumerate(seeds):
        h = wanghash(flat ^ U64(s))
        sig[nonempty, j] = np.minimum.reduceat(h, starts)
    return sig


def signature_jaccard(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from matching minhash components (row-wise)."""
    return (a == b).mean(axis=-1)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs


def minhash_lsh_pairs(ds: Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 3,
                      threshold: float = 0.8,
                      seedseed: int = 137) -> pd.DataFrame:
    """Near-duplicate pairs with estimated Jaccard ≥ threshold.

    Pipeline: per-batch signatures → explode to (band, band_hash, id,
    signature) rows → groupby band buckets → intra-bucket candidate
    pairs → signature-Jaccard verify → dedup pairs. The grouped stage
    sees only buckets with ≥2 docs; signatures ride along (num_perm·8 B
    per doc) so verification needs no second join.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, num_perm, shingle_k, seedseed)
        band_view = sig.reshape(len(ids), bands, rows_per_band)
        bh = band_view[:, :, 0].astype(U64)
        for j in range(1, rows_per_band):
            bh = wanghash(bh ^ band_view[:, :, j])
        n = len(ids)
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.ravel().astype(np.int64)),
            id_col: pa.array(np.repeat(ids, bands)),
            "sig": pa.array(list(np.repeat(sig, bands, axis=0).view(np.int64))),
        })

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        ids = df[id_col].to_numpy()
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in df["sig"]]).view(U64)
        ii, jj = np.triu_indices(len(ids), k=1)
        jac = signature_jaccard(sigs[ii], sigs[jj])
        keep = jac >= threshold
        a, b = ids[ii[keep]], ids[jj[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a": a2, "b": b2, "jaccard": jac[keep]})

    pairs = (ds.map_batches(to_bands, batch_format="pyarrow")
             .groupby(["band", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas())
    if len(pairs) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    pairs = (pairs.sort_values(["a", "b"])
             .drop_duplicates(["a", "b"]).reset_index(drop=True))
    return pairs


def ngram_jaccard_verify(pairs: pd.DataFrame, docs: pd.DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         shingle_k: int = 3) -> pd.DataFrame:
    """EXACT n-gram Jaccard for candidate pairs (the verify stage after
    LSH). ``docs`` is the id→text table for the candidate ids only —
    broadcastable because candidates are a tiny fraction of the corpus."""
    flat, lens = _word_shingles(docs[text_col].tolist(), shingle_k)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    sets = {doc: set(flat[bounds[i]:bounds[i + 1]].tolist())
            for i, doc in enumerate(docs[id_col])}
    exact = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sets[a], sets[b]
        u = len(sa | sb)
        exact.append(len(sa & sb) / u if u else 1.0)
    out = pairs.copy()
    out["jaccard_exact"] = exact
    return out


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints(ds: Dataset, id_col: str = "doc_id",
                         text_col: str = "text") -> Dataset:
    """64-bit SimHash per document: sign-sum of token-hash bit vectors.
    Near-dup docs differ in few bits (Hamming)."""
    def fp(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column(text_col)).str.to_lowercase().str.split(" ")
        lens = s.list.len().to_numpy().astype(np.int64)
        flat = s.explode().hash(seed=137).to_numpy().astype(U64, copy=False)
        bits = ((flat[:, None] >> np.arange(64, dtype=U64)) & U64(1)).astype(np.int32)
        bits = bits * 2 - 1  # ±1
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.int64)
        ne = lens > 0
        acc = np.zeros((len(lens), 64), dtype=np.int64)
        if flat.size:
            acc[ne] = np.add.reduceat(bits, starts[ne], axis=0)[: ne.sum()]
        fp_bits = (acc > 0).astype(np.uint64)
        fps = (fp_bits << np.arange(64, dtype=U64)).sum(axis=1, dtype=np.uint64)
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(fps.astype(np.int64))})

    return ds.map_batches(fp, batch_format="pyarrow")


def simhash_pairs(ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: fingerprints agreeing on one of
    4 16-bit bands are candidates; verify exact Hamming distance."""
    fps = simhash_fingerprints(ds, id_col, text_col).to_pandas()
    ids = fps[id_col].to_numpy()
    h = fps["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    cands = set()
    for band in range(4):
        key = (h >> U64(band * 16)) & U64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [len(ks)]])
        for s, e in zip(starts, ends):
            if e - s > 1:
                grp = order[s:e]
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        a, b = sorted((int(grp[i]), int(grp[j])))
                        cands.add((a, b))
    rows = []
    for i, j in cands:
        d = int(bin(int(h[i]) ^ int(h[j])).count("1"))
        if d <= max_hamming:
            a, b = sorted((ids[i], ids[j]))
            rows.append({"a": a, "b": b, "hamming": d})
    return pd.DataFrame(rows, columns=["a", "b", "hamming"]).sort_values(
        ["a", "b"]).reset_index(drop=True) if rows else \
        pd.DataFrame({"a": [], "b": [], "hamming": []})


# ---------------------------------------------------------------------------
# embedding near-dup


def embedding_dup_pairs(ds: Dataset, threshold: float = 0.95,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        bits: int = 0, seedseed: int = 137) -> pd.DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    ``bits=0`` → brute force (batch × corpus matmul against a broadcast
    normalized matrix — exact, fine to ~10^5 vectors). ``bits>0`` →
    hyperplane-LSH bucketing first: only intra-bucket (±1-bit probe)
    pairs are scored, the 100 TB path."""
    from ocm_ray.ops.similarity import _embedding_matrix, _normalize, add_lsh_bucket

    if bits:
        bucketed = add_lsh_bucket(ds, dim=None or len(ds.take(1)[0][emb_col]),
                                  bits=bits, emb_col=emb_col, seedseed=seedseed)
        df = bucketed.to_pandas()
        out = []
        for _, grp in df.groupby("bucket"):
            m = _normalize(np.stack(grp[emb_col].to_numpy()).astype(np.float64))
            ids = grp[id_col].to_numpy()
            sims = m @ m.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            for i, j in zip(ii, jj):
                a, b = sorted((ids[i], ids[j]))
                out.append({"a": a, "b": b, "sim": sims[i, j]})
        return pd.DataFrame(out, columns=["a", "b", "sim"]).sort_values(
            ["a", "b"]).reset_index(drop=True) if out else \
            pd.DataFrame({"a": [], "b": [], "sim": []})

    # brute force: broadcast the whole normalized matrix once
    full = ds.to_pandas()
    ids_all = full[id_col].to_numpy()
    m_all = _normalize(np.stack(full[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids_all, m_all))

    def score(batch: pa.Table) -> pa.Table:
        ids_a, m_a = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = _normalize(_embedding_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = m @ m_a.T
        ii, jj = np.where(sims >= threshold)
        keep = ids[ii] < ids_a[jj]  # dedup + drop self-pairs
        return pa.table({"a": pa.array(ids[ii][keep]),
                         "b": pa.array(ids_a[jj][keep]),
                         "sim": pa.array(sims[ii, jj][keep])})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def exact_dedup(ds: Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> Dataset:
    """Exact dedup by content: one representative (min id) per distinct
    text + multiplicity. Content is grouped via its hash (the 100 TB
    shuffle key), not the raw text."""
    def hash_col(batch: pa.Table) -> pa.Table:
        from ocm_ray.engine.tokens import hash_string_array

        h = hash_string_array(batch.column(text_col)).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "content_hash": pa.array(h)})

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [df[id_col].min()],
                             "n_copies": [len(df)]})

    return (ds.map_batches(hash_col, batch_format="pyarrow")
            .groupby("content_hash")
            .map_groups(keep_min, batch_format="pandas"))
