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

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ocm_ray.core.hashing import derive_seeds, wanghash

U64 = np.uint64


# ---------------------------------------------------------------------------
# shingling + signatures


def _word_shingles(texts, k: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes, per-doc lengths): k-word shingles hashed to
    uint64 via chained WangHash over stable-hashed lowercase words
    (``texts`` may be a Python list or an Arrow string array)."""
    from ocm_ray.engine.tokens import split_words_hashed

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts)
    flat, lens = split_words_hashed(arr)
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
    # one (shingles × num_perm) hash matrix + a single axis-0 segment-min:
    # ~100x fewer numpy dispatches than a per-permutation loop. Chunked so
    # the matrix stays ~64 MB regardless of batch size.
    chunk = max(1, (1 << 23) // num_perm)
    lo = 0
    while lo < len(starts):
        hi = min(lo + chunk, len(starts))
        s0 = starts[lo]
        s1 = starts[hi] if hi < len(starts) else len(flat)
        h = wanghash(flat[s0:s1, None] ^ seeds[None, :])
        seg = starts[lo:hi] - s0
        sig[np.flatnonzero(nonempty)[lo:hi]] = np.minimum.reduceat(h, seg, axis=0)
        lo = hi
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

    Pipeline: distributed per-batch signature computation (one
    fixed-size-list row per doc) → compact band table (16 B per
    (doc, band)) → sorted-run collision scan → signature-Jaccard verify
    on candidates only. Signatures are computed once and never reshuffled.
    The band scan runs on the collected band table here (sub-GB up to
    ~10M docs); at larger scale shard the band table by bucket-key range
    and run the identical scan per shard (runs cannot span shards).
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    # Stage 1: signatures once per doc, as a fixed-size-list column
    # (zero-copy Arrow; one row per doc, num_perm·8 B)
    def compute_sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sig = minhash_signatures(texts, num_perm, shingle_k, seedseed)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.ravel().view(np.int64)), num_perm)
        return pa.table({id_col: batch.column(id_col), "sig": col})

    sig_tbl = pa.concat_tables(ray.get(
        ds.map_batches(compute_sigs, batch_format="pyarrow").to_arrow_refs()))
    ids_all = sig_tbl.column(id_col).to_numpy(zero_copy_only=False)
    sig_all = (sig_tbl.column("sig").combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).view(U64)
               .reshape(len(ids_all), num_perm))

    # Stage 2: band table — only (band, band_hash, row_idx), 16 B/row,
    # through the shuffle; signatures NEVER move again (broadcast once)
    band_view = sig_all.reshape(len(ids_all), bands, rows_per_band)
    bh = band_view[:, :, 0].copy()
    for j in range(1, rows_per_band):
        bh = wanghash(bh ^ band_view[:, :, j])

    # bucket key: (band << 64-bits folded) — mix band index into the hash so
    # one flat sort finds all collision runs. Most buckets are singletons;
    # per-group task dispatch (groupby.map_groups) costs ~1 ms × #buckets,
    # so candidate detection is a vectorized sorted-run scan instead. At
    # cluster scale the band table shards by key range and each shard runs
    # this same scan (runs never span shards when sharded by bucket key).
    key = wanghash(bh.ravel() ^ (np.tile(np.arange(bands, dtype=U64),
                                         len(ids_all)) << U64(48)))
    rows = np.repeat(np.arange(len(ids_all), dtype=np.int64), bands)
    order = np.argsort(key, kind="stable")
    ks, rs = key[order], rows[order]
    run_start = np.concatenate([[True], ks[1:] != ks[:-1]])
    starts = np.flatnonzero(run_start)
    lens = np.diff(np.concatenate([starts, [len(ks)]]))
    cand_a, cand_b = [], []
    for s, l in zip(starts[lens > 1], lens[lens > 1]):
        grp = rs[s:s + l]
        ii, jj = np.triu_indices(l, k=1)
        cand_a.append(grp[ii])
        cand_b.append(grp[jj])
    if not cand_a:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    a_rows = np.concatenate(cand_a)
    b_rows = np.concatenate(cand_b)
    swap = a_rows > b_rows
    a_rows, b_rows = np.where(swap, b_rows, a_rows), np.where(swap, a_rows, b_rows)
    uniq = np.unique(a_rows << np.int64(32) | b_rows)
    a_rows = (uniq >> np.int64(32)).astype(np.int64)
    b_rows = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
    jac = signature_jaccard(sig_all[a_rows], sig_all[b_rows])
    keep = jac >= threshold
    out = pd.DataFrame({"a": ids_all[a_rows[keep]], "b": ids_all[b_rows[keep]],
                        "jaccard": jac[keep]})
    sw = out["a"] > out["b"]
    out.loc[sw, ["a", "b"]] = out.loc[sw, ["b", "a"]].values
    return (out.sort_values(["a", "b"]).drop_duplicates(["a", "b"])
            .reset_index(drop=True))


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
        from ocm_ray.engine.tokens import split_words_hashed

        flat, lens = split_words_hashed(batch.column(text_col))
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
