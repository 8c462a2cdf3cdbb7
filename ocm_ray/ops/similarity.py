"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
matrix via ``ray.put``, one numpy matmul per batch, per-batch top-k
candidate pruning, exact global top-k from the tiny candidate union.

Scale path: ``lsh_topk`` — random-hyperplane LSH bucketing: each vector
is assigned ``sign(R·v)`` bucket bits in a vectorized map, candidates are
restricted to the query's bucket (± multiprobe flips), so the per-query
work drops from O(N) to O(N / 2^bits) at a recall cost. The same
partitioned layout (write Parquet partitioned by bucket prefix) turns
this into an index at 100 TB scale.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ocm_ray.core.hashing import MT19937_64


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 from a list<float> / fixed_size_list / Ray tensor
    extension column."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type) \
            or pa.types.is_fixed_size_list(arr.type):
        if arr.null_count:
            # flatten() silently DROPS null lists, which would misalign
            # every id after the null with the wrong vector — fail loud
            raise ValueError(
                f"embedding column {col!r} has {arr.null_count} null "
                "row(s); drop or impute them upstream of similarity ops")
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = (arr.type.list_size if pa.types.is_fixed_size_list(arr.type)
               else len(arr[0]))
        return flat.reshape(-1, dim)
    # Ray's ArrowTensorArray (from_pandas with ndarray cells) or object rows
    m = np.asarray(arr.to_numpy(zero_copy_only=False))
    if m.dtype == object:
        m = np.stack(m)
    return m.astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _topk_stage(batch: pa.Table, q_ref, id_col: str, emb_col: str,
                k: int) -> pa.Table:
    """Per-batch candidate pruning: cosine vs the broadcast query matrix
    (``ray.put`` once, zero-copy ``ray.get`` per batch), emit only the
    per-batch top-k rows per query (k rows/query/block, not N)."""
    if batch.num_rows == 0:
        # empty upstream block, possibly schema-less (rule 8b) — emit
        # the same schema-less empty Ray itself uses
        return pa.table({})
    q = _normalize(np.atleast_2d(np.asarray(
        ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref,
        dtype=np.float64)))
    m = _normalize(_embedding_matrix(batch, emb_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sims = q @ m.T  # (Q, B)
    k = min(k, sims.shape[1])
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    qi = np.repeat(np.arange(sims.shape[0]), k)
    vi = part.ravel()
    return pa.table({
        "query_idx": pa.array(qi.astype(np.int32)),
        "vec_id": pa.array(ids[vi]),
        "sim": pa.array(sims[qi, vi]),
    })


def brute_force_topk(ds: Dataset, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency: Optional[int] = None) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    (query_idx, vec_id, sim, rank) with deterministic tie-breaking
    (sim desc, vec_id asc). Stateless task stage — no actor-pool
    startup on the critical path; the query matrix broadcasts once.
    ``concurrency`` caps the concurrent scoring tasks (None = let the
    streaming executor schedule freely, the default)."""
    import functools

    ref = ray.put(np.asarray(queries, dtype=np.float64))
    cand = ds.map_batches(
        functools.partial(_topk_stage, q_ref=ref, id_col=id_col,
                          emb_col=emb_col, k=k),
        batch_format="pyarrow", concurrency=concurrency).to_pandas()
    if cand.empty or "query_idx" not in cand.columns:
        # every candidate block was empty (e.g. lsh_topk probed buckets
        # holding no corpus vectors) — schema-less blocks union to a
        # column-less frame; return the documented empty result
        return pd.DataFrame({"query_idx": [], "vec_id": [], "sim": [],
                             "rank": []})
    cand = cand.sort_values(["query_idx", "sim", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount()
    return out


def _hyperplanes(dim: int, bits: int, seedseed: int = 137) -> np.ndarray:
    """Deterministic Gaussian hyperplanes via Box-Muller over mt19937_64."""
    rng = MT19937_64(seedseed)
    n = dim * bits
    u = np.array([rng() for _ in range(2 * n)],
                 dtype=np.uint64).astype(np.float64) / np.float64(2.0**64)
    u = u.reshape(2, -1)
    z = np.sqrt(-2 * np.log(np.clip(u[0], 1e-12, 1))) * np.cos(2 * np.pi * u[1])
    return z[:n].reshape(bits, dim)


def add_lsh_bucket(ds: Dataset, dim: int, bits: int = 8,
                   emb_col: str = "embedding", seedseed: int = 137) -> Dataset:
    """Append a random-hyperplane LSH ``bucket`` column (int32). At scale,
    write Parquet partitioned by this column to get an on-disk ANN index."""
    planes = _hyperplanes(dim, bits, seedseed)
    ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        p = ray.get(ref)  # zero-copy broadcast read
        m = _embedding_matrix(batch, emb_col)
        bitsmat = (m @ p.T) > 0
        bucket = (bitsmat @ (1 << np.arange(bitsmat.shape[1]))).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def _probe_buckets(q: np.ndarray, bits: int, multiprobe: int,
                   seedseed: int) -> list:
    """Buckets within Hamming distance ``multiprobe`` of each query's
    bucket (distance 0..multiprobe — all combinations of that many bit
    flips, the contract the docstrings promise; an earlier version only
    ever flipped one bit regardless of the setting)."""
    from itertools import combinations

    planes = _hyperplanes(q.shape[1], bits, seedseed)
    qbits = (q @ planes.T) > 0
    qbuckets = (qbits @ (1 << np.arange(bits))).astype(np.int32)
    masks = [0]
    for r in range(1, max(0, min(multiprobe, bits)) + 1):
        masks.extend(sum(1 << j for j in c)
                     for c in combinations(range(bits), r))
    probe = {int(b) ^ m for b in qbuckets for m in masks}
    return sorted(probe)


def build_ann_index(ds: Dataset, index_dir: str, bits: int = 8,
                    emb_col: str = "embedding", seedseed: int = 137) -> dict:
    """Materialize the LSH-bucketed corpus as an on-disk ANN index:
    Parquet partitioned by ``bucket`` (one directory per bucket — the
    prunable layout), plus a small JSON sidecar with the geometry. Build
    once; every ``lsh_topk(index_dir=...)`` probe then READS ONLY the
    probed bucket partitions instead of re-bucketing the corpus."""
    import json

    dim = len(ds.take(1)[0][emb_col])
    bucketed = add_lsh_bucket(ds, dim, bits, emb_col, seedseed)
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    meta = dict(dim=dim, bits=bits, seedseed=seedseed, emb_col=emb_col)
    with open(f"{index_dir}/_ann_meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def lsh_topk(ds: Optional[Dataset], queries: np.ndarray, k: int = 10,
             bits: Optional[int] = None, multiprobe: int = 1,
             id_col: str = "vec_id", emb_col: str = "embedding",
             seedseed: Optional[int] = None,
             index_dir: Optional[str] = None) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe`` bit-flips of the query's bucket.

    Two modes: ``ds`` given → bucket on the fly (one corpus scan;
    ``bits``/``seedseed`` default 8/137); ``index_dir`` given → pruned
    ``read_parquet`` of ONLY the probed bucket partitions of a
    :func:`build_ann_index` layout — the 100 TB path (per-query I/O ∝
    probed fraction, not corpus size). In index mode the geometry comes
    from the persisted sidecar; explicitly passed ``bits``/``seedseed``
    must MATCH it (probing a different geometry than the one the index
    was bucketed with returns silently wrong neighbors)."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if index_dir is not None:
        import json
        import os

        import ray.data as rd

        with open(f"{index_dir}/_ann_meta.json") as f:
            meta = json.load(f)
        assert meta["dim"] == q.shape[1]
        if bits is not None and bits != meta["bits"]:
            raise ValueError(f"lsh_topk: bits={bits} != index meta "
                             f"bits={meta['bits']} ({index_dir})")
        if seedseed is not None and seedseed != meta["seedseed"]:
            raise ValueError(f"lsh_topk: seedseed={seedseed} != index meta "
                             f"seedseed={meta['seedseed']} ({index_dir})")
        allowed = _probe_buckets(q, meta["bits"], multiprobe, meta["seedseed"])
        import glob as _glob

        paths = [f for b in allowed
                 for f in sorted(_glob.glob(f"{index_dir}/bucket={b}/*.parquet"))]
        if not paths:
            return pd.DataFrame({"query_idx": [], "vec_id": [], "sim": [],
                                 "rank": []})
        return brute_force_topk(rd.read_parquet(paths), q, k, id_col,
                                meta["emb_col"])

    bits = 8 if bits is None else bits
    seedseed = 137 if seedseed is None else seedseed
    allowed = _probe_buckets(q, bits, multiprobe, seedseed)
    bucketed = add_lsh_bucket(ds, q.shape[1], bits, emb_col, seedseed)

    def keep_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # bare `import pyarrow` lacks it

        return t.filter(pc.is_in(t.column("bucket"),
                                 value_set=pa.array(allowed, pa.int32())))

    filtered = bucketed.map_batches(keep_probed, batch_format="pyarrow")
    return brute_force_topk(filtered, q, k, id_col, emb_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + partitioned index.
# Complements lsh_topk: data-adaptive cells follow the embedding
# distribution (LSH cells are data-oblivious), usually better recall per
# probed fraction on clustered real-world embeddings.


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 12,
                seedseed: int = 137) -> np.ndarray:
    """Deterministic spherical k-means on a normalized sample:
    kmeans++-style farthest-point init seeded by the engine RNG, Lloyd
    iterations with cosine assignment; empty cells re-seeded from the
    worst-assigned points. Pure numpy, O(sample x n_centroids) per
    iteration — the sample is driver-sized by contract, the corpus
    never is."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    rng = MT19937_64(seedseed + 11)
    cent = [x[rng() % n]]
    d2 = 1.0 - x @ cent[0]
    for _ in range(1, min(n_centroids, n)):
        j = int(np.argmax(d2))          # deterministic farthest point
        cent.append(x[j])
        d2 = np.minimum(d2, 1.0 - x @ cent[-1])
    c = np.stack(cent)
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        newc = np.zeros_like(c)
        np.add.at(newc, assign, x)
        counts = np.bincount(assign, minlength=len(c))
        empty = counts == 0
        if empty.any():
            worst = np.argsort(sims.max(axis=1))[: int(empty.sum())]
            newc[empty] = x[worst]
            counts[empty] = 1
        c = _normalize(newc / counts[:, None])
    return c


def build_ivf_index(ds: Dataset, index_dir: str, n_centroids: int = 64,
                    emb_col: str = "embedding", id_col: str = "vec_id",
                    sample_size: int = 20_000, seedseed: int = 137) -> dict:
    """Materialize an IVF ANN index: k-means centroids trained on a
    deterministic sample, corpus assigned to its nearest centroid in one
    vectorized map, Parquet partitioned by ``cell`` (one directory per
    inverted list — the prunable layout), centroids in a JSON sidecar.
    Probe I/O of :func:`ivf_topk` is then ∝ probed cells, not corpus."""
    import json

    sample_tbl = ds.limit(sample_size).take_batch(sample_size,
                                                  batch_format="pyarrow")
    sample = _embedding_matrix(pa.table(sample_tbl), emb_col)
    cents = _kmeans_fit(sample, n_centroids, seedseed=seedseed)
    assign_clusters(ds, cents, emb_col=emb_col, out_col="cell") \
        .write_parquet(index_dir, partition_cols=["cell"])
    meta = dict(dim=int(cents.shape[1]), n_centroids=int(len(cents)),
                seedseed=seedseed, emb_col=emb_col,
                centroids=[[float(v) for v in row] for row in cents])
    with open(f"{index_dir}/_ivf_meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def ivf_topk(queries: np.ndarray, k: int = 10, n_probe: int = 4,
             index_dir: str = None, id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate cosine top-k against a :func:`build_ivf_index` layout:
    score only the ``n_probe`` nearest inverted lists per query (union
    across queries), via a pruned ``read_parquet`` of those cell
    partitions — the 100 TB path (per-query I/O ∝ probed fraction)."""
    import glob as _glob
    import json

    import ray.data as rd

    with open(f"{index_dir}/_ivf_meta.json") as f:
        meta = json.load(f)
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    assert q.shape[1] == meta["dim"], "query dim != index dim"
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    sims = _normalize(q) @ cents.T
    probe = np.unique(
        np.argpartition(-sims, min(n_probe, sims.shape[1]) - 1,
                        axis=1)[:, :n_probe].ravel())
    paths = [f for c in probe.tolist()
             for f in sorted(_glob.glob(f"{index_dir}/cell={c}/*.parquet"))]
    if not paths:
        return pd.DataFrame({"query_idx": [], "vec_id": [], "sim": [],
                             "rank": []})
    return brute_force_topk(rd.read_parquet(paths), q, k, id_col,
                            meta["emb_col"])


# ---------------------------------------------------------------------------
# distributed k-means (full-corpus Lloyd iterations)


def kmeans_lloyd(ds: Dataset, n_clusters: int = 64, iters: int = 6,
                 emb_col: str = "embedding", sample_size: int = 20_000,
                 seedseed: int = 137):
    """Distributed spherical k-means over the FULL corpus.

    :func:`_kmeans_fit` trains on a driver-sized sample (the IVF coarse
    quantizer); this is the full Lloyd loop for when cluster quality
    matters (semantic dedup, data curation by cluster): initialize from
    the sample fit, then per iteration ONE stateless ``map_batches``
    pass emits a per-batch partial — assigned-vector sums (k × dim),
    counts and cosine inertia, ~k·dim·8 B per BATCH — which the driver
    folds (bounded by n_batches × 32 KB at the defaults, never by the
    corpus) and re-broadcasts as the next centroid matrix. No shuffle;
    corpus passes = ``iters``. Empty clusters keep their previous
    centroid (deterministic; no data-dependent reseeding mid-stream).

    Returns ``(centroids (k, dim) float64, inertia_history list)`` —
    inertia is mean ``1 − cos(x, centroid(x))``, non-increasing across
    iterations up to empty-cluster freezes (asserted in tests).
    """
    sample_tbl = ds.limit(sample_size).take_batch(sample_size,
                                                  batch_format="pyarrow")
    sample = _embedding_matrix(pa.table(sample_tbl), emb_col)
    c = _kmeans_fit(sample, n_clusters, iters=4, seedseed=seedseed)
    k, dim = c.shape
    history = []

    def partials(batch: pa.Table, c_ref) -> pa.Table:
        if batch.num_rows == 0:     # may arrive schema-less (rule 8b)
            return pa.table({})
        cc = ray.get(c_ref)
        m = _normalize(_embedding_matrix(batch, emb_col))
        sims = m @ cc.T
        assign = sims.argmax(axis=1)
        sums = np.zeros_like(cc)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=len(cc)).astype(np.int64)
        inertia = float((1.0 - sims[np.arange(len(m)), assign]).sum())
        return pa.table({
            "sums": pa.array([sums.tobytes()], pa.binary()),
            "counts": pa.array([counts.tobytes()], pa.binary()),
            "inertia": pa.array([inertia]),
            "n": pa.array([len(m)], pa.int64()),
        })

    import functools

    for _ in range(iters):
        ref = ray.put(c)
        sums = np.zeros((k, dim))
        counts = np.zeros(k, np.int64)
        tot_inertia, tot_n = 0.0, 0
        for b in ds.map_batches(functools.partial(partials, c_ref=ref),
                                batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0:     # schema-less empty block (rule 8b)
                continue
            for s_raw, c_raw, ine, n in zip(b.column("sums").to_pylist(),
                                            b.column("counts").to_pylist(),
                                            b.column("inertia").to_pylist(),
                                            b.column("n").to_pylist()):
                sums += np.frombuffer(s_raw, np.float64).reshape(k, dim)
                counts += np.frombuffer(c_raw, np.int64)
                tot_inertia += ine
                tot_n += n
        history.append(tot_inertia / max(tot_n, 1))
        nonempty = counts > 0
        newc = c.copy()
        newc[nonempty] = sums[nonempty] / counts[nonempty, None]
        c = _normalize(newc)
    return c, history


def assign_clusters(ds: Dataset, centroids: np.ndarray,
                    emb_col: str = "embedding",
                    out_col: str = "cell") -> Dataset:
    """Append the nearest-centroid (cosine) cluster id — one broadcast,
    one stateless vectorized map pass."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        m = _normalize(_embedding_matrix(batch, emb_col))
        cell = (m @ cc.T).argmax(axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(cell))

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized inverted lists (round 4)
#
# At 100 TB of embeddings the IVF-flat layout above still stores 4·dim
# bytes per vector; product quantization stores ``m`` uint8 codes
# (16-32x smaller at dim 32-64), which is what keeps a corpus-scale ANN
# index resident. Standard construction (Jegou et al. 2011, "Product
# quantization for nearest neighbor search"): coarse quantizer -> PQ
# codebooks trained on coarse RESIDUALS -> asymmetric distance
# computation (ADC) at probe time via per-query lookup tables.
# Deterministic end to end: sample, inits and empty-cluster reseeding
# are all seeded-hash driven (no RNG — resume/retry-safe).


def _pq_fit(x: np.ndarray, n_codes: int, iters: int = 8,
            seedseed: int = 137) -> np.ndarray:
    """Plain (Euclidean) k-means for one PQ subspace, deterministic:
    init = seeded-hash sample of distinct rows; empty codes reseed from
    the worst-reconstructed rows."""
    from ocm_ray.core.hashing import wanghash

    n, d = x.shape
    order = np.argsort(wanghash(np.arange(n, dtype=np.uint64)
                                ^ np.uint64(seedseed)), kind="stable")
    c = x[order[: n_codes]].copy()
    if len(c) < n_codes:                      # tiny sample: pad by repeat
        c = np.concatenate([c] * (n_codes // max(len(c), 1) + 1))[:n_codes]
    for _ in range(iters):
        # assignment via ||x||^2 - 2 x.c + ||c||^2 (argmin over codes)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None]
        code = d2.argmin(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, code, x)
        counts = np.bincount(code, minlength=n_codes).astype(np.float64)
        nonempty = counts > 0
        c[nonempty] = sums[nonempty] / counts[nonempty, None]
        empty = ~nonempty
        if empty.any():
            # reseed at most n empties from the worst-reconstructed rows
            # (a tiny sample can leave more empty codes than rows — the
            # padded-duplicate init guarantees they stay duplicates of a
            # live code, which is harmless)
            k = min(int(empty.sum()), n)
            worst = np.argsort(-d2[np.arange(n), code])[:k]
            c[np.flatnonzero(empty)[:k]] = x[worst]
    return c


def build_ivfpq_index(ds: Dataset, index_dir: str, n_centroids: int = 32,
                      m_subspaces: int = 8, n_codes: int = 256,
                      emb_col: str = "embedding", id_col: str = "vec_id",
                      sample_size: int = 20_000, iters: int = 8,
                      seedseed: int = 137) -> dict:
    """Materialize an IVF-PQ index: spherical coarse quantizer (same as
    :func:`build_ivf_index`), per-subspace PQ codebooks trained on the
    sample's coarse residuals, then ONE vectorized map pass encodes
    every vector to (cell int32, codes m x uint8) and writes Parquet
    partitioned by cell. Index bytes per vector ≈ ``m_subspaces`` + id,
    vs ``4 * dim`` for IVF-flat."""
    import json

    sample_tbl = ds.limit(sample_size).take_batch(sample_size,
                                                  batch_format="pyarrow")
    sample = _normalize(_embedding_matrix(pa.table(sample_tbl), emb_col))
    dim = sample.shape[1]
    assert dim % m_subspaces == 0, "dim must divide into subspaces"
    if n_codes > 256:
        # codes persist as uint8 — a larger codebook would silently
        # wrap modulo 256 and decode against the wrong rows
        raise ValueError(f"n_codes={n_codes} > 256 cannot be stored in "
                         "uint8 PQ codes")
    d_sub = dim // m_subspaces
    cents = _kmeans_fit(sample, n_centroids, seedseed=seedseed)
    resid = sample - cents[(sample @ cents.T).argmax(axis=1)]
    codebooks = np.stack([
        _pq_fit(resid[:, j * d_sub:(j + 1) * d_sub], n_codes,
                iters, seedseed + j)
        for j in range(m_subspaces)])          # (m, n_codes, d_sub)
    ref = ray.put((cents, codebooks))

    def encode(batch: pa.Table) -> pa.Table:
        c, cb = ray.get(ref)
        x = _normalize(_embedding_matrix(batch, emb_col))
        cell = (x @ c.T).argmax(axis=1)
        r = x - c[cell]
        codes = np.empty((len(x), m_subspaces), dtype=np.uint8)
        for j in range(m_subspaces):
            sub = r[:, j * d_sub:(j + 1) * d_sub]
            cj = cb[j]
            d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cj.T) \
                + (cj * cj).sum(1)[None]
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.uint8()), m_subspaces)
        return pa.table({id_col: batch.column(id_col),
                         "cell": pa.array(cell.astype(np.int32)),
                         "codes": code_col})

    ds.map_batches(encode, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["cell"])
    meta = dict(dim=int(dim), n_centroids=int(n_centroids),
                m_subspaces=int(m_subspaces), n_codes=int(n_codes),
                seedseed=seedseed, emb_col=emb_col, id_col=id_col,
                centroids=[[float(v) for v in row] for row in cents],
                codebooks=[[[float(v) for v in code] for code in book]
                           for book in codebooks])
    with open(f"{index_dir}/_ivfpq_meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def ivfpq_topk(queries: np.ndarray, k: int = 10, n_probe: int = 4,
               index_dir: str = None) -> pd.DataFrame:
    """Approximate cosine top-k by asymmetric distance computation over
    the probed cells' CODE tables (never the original vectors): per
    query ONE (m, n_codes) lookup table ``T[j, c] = q_sub_j ·
    codebook[j, c]``, then ``sim ≈ q·centroid(cell) + Σ_j T[j,
    code_j]`` — probe I/O ∝ probed cells x m bytes/vector."""
    import glob as _glob
    import json

    import pyarrow.parquet as pq

    with open(f"{index_dir}/_ivfpq_meta.json") as f:
        meta = json.load(f)
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    assert q.shape[1] == meta["dim"], "query dim != index dim"
    m, d_sub = meta["m_subspaces"], meta["dim"] // meta["m_subspaces"]
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    coarse = q @ cents.T                        # (nq, n_centroids)
    probe = np.unique(
        np.argpartition(-coarse, min(n_probe, coarse.shape[1]) - 1,
                        axis=1)[:, :n_probe].ravel())
    # ADC lookup tables are CELL-independent — build them once per query
    # up front: T[qi, j, c] = q_sub_j · codebook[j, c]  (nq, m, n_codes)
    qsub = q.reshape(len(q), m, d_sub)
    T = np.einsum("qjd,jcd->qjc", qsub, books)
    rows = []
    id_col = meta["id_col"]
    for c in probe.tolist():
        paths = sorted(_glob.glob(f"{index_dir}/cell={c}/*.parquet"))
        if not paths:
            continue
        t = pq.read_table(paths, columns=[id_col, "codes"])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        codes = np.asarray(t.column("codes").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(ids), m)
        for qi in range(len(q)):
            sims = coarse[qi, c] + \
                T[qi, np.arange(m)[None, :], codes].sum(axis=1)
            rows.append(pd.DataFrame({"query_idx": qi, "vec_id": ids,
                                      "sim": sims}))
    if not rows:
        return pd.DataFrame({"query_idx": [], "vec_id": [], "sim": [],
                             "rank": []})
    allr = pd.concat(rows, ignore_index=True)
    out = (allr.sort_values(["query_idx", "sim", "vec_id"],
                            ascending=[True, False, True])
           .groupby("query_idx", as_index=False).head(k)
           .reset_index(drop=True))
    out["rank"] = out.groupby("query_idx").cumcount()
    return out
