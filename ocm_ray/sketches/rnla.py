"""CountSketch vector compression — the ``rnla.h`` core transform.

Behavioral contract from ``rnla.h:54-105`` (``cs_compress``): a length-d
vector is compressed into ``ns`` tables of ``newdim`` buckets; entry
``i`` contributes ``v[i] * sign`` to bucket ``(h(i, j) >> 1) mod
newdim`` of table ``j`` with ``sign = +1 if h(i, j) & 1 else -1``.
Decompression (``cs_decompress`` / ``top_indices_from_compressed``,
``rnla.h:229-264``) estimates entry ``i`` as the MEDIAN over tables of
the signed bucket values — the classic CountSketch recovery, unbiased,
heavy entries recoverable to ±||v||₂/√newdim per table.

The transform is LINEAR: ``compress(a + b) == compress(a) +
compress(b)`` exactly, so compressed per-partition vectors merge by
addition (the mergeable-UDAF shape). Deviation: the reference's
``KWiseHasherSet<4>`` polynomial hashes are replaced by the engine's
WangHash chain over ``(index ^ table-seed)`` — same independence role,
one hash codec everywhere (CLAUDE.md rule 8).

``wz_compress`` / ``wz_decompress`` (``rnla.h:109-194``, the
Woodruff-Zhang-style exponentially-scaled CountSketch): identical
bucket/sign layout, but each ``(i, j)`` contribution is additionally
multiplied by a deterministic ``Exp(p)`` draw keyed by the same hash;
decompression divides the draw back out before the median. The scaling
implements Lp-sampling-style heavy-coordinate recovery (the reference
seeds a per-(i,j) RNG from the hash quotient, ``rnla.h:122-125``; here
the draw is ``-log(U(WangHash(h)))/p`` — same distribution, engine
codec). Still LINEAR in the input vector, so partial compressions
merge by addition.

``pstable_compress`` / ``pstable_norm`` / ``pstable_union_size``
(``rnla.h:341-463`` ``PStableSketcher`` + ``rnla.h:504-510``
``IndykSketcher``): each source coordinate contributes to ONE hashed
cell per table, scaled by a thresholded-Cauchy draw
(``rnla.h:22-36``: redraw while ``|c| > absmax``); the sketch is
LINEAR (the reference's ``+=``/``-=`` require matching seeds,
``rnla.h:389-410``), so per-partition sketches merge by addition and a
DIFFERENCE of sketches estimates the L1 distance between the vectors —
Indyk's p-stable stream norm (FOCS'00, the published algorithm).
``union_size`` (``rnla.h:417-428``) = median over tables of the row
norm of the summed sketches. Deviation (same policy as SetSketch/CWS):
the Cauchy draws come from the engine's WangHash chain —
``tan(pi*(U(h) - 1/2))`` — instead of blaze's RNG; distribution-
identical, deterministic, partition-invariant.
"""

from __future__ import annotations

import numpy as np

from ocm_ray.core.hashing import derive_seeds, wanghash

U64 = np.uint64


_CHUNK = 1 << 19  # hash-matrix cells per chunk (~4 MB; CLAUDE.md rule 4)


def _bucket_sign_chunk(lo: int, hi: int, seeds: np.ndarray):
    """(bucket-hash[ns, hi-lo], sign[ns, hi-lo]) for index range
    [lo, hi) — chunked so the wang kernel stays cache-resident."""
    idx = np.arange(lo, hi, dtype=U64)
    h = wanghash(idx[None, :] ^ seeds[:, None])
    sign = np.where((h & U64(1)) == U64(1), 1.0, -1.0)
    return h, sign


def cs_compress(vec: np.ndarray, newdim: int, ns: int = 5,
                seedseed: int = 137) -> np.ndarray:
    """Compress a length-d vector to an ``(ns, newdim)`` CountSketch
    (``rnla.h:54-73`` semantics: bucket = (h >> 1) mod newdim, sign =
    low hash bit). Linear in ``vec``."""
    vec = np.asarray(vec, dtype=np.float64)
    d = len(vec)
    seeds = derive_seeds(ns, seedseed)
    out = np.zeros((ns, newdim), dtype=np.float64)
    step = max(1, _CHUNK // max(ns, 1))
    for lo in range(0, d, step):
        hi = min(lo + step, d)
        h, sign = _bucket_sign_chunk(lo, hi, seeds)
        bucket = ((h >> U64(1)) % U64(newdim)).astype(np.int64)
        seg = vec[lo:hi]
        for j in range(ns):                  # loop over TABLES only
            np.add.at(out[j], bucket[j], seg * sign[j])
    return out


def cs_decompress(sk: np.ndarray, d: int, seedseed: int = 137) -> np.ndarray:
    """Median-of-tables estimate of every original entry
    (``rnla.h`` cs_decompress shape)."""
    ns, newdim = sk.shape
    seeds = derive_seeds(ns, seedseed)
    est = np.empty(d, dtype=np.float64)
    step = max(1, _CHUNK // max(ns, 1))
    ests = np.empty((ns, step), dtype=np.float64)
    for lo in range(0, d, step):
        hi = min(lo + step, d)
        h, sign = _bucket_sign_chunk(lo, hi, seeds)
        bucket = ((h >> U64(1)) % U64(newdim)).astype(np.int64)
        for j in range(ns):
            ests[j, :hi - lo] = sk[j, bucket[j]] * sign[j]
        est[lo:hi] = np.median(ests[:, :hi - lo], axis=0)
    return est


def _exp_draws(h: np.ndarray, p: float) -> np.ndarray:
    """Deterministic per-(index, table) Exp(p) draws keyed by the
    bucket hash — the reference's ``RNG rng(dm.quot >> 1);
    exponential_distribution gen(p)`` (``rnla.h:122-125``), engine
    codec."""
    u = (wanghash(h).astype(np.float64) + 1.0) * 2.0 ** -64   # (0, 1]
    return -np.log(u) / p


def wz_compress(vec: np.ndarray, newdim: int, ns: int = 5, p: float = 1.0,
                seedseed: int = 137) -> np.ndarray:
    """Woodruff-Zhang-style compression (``rnla.h:109-130``): CountSketch
    layout with each contribution scaled by a deterministic Exp(p) draw.
    Linear in ``vec`` — partial compressions merge by addition."""
    vec = np.asarray(vec, dtype=np.float64)
    d = len(vec)
    seeds = derive_seeds(ns, seedseed)
    out = np.zeros((ns, newdim), dtype=np.float64)
    step = max(1, _CHUNK // max(ns, 1))
    for lo in range(0, d, step):
        hi = min(lo + step, d)
        h, sign = _bucket_sign_chunk(lo, hi, seeds)
        bucket = ((h >> U64(1)) % U64(newdim)).astype(np.int64)
        mult = _exp_draws(h, p) * sign
        seg = vec[lo:hi]
        for j in range(ns):                  # loop over TABLES only
            np.add.at(out[j], bucket[j], seg * mult[j])
    return out


def wz_decompress(sk: np.ndarray, d: int, p: float = 1.0,
                  seedseed: int = 137) -> np.ndarray:
    """Median-of-tables recovery with the Exp(p) draw divided back out
    (``rnla.h:165-186``): entry i's own contribution cancels exactly;
    colliding entries are damped/amplified by their draw ratios, which
    the median suppresses."""
    ns, newdim = sk.shape
    seeds = derive_seeds(ns, seedseed)
    est = np.empty(d, dtype=np.float64)
    step = max(1, _CHUNK // max(ns, 1))
    ests = np.empty((ns, step), dtype=np.float64)
    for lo in range(0, d, step):
        hi = min(lo + step, d)
        h, sign = _bucket_sign_chunk(lo, hi, seeds)
        bucket = ((h >> U64(1)) % U64(newdim)).astype(np.int64)
        mult = _exp_draws(h, p) * sign
        for j in range(ns):
            ests[j, :hi - lo] = sk[j, bucket[j]] / mult[j]
        est[lo:hi] = np.median(ests[:, :hi - lo], axis=0)
    return est


def _cauchy_cells(lo: int, hi: int, seeds: np.ndarray, destdim: int,
                  absmax: float):
    """Per-(table, index) destination cell + thresholded-Cauchy
    coefficient for index range [lo, hi) (``rnla.h:355-376`` init):
    one nonzero per (table, coord). The threshold redraw
    (``rnla.h:30-35``) walks the wang chain until ``|c| <= absmax`` —
    P(redraw) ~= 2/(pi*absmax) ~= 2e-5 at the reference default, so the
    loop almost always exits in one pass."""
    idx = np.arange(lo, hi, dtype=U64)
    h = wanghash(idx[None, :] ^ seeds[:, None])
    cell = (h % U64(destdim)).astype(np.int64)
    draw = wanghash(h ^ U64(0x9E3779B97F4A7C15))
    u = (draw.astype(np.float64) + 0.5) * 2.0 ** -64   # (0, 1)
    c = np.tan(np.pi * (u - 0.5))
    bad = np.abs(c) > absmax
    while bad.any():
        draw = wanghash(draw)
        u = (draw.astype(np.float64) + 0.5) * 2.0 ** -64
        c = np.where(bad, np.tan(np.pi * (u - 0.5)), c)
        bad = np.abs(c) > absmax
    return cell, c


def pstable_compress(vec: np.ndarray, destdim: int, ntables: int = 5,
                     seedseed: int = 137,
                     absmax: float = 30000.0) -> np.ndarray:
    """1-stable (Cauchy) projection of a length-d vector into an
    ``(ntables, destdim)`` sketch (``rnla.h:430-441`` dense ``add``:
    coordinate i lands in ONE cell per table with a Cauchy weight).
    Linear in ``vec`` — per-partition sketches merge by ``+`` and
    difference sketches estimate L1 distance (1-stability)."""
    vec = np.asarray(vec, dtype=np.float64)
    seeds = derive_seeds(ntables, seedseed)
    out = np.zeros((ntables, destdim), dtype=np.float64)
    step = max(1, _CHUNK // max(ntables, 1))
    for lo in range(0, len(vec), step):
        hi = min(lo + step, len(vec))
        cell, c = _cauchy_cells(lo, hi, seeds, destdim, absmax)
        seg = vec[lo:hi]
        for j in range(ntables):             # loop over TABLES only
            np.add.at(out[j], cell[j], seg * c[j])
    return out


def pstable_norm(sk: np.ndarray, p_norm: int = 1) -> float:
    """Median over tables of the per-row norm (``rnla.h:417-428``
    with the zero sketch; Norm = L1 per the PStableSketcher default,
    L2 for the IndykSketcher preset). With ``destdim == 1`` each row is
    exactly Cauchy(||x||_1)-distributed, so the median of |row| is a
    consistent L1-norm estimate (median |Cauchy| = 1); wider sketches
    trade estimator bias for per-cell recovery, as in the reference."""
    rows = (np.abs(sk).sum(axis=1) if p_norm == 1
            else np.sqrt((sk * sk).sum(axis=1)))
    return float(np.median(rows))


def pstable_union_size(a: np.ndarray, b: np.ndarray,
                       p_norm: int = 1) -> float:
    """``union_size`` (``rnla.h:417-428``): median row norm of the SUM
    of two same-seed sketches — the norm of the combined stream."""
    if a.shape != b.shape:
        raise ValueError(f"sketch geometry mismatch: {a.shape} vs {b.shape}")
    return pstable_norm(a + b, p_norm)


def top_indices_from_compressed(sk: np.ndarray, d: int, k: int,
                                seedseed: int = 137) -> np.ndarray:
    """Indices of the k largest estimated |entries|
    (``rnla.h:229-264``), deterministic tie-break by index."""
    est = np.abs(cs_decompress(sk, d, seedseed))
    order = np.lexsort((np.arange(d), -est))
    return np.sort(order[:k])
