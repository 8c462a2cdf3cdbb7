"""Deterministic generator for the ``sequences`` table — the engine's
primary input shape (BASELINE.json input_hint / FIXTURES.md F1):

    doc_id : string      "doc-{i:08d}"
    tokens : list<int32> bounded-Zipf(s≈1.1) token ids over vocab 50,257
    n_tok  : int32       log-normal lengths (μ=ln 512, σ=0.8), clipped [8, 8192]
    source : string      {"web","books","code","wiki"} at 70/15/10/5

Written as multiple Parquet files so partition-invariance tests and the
streaming executor see real block boundaries. Every file is a pure
function of ``(seed, file_index)`` — regeneration is bit-identical (the
per-row token-array-equality invariant is asserted in tests by
regenerating), generation parallelizes per file, and a resumable writer
can skip files that already exist.

The Zipf sampler is inverse-CDF over the finite vocab (``np.searchsorted``
on the normalized harmonic cumsum) — NOT ``rng.zipf`` clipped, whose
unbounded tail would pile ~30% of mass onto the clip boundary at s=1.1.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_P = np.array([0.70, 0.15, 0.10, 0.05])


def _zipf_cdf(vocab: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, vocab + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


_CDF_CACHE: dict = {}


def sample_tokens(rng: np.random.Generator, n: int, vocab: int = VOCAB,
                  s: float = 1.1) -> np.ndarray:
    key = (vocab, s)
    if key not in _CDF_CACHE:
        _CDF_CACHE[key] = _zipf_cdf(vocab, s)
    cdf = _CDF_CACHE[key]
    return np.searchsorted(cdf, rng.random(n), side="right").astype(np.int32)


def generate_file(path: str, n_docs: int, start_idx: int, seed: int = 42,
                  file_index: int = 0, vocab: int = VOCAB, s: float = 1.1,
                  mean_len: float = 512.0, sigma_len: float = 0.8,
                  hot_source_skew: bool = False) -> None:
    """One deterministic Parquet part file. ``hot_source_skew=True`` makes
    ``web`` docs 4x longer (FIXTURES.md F6 skew fixture)."""
    rng = np.random.default_rng([seed, file_index])
    lens = np.clip(rng.lognormal(np.log(mean_len), sigma_len, n_docs), 8, 8192).astype(np.int32)
    src = SOURCES[rng.choice(len(SOURCES), size=n_docs, p=SOURCE_P)]
    if hot_source_skew:
        lens = np.where(src == "web", np.minimum(lens * 4, 8192), lens).astype(np.int32)
    total = int(lens.astype(np.int64).sum())
    # list<int32> offsets are int32: a part file whose token total exceeded
    # 2^31 would silently wrap to negative offsets and corrupt the column.
    # Shard into more files (n_files) before that — fail loudly here.
    assert total < 2**31, (
        f"part file token total {total} overflows int32 list offsets; "
        "increase n_files so each part stays under 2^31 tokens")
    flat = sample_tokens(rng, total, vocab, s)
    offsets = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    doc_id = pa.array([f"doc-{i:08d}" for i in range(start_idx, start_idx + n_docs)])
    table = pa.table({
        "doc_id": doc_id,
        "tokens": tokens,
        "n_tok": pa.array(lens, type=pa.int32()),
        "source": pa.array(src),
    })
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=4096)
    os.replace(tmp, path)  # atomic: a reader never sees a partial file


def generate_sequences(out_dir: str, n_docs: int, seed: int = 42,
                       n_files: int = 8, **kw) -> List[str]:
    """Materialize the table as ``n_files`` part files; returns the paths.
    Already-present part files are kept (resume-friendly; files are pure
    functions of (seed, index))."""
    os.makedirs(out_dir, exist_ok=True)
    per = n_docs // n_files
    counts = [per + (1 if i < n_docs % n_files else 0) for i in range(n_files)]
    paths = []
    start = 0
    for i, c in enumerate(counts):
        p = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if not os.path.exists(p):
            generate_file(p, c, start, seed=seed, file_index=i, **kw)
        paths.append(p)
        start += c
    return paths


def ensure_sequences(n_docs: int, seed: int = 42, n_files: int = 8,
                     root: str = "/tmp/ocm_ray_data", tag: str = "",
                     **kw) -> str:
    """Cache-or-create a sequences table; returns its directory.

    The cache key covers EVERY generation parameter: generate_sequences
    keeps already-present part files, so two calls differing only in
    ``**kw`` (hot_source_skew, mean_len, ...) must not resolve to the
    same directory — the second would silently get the first's data."""
    kw_tag = ""
    if kw:
        kw_tag = "_" + "_".join(f"{k}-{kw[k]}" for k in sorted(kw))
        kw_tag = "".join(c if c.isalnum() or c in "_-." else "-"
                         for c in kw_tag)
    d = os.path.join(root, f"seq_{n_docs}_{seed}_{n_files}{tag}{kw_tag}")
    generate_sequences(d, n_docs, seed=seed, n_files=n_files, **kw)
    return d


def sf_to_docs(sf: float) -> int:
    """Scale factor → doc count (sf 0.01 ≈ 10k docs ≈ 5M tokens)."""
    return max(64, int(sf * 1_000_000))


def validate_sequences(seq_dir: str, seed: int = 42, **gen_kw) -> dict:
    """Per-row token-array-equality invariant, as a pipeline stage
    (north-rule: 'per-row token-array equality against the reference
    input is asserted in the pipeline').

    One Ray task per part file regenerates that file's rows from
    ``(seed, file_index)`` — the table is a pure function of them — and
    compares every row's token array elementwise against what is stored.
    Returns {files, rows, mismatched_rows}; raises on any mismatch."""
    import glob

    import ray

    @ray.remote(num_cpus=0.5)
    def check(path: str, file_index: int, start_idx: int, n_docs: int) -> dict:
        import tempfile

        import pyarrow.parquet as pq

        stored = pq.read_table(path)
        with tempfile.TemporaryDirectory() as td:
            ref_path = os.path.join(td, "ref.parquet")
            generate_file(ref_path, n_docs, start_idx, seed=seed,
                          file_index=file_index, **gen_kw)
            expect = pq.read_table(ref_path)
        bad = 0
        if not stored.equals(expect):
            s_tok = stored.column("tokens").to_pylist()
            e_tok = expect.column("tokens").to_pylist()
            bad = sum(1 for a, b in zip(s_tok, e_tok) if a != b)
            bad = bad or 1  # schema/metadata drift with equal tokens still flags
        return {"rows": stored.num_rows, "bad": bad}

    files = sorted(glob.glob(os.path.join(seq_dir, "part-*.parquet")))
    if not files:
        # zero files would "pass" vacuously — a typo'd path must fail loud
        raise FileNotFoundError(f"no part-*.parquet under {seq_dir}")
    import pyarrow.parquet as pq

    counts = [pq.read_metadata(f).num_rows for f in files]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    results = ray.get([check.remote(f, i, int(starts[i]), counts[i])
                       for i, f in enumerate(files)])
    bad = sum(r["bad"] for r in results)
    total = sum(r["rows"] for r in results)
    if bad:
        raise AssertionError(
            f"{bad}/{total} rows fail the token-array-equality invariant")
    return {"files": len(files), "rows": total, "mismatched_rows": 0}
