"""1M-doc bounded-driver-RSS proof for the distributed near-dedup path.

Generates a synthetic 1,000,000-document corpus (~1 GB of text) ENTIRELY
inside Ray tasks (the driver never holds a corpus batch), writes it to
Parquet, then runs ``minhash_lsh_pairs(local=False)`` — the
``ops/pairs.py`` shard-shuffle path — and asserts:

* every planted near-dup pair is found (correctness at scale);
* no pair explosion (candidate set stays output-sized);
* the DRIVER's peak RSS stays under a bound far below corpus size
  (text ~1 GB + signatures ~1 GB): driver memory is bounded by the
  OUTPUT, not the corpus (CLAUDE.md rule 9).

Usage:  python scripts/dedup_scale_proof.py [n_docs]
Prints one JSON line; the result is recorded in BASELINE.md.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

def _n_docs_arg() -> int:
    # import-safe: Ray workers import this module with raylet argv
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return 1_000_000


N_DOCS = _n_docs_arg()
WORDS_PER_DOC = 150
VOCAB = 30_000
PLANT_EVERY = 125_000          # doc ids ≡ 3 (mod this) near-duplicate id-1
OUT = f"/tmp/dedup_scale_proof_{N_DOCS}"


def _word_ids(ids: np.ndarray) -> np.ndarray:
    """(n, WORDS_PER_DOC) deterministic word ids for doc ids."""
    from ocm_ray.core.hashing import wanghash

    grid = (ids[:, None].astype(np.uint64) * np.uint64(256)
            + np.arange(WORDS_PER_DOC, dtype=np.uint64))
    return (wanghash(grid.ravel()) % np.uint64(VOCAB)).reshape(grid.shape)


def gen_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    wid = _word_ids(ids)
    planted = ids % PLANT_EVERY == 3
    if planted.any():
        # near-dup of doc id-1: same words except the last one
        src = _word_ids(ids[planted] - 1)
        src[:, -1] = VOCAB + 1
        wid[planted] = src
    texts = [" ".join([f"w{w}" for w in row]) for row in wid]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def main() -> int:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if not os.path.exists(os.path.join(OUT, "_done")):
        # build-then-rename: a crash mid-write must not leave partial
        # parquet files that a rerun's write_parquet would append to
        # (duplicated corpus, confusing n_distinct failures)
        import shutil

        tmp = OUT + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(OUT, ignore_errors=True)
        t0 = time.time()
        (rd.range(N_DOCS, override_num_blocks=64)
         .map_batches(gen_batch, batch_format="pyarrow")
         .write_parquet(tmp))
        open(os.path.join(tmp, "_done"), "w").close()
        os.replace(tmp, OUT)
        print(f"# generated {N_DOCS} docs in {time.time() - t0:.1f}s",
              file=sys.stderr)

    rss_before_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    from ocm_ray.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(rd.read_parquet(OUT), local=False,
                              threshold=0.8)
    wall = time.time() - t0

    # the other shard_scan consumers at the same scale: exact dedup
    # (1M near-unique content hashes) — planted docs are the only
    # near-dups, so distinct == N_DOCS (every text is unique; near-dup
    # is not exact-dup)
    from ocm_ray.ops.dedup import exact_dedup_groups

    t1 = time.time()
    n_distinct = exact_dedup_groups(rd.read_parquet(OUT)).count()
    wall_exact = time.time() - t1
    assert n_distinct == N_DOCS, n_distinct

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    expected = {(int(i - 1), int(i))
                for i in range(3, N_DOCS, PLANT_EVERY) if i >= 1}
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    missing = expected - got
    extra_frac = (len(got) - len(expected & got)) / max(len(expected), 1)

    # corpus text ~1 GB + signature table ~1 GB live in the object store /
    # on disk — the DRIVER process must stay far below that
    bound_mb = 800 if N_DOCS >= 1_000_000 else 4000
    result = {
        "n_docs": N_DOCS, "wall_sec": round(wall, 1),
        "exact_dedup_wall_sec": round(wall_exact, 1),
        "pairs_found": len(got), "planted": len(expected),
        "planted_missing": sorted(missing),
        "driver_peak_rss_mb": round(peak_mb),
        "driver_rss_before_mb": round(rss_before_mb),
        "rss_bound_mb": bound_mb,
        "ok": not missing and peak_mb < bound_mb and extra_frac < 2.0,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
