"""Checkpointed, resumable sketch builds with per-partition lineage.

North-rule requirement: "per-partition lineage metadata and checkpointed
partial sketches enabling resume from any failed stage".

Design (deterministic, idempotent):
  * the input is split into SHARDS = groups of whole Parquet files
    (files are the reference's unit of determinism — a shard's content
    is a pure function of its file list, unlike streaming splits);
  * one Ray task per shard streams the shard's row groups through
    pyarrow (no full-file materialization), builds one partial sketch,
    and writes it ATOMICALLY (tmp + rename) to
    ``{dir}/partial-{shard:05d}.sk`` next to a lineage JSON recording
    the shard's files, sizes, row counts, item counts and wall time;
  * resume = skip shards whose partial exists AND whose input
    fingerprint matches; only missing/stale shards re-run;
  * the merged sketch is written last (``merged.sk``) with the run
    manifest.

Retry safety: shard tasks are deterministic functions of (files,
factory params) ⇒ Ray task retries and job-level resume produce
identical partials (the reference restarts multi-round builds from zero
on any failure — SURVEY §4.1).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import pyarrow.parquet as pq
import ray

from ocm_ray.engine.build import tree_merge
from ocm_ray.engine.tokens import items_from_batch
from ocm_ray.sketches.base import MergeableSketch


def _fingerprint(files: List[str]) -> str:
    # full path + size + mtime_ns: basename+size alone would let a
    # same-size regenerated shard (fixed-width columns) or a different
    # corpus with coincident part-NNNNN names silently reuse a stale
    # partial
    parts = []
    for f in sorted(files):
        st = os.stat(f)
        parts.append(f"{os.path.abspath(f)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


@ray.remote
def _build_shard(files: List[str], factory, column: str, kgram: int,
                 shard_id: int, ckpt_dir: str) -> str:
    t0 = time.monotonic()
    sk = factory()
    rows = 0
    items = 0
    for f in files:
        pf = pq.ParquetFile(f)
        cols = [column]
        for batch in pf.iter_batches(batch_size=65536, columns=cols):
            import pyarrow as pa

            t = pa.Table.from_batches([batch])
            arr = items_from_batch(t, column, kgram)
            sk.update(arr)
            rows += t.num_rows
            items += len(arr)
    path = os.path.join(ckpt_dir, f"partial-{shard_id:05d}.sk")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(sk.to_bytes())
    os.replace(tmp, path)
    lineage = {
        "shard_id": shard_id,
        "files": [os.path.basename(f) for f in files],
        "fingerprint": _fingerprint(files),
        "rows": rows,
        "items": items,
        "wall_sec": round(time.monotonic() - t0, 4),
    }
    lpath = os.path.join(ckpt_dir, f"lineage-{shard_id:05d}.json")
    with open(lpath + ".tmp", "w") as fh:
        json.dump(lineage, fh)
    os.replace(lpath + ".tmp", lpath)
    return path


@ray.remote
def _load_partial(path: str) -> MergeableSketch:
    return MergeableSketch.from_bytes(open(path, "rb").read())


def build_sketch_checkpointed(files: List[str], factory, ckpt_dir: str,
                              column: str = "tokens", kgram: int = 1,
                              shards: Optional[int] = None,
                              resume: bool = True) -> MergeableSketch:
    """Build a sketch over Parquet files with per-shard checkpoints.

    Returns the merged sketch; on a rerun only missing/stale shards are
    recomputed (kill-and-resume integration-tested).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    files = sorted(files)
    n_shards = min(shards or max(1, len(files)), len(files))
    groups: List[List[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(files):
        groups[i % n_shards].append(f)

    pending = []
    done_paths = []
    for sid, grp in enumerate(groups):
        ppath = os.path.join(ckpt_dir, f"partial-{sid:05d}.sk")
        lpath = os.path.join(ckpt_dir, f"lineage-{sid:05d}.json")
        fresh = False
        if resume and os.path.exists(ppath) and os.path.exists(lpath):
            try:
                lineage = json.load(open(lpath))
                fresh = lineage.get("fingerprint") == _fingerprint(grp)
            except (json.JSONDecodeError, OSError):
                fresh = False
        if fresh:
            done_paths.append(ppath)
        else:
            pending.append((sid, grp))

    new_paths = ray.get([
        _build_shard.remote(grp, factory, column, kgram, sid, ckpt_dir)
        for sid, grp in pending
    ])
    all_paths = sorted(done_paths + list(new_paths))
    merged = tree_merge([_load_partial.remote(p) for p in all_paths])

    mpath = os.path.join(ckpt_dir, "merged.sk")
    with open(mpath + ".tmp", "wb") as fh:
        fh.write(merged.to_bytes())
    os.replace(mpath + ".tmp", mpath)
    manifest = {
        "n_shards": n_shards,
        "resumed_shards": len(done_paths),
        "built_shards": len(pending),
        "files": [os.path.basename(f) for f in files],
        "column": column,
        "kgram": kgram,
    }
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return merged


class RoundCheckpointer:
    """``on_round_end`` hook for ``build_ocm``: persists the merged sketch
    after every round so a killed multi-round build resumes at the last
    completed round instead of round 0 (vs reference restart-from-zero).

    ``params`` (any JSON-serializable dict of the run's identity — sketch
    geometry, seed, column, kgram, input fingerprint) guards resume:
    round files written under DIFFERENT params are stale — they are
    discarded on construction rather than silently resumed into a run
    they don't belong to. ``rounds`` itself should NOT be in ``params``:
    round r of a multi-round build is independent of the total round
    count, so a longer rerun legitimately extends a shorter one.
    """

    def __init__(self, ckpt_dir: str, params: Optional[dict] = None):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        ppath = os.path.join(ckpt_dir, "params.json")
        if params is not None:
            stale = False
            if os.path.exists(ppath):
                try:
                    stale = json.load(open(ppath)) != params
                except (json.JSONDecodeError, OSError):
                    stale = True
            if stale:
                for f in os.listdir(ckpt_dir):
                    if f.startswith("round-") and f.endswith(".sk"):
                        os.remove(os.path.join(ckpt_dir, f))
            with open(ppath + ".tmp", "w") as fh:
                json.dump(params, fh, sort_keys=True)
            os.replace(ppath + ".tmp", ppath)

    def __call__(self, round_no: int, sketch) -> None:
        p = os.path.join(self.dir, f"round-{round_no:02d}.sk")
        with open(p + ".tmp", "wb") as fh:
            fh.write(sketch.to_bytes())
        os.replace(p + ".tmp", p)

    def last_completed(self) -> int:
        rounds = [int(f.split("-")[1].split(".")[0])
                  for f in os.listdir(self.dir)
                  if f.startswith("round-") and f.endswith(".sk")]
        return max(rounds) if rounds else -1

    def load(self, round_no: int):
        p = os.path.join(self.dir, f"round-{round_no:02d}.sk")
        return MergeableSketch.from_bytes(open(p, "rb").read())
