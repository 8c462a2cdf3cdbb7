"""Resumable ETL output: per-input-shard Parquet writing with lineage.

"Resumable output" for a batch pipeline
means: one output unit per input shard, written atomically (tmp +
rename), plus a manifest of completed shards — a rerun skips finished
work. ``run_resumable_etl`` is the generic runner: per input file, a Ray
task streams row batches through a vectorized transform and writes one
output part file; shards whose fingerprint matches are skipped.

For key-partitioned layouts (one directory per ``source``/date/bucket),
``Dataset.write_parquet(partition_cols=[...])`` already does the
Hive-style layout; the wrapper here just pins the idiom.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import pyarrow as pa
import ray


def parquet_rows(out_dir: str) -> int:
    """Row count of a written parquet dir from FILE METADATA (free) —
    never ``.count()`` a lazy Dataset after ``write_parquet``: Ray
    re-executes the full plan per consumption. Recursive so Hive
    layouts (``partition_cols``) count too."""
    import glob as _g

    import pyarrow.parquet as _pq

    return sum(_pq.read_metadata(f).num_rows for f in
               _g.glob(os.path.join(out_dir, "**", "*.parquet"),
                       recursive=True))


@ray.remote(num_cpus=1)
def _etl_shard(in_file: str, out_file: str, transform, columns,
               batch_size: int) -> dict:
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    pf = pq.ParquetFile(in_file)
    writer = None
    rows_in = rows_out = 0
    tmp = out_file + ".tmp"
    try:
        for rb in pf.iter_batches(batch_size=batch_size, columns=columns):
            t = pa.Table.from_batches([rb])
            rows_in += t.num_rows
            out = transform(t)
            if out is None or out.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(tmp, out.schema)
            writer.write_table(out)
            rows_out += out.num_rows
        if writer is None:  # fully filtered shard still marks completion
            pq.write_table(pa.table({}), tmp)
        else:
            writer.close()
            writer = None
        os.replace(tmp, out_file)
    finally:
        if writer is not None:
            writer.close()
    return {"in_file": os.path.basename(in_file),
            "out_file": os.path.basename(out_file),
            "size": os.path.getsize(in_file),
            "rows_in": rows_in, "rows_out": rows_out,
            "wall_sec": round(time.monotonic() - t0, 4)}


def run_resumable_etl(files: List[str], out_dir: str,
                      transform: Callable[[pa.Table], pa.Table],
                      columns: Optional[List[str]] = None,
                      batch_size: int = 65536,
                      resume: bool = True) -> dict:
    """Apply ``transform`` (Arrow table → Arrow table, vectorized) to each
    input Parquet file, writing ``out_dir/part-NNNNN.parquet`` per input
    file atomically. Returns the run manifest; reruns skip shards whose
    recorded input size still matches."""
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(files)
    mpath = os.path.join(out_dir, "_manifest.json")
    done = {}
    if resume and os.path.exists(mpath):
        try:
            done = {e["in_file"]: e for e in json.load(open(mpath))["shards"]}
        except (json.JSONDecodeError, KeyError, OSError):
            done = {}
    pending = []
    kept = []
    for i, f in enumerate(files):
        out_f = os.path.join(out_dir, f"part-{i:05d}.parquet")
        prev = done.get(os.path.basename(f))
        if prev and prev.get("size") == os.path.getsize(f) \
                and os.path.exists(out_f):
            kept.append(prev)
        else:
            pending.append((f, out_f))
    new = ray.get([_etl_shard.remote(f, o, transform, columns, batch_size)
                   for f, o in pending])
    manifest = {"shards": sorted(kept + list(new), key=lambda e: e["in_file"]),
                "skipped": len(kept), "built": len(pending)}
    with open(mpath + ".tmp", "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def write_partitioned_by(ds, out_dir: str, cols: List[str]) -> None:
    """Hive-partitioned Parquet layout (one directory tree per key value)
    — the layout that lets a 100 TB consumer prune at the read."""
    ds.write_parquet(out_dir, partition_cols=cols)
