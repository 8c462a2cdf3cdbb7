"""End-to-end training-data curation pipeline — the composition a 100 TB
corpus run would use, exercising every operator class in one flow:

    read → text stats + quality score (actor pool) → quality filter →
    exact dedup (content hash) → MinHash-LSH near-dedup → per-source
    HLL distinct + token counts → hive-partitioned Parquet output.

Each stage is the library operator; this module only wires them. The
output layout (partitioned by ``source``) plus the returned summary make
the run auditable and the output prunable at the read.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


def curate(documents_path: str, out_dir: str, quality_min: float = 0.3,
           near_dup_threshold: float = 0.85,
           concurrency: int = 4) -> dict:
    """Run the curation flow over a documents Parquet table; returns a
    summary dict (counts per stage, per-source distincts)."""
    import ray.data as rd

    from ocm_ray.engine.build import grouped_sketches
    from ocm_ray.ops.dedup import exact_dedup, minhash_lsh_pairs
    from ocm_ray.ops.text import add_text_stats

    ds = rd.read_parquet(documents_path)
    n_in = ds.count()

    # 1. per-doc stats + quality (actor pool), filter
    scored = add_text_stats(ds, concurrency=concurrency)
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("quality"),
                                            pa.scalar(quality_min))),
        batch_format="pyarrow")
    kept = kept.materialize()  # reused by three consumers below
    n_quality = kept.count()
    if n_quality == 0:
        # everything filtered: empty groupbys lose their schema — exit early
        os.makedirs(out_dir, exist_ok=True)
        return {"n_input": n_in, "n_after_quality": 0, "n_exact_unique": 0,
                "n_near_dup_dropped": 0, "n_output": 0,
                "distinct_docs_per_source": {}, "out_dir": out_dir}

    # 2. exact dedup: representative id per distinct text
    reps = exact_dedup(kept).to_pandas()
    keep_ids = set(reps["doc_id"].tolist())

    # 3. near-dedup: drop the higher id of each near-dup pair
    pairs = minhash_lsh_pairs(kept.select_columns(["doc_id", "text"]),
                              threshold=near_dup_threshold)
    drop = set(pairs["b"].tolist())
    keep_ids -= drop

    keep_ref = sorted(keep_ids)
    final = kept.map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"),
                                    value_set=pa.array(keep_ref))),
        batch_format="pyarrow")

    # 4. per-source distinct-document estimates over the surviving docs
    from ocm_ray.sketches import HyperLogLog

    per_src = grouped_sketches(final.select_columns(["text", "source"]),
                               "source", lambda: HyperLogLog(12),
                               column="text")

    # 5. partitioned output (prunable layout + resumable unit per key)
    final.write_parquet(out_dir, partition_cols=["source"])

    return {
        "n_input": n_in,
        "n_after_quality": n_quality,
        "n_exact_unique": len(reps),
        "n_near_dup_dropped": len(drop),
        "n_output": len(keep_ref),
        "distinct_docs_per_source": {k: round(v.estimate())
                                     for k, v in sorted(per_src.items())},
        "out_dir": out_dir,
    }
