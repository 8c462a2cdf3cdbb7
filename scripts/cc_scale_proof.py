"""Driver-RSS + wall proof for distributed connected components at
crawl scale: a worker-generated N-edge graph (default 60M edges —
~1.5M planted 64-node near-dup clusters, ~96M node id space) through
``dup_clusters_ds``'s forced star-round plan. Labels are streamed out
and checked against the planted structure; the driver never holds the
edge set, the message exchanges, or the label table.

    python scripts/cc_scale_proof.py [n_edges]     # default 60_000_000
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray
import ray.data as rd

RSS_BOUND_MB = 1000


def cluster_edge_gen(n_cl: int, csize: int, chain: int = 0, salt: int = 31):
    """Worker-side planted-cluster edge generator shared by this proof
    and the census CC stage (scripts/exchange_rss_proof.py): each edge
    connects two random members of cluster ``id % n_cl``; ``chain`` > 0
    splices a path of that many extra nodes into the first batch (the
    depth-adversarial case)."""
    def gen_edges(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + salt)
        c = (ids % n_cl).astype(np.int64)
        a = c * csize + rng.integers(0, csize, len(ids))
        b = c * csize + rng.integers(0, csize, len(ids))
        if chain and int(ids[0]) == 0:
            base = n_cl * csize
            ca = base + np.arange(chain - 1)
            a = np.concatenate([a, ca])
            b = np.concatenate([b, ca + 1])
        k = a != b
        return pd.DataFrame({"a": a[k], "b": b[k]})

    return gen_edges


def label_check_partials(n_cl: int, csize: int, chain: int = 0):
    """Per-block (n, bad) label-check partials for the planted
    structure (the 100 TB shape — never stream the label table through
    the driver just to assert it): cluster nodes must carry a
    same-cluster label <= their own id (min-monotone); chain nodes (ids
    >= n_cl*csize) must carry the chain head."""
    def check(blk):
        import pandas as pd

        if blk.num_rows == 0:
            return pd.DataFrame({"n": [0], "bad": [0]})
        d = blk.column("doc_id").to_numpy(zero_copy_only=False)
        lab = blk.column("cluster_id").to_numpy(zero_copy_only=False)
        in_cl = d < n_cl * csize
        # chain nodes live above the cluster id range and must carry
        # the chain head; without a planted chain NO id belongs up
        # there, so such a row is bad by construction
        above_ok = (lab == n_cl * csize) if chain else np.zeros(len(d),
                                                                bool)
        ok = np.where(in_cl, (lab // csize == d // csize) & (lab <= d),
                      above_ok)
        return pd.DataFrame({"n": [len(d)], "bad": [int(np.sum(~ok))]})

    return check


def main(n_edges: int) -> int:
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocm_ray.ops.dedup import dup_clusters_ds

    if n_edges < 1000:
        print(f"n_edges must be >= 1000 (got {n_edges})", file=sys.stderr)
        return 2
    csize = 64
    n_cl = max(1, n_edges // 40)      # ~40 sampled edges per cluster

    edges = rd.range(n_edges).map_batches(
        cluster_edge_gen(n_cl, csize), batch_size=262144,
        batch_format="pandas")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    labels = dup_clusters_ds(edges, distributed=True, n_shards=64)

    # verify DISTRIBUTED (the 100 TB shape): per-block (n, bad) check
    # partials — streaming 68M label rows through the driver would put
    # ~1.1 GB of plasma pages into its RSS just for the assertion
    part = labels.map_batches(label_check_partials(n_cl, csize),
                              batch_format="pyarrow",
                              batch_size=None).to_pandas()
    n_lab = int(part["n"].sum()) if "n" in part.columns else 0
    n_bad = int(part["bad"].sum()) if "bad" in part.columns else 0
    wall = time.time() - t0
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    ok = n_bad == 0 and peak < RSS_BOUND_MB and n_lab > n_cl * csize * 0.6
    print(json.dumps({"n_edges": n_edges, "n_clusters_planted": n_cl,
                      "labels": n_lab, "bad": n_bad,
                      "wall_sec": round(wall, 1),
                      "driver_rss_before_mb": round(rss0),
                      "driver_peak_rss_mb": round(peak),
                      "rss_bound_mb": RSS_BOUND_MB, "ok": ok}))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    sys.exit(main(n))
