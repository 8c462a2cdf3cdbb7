"""Driver-RSS census of the round-3/4 exchange operators.

Companion to ``dedup_scale_proof.py`` (which proves the MinHash-LSH
path at 1M docs): generates corpus-scale synthetic inputs WORKER-SIDE
(the driver never holds them), pushes them through the new exchanges —

* ``dup_gram_table``  — corpus-sized gram keyspace through shard_scan;
* ``interval_join_sharded`` — two-sided range-bucket exchange;
* ``semantic_dedup_pairs``  — k-means cells + per-cell matmul;

— and asserts the driver's peak RSS stays bounded by the OUTPUT sizes
(CLAUDE.md rule 9), not the corpus. Run:

    python scripts/exchange_rss_proof.py        # ~1-2 min at 32 CPUs
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray
import ray.data as rd

N_DOCS = 200_000          # ~24M words of text, built worker-side
N_EVENTS = 5_000_000
N_BANDS = 20_000
N_VECS = 100_000
N_DNG_DOCS = 240_000      # identical-twin pairs → ~13.9M dup grams (> cap)
RSS_BOUND_MB = 900


def synth_docs(n_docs: int) -> rd.Dataset:
    """Worker-side text synthesis: ~120 words/doc, Zipf-ish vocab, with
    planted shared spans so dup grams exist."""
    def gen(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 1)
        vocab = np.array([f"w{i}" for i in range(30_000)])
        texts = []
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        for i in ids:
            words = vocab[rng.integers(0, len(vocab), 120)]
            t = " ".join(words)
            if i % 50 == 0:
                t = shared + " " + t
            texts.append(t)
        return pd.DataFrame({"doc_id": ids, "text": texts})

    return rd.range(n_docs).map_batches(gen, batch_size=4096,
                                        batch_format="pandas")


def main() -> int:
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocm_ray.ops.dedup import dup_gram_table, semantic_dedup_pairs
    from ocm_ray.ops.relational import interval_join_sharded

    results = {}
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    # 1. dup_gram_table over ~24M grams
    t0 = time.time()
    dup = dup_gram_table(synth_docs(N_DOCS), k=5, min_docs=2)
    n_dup = sum(b.num_rows for b in dup.iter_batches(batch_format="pyarrow"))
    results["dup_gram"] = {"n_dup_grams": int(n_dup),
                           "wall": round(time.time() - t0, 1)}
    assert n_dup >= 4, "planted shared spans must produce dup grams"

    # 2. interval_join_sharded: 5M values x 20k bands (output-bounded
    # by narrow bands; a couple of unbounded sentinels ride broadcast)
    def gen_events(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 7)
        return pd.DataFrame({"eid": ids,
                             "value": rng.normal(500, 300, len(ids))})

    left = rd.range(N_EVENTS).map_batches(gen_events, batch_size=65536,
                                          batch_format="pandas")
    rng = np.random.default_rng(3)
    import pandas as pd

    lo = rng.uniform(-200, 1200, N_BANDS)
    bands = pd.DataFrame({"band_id": np.arange(N_BANDS), "lo": lo,
                          "hi": lo + rng.exponential(0.05, N_BANDS)})
    bands.loc[N_BANDS - 2:, "lo"] = [-np.inf, 900.0]
    bands.loc[N_BANDS - 2:, "hi"] = [-100.0, np.inf]
    t0 = time.time()
    joined = interval_join_sharded(left, rd.from_pandas(bands), "value",
                                   right_cols=["band_id"], n_shards=32)
    n_join = sum(b.num_rows for b in joined.select_columns(["band_id"])
                 .iter_batches(batch_format="pyarrow"))
    results["interval_join"] = {"rows": int(n_join),
                                "wall": round(time.time() - t0, 1)}

    # 3. semantic dedup over 100k vectors (worker-side embeddings)
    def gen_vecs(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 11)
        base = rng.normal(size=(len(ids), 32)).astype(np.float32)
        return pd.DataFrame({"vec_id": ids, "embedding": list(base)})

    vecs = rd.range(N_VECS).map_batches(gen_vecs, batch_size=8192,
                                        batch_format="pandas")
    t0 = time.time()
    pairs = semantic_dedup_pairs(vecs, threshold=0.95, n_clusters=64,
                                 iters=2)
    n_pairs = sum(b.num_rows for b in pairs.iter_batches(
        batch_format="pyarrow"))
    results["semantic"] = {"pairs": int(n_pairs),
                           "wall": round(time.time() - t0, 1)}

    # 4. dup_ngram_stats with a dup-gram vocabulary ABOVE the broadcast
    # cap (round 4: the positional-exchange path replaces the old
    # ValueError). 240k docs in identical-twin pairs — every 5-gram is
    # duplicated, ~13.9M distinct dup grams >> max_broadcast=8M, so the
    # auto-dispatch MUST take the exchange plan; the driver never holds
    # the dup-gram set or the hit triples.
    from ocm_ray.ops.dedup import dup_ngram_stats

    def gen_twins(batch):
        import pandas as pd

        from ocm_ray.core.hashing import wanghash

        ids = batch["id"].to_numpy()
        p = (ids // 2).astype(np.uint64)       # twin pairs share a text
        L = 120
        key = (p[:, None] * np.uint64(1000003)
               + np.arange(L, dtype=np.uint64)[None, :])
        w = (wanghash(key) % np.uint64(30_000)).astype(np.int64)
        vocab = np.array([f"w{i}" for i in range(30_000)])
        texts = [" ".join(row) for row in vocab[w]]
        return pd.DataFrame({"doc_id": ids, "text": texts})

    twins = rd.range(N_DNG_DOCS).map_batches(gen_twins, batch_size=4096,
                                             batch_format="pandas")
    t0 = time.time()
    stats = dup_ngram_stats(twins, k=5)        # auto: must pick exchange
    n_rows = 0
    n_all_dup = 0
    for b in stats.iter_batches(batch_format="pyarrow"):
        n_rows += b.num_rows
        nd = b.column("n_dup_grams").to_numpy(zero_copy_only=False)
        ng = b.column("n_grams").to_numpy(zero_copy_only=False)
        n_all_dup += int((nd == ng).sum())
    results["dup_ngram_exchange"] = {"docs": int(n_rows),
                                     "all_dup_docs": int(n_all_dup),
                                     "wall": round(time.time() - t0, 1)}
    assert n_rows == N_DNG_DOCS
    # twins share their entire text: every gram of every doc is a dup
    assert n_all_dup == N_DNG_DOCS, \
        f"expected every doc fully duplicated, got {n_all_dup}/{n_rows}"

    # 5. remove_dup_spans over the same twin corpus, same above-cap
    # dup vocabulary (round 4.2): the payload-carrying exchange rewrites
    # every doc worker-side; the corpus-sized OUTPUT is consumed
    # streaming, never held. Twins duplicate their entire text, so every
    # word of every doc must be removed.
    from ocm_ray.ops.dedup import remove_dup_spans

    t0 = time.time()
    rewritten = remove_dup_spans(twins, k=5)   # auto: must pick exchange
    n_rw, n_fully = 0, 0
    for b in rewritten.iter_batches(batch_format="pyarrow"):
        n_rw += b.num_rows
        nw = b.column("n_words").to_numpy(zero_copy_only=False)
        nr = b.column("n_removed_words").to_numpy(zero_copy_only=False)
        n_fully += int((nw == nr).sum())
    results["span_removal_exchange"] = {"docs": int(n_rw),
                                        "fully_removed": int(n_fully),
                                        "wall": round(time.time() - t0, 1)}
    assert n_rw == N_DNG_DOCS and n_fully == N_DNG_DOCS, \
        f"twin corpus must be fully removed: {n_fully}/{n_rw}"

    # 6. epoch_shuffle over the same 240k-doc corpus: the full text
    # payload rides ONE exchange; output consumed streaming. Also
    # asserts the global order is the documented key order.
    from ocm_ray.ops.sampling import epoch_shuffle

    t0 = time.time()
    shuffled = epoch_shuffle(twins, seed=7, id_col="doc_id")
    n_sh, last_key = 0, None
    from ocm_ray.core.hashing import wanghash

    mix = wanghash(np.array([7], dtype=np.uint64))[0]
    ordered = True
    for b in shuffled.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
        n_sh += b.num_rows
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keys = wanghash(ids.astype(np.uint64) ^ mix)
        if len(keys):
            if last_key is not None and keys[0] < last_key:
                ordered = False
            if np.any(keys[1:] < keys[:-1]):
                ordered = False
            last_key = keys[-1]
    results["epoch_shuffle"] = {"docs": int(n_sh), "ordered": bool(ordered),
                                "wall": round(time.time() - t0, 1)}
    assert n_sh == N_DNG_DOCS and ordered

    # 7. NB-classifier training on a NEAR-UNIQUE vocabulary (round 4.3
    # census): 60k docs whose words are mostly doc-private (~2.2M
    # distinct words), so the training fold's keyspace is corpus-like.
    # The driver-held model is vocab-sized BY CONTRACT — the census
    # records that a multi-million-word vocab still fits the bound and
    # that the grouped-sum tree, not the driver, absorbs the fold.
    from ocm_ray.ops.classifier import nb_scores, train_quality_classifier

    N_NB = 60_000

    def gen_unique(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 13)
        texts = []
        for i in ids:
            own = [f"u{int(i)}_{j}" for j in range(36)]   # doc-private
            common = [f"c{v}" for v in rng.integers(0, 200, 4)]
            texts.append(" ".join(own + common))
        return pd.DataFrame({"doc_id": ids, "text": texts,
                             "label": (ids % 2).astype(np.int64)})

    nb_ds = rd.range(N_NB).map_batches(gen_unique, batch_size=4096,
                                       batch_format="pandas")
    t0 = time.time()
    model = train_quality_classifier(nb_ds, label_col="label")
    n_scored = sum(b.num_rows for b in
                   nb_scores(nb_ds, model).iter_batches(
                       batch_format="pyarrow"))
    results["nb_near_unique_vocab"] = {
        "vocab": int(model.vocab_size), "scored": int(n_scored),
        "wall": round(time.time() - t0, 1)}
    assert model.vocab_size > 2_000_000 and n_scored == N_NB

    # 8. perplexity_buckets over the 200k-doc corpus: LM table broadcast,
    # (source, score)-pair threshold exchange, stateless assignment —
    # nothing corpus-sized on the driver.
    from ocm_ray.ops.sampling import perplexity_buckets

    def gen_sourced(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 17)
        vocab = np.array([f"w{i}" for i in range(30_000)])
        texts = [" ".join(vocab[rng.integers(0, len(vocab), 80)])
                 for _ in ids]
        return pd.DataFrame({"doc_id": ids, "text": texts,
                             "source": [f"s{int(i) % 20}" for i in ids]})

    src_docs = rd.range(N_DOCS).map_batches(gen_sourced, batch_size=4096,
                                            batch_format="pandas")
    t0 = time.time()
    buckets = perplexity_buckets(src_docs)
    from collections import Counter

    dist = Counter()
    for b in buckets.iter_batches(batch_format="pyarrow"):
        dist.update(b.column("ppl_bucket").to_pylist())
    results["perplexity_buckets"] = {
        "docs": int(sum(dist.values())), "buckets": dict(dist),
        "wall": round(time.time() - t0, 1)}
    assert sum(dist.values()) == N_DOCS and len(dist) == 3

    # 9. funnel + retention at 10^6 users over 8M events; retention is
    # FORCED onto its shard_scan2 exchange plan (the >max_broadcast
    # path) so the census covers the users-unbounded join, not just the
    # broadcast default.
    from ocm_ray.ops.relational import funnel, retention_cohorts

    N_EV, N_USERS = 8_000_000, 1_000_000

    def gen_ev(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 19)
        return pd.DataFrame({
            "user_id": rng.integers(0, N_USERS, len(ids)),
            "ts": rng.integers(0, 30 * 86_400_000_000, len(ids)),
            "event_type": np.array(["view", "click", "signup"])[
                rng.integers(0, 3, len(ids))],
            "event_id": ids,
        })

    ev = rd.range(N_EV).map_batches(gen_ev, batch_size=131072,
                                    batch_format="pandas")
    t0 = time.time()
    fu = funnel(ev, ("view", "click", "signup"))
    n_funnel = sum(b.num_rows for b in fu.select_columns(["n_reached"])
                   .iter_batches(batch_format="pyarrow"))
    results["funnel_1m_users"] = {"users": int(n_funnel),
                                  "wall": round(time.time() - t0, 1)}
    assert n_funnel > N_USERS * 0.9

    t0 = time.time()
    ret = retention_cohorts(ev, distributed=True, n_shards=32)
    n_ret = 0
    n_active = 0
    for b in ret.iter_batches(batch_format="pyarrow"):
        n_ret += b.num_rows
        n_active += int(np.sum(
            b.column("n_active").to_numpy(zero_copy_only=False)))
    results["retention_1m_users_exchange"] = {
        "cohort_rows": int(n_ret), "user_periods": int(n_active),
        "wall": round(time.time() - t0, 1)}
    assert n_ret > 0 and n_active > N_USERS  # ≥ one period per user

    # 10. distributed connected components over a 6M-edge graph (150k
    # 64-node near-dup clusters + a 1024-node chain for depth) — the
    # dup_clusters_ds star rounds: ~11 signature iterations, every
    # exchange through shard_scan, labels checked against the planted
    # structure via per-block partials (generator/checker shared with
    # scripts/cc_scale_proof.py, which runs the same proof at 60M
    # edges). The driver never holds the edge set or the label table.
    from ocm_ray.ops.dedup import dup_clusters_ds
    from scripts.cc_scale_proof import cluster_edge_gen, label_check_partials

    N_CC_EDGES, CSIZE, CHAIN = 6_000_000, 64, 1024
    N_CL = N_CC_EDGES // 40

    cc_edges = rd.range(N_CC_EDGES).map_batches(
        cluster_edge_gen(N_CL, CSIZE, chain=CHAIN, salt=23),
        batch_size=262144, batch_format="pandas")
    t0 = time.time()
    labels = dup_clusters_ds(cc_edges, distributed=True, n_shards=32)
    part = labels.map_batches(label_check_partials(N_CL, CSIZE,
                                                   chain=CHAIN),
                              batch_format="pyarrow",
                              batch_size=None).to_pandas()
    n_lab = int(part["n"].sum()) if "n" in part.columns else 0
    n_bad = int(part["bad"].sum()) if "bad" in part.columns else 0
    results["connected_components_6m_edges"] = {
        "labels": int(n_lab), "bad": int(n_bad),
        "wall": round(time.time() - t0, 1)}
    assert n_bad == 0 and n_lab > N_CL * CSIZE * 0.6

    # 11. LR classifier training at the full census corpus: 2 full-batch
    # GD epochs over 200k docs at the default dim=2^18 — per-block
    # sparse gradient partials through the grouped_sum tree; the driver
    # holds only the 2 MB model + the dim-bounded folded gradient.
    from ocm_ray.ops.classifier import lr_scores, train_lr_classifier

    def gen_labeled(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 29)
        vocab = np.array([f"w{i}" for i in range(30_000)])
        texts = []
        for i in ids:
            words = list(vocab[rng.integers(0, len(vocab), 80)])
            words.append("goodmark" if i % 2 == 0 else "badmark")
            texts.append(" ".join(words))
        return pd.DataFrame({"doc_id": ids, "text": texts,
                             "label": ids % 2 == 0})

    lab = rd.range(N_DOCS).map_batches(gen_labeled, batch_size=4096,
                                       batch_format="pandas")
    t0 = time.time()
    model = train_lr_classifier(lab, epochs=2, lr=5.0)
    n_scored = sum(b.num_rows for b in lr_scores(lab, model)
                   .iter_batches(batch_format="pyarrow"))
    results["lr_train_200k"] = {"scored": int(n_scored), "dim": model.dim,
                                "wall": round(time.time() - t0, 1)}
    assert n_scored == N_DOCS

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    ok = peak < RSS_BOUND_MB
    import json

    print(json.dumps({"results": results,
                      "driver_rss_before_mb": round(rss0),
                      "driver_peak_rss_mb": round(peak),
                      "rss_bound_mb": RSS_BOUND_MB, "ok": ok}))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
