"""Round-4 tests: VERDICT/ADVICE r3 punch list.

Covers the de-scale-killed dup_ngram_stats positional exchange, wave-
scheduled shard_scan, vectorized grouped-sketch partials, Arrow-native
broadcast join, ProbMinHash, wz_compress, and the ADVICE r3 fixes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def seq_dir():
    from ocm_ray.data.sequences import ensure_sequences

    return ensure_sequences(500, seed=42, n_files=8)


def _mixed_corpus(n=400, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)]
    shared = " ".join(rng.choice(vocab, 12))
    docs = []
    for i in range(n):
        body = " ".join(rng.choice(vocab, rng.integers(3, 60)))
        if i % 7 == 0:
            body = body + " " + shared
        docs.append({"doc_id": f"d{i:04d}", "text": body})
    return pd.DataFrame(docs)


def test_dup_ngram_stats_exchange_matches_broadcast():
    """The unbounded-vocabulary positional-exchange path must produce
    byte-identical stats to the broadcast probe (VERDICT r3 #3: the
    max_broadcast ValueError is gone; above the cap the plan switches
    to a two-exchange shard_scan2 with no driver materialization)."""
    import ray.data as rd

    from ocm_ray.ops.dedup import dup_ngram_stats

    docs = _mixed_corpus()
    ds = rd.from_pandas(docs).repartition(6)
    a = (dup_ngram_stats(ds, k=5, distributed=False)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dup_ngram_stats(ds, k=5, distributed=True, n_shards=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup_grams"] > 0).any()          # the test has real dups
    assert (a["max_dup_run"].max()) >= 8          # the planted 12-gram run

    # auto-dispatch: a tiny cap forces the exchange path with no error
    c = (dup_ngram_stats(ds, k=5, max_broadcast=1, n_shards=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, c)


def test_dup_ngram_stats_exchange_tokens_domain_and_int_ids():
    """Tokens-domain + integer id column through the exchange path."""
    import ray.data as rd

    from ocm_ray.ops.dedup import dup_ngram_stats

    rng = np.random.default_rng(3)
    base = rng.integers(0, 500, 40).tolist()
    rows = []
    for i in range(200):
        toks = rng.integers(0, 500, int(rng.integers(5, 80))).tolist()
        if i % 5 == 0:
            toks = toks + base
        rows.append({"doc_id": i, "tokens": toks})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    a = (dup_ngram_stats(ds, k=5, tokens_col="tokens", distributed=False)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dup_ngram_stats(ds, k=5, tokens_col="tokens", distributed=True,
                         n_shards=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_occm_collapse_vs_sharded_sandwich(seq_dir):
    """ADVICE r3 #3: the bounded-vocab collapse regroups what the
    conservative update sees, so collapsed and sharded OCCM may differ
    in bytes — but BOTH must stay inside the documented sandwich
    ``true <= est <= vanilla-CM est`` for every token, and the
    non-conservative OCM build must stay BIT-EXACT across the paths
    (its passes are multiset functions)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    from ocm_ray.engine.rounds import build_ocm
    from ocm_ray.sketches import CountMin

    files = sorted(_glob.glob(_os.path.join(seq_dir, "*.parquet")))
    kw = dict(np_bits=10, nh=3, rounds=3, files=files)
    occ_coll = build_ocm(conservative=True, collapse_threshold=1 << 30, **kw)
    occ_shard = build_ocm(conservative=True, collapse_threshold=0, **kw)
    ocm_coll = build_ocm(conservative=False, collapse_threshold=1 << 30, **kw)
    ocm_shard = build_ocm(conservative=False, collapse_threshold=0, **kw)
    assert np.array_equal(ocm_coll.core, ocm_shard.core)
    assert np.array_equal(ocm_coll.collision, ocm_shard.collision)

    # exact truth + a vanilla CM upper bound over the same stream
    toks = np.concatenate([np.concatenate(
        pq.read_table(f, columns=["tokens"]).column("tokens").to_pylist())
        for f in files]).astype(np.uint64)
    uniq, cnt = np.unique(toks, return_counts=True)
    vans = CountMin(10, 3, conservative=False)
    vans.update(toks)
    van_est = vans.estimate(uniq)
    for occ in (occ_coll, occ_shard):
        est = occ.estimate(uniq)
        assert (est >= cnt).all(), "one-sided guarantee broken"
        assert (est <= van_est).all(), "conservative above vanilla"


def test_grouped_sketches_many_keys_linear():
    """VERDICT r3 #6: per-batch grouped partials are one sort + slice
    pass — 10k distinct keys in one batch must stay tractable (the old
    per-key Table.filter re-scanned the batch per key) and correct."""
    import time

    import ray.data as rd

    from ocm_ray.engine.build import grouped_sketches
    from ocm_ray.sketches import HyperLogLog

    n_keys, reps = 10_000, 3
    keys = np.repeat(np.arange(n_keys), reps)
    toks = np.arange(len(keys), dtype=np.int64)
    df = pd.DataFrame({"src": keys,
                       "tokens": [[int(t)] for t in toks]})
    ds = rd.from_pandas(df).repartition(2)
    t0 = time.perf_counter()
    out = grouped_sketches(ds, "src", lambda: HyperLogLog(6),
                           column="tokens", n_shards=8)
    wall = time.perf_counter() - t0
    assert len(out) == n_keys
    # every key saw EXACTLY tokens {3k, 3k+1, 3k+2}: the sampled keys'
    # registers must equal a directly-built sketch over that exact set —
    # a sort/slice run-boundary leak (one neighboring key's token
    # bleeding in) changes registers and fails; a loose estimate band
    # would not
    for k in range(0, n_keys, 997):
        want = HyperLogLog(6)
        want.update(np.arange(3 * k, 3 * k + reps, dtype=np.uint64))
        assert np.array_equal(out[k].registers, want.registers), k
    assert wall < 120, f"grouped partials took {wall:.0f}s for 10k keys"


def test_broadcast_join_arrow_native():
    """VERDICT r3 #7: broadcast_join is pa.Table.join per batch (no
    pandas conversion); values and row multiplicity match a pandas
    merge."""
    import ray.data as rd

    from ocm_ray.ops.relational import broadcast_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 50, 3000),
                         "v": rng.normal(size=3000)})
    small = pd.DataFrame({"k": np.arange(0, 40),
                          "name": [f"n{i}" for i in range(40)]})
    got = (broadcast_join(rd.from_pandas(left).repartition(4), small, "k")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = (left.merge(small, on="k", how="inner")
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_inner_product_exact_past_float53():
    """ADVICE r3 #4: inner_product must not round down through float64
    — construct counters whose row dot exceeds 2^53 and check exactness
    against arbitrary-precision arithmetic."""
    from ocm_ray.sketches import CountMin

    a = CountMin(4, 3, conservative=False, counter_dtype="int64")
    b = CountMin(4, 3, conservative=False, counter_dtype="int64")
    big = 3_037_000_499  # ~2^31.5: big*big > 2^62 per cell
    a.core[:] = big
    b.core[:] = big
    w = 1 << 4
    exact = big * big * w          # per-row dot (> int64 max: the sum
    assert a.inner_product(b) == exact  # must go arbitrary-precision)


# ---------------------------------------------------------------------------
# ProbMinHash (pmh.h — VERDICT r3 #4, last undispositioned vendored sketch)


def test_probminhash_merge_law_and_partition_invariance():
    from ocm_ray.sketches import MergeableSketch, ProbMinHash

    rng = np.random.default_rng(11)
    n = 600
    idx = rng.permutation(20_000)[:n].astype(np.int64)
    w = rng.exponential(2.0, n) + 0.05

    whole = ProbMinHash(256)
    whole.update(idx, w)

    # exact mergeability: any partitioning of the nonzeros min-merges to
    # the identical registers (draws are a pure function of weight bits)
    parts = []
    for lo in range(0, n, 97):
        p = ProbMinHash(256)
        p.update(idx[lo:lo + 97], w[lo:lo + 97])
        parts.append(p)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert np.array_equal(acc.minval, whole.minval)
    assert np.array_equal(acc.argmin, whole.argmin)

    # associativity on three independent pieces
    a, b, c = (ProbMinHash(64) for _ in range(3))
    a.update(idx[:200], w[:200])
    b.update(idx[200:400], w[200:400])
    c.update(idx[400:], w[400:])
    left = ProbMinHash.from_bytes(a.to_bytes()).ensure_writable()
    left.merge(b).merge(c)
    right = ProbMinHash.from_bytes(b.to_bytes()).ensure_writable()
    right.merge(c)
    right2 = ProbMinHash.from_bytes(a.to_bytes()).ensure_writable()
    right2.merge(right)
    assert np.array_equal(left.argmin, right2.argmin)
    assert np.array_equal(left.minval, right2.minval)

    # serialization round trip through the registry
    back = MergeableSketch.from_bytes(whole.to_bytes())
    assert isinstance(back, ProbMinHash)
    assert np.array_equal(back.argmin, whole.argmin)


def test_probminhash_selection_proportional_to_weight():
    """argmin over Exp(w_i) draws picks i with probability w_i/Σw: with
    few elements and many registers the empirical selection frequencies
    must track the weights."""
    from ocm_ray.sketches import ProbMinHash

    idx = np.array([1, 2, 3, 4], dtype=np.int64)
    w = np.array([8.0, 4.0, 2.0, 1.0])
    sk = ProbMinHash(n_regs=4096)
    sk.update(idx, w)
    sel = sk.sample()
    freq = np.array([(sel == i).mean() for i in idx])
    expect = w / w.sum()
    # binomial 5-sigma at n=4096
    sigma = np.sqrt(expect * (1 - expect) / 4096)
    assert (np.abs(freq - expect) < 5 * sigma + 1e-9).all(), (freq, expect)


def test_probminhash_similarity_matches_weighted_jaccard():
    """With intersection weights agreeing (the consistent-sampling
    regime), P[register match] == weighted Jaccard; check the estimate
    against the exact value within binomial 5 sigma."""
    from ocm_ray.sketches import ProbMinHash

    rng = np.random.default_rng(23)
    n_all = 3000
    weights = rng.exponential(1.0, n_all) + 0.01
    in_a = rng.random(n_all) < 0.75
    in_b = rng.random(n_all) < 0.75
    wa = np.where(in_a, weights, 0.0)
    wb = np.where(in_b, weights, 0.0)
    exact = np.minimum(wa, wb).sum() / np.maximum(wa, wb).sum()

    m = 2048
    a, b = ProbMinHash(m), ProbMinHash(m)
    a.update(np.flatnonzero(in_a), wa[in_a])
    b.update(np.flatnonzero(in_b), wb[in_b])
    est = a.similarity(b)
    sigma = np.sqrt(exact * (1 - exact) / m)
    assert abs(est - exact) < 5 * sigma, (est, exact, sigma)


def test_shard_scan_pandas_block_upstream():
    """The wave-scheduled exchange consumes RAW block refs, which may be
    pandas blocks (producer's choice) — _as_arrow must normalize them
    worker-side without changing results."""
    import ray.data as rd

    from ocm_ray.ops.pairs import shard_scan

    def gen(batch):                      # pandas in, pandas out
        ids = batch["id"].to_numpy()
        return pd.DataFrame({"key": (ids * 2654435761) % 97,
                             "v": ids})

    ds = rd.range(5000, override_num_blocks=6).map_batches(
        gen, batch_format="pandas")

    def shard_of(tbl: pa.Table) -> np.ndarray:
        return (tbl.column("key").to_numpy(zero_copy_only=False)
                % 8).astype(np.int32)

    def scan(tbl: pa.Table) -> pa.Table:
        k = tbl.column("key").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        run = np.concatenate([[True], ks[1:] != ks[:-1]]) if len(ks) \
            else np.empty(0, bool)
        starts = np.flatnonzero(run)
        tot = np.add.reduceat(vs, starts) if len(starts) else vs
        return pa.table({"key": pa.array(ks[starts] if len(starts)
                                         else ks),
                         "sum_v": pa.array(tot.astype(np.int64))})

    out = (shard_scan(ds, shard_of, scan, 8).to_pandas()
           .sort_values("key").reset_index(drop=True))
    ids = np.arange(5000)
    keys = (ids * 2654435761) % 97
    want = (pd.DataFrame({"key": keys, "v": ids})
            .groupby("key", as_index=False)["v"].sum()
            .rename(columns={"v": "sum_v"}))
    pd.testing.assert_frame_equal(
        out.astype({"key": np.int64, "sum_v": np.int64}),
        want.astype({"key": np.int64, "sum_v": np.int64}))


def test_ivfpq_index_recall_and_compression(tmp_path):
    """IVF-PQ (Jegou et al. 2011): code bytes per vector == m_subspaces
    (16x smaller than float32 at dim 32, m 8), deterministic rebuild,
    and ADC recall@10 against brute force on clustered synthetic data."""
    import ray.data as rd

    from ocm_ray.ops.similarity import (brute_force_topk,
                                        build_ivfpq_index, ivfpq_topk)

    rng = np.random.default_rng(2)
    dim, n = 32, 6000
    base = rng.normal(size=(n, dim))
    # plant 10 well-separated near-neighbors for each of 8 queries
    # (cos ~0.98 vs a ~0.65 best random match — PQ must rank structure,
    # not near-tie noise, which no 8-byte code can resolve)
    queries = rng.normal(size=(8, dim))
    for qi in range(8):
        for j in range(10):
            base[100 * qi + j] = queries[qi] + 0.1 * rng.normal(size=dim)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [r.astype(np.float32) for r in base]})
    ds = rd.from_pandas(df).repartition(4)
    idx = str(tmp_path / "ivfpq")
    meta = build_ivfpq_index(ds, idx, n_centroids=16, m_subspaces=8,
                             n_codes=64)
    # compression: 8 uint8 codes per vector vs 32 float32 = 16x
    import glob as _glob

    import pyarrow.parquet as pq

    files = _glob.glob(idx + "/**/*.parquet", recursive=True)
    t = pq.read_table(files[0], columns=["codes"])
    assert t.column("codes").type.list_size == 8

    got = ivfpq_topk(queries, k=10, n_probe=8, index_dir=idx)
    exact = brute_force_topk(ds, queries, k=10)
    recalls = []
    for qi in range(8):
        g = set(got.loc[got.query_idx == qi, "vec_id"])
        e = set(exact.loc[exact.query_idx == qi, "vec_id"])
        recalls.append(len(g & e) / len(e))
    assert np.mean(recalls) >= 0.7, recalls

    # determinism: rebuilding yields the identical metadata
    idx2 = str(tmp_path / "ivfpq2")
    meta2 = build_ivfpq_index(ds, idx2, n_centroids=16, m_subspaces=8,
                              n_codes=64)
    assert meta["centroids"] == meta2["centroids"]
    assert meta["codebooks"] == meta2["codebooks"]


def test_mp4_container_metadata():
    """ISO-BMFF container triage without ffmpeg (round 4: the compressed
    -video stub gains a REAL metadata layer): box-tree walk extracts
    brand / duration / tracks / codec / geometry / sample count from a
    spec-built fixture; pixel decode stays honestly stubbed."""
    import ray.data as rd

    from ocm_ray.ops.multimodal import (make_mp4_meta_fixture,
                                        parse_mp4_meta,
                                        video_container_meta)

    blob = make_mp4_meta_fixture(n_samples=48, w=64, h=36,
                                 duration_ms=2000)
    meta = parse_mp4_meta(blob)
    assert meta == {"brand": "isom", "duration_ms": 2000, "n_tracks": 1,
                    "video_codec": "avc1", "width": 64, "height": 36,
                    "n_samples": 48}
    # 64-bit largesize box handled: wrap moov in a largesize shell? —
    # simpler: truncation must not crash, non-BMFF must raise
    assert parse_mp4_meta(blob[:40])["brand"] == "isom"
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00" * 64)

    blobs = [make_mp4_meta_fixture(n_samples=i + 1, w=32 * (i + 1),
                                   h=18 * (i + 1), duration_ms=500 * (i + 1))
             for i in range(5)]
    ds = rd.from_pandas(pd.DataFrame({"media_id": np.arange(5),
                                      "payload": blobs})).repartition(2)
    out = (video_container_meta(ds).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert (out["n_samples"].to_numpy() == np.arange(1, 6)).all()
    assert (out["width"].to_numpy() == 32 * np.arange(1, 6)).all()
    assert (out["duration_ms"].to_numpy() == 500 * np.arange(1, 6)).all()
    assert (out["video_codec"] == "avc1").all()


def test_counting_bottomk_minhash():
    """mh.h CountingRangeMinHash contract: exact per-hash counts on the
    final bottom-k under ANY partitioning, histogram intersection vs a
    brute-force weighted computation over the union bottom-k, k-th
    order-statistic cardinality, serialization round trip."""
    from ocm_ray.sketches import CountingBottomKMinHash, MergeableSketch

    rng = np.random.default_rng(9)
    stream = rng.zipf(1.5, 40_000)
    stream = stream[stream < 5000].astype(np.uint64)

    whole = CountingBottomKMinHash(k=256)
    whole.update(stream)

    # partition invariance: counts on the surviving bottom-k are exact
    parts = []
    for lo in range(0, len(stream), 1237):
        p = CountingBottomKMinHash(k=256)
        p.update(stream[lo:lo + 1237])
        parts.append(p)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert np.array_equal(acc.values, whole.values)
    assert np.array_equal(acc.counts, whole.counts)

    # counts are the EXACT occurrence totals of the retained hashes
    from ocm_ray.core.hashing import wanghash

    h = wanghash(stream ^ np.uint64(137))
    uniq, cnt = np.unique(h, return_counts=True)
    keep = np.searchsorted(uniq, whole.values)
    assert np.array_equal(cnt[keep], whole.counts)

    # histogram intersection vs brute force on two overlapping streams
    s2 = np.concatenate([stream[::2], (rng.zipf(1.5, 10_000) + 10_000)
                         .astype(np.uint64)])
    other = CountingBottomKMinHash(k=256)
    other.update(s2)
    est = whole.histogram_intersection(other)
    union = np.unique(np.concatenate([whole.values, other.values]))[:256]
    ca = np.zeros(len(union), np.int64)
    cb = np.zeros(len(union), np.int64)
    for arr, out in ((stream, ca), (s2, cb)):
        hh = wanghash(arr ^ np.uint64(137))
        u2, c2 = np.unique(hh, return_counts=True)
        ix = np.searchsorted(u2, union)
        ix = np.minimum(ix, len(u2) - 1)
        m = u2[ix] == union
        out[m] = c2[ix[m]]
    want = np.minimum(ca, cb).sum() / np.maximum(ca, cb).sum()
    assert abs(est - want) < 1e-12
    assert 0.0 < est < 1.0

    # cardinality within 5 relative sigma (~1/sqrt(k))
    n_true = len(np.unique(stream))
    assert abs(whole.cardinality_estimate() - n_true) < 5 * n_true / 16

    back = MergeableSketch.from_bytes(whole.to_bytes())
    assert isinstance(back, CountingBottomKMinHash)
    assert np.array_equal(back.counts, whole.counts)


def test_wz_compress_linear_and_recovers_heavy():
    """rnla.h wz transform (VERDICT r3 #8): linearity (mergeable by
    addition) and heavy-coordinate recovery after dividing the Exp
    draws back out."""
    from ocm_ray.sketches.rnla import wz_compress, wz_decompress

    rng = np.random.default_rng(4)
    d, newdim, ns = 4096, 512, 7
    v = rng.normal(0, 1, d)
    heavy = rng.permutation(d)[:8]
    v[heavy] += np.sign(v[heavy] + 0.1) * 60.0

    a, b = np.zeros(d), np.zeros(d)
    a[: d // 2] = v[: d // 2]
    b[d // 2:] = v[d // 2:]
    ca = wz_compress(a, newdim, ns)
    cb = wz_compress(b, newdim, ns)
    cv = wz_compress(v, newdim, ns)
    assert np.allclose(ca + cb, cv, rtol=1e-12, atol=1e-9)  # linear

    est = wz_decompress(cv, d)
    # the 8 planted heavies must dominate the top estimates
    top = np.argsort(-np.abs(est))[:16]
    assert set(heavy).issubset(set(top.tolist()))
    # own contribution cancels exactly: a 1-sparse vector round-trips
    one = np.zeros(d)
    one[123] = 5.0
    assert abs(wz_decompress(wz_compress(one, newdim, ns), d)[123] - 5.0) \
        < 1e-9


def test_text_embedder_custom_encode_fn():
    """VERDICT r3 #9: the embedding stage accepts a user-supplied
    encoder; the placeholder projection is demonstrably swappable (the
    callable must be picklable — module-level def)."""
    import ray.data as rd

    from ocm_ray.ops.text import embed_texts

    def len_encoder(texts):
        """Deterministic stand-in 'model': 4 length-derived features.
        A closure — cloudpickle ships it by VALUE (a module-level def in
        a test module is pickled by reference, which workers cannot
        import)."""
        import numpy as _np

        out = _np.zeros((len(texts), 4), dtype=_np.float32)
        for i, t in enumerate(texts):
            out[i] = [len(t), t.count(" "), len(t.split()), 1.0]
        return out

    docs = pd.DataFrame({"doc_id": ["a", "b", "c"],
                         "text": ["one two", "three", "four five six"]})
    out = embed_texts(rd.from_pandas(docs), dim=4,
                      encode_fn=len_encoder).to_pandas()
    emb = np.stack(out.sort_values("doc_id")["embedding"].to_numpy())
    want = np.stack([len_encoder([t])[0] for t in
                     docs.sort_values("doc_id")["text"]])
    assert np.allclose(emb, want)
    # wrong width must fail loudly, not silently reshape (direct call:
    # raising inside a Ray actor pool stalls on actor restarts)
    from ocm_ray.ops.text import TextEmbedder

    bad = TextEmbedder(dim=7, encode_fn=len_encoder)
    with pytest.raises(AssertionError):
        bad(pa.table({"text": ["x y"]}))


def test_perplexity_buckets_matches_duckdb(ray_session):
    """CCNet head/middle/tail tiers: engine buckets == DuckDB recompute
    (quantile_disc terciles of the rounded unigram-LM score per source),
    partition-invariant, roughly balanced thirds per source."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocm_ray.ops.sampling import perplexity_buckets

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(50)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, rng.integers(5, 40))),
             "source": f"s{i % 3}"} for i in range(300)]
    tbl = pa.Table.from_pylist(rows)

    got = (perplexity_buckets(ray.data.from_arrow(tbl).repartition(7))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute("""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents),
        cnts AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
        tot AS (SELECT SUM(c) AS t FROM cnts),
        lp AS (SELECT doc_id,
                      ROUND(AVG(log2(CAST(c AS DOUBLE) / t)), 4) AS lp
               FROM w JOIN cnts USING (w), tot GROUP BY doc_id),
        ls AS (SELECT d.doc_id, d.source, lp.lp
               FROM documents d JOIN lp USING (doc_id)),
        th AS (SELECT source, quantile_disc(lp, 1.0/3) AS q1,
                              quantile_disc(lp, 2.0/3) AS q2
               FROM ls GROUP BY source)
        SELECT doc_id, lp AS logprob,
               CASE WHEN lp <= q1 THEN 'tail'
                    WHEN lp <= q2 THEN 'middle'
                    ELSE 'head' END AS ppl_bucket
        FROM ls JOIN th USING (source) ORDER BY doc_id
    """).df()
    assert np.allclose(got["logprob"], want["logprob"], atol=1e-12)
    assert got["ppl_bucket"].tolist() == want["ppl_bucket"].tolist()
    # tiers are value-based, so each source's split is near thirds
    per = got.groupby("source")["ppl_bucket"].value_counts().unstack()
    assert (per.min(axis=1) >= 20).all()

    # partition invariance
    got1 = (perplexity_buckets(ray.data.from_arrow(tbl).repartition(1))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got1["ppl_bucket"].tolist() == got["ppl_bucket"].tolist()


def test_kn_bigram_logprob(ray_session):
    """Interpolated Kneser-Ney bigram LM: DuckDB recompute parity,
    partition invariance, and the smoothing property the MLE lacks —
    held-out text with unseen bigrams over seen contexts still scores
    (backed off to the continuation distribution)."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocm_ray.ops.text import kn_bigram_logprob

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(30)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, rng.integers(2, 25)))}
            for i in range(150)]
    tbl = pa.Table.from_pylist(rows)

    got = (kn_bigram_logprob(ray.data.from_arrow(tbl).repartition(6))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        bgo AS (SELECT doc_id, ws[j] AS w1, ws[j+1] AS w2
                FROM t, UNNEST(range(1, len(ws))) AS r(j)),
        bg AS (SELECT w1, w2, COUNT(*) AS c FROM bgo GROUP BY w1, w2),
        ctx AS (SELECT w1, SUM(c) AS ctx, COUNT(*) AS n1f
                FROM bg GROUP BY w1),
        cont AS (SELECT w2, COUNT(*) AS n1b FROM bg GROUP BY w2),
        tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM bg)
        SELECT doc_id, ROUND(AVG(log2((GREATEST(c - 0.75, 0)
                       + 0.75 * n1f * (n1b / t)) / ctx)), 4) AS logprob
        FROM bgo JOIN bg USING (w1, w2) JOIN ctx USING (w1)
             JOIN cont USING (w2), tt
        GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert np.allclose(got["logprob"], want["logprob"], atol=1e-9)

    got1 = (kn_bigram_logprob(ray.data.from_arrow(tbl).repartition(1))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got1["logprob"] == got["logprob"]).all()

    # the defining KN invariant: p_kn(.|w0) is a proper distribution —
    # summing the seen-type terms plus the backed-off mass over ALL
    # continuation types gives exactly 1 for every context
    from collections import Counter, defaultdict

    bgc = Counter()
    for r in rows:
        ws = r["text"].split(" ")
        bgc.update(zip(ws, ws[1:]))
    ctx = defaultdict(int)
    n1f = defaultdict(int)
    n1b = defaultdict(int)
    for (a, b), c in bgc.items():
        ctx[a] += c
        n1f[a] += 1
        n1b[b] += 1
    T = len(bgc)
    for w0 in list(ctx)[:10]:
        seen_mass = sum(max(c - 0.75, 0.0) for (a, _), c in bgc.items()
                        if a == w0) / ctx[w0]
        backoff = 0.75 * n1f[w0] / ctx[w0] * \
            sum(n1b[b] for b in n1b) / T
        assert abs(seen_mass + backoff - 1.0) < 1e-9


def test_kn_bigram_logprob_held_out(ray_session):
    """score_ds with bigrams/words the training corpus never saw: the
    backoff lambda(w0)*p_cont(w1) scores them exactly (Python
    recompute), unseen words hit the documented D/T floor, and no
    lookup ever indexes past the broadcast tables."""
    import pyarrow as pa
    import ray

    from ocm_ray.ops.text import kn_bigram_logprob

    train = pa.Table.from_pylist([
        {"doc_id": 0, "text": "a b a c a b"},
        {"doc_id": 1, "text": "b c b a c c"},
    ])
    # "a z": seen context, UNSEEN word z; "c a": seen bigram;
    # "z q": unseen context AND unseen word
    held = pa.Table.from_pylist([
        {"doc_id": 10, "text": "c a"},
        {"doc_id": 11, "text": "a z"},
        {"doc_id": 12, "text": "z q"},
    ])
    got = (kn_bigram_logprob(ray.data.from_arrow(train).repartition(2),
                             score_ds=ray.data.from_arrow(held),
                             ndigits=9)
           .to_pandas().set_index("doc_id")["logprob"])

    from collections import Counter, defaultdict

    D = 0.75
    bgc = Counter()
    for t in ["a b a c a b", "b c b a c c"]:
        ws = t.split()
        bgc.update(zip(ws, ws[1:]))
    ctx, n1f, n1b = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b), c in bgc.items():
        ctx[a] += c
        n1f[a] += 1
        n1b[b] += 1
    T = float(len(bgc))

    def p_kn(w0, w1):
        if (w0, w1) in bgc:
            return (max(bgc[(w0, w1)] - D, 0)
                    + D * n1f[w0] * (n1b[w1] / T)) / ctx[w0]
        lam = D * n1f[w0] / ctx[w0] if w0 in ctx else 1.0
        cont = n1b[w1] / T if w1 in n1b else D / T
        return lam * cont

    assert abs(got[10] - np.log2(p_kn("c", "a"))) < 1e-6
    assert abs(got[11] - np.log2(p_kn("a", "z"))) < 1e-6
    assert abs(got[12] - np.log2(p_kn("z", "q"))) < 1e-6
    # held-out scores are finite — the IndexError/neighbor-logprob
    # latent bug this path guards against would break one of the above


def test_weighted_sample_n_per_key(ray_session):
    """A-ES weighted per-key sampling: DuckDB recompute parity (exact
    same hash -> u -> ln(u)/w chain), partition invariance, and
    selection frequency proportional to weight over many seeds."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocm_ray.ops.sampling import sample_n_per_key

    n_rows = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "grp": pa.array((np.arange(n_rows) % 4).astype(np.int64)),
        "w": pa.array(np.where(np.arange(n_rows) % 10 == 0, 9.0, 1.0)),
    })

    got = (sample_n_per_key(ray.data.from_arrow(tbl).repartition(6),
                            "grp", id_col="doc_id", n=12, weight_col="w")
           .to_pandas().sort_values(["grp", "doc_id"])
           .reset_index(drop=True))
    got1 = (sample_n_per_key(ray.data.from_arrow(tbl).repartition(1),
                             "grp", id_col="doc_id", n=12, weight_col="w")
            .to_pandas().sort_values(["grp", "doc_id"])
            .reset_index(drop=True))
    assert got[["grp", "doc_id"]].equals(got1[["grp", "doc_id"]])

    # brute-force recompute of the exact key chain
    from ocm_ray.core.hashing import wanghash
    from ocm_ray.ops.sampling import _SPLIT_SALT

    h = wanghash(np.arange(n_rows, dtype=np.uint64)
                 ^ np.uint64(_SPLIT_SALT) ^ np.uint64(137))
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    key = np.log(u) / tbl.column("w").to_numpy()
    import pandas as pd

    ref = (pd.DataFrame({"doc_id": np.arange(n_rows),
                         "grp": np.arange(n_rows) % 4, "k": key})
           .sort_values(["grp", "k", "doc_id"],
                        ascending=[True, False, True])
           .groupby("grp").head(12)
           .sort_values(["grp", "doc_id"]).reset_index(drop=True))
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()

    # inclusion frequency tracks weight: heavy rows (w=9) should be
    # picked far more often across seeds than light rows
    heavy_hits = light_hits = 0
    for seed in range(40):
        s = (sample_n_per_key(ray.data.from_arrow(tbl), "grp",
                              id_col="doc_id", n=12, seed=seed,
                              weight_col="w").to_pandas())
        ids = s["doc_id"].to_numpy()
        heavy_hits += int((ids % 10 == 0).sum())
        light_hits += int((ids % 10 != 0).sum())
    # 10 heavy rows (w=9) + 90 light (w=1) per group, 12 picks without
    # replacement: heavies deplete so the share renormalizes below the
    # first-draw 50% (simulated ~0.31); uniform sampling would give 0.10
    share = heavy_hits / (heavy_hits + light_hits)
    assert 0.22 <= share <= 0.45


def test_perplexity_tier_filter_and_curate(ray_session, tmp_path):
    """The CCNet selection policy applied: perplexity_tier_filter keeps
    exactly the rows perplexity_buckets labels with the kept tiers (the
    re-scoring filter pass reproduces the bucketing bit-for-bit), and
    curate(ppl_tiers=) composes it into the flagship pipeline."""
    import pyarrow.parquet as pq
    import ray

    from ocm_ray.ops.sampling import perplexity_buckets, perplexity_tier_filter
    from ocm_ray.pipelines.pretraining import curate

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(60)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, rng.integers(5, 40))),
             "source": f"s{i % 2}"} for i in range(200)]
    tbl = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(tbl).repartition(5)

    buckets = perplexity_buckets(ds).to_pandas()
    expect = set(buckets.loc[buckets["ppl_bucket"] != "tail", "doc_id"])
    kept = perplexity_tier_filter(ds, tiers=("head", "middle")).to_pandas()
    assert set(kept["doc_id"]) == expect
    assert list(kept.columns) == ["doc_id", "text", "source"]  # passthrough

    with pytest.raises(ValueError, match="unknown tiers"):
        perplexity_tier_filter(ds, tiers=("best",))

    src = str(tmp_path / "docs.parquet")
    pa.parquet.write_table(tbl, src)
    out_dir = str(tmp_path / "curated")
    summary = curate(src, out_dir, quality_min=0.0,
                     near_dup_threshold=1.01, ppl_tiers=("head", "middle"))
    got = pq.read_table(out_dir).to_pandas()
    # curate's own tier thresholds are computed AFTER the heuristic
    # quality stage; with quality_min=0 that's the same corpus
    assert set(got["doc_id"]) == expect
    assert summary["n_after_quality"] == len(expect)


def test_funnel_matches_duckdb(ray_session):
    """Ordered funnel progression per user vs a DuckDB recompute of the
    same strict-(ts, event_id)-order semantics; partition-invariant;
    integers only, so equality is exact."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocm_ray.ops.relational import funnel

    rng = np.random.default_rng(17)
    n = 4000
    types = ["view", "click", "signup", "purchase", "error"]
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 150, n),
        # coarse time grid -> ties exercise the (ts, event_id) order
        "ts": pd.to_datetime(rng.integers(0, 300, n) * 1_000_000, unit="us"),
        "event_type": rng.choice(types, n, p=[.4, .25, .15, .1, .1]),
    })
    stages = ("view", "click", "signup", "purchase")
    got = (funnel(ray.data.from_pandas(df, override_num_blocks=5), stages,
                  n_shards=8)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    got1 = (funnel(ray.data.from_pandas(df), stages, n_shards=1)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got1)

    # brute force: per user, walk the sorted stream
    want = []
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        reach, prev_seen = [], False
        ts_list, reached = [], 0
        idx = -1
        rows = list(g.itertuples())
        dead = False
        for s in stages:
            hit = None if dead else next(
                (j for j in range(idx + 1, len(rows))
                 if rows[j].event_type == s), None)
            if hit is None:
                dead = True  # a funnel stops at the first missed stage
                ts_list.append(-1)
            else:
                idx = hit
                reached += 1
                ts_list.append(int(rows[hit].ts.value // 1000))
        want.append({"user_id": uid, "n_reached": reached,
                     **{f"ts_{s}": t for s, t in zip(stages, ts_list)}})
    want = pd.DataFrame(want).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns].astype({c: np.int64 for c in want.columns
                                  if c != "user_id"}), want)

    # only users with at least one stage event appear
    active = set(df.loc[df.event_type.isin(stages), "user_id"])
    assert set(got["user_id"]) == active

    # and DuckDB agrees on the reach counts (chained strict-after mins)
    con = duckdb.connect()
    con.register("events", df)
    dd = con.execute("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS i,
                          event_type FROM events),
        s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
               WHERE event_type='view' GROUP BY user_id),
        s1x AS (SELECT e.user_id, t1, MIN(i) AS i1 FROM e JOIN s1 USING (user_id)
                WHERE event_type='view' AND t = t1 GROUP BY e.user_id, t1),
        s2 AS (SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1x USING (user_id)
               WHERE event_type='click' AND (t > t1 OR (t = t1 AND i > i1))
               GROUP BY e.user_id),
        s2x AS (SELECT e.user_id, t2, MIN(i) AS i2
                FROM e JOIN s2 USING (user_id) JOIN s1x USING (user_id)
                WHERE event_type='click' AND t = t2
                  AND (t2 > t1 OR (t2 = t1 AND i > i1))
                GROUP BY e.user_id, t2),
        s3 AS (SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2x USING (user_id)
               WHERE event_type='signup' AND (t > t2 OR (t = t2 AND i > i2))
               GROUP BY e.user_id)
        SELECT s1.user_id, t1, t2, t3
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        ORDER BY user_id
    """).df()
    m = got.set_index("user_id")
    for _, r in dd.iterrows():
        u = r["user_id"]
        assert m.loc[u, "ts_view"] == r["t1"]
        for col, v in (("ts_click", r["t2"]), ("ts_signup", r["t3"])):
            assert (m.loc[u, col] == -1) == pd.isna(v)
            if not pd.isna(v):
                assert m.loc[u, col] == v


def test_retention_cohorts_matches_duckdb(ray_session):
    """Cohort retention triangle vs a DuckDB recompute — integers only,
    exact equality; partition-invariant."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocm_ray.ops.relational import retention_cohorts

    rng = np.random.default_rng(29)
    n = 6000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 200, n),
        "ts": pd.to_datetime(
            rng.integers(0, 30 * 86_400, n) * 1_000_000, unit="us"),
    })
    got = (retention_cohorts(ray.data.from_pandas(df,
                                                  override_num_blocks=6))
           .to_pandas().sort_values(["cohort", "period_offset"])
           .reset_index(drop=True))
    got1 = (retention_cohorts(ray.data.from_pandas(df))
            .to_pandas().sort_values(["cohort", "period_offset"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got1)

    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS period
                     FROM events),
        first AS (SELECT user_id, MIN(period) AS cohort
                  FROM act GROUP BY user_id)
        SELECT cohort, period - cohort AS period_offset,
               COUNT(*) AS n_active
        FROM act JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got["cohort"].tolist() == want["cohort"].tolist()
    assert got["period_offset"].tolist() == want["period_offset"].tolist()
    assert got["n_active"].tolist() == want["n_active"].tolist()
    # offset-0 row of each cohort counts the whole cohort
    z = got[got.period_offset == 0].set_index("cohort")["n_active"]
    sizes = (con.execute("""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS period
                     FROM events)
        SELECT MIN(period) AS cohort, COUNT(*) AS n
        FROM act GROUP BY user_id
    """).df().groupby("cohort").size())
    assert (z.loc[sizes.index] == sizes).all()

    # forced-distributed path (shard_scan2 co-shard) is count-identical
    # to the broadcast path — the rule-10c auto-dispatch parity
    got_d = (retention_cohorts(ray.data.from_pandas(df,
                                                    override_num_blocks=6),
                               distributed=True, n_shards=8)
             .to_pandas().sort_values(["cohort", "period_offset"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_d, got)


def test_retention_cohorts_distributed_string_keys(ray_session):
    """The exchange path shards string keys through the stable string
    hash; parity with the broadcast path on a string-keyed corpus."""
    import ray

    from ocm_ray.ops.relational import retention_cohorts

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame({
        "user_id": np.array([f"u{int(x):03d}" for x in
                             rng.integers(0, 150, n)]),
        "ts": pd.to_datetime(
            rng.integers(0, 20 * 86_400, n) * 1_000_000, unit="us"),
    })
    ds = ray.data.from_pandas(df, override_num_blocks=5)
    a = (retention_cohorts(ds, distributed=False)
         .to_pandas().sort_values(["cohort", "period_offset"])
         .reset_index(drop=True))
    b = (retention_cohorts(ds, distributed=True, n_shards=8)
         .to_pandas().sort_values(["cohort", "period_offset"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_perplexity_buckets_null_source(ray_session):
    """A null source must take the unmatched -> "head" path (the old
    dict-map semantics), not crash the vectorized searchsorted lookup
    on a mixed str/None object array."""
    import pyarrow as pa
    import ray

    from ocm_ray.ops.sampling import perplexity_buckets

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(30)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, 12)),
             "source": None if i % 10 == 0 else f"s{i % 2}"}
            for i in range(100)]
    tbl = pa.Table.from_pylist(rows)

    got = (perplexity_buckets(ray.data.from_arrow(tbl).repartition(5))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 100
    nulls = got[got["source"].isna()]
    assert len(nulls) == 10
    assert (nulls["ppl_bucket"] == "head").all()
    # non-null rows still get real terciles
    per = got[got["source"].notna()].groupby("source")["ppl_bucket"] \
        .nunique()
    assert (per == 3).all()


def test_shards_for_and_shard_count_invariance(ray_session):
    """shards_for sizes the exchange to the corpus (power of two,
    clamped), and exchange RESULTS are shard-count-invariant."""
    import ray.data as rd

    from ocm_ray.ops.dedup import exact_dedup_groups
    from ocm_ray.ops.pairs import shards_for

    assert shards_for(0) == 8
    assert shards_for(5_000) == 8
    assert shards_for(2_048 * 16) == 16
    assert shards_for(10 ** 9) == 64
    assert shards_for(10 ** 9, hi=256) == 256
    for n in (1, 999, 123_456, 10 ** 7):
        s = shards_for(n)
        assert s & (s - 1) == 0  # power of two (shard_scan contract)

    docs = _mixed_corpus()
    ds = rd.from_pandas(docs).repartition(6)
    a = (exact_dedup_groups(ds, n_shards=8).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (exact_dedup_groups(ds, n_shards=64).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
