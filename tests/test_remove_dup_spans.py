"""remove_dup_spans — the ExactSubstr REWRITE step (Lee et al. 2021):
brute-force parity, broadcast==exchange parity, tokens domain, the
min_span knob, and no-dup identity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

K = 4


def _brute_remove(docs, k, min_docs, min_span, lowercase=True):
    """Per-doc python reference: dup k-grams over >= min_docs distinct
    docs; maximal consecutive-hit runs; remove runs spanning >= min_span
    words; rebuild from ORIGINAL-case words."""
    from collections import defaultdict

    grams = {}
    where = defaultdict(set)
    for did, text in docs.items():
        w = (text or "").lower().split(" ") if lowercase \
            else (text or "").split(" ")
        gs = [tuple(w[i:i + k]) for i in range(len(w) - k + 1)]
        grams[did] = gs
        for g in gs:
            where[g].add(did)
    dup = {g for g, ids in where.items() if len(ids) >= min_docs}
    out = {}
    for did, text in docs.items():
        words = (text or "").split(" ")
        hit = [g in dup for g in grams[did]]
        covered = set()
        n_spans = 0
        i = 0
        while i < len(hit):
            if hit[i]:
                j = i
                while j + 1 < len(hit) and hit[j + 1]:
                    j += 1
                span = (j - i) + k
                if span >= min_span:
                    n_spans += 1
                    covered.update(range(i, i + span))
                i = j + 1
            else:
                i += 1
        kept = [w for p, w in enumerate(words) if p not in covered]
        out[did] = (" ".join(kept), len(words), len(covered), n_spans)
    return out


def _twin_corpus(n=120, seed=3):
    """Docs where every 6th/7th pair shares a long span and every 11th a
    short (sub-min_span) one."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(500)]
    long_shared = " ".join(rng.choice(vocab, 14))
    short_shared = " ".join(rng.choice(vocab, K))   # exactly one gram
    rows = []
    for i in range(n):
        body = " ".join(rng.choice(vocab, int(rng.integers(6, 40))))
        if i % 6 == 0:
            body = body + " " + long_shared
        if i % 7 == 0:
            body = long_shared + " " + body
        if i % 11 == 0:
            body = body + " " + short_shared
        rows.append({"doc_id": f"d{i:04d}", "text": body})
    return pd.DataFrame(rows)


def _run(df, **kw):
    import ray.data

    from ocm_ray.ops.dedup import remove_dup_spans

    ds = ray.data.from_pandas(df).repartition(5)
    out = remove_dup_spans(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_remove_dup_spans_matches_bruteforce():
    df = _twin_corpus()
    got = _run(df, k=K, min_docs=2, min_span=K + 2)
    want = _brute_remove(dict(zip(df.doc_id, df.text)), K, 2, K + 2)
    assert len(got) == len(df)
    for _, r in got.iterrows():
        text, n_words, n_removed, n_spans = want[r.doc_id]
        assert r.text == text, r.doc_id
        assert (r.n_words, r.n_removed_words, r.n_spans_removed) == \
               (n_words, n_removed, n_spans), r.doc_id
    # the corpus must actually exercise removal AND the min_span filter
    assert got.n_spans_removed.sum() > 0
    assert (got.n_removed_words == 0).any()


def test_remove_dup_spans_exchange_parity():
    """Forced positional-exchange plan == broadcast plan, byte-identical
    rows (the 100 TB path produces the same corpus)."""
    df = _twin_corpus(80, seed=9)
    a = _run(df, k=K, min_docs=2, min_span=K, distributed=False)
    b = _run(df, k=K, min_docs=2, min_span=K, distributed=True,
             n_shards=8)
    pd.testing.assert_frame_equal(a, b)


def test_remove_dup_spans_tokens_domain():
    """Axis B: rewrite list<int32> token sequences, no text anywhere."""
    import ray.data

    from ocm_ray.ops.dedup import remove_dup_spans

    rng = np.random.default_rng(5)
    shared = rng.integers(0, 1000, 9, dtype=np.int32)
    rows = []
    for i in range(60):
        toks = rng.integers(0, 1000, int(rng.integers(5, 30)),
                            dtype=np.int32)
        if i % 4 == 0:
            toks = np.concatenate([toks, shared])
        rows.append({"doc_id": f"t{i:03d}",
                     "tokens": toks.astype(np.int32)})
    tbl = pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "tokens": pa.array([r["tokens"].tolist() for r in rows],
                           pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    for dist in (False, True):
        out = remove_dup_spans(ds, k=K, min_docs=2, min_span=K + 1,
                               tokens_col="tokens", distributed=dist,
                               n_shards=8).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        by_id = dict(zip(out.doc_id, zip(out.tokens, out.n_tokens,
                                         out.n_removed_tokens,
                                         out.n_spans_removed)))
        for r in rows:
            toks, n, n_rm, n_sp = by_id[r["doc_id"]]
            orig = r["tokens"]
            assert n == len(orig)
            if r["doc_id"][1:] != "" and int(r["doc_id"][1:]) % 4 == 0:
                # the 9-token shared tail (6 grams, span 9 >= K+1) is cut
                assert n_sp >= 1 and n_rm >= 9
                assert not np.array_equal(np.asarray(toks), orig)
                # the removed region is exactly the shared suffix here
                # unless body grams also collided (rare w/ 1000-vocab):
                if n_rm == 9:
                    np.testing.assert_array_equal(np.asarray(toks),
                                                  orig[:-9])
            else:
                if n_rm == 0:
                    np.testing.assert_array_equal(np.asarray(toks), orig)


def test_remove_dup_spans_identity_without_dups():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "doc_id": [f"u{i}" for i in range(40)],
        "text": [" ".join(rng.choice([f"v{j}" for j in range(2000)], 15))
                 for _ in range(40)],
    })
    got = _run(df, k=K, min_docs=2)
    assert (got.n_removed_words == 0).all()
    assert (got.n_spans_removed == 0).all()
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert (got.text == want.text).all()


def test_remove_dup_spans_min_span_guard():
    import ray.data

    from ocm_ray.ops.dedup import remove_dup_spans

    ds = ray.data.from_pandas(_twin_corpus(10))
    with pytest.raises(ValueError, match="min_span"):
        remove_dup_spans(ds, k=5, min_span=3)


# --------------------------------------------------------- cross-corpus dedup

def test_dedup_against_text_and_tokens():
    """dedup_against drops exactly the ds rows whose content also
    appears in the reference corpus — exact (no Bloom FP loss), both
    domains, any partitioning."""
    import ray.data

    from ocm_ray.ops.dedup import dedup_against

    rng = np.random.default_rng(13)
    vocab = [f"v{i}" for i in range(400)]
    mk = lambda: " ".join(rng.choice(vocab, int(rng.integers(5, 25))))
    ref_texts = [mk() for _ in range(50)]
    new_texts = [mk() for _ in range(80)]
    # plant 17 reference texts into the new corpus (some twice)
    planted = ref_texts[:17] + ref_texts[:5]
    all_new = new_texts + planted
    ref = pd.DataFrame({"doc_id": [f"r{i}" for i in range(len(ref_texts))],
                        "text": ref_texts})
    new = pd.DataFrame({"doc_id": [f"n{i}" for i in range(len(all_new))],
                        "text": all_new})
    out = dedup_against(ray.data.from_pandas(new).repartition(5),
                        ray.data.from_pandas(ref).repartition(3),
                        n_shards=8).to_pandas()
    ref_set = set(ref_texts)
    want = new[~new.text.isin(ref_set)]
    assert sorted(out.doc_id) == sorted(want.doc_id)
    assert set(out.columns) == {"doc_id", "text"}

    # tokens domain: identity is the raw int32 buffer
    seqs = [rng.integers(0, 500, int(rng.integers(3, 12)),
                         dtype=np.int32) for _ in range(40)]
    ref_t = pa.table({"doc_id": [f"r{i}" for i in range(20)],
                      "tokens": pa.array([s.tolist() for s in seqs[:20]],
                                         pa.list_(pa.int32()))})
    new_t = pa.table({"doc_id": [f"n{i}" for i in range(30)],
                      "tokens": pa.array(
                          [s.tolist() for s in seqs[10:40]],
                          pa.list_(pa.int32()))})
    out_t = dedup_against(ray.data.from_arrow(new_t).repartition(4),
                          ray.data.from_arrow(ref_t).repartition(2),
                          tokens_col="tokens", n_shards=8).to_pandas()
    # seqs[10:20] overlap the reference; seqs[20:40] survive
    assert sorted(out_t.doc_id) == sorted(f"n{i}" for i in range(10, 30))


def test_dedup_against_empty_reference_keeps_all():
    """Anti-join semantics: an empty reference corpus must keep every
    row (shard_scan2's zero-block early return encodes inner-join
    semantics — dedup_against guards it)."""
    import ray.data

    from ocm_ray.ops.dedup import dedup_against

    new = pd.DataFrame({"doc_id": [f"n{i}" for i in range(20)],
                        "text": [f"doc body {i}" for i in range(20)]})
    empty_ref = pd.DataFrame({"doc_id": pd.Series([], dtype=str),
                              "text": pd.Series([], dtype=str)})
    out = dedup_against(ray.data.from_pandas(new),
                        ray.data.from_pandas(empty_ref),
                        n_shards=4).to_pandas()
    assert sorted(out.doc_id) == sorted(new.doc_id)


def test_remove_dup_spans_keep_cols_both_paths():
    """Non-payload columns ride both plans unchanged (curate uses this
    instead of a second corpus shuffle)."""
    import ray.data

    from ocm_ray.ops.dedup import remove_dup_spans

    df = _twin_corpus(60, seed=4)
    df["source"] = ["web" if i % 2 else "code" for i in range(len(df))]
    df["n_orig"] = df.text.str.count(" ") + 1
    ds = ray.data.from_pandas(df).repartition(4)
    outs = {}
    for dist in (False, True):
        out = remove_dup_spans(ds, k=K, min_docs=2, min_span=K,
                               keep_cols=("source", "n_orig"),
                               distributed=dist, n_shards=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out.columns) == ["doc_id", "text", "n_words",
                                     "n_removed_words", "n_spans_removed",
                                     "source", "n_orig"]
        merged = out.merge(df[["doc_id", "source", "n_orig"]],
                           on="doc_id", suffixes=("", "_want"))
        assert (merged.source == merged.source_want).all()
        assert (merged.n_orig == merged.n_orig_want).all()
        assert (out.n_words == out.n_orig).all()
        outs[dist] = out
    pd.testing.assert_frame_equal(outs[False], outs[True])
