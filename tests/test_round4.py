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
