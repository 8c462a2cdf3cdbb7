"""Retrieval / decontamination operators over a documents table.

Two pipelines a training-data engine needs beyond dedup:

- **decontamination** (GPT-3 App. C / Brown et al. 2020 style): flag
  training documents sharing any word k-gram with a held-out eval set,
  so benchmark text can be dropped before training;
- **BM25 scoring** (Robertson-Walker, the Lucene ``k1/b`` variant):
  score every document against a small bag-of-words query, fully
  distributed — corpus statistics (N, avgdl, per-term df) from one
  vectorized pass, scoring from a second.

Both follow the engine's scale rules: the eval-gram set and the query
term table are the SMALL side and travel once via ``ray.put``; the
corpus side is only ever touched by stateless vectorized
``map_batches`` passes (no shuffle at all — the only exchanges are
output-bounded: the distinct eval grams and the per-batch top-k rows).
Grouping/matching is on the engine's stable word-hash domain
(``engine.tokens.word_kgram_hashes``) — equal to string matching
absent in-corpus 64-bit collisions, the same documented contract as
``ops.text.gopher_repetition_flags``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64


def _sorted_member(haystack_sorted: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``needles`` in a SORTED uint64 array."""
    if not len(haystack_sorted) or not len(needles):
        return np.zeros(len(needles), dtype=bool)
    idx = np.searchsorted(haystack_sorted, needles)
    idx_c = np.minimum(idx, len(haystack_sorted) - 1)
    return haystack_sorted[idx_c] == needles


def eval_gram_set(eval_ds, k: int = 3, text_col: str = "text",
                  lowercase: bool = True, seed: int = 137) -> np.ndarray:
    """Sorted distinct word k-gram hashes of an eval corpus.

    Per-batch ``np.unique`` inside ``map_batches`` keeps the exchange
    output-bounded (one distinct-gram row per batch-local distinct);
    the final union happens driver-side and is bounded by the eval
    set's distinct-gram count — the small side by definition of
    decontamination (eval benchmarks are MBs, training corpora TBs)."""
    from ocm_ray.engine.tokens import word_kgram_hashes

    def uniq(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:     # may arrive schema-less (rule 8b)
            return pa.table({"g": pa.array([], pa.uint64())})
        g, _, _ = word_kgram_hashes(batch.column(text_col), k,
                                    lowercase, seed)
        return pa.table({"g": pa.array(np.unique(g))})

    parts = [b.column("g").to_numpy(zero_copy_only=False)
             for b in eval_ds.map_batches(uniq, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return np.empty(0, dtype=U64)
    return np.unique(np.concatenate(parts).astype(U64))


def decontaminate(train_ds, eval_ds, k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", lowercase: bool = True,
                  seed: int = 137):
    """Per training doc: total word k-grams, how many occurrences hit
    the eval gram set, and a ``contaminated`` flag (any hit). The eval
    side is reduced to a sorted distinct-gram array, shipped once via
    ``ray.put``, and probed per batch with one ``searchsorted`` — no
    corpus-side shuffle."""
    import ray

    ev_ref = ray.put(eval_gram_set(eval_ds, k, text_col, lowercase, seed))

    from ocm_ray.engine.tokens import word_kgram_hashes

    def flag(batch: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        g, rowid, nrows = word_kgram_hashes(batch.column(text_col), k,
                                            lowercase, seed)
        hit = _sorted_member(ev, g)
        n_grams = np.bincount(rowid, minlength=nrows).astype(np.int64)
        n_cont = np.bincount(rowid, weights=hit,
                             minlength=nrows).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(n_grams),
            "n_contaminated": pa.array(n_cont),
            "contaminated": pa.array(n_cont > 0),
        })

    return train_ds.map_batches(flag, batch_format="pyarrow")


def bm25_scores(docs_ds, query_terms: list[str], k1: float = 1.2,
                b: float = 0.75, id_col: str = "doc_id",
                text_col: str = "text", seed: int = 137):
    """BM25 score of every matching document against a bag-of-words
    query: ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with the Lucene idf ``ln((N-df+0.5)/(df+0.5)+1)``.

    Two corpus passes: (1) a stats pass emitting per-batch partials
    (doc count, length sum, per-term document frequency — a handful of
    rows per batch, summed driver-side), (2) a scoring pass against the
    broadcast ``(term, idf)`` table. Term tf's are one vectorized
    ``bincount`` per term over the flat word-hash stream — the loop is
    over QUERY TERMS (a handful), never rows. Returns a Dataset of
    ``(id_col, score float64)`` for docs with score > 0."""
    import ray

    from ocm_ray.engine.tokens import hash_string_array, split_words_hashed

    terms = sorted(set(t.lower() for t in query_terms))
    th = hash_string_array(pa.array(terms, pa.string()), seed).astype(U64)

    def stats(batch: pa.Table) -> pa.Table:
        flat, lens = split_words_hashed(batch.column(text_col), True, seed)
        rowid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        df = np.empty(len(th), dtype=np.int64)
        for i, t in enumerate(th):           # loop over query terms only
            tf = np.bincount(rowid[flat == t], minlength=len(lens))
            df[i] = int((tf > 0).sum())
        meta = np.zeros(len(th), dtype=np.int64)
        meta2 = np.zeros(len(th), dtype=np.int64)
        if len(th):
            meta[0], meta2[0] = len(lens), int(lens.sum())
        return pa.table({"ti": pa.array(np.arange(len(th), dtype=np.int64)),
                         "df": pa.array(df),
                         "n_docs": pa.array(meta),
                         "len_sum": pa.array(meta2)})

    agg = (docs_ds.map_batches(stats, batch_format="pyarrow")
           .to_pandas().groupby("ti", as_index=False).sum())
    n_docs = int(agg["n_docs"].sum())
    avgdl = float(agg["len_sum"].sum()) / max(n_docs, 1)
    df = agg.sort_values("ti")["df"].to_numpy().astype(np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    bc = ray.put((th, idf, np.float64(avgdl)))

    def score(batch: pa.Table) -> pa.Table:
        th_, idf_, avgdl_ = ray.get(bc)
        flat, lens = split_words_hashed(batch.column(text_col), True, seed)
        nrows = len(lens)
        rowid = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        dl = lens.astype(np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl_)
        sc = np.zeros(nrows, dtype=np.float64)
        for i, t in enumerate(th_):
            tf = np.bincount(rowid[flat == t],
                             minlength=nrows).astype(np.float64)
            sc += idf_[i] * tf * (k1 + 1.0) / (tf + denom_dl)
        keep = sc > 0
        return pa.table({id_col: batch.column(id_col).filter(pa.array(keep)),
                         "score": pa.array(sc[keep])})

    return docs_ds.map_batches(score, batch_format="pyarrow")


def bm25_topk(docs_ds, query_terms: list[str], topk: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", seed: int = 137,
              round_to: int = 4) -> "pa.Table":
    """Top-k BM25 hits with a fully deterministic order: sort on the
    ROUNDED score (desc) then ``id_col`` (asc) — the same collation an
    oracle can express, so ties at the cutoff cannot flip the set.
    Per-batch top-k inside ``map_batches`` bounds the driver collect at
    ``topk × n_blocks`` rows regardless of corpus size."""
    scored = bm25_scores(docs_ds, query_terms, k1, b, id_col,
                         text_col, seed)

    def batch_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:     # may arrive schema-less (rule 8b)
            return pa.table({})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sc = np.round(batch.column("score").to_numpy(zero_copy_only=False),
                      round_to)
        order = np.lexsort((ids, -sc))[:topk]
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(sc[order])})

    small = scored.map_batches(batch_topk,
                               batch_format="pyarrow").to_pandas()
    if small.empty or "score" not in small.columns:
        # no document matched any query term: every block was empty
        # (schema-less union -> column-less frame)
        import pandas as pd

        small = pd.DataFrame({id_col: [], "score": []})
    small = small.sort_values(["score", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(topk)
    return pa.Table.from_pandas(small.reset_index(drop=True))


def hybrid_search(docs_ds, query_text: str, topk: int = 10,
                  recall_k: int = 50, alpha: float = 0.5,
                  id_col: str = "doc_id", text_col: str = "text",
                  dim: int = 64, seed: int = 137,
                  encode_fn=None) -> "pd.DataFrame":
    """Two-stage retrieval: distributed BM25 RECALL over the corpus
    (``recall_k`` candidates — the only stage that touches every doc),
    then a dense RERANK on the candidate set only. Final score =
    ``alpha * cosine + (1 - alpha) * bm25_minmax`` with min-max
    normalization inside the candidate pool (the standard hybrid
    convex combination); ties break on id for a deterministic order.

    Scale shape: stage 1 is :func:`bm25_topk` (two stateless passes,
    driver collect bounded at recall_k x n_blocks); stage 2 embeds ONLY
    the candidates — their texts come back via a broadcast-id semi-join
    filter (output-sized) and both candidates and query run through the
    same :class:`ocm_ray.ops.text.TextEmbedder` kernel driver-side
    (recall_k rows; a real encoder plugs in via ``encode_fn``)."""
    import pandas as pd
    import pyarrow as pa

    from ocm_ray.ops.relational import semi_join_filter
    from ocm_ray.ops.text import TextEmbedder

    query_terms = [w for w in query_text.split(" ") if w]
    cand = bm25_topk(docs_ds, query_terms, topk=recall_k, id_col=id_col,
                     text_col=text_col, seed=seed)
    cand = cand if isinstance(cand, pd.DataFrame) else cand.to_pandas()
    if not len(cand):
        return pd.DataFrame({id_col: [], "bm25": [], "cosine": [],
                             "score": [], "rank": []})
    texts = semi_join_filter(docs_ds, np.asarray(cand[id_col]), id_col) \
        .to_pandas()[[id_col, text_col]]
    merged = cand.merge(texts, on=id_col)

    emb = TextEmbedder(dim=dim, seedseed=seed, text_col=text_col,
                       encode_fn=encode_fn)
    both = pa.table({id_col: pa.array(
        ["__query__"] + merged[id_col].astype(str).tolist()),
        text_col: pa.array([query_text] + merged[text_col].tolist())})
    vecs = np.stack(emb(both).column("embedding").to_pylist())
    qv, dv = vecs[0], vecs[1:]
    cos = dv @ qv  # TextEmbedder L2-normalizes -> dot == cosine
    bm = merged["score"].to_numpy(dtype=np.float64)
    lo, hi = bm.min(), bm.max()
    bm_norm = (bm - lo) / (hi - lo) if hi > lo else np.ones_like(bm)
    merged["bm25"] = bm
    merged["cosine"] = cos
    merged["score"] = alpha * cos + (1.0 - alpha) * bm_norm
    out = merged.sort_values(["score", id_col],
                             ascending=[False, True]).head(topk) \
        .reset_index(drop=True)[[id_col, "bm25", "cosine", "score"]]
    out["rank"] = np.arange(len(out))
    return out
