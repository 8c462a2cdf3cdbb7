"""redact_pii (DuckDB regexp parity as the oracle) + WebDataset tar
round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_redact_pii_matches_duckdb_regexp():
    """The scrub is Arrow RE2; DuckDB's regexp_replace is also RE2 —
    applying the same patterns in the same order must agree exactly
    (an oracle-grade check without burning a driver query slot)."""
    import duckdb
    import ray.data

    from ocm_ray.ops.text import _PII_PATTERNS, redact_pii

    rng = np.random.default_rng(4)
    texts = []
    for i in range(200):
        t = " ".join(f"w{j}" for j in rng.integers(0, 50, 8))
        if i % 3 == 0:
            t += f" contact bob{i}@example.com or alice.smith@mail.co.uk"
        if i % 4 == 0:
            t += f" see https://example.com/x?id={i} and http://a.b/c#frag"
        if i % 5 == 0:
            t += f" from 10.0.{i % 256}.7 port"
        if i % 7 == 0:
            t += f" acct 12345678{i:04d} ok"
        texts.append(t)
    df = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(200)],
                       "text": texts})
    out = redact_pii(ray.data.from_pandas(df).repartition(3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", df)
    expr = "text"
    for kind, pat, repl in _PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    # counts must mirror the engine's SEQUENTIAL application order:
    # recompute each count on the text as-already-scrubbed by the
    # preceding patterns
    running = "text"
    count_exprs = []
    for kind, pat, repl in _PII_PATTERNS:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({running}, '{pat}')) AS BIGINT)"
            f" AS n_{kind}")
        running = f"regexp_replace({running}, '{pat}', '{repl}', 'g')"
    want = con.sql(
        f"SELECT doc_id, {expr} AS text, {', '.join(count_exprs)} "
        "FROM docs ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(
        out[want.columns.tolist()], want, check_dtype=False)
    assert out.n_email.sum() > 0 and out.n_url.sum() > 0
    assert out.n_ip.sum() > 0 and out.n_longnum.sum() > 0


def test_webdataset_round_trip(tmp_path):
    import ray.data

    from ocm_ray.ops.multimodal import read_webdataset, write_webdataset

    rng = np.random.default_rng(9)
    n = 120
    tbl = pa.table({
        "sample_id": [f"s{i:05d}" for i in range(n)],
        "payload": pa.array([rng.bytes(rng.integers(10, 200))
                             for _ in range(n)], pa.binary()),
        "meta": pa.array(['{"i": %d}' % i for i in range(n)], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(6)
    manifest = write_webdataset(ds, str(tmp_path / "wds"),
                                cols={"payload": "bin", "meta": "json"})
    assert sum(m[1] for m in manifest) == n
    assert len(manifest) >= 2   # multiple shards (one per block)

    back = read_webdataset(str(tmp_path / "wds"),
                           exts=("bin", "json")).to_pandas() \
        .sort_values("sample_id").reset_index(drop=True)
    assert len(back) == n
    orig = tbl.to_pandas()
    for _, r in back.iterrows():
        i = int(r.sample_id[1:])
        assert bytes(r.bin) == orig.payload[i]
        assert bytes(r.json).decode() == orig.meta[i]

    # missing-member column -> null, extra exts ignored
    back2 = read_webdataset(str(tmp_path / "wds"),
                            exts=("bin", "txt")).to_pandas()
    assert back2.txt.isna().all()
    assert len(back2) == n


def test_write_webdataset_dirty_sink_guard(tmp_path):
    """Re-running into a non-empty dir is refused without overwrite=True;
    with it, stale shards from a DIFFERENT block layout are reconciled
    away so a read sees exactly one copy of each sample."""
    import ray.data

    from ocm_ray.ops.multimodal import read_webdataset, write_webdataset

    tbl = pa.table({
        "sample_id": [f"s{i:04d}" for i in range(40)],
        "payload": pa.array([b"x%d" % i for i in range(40)], pa.binary()),
        "meta": pa.array(["m%d" % i for i in range(40)], pa.string()),
    })
    out = str(tmp_path / "wds")
    write_webdataset(ray.data.from_arrow(tbl).repartition(5), out)

    with pytest.raises(ValueError, match="overwrite=True"):
        write_webdataset(ray.data.from_arrow(tbl).repartition(2), out)

    # different layout (2 blocks -> different shard names) + overwrite:
    # the 5-block run's stale tars must not survive
    write_webdataset(ray.data.from_arrow(tbl).repartition(2), out,
                     overwrite=True)
    back = read_webdataset(out, exts=("bin", "json")).to_pandas()
    assert len(back) == 40
    assert back.sample_id.is_unique


def test_redact_pii_custom_text_col():
    """text_col != 'text' must round-trip under ITS OWN name (the
    scrubbed column used to come back renamed to 'text')."""
    import ray.data

    from ocm_ray.ops.text import redact_pii

    df = pd.DataFrame({"doc_id": ["a", "b"],
                       "body": ["mail me x@y.com now", "no pii here"]})
    out = redact_pii(ray.data.from_pandas(df), text_col="body") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert "body" in out.columns and "text" not in out.columns
    assert "<EMAIL>" in out.body[0]
    assert out.body[1] == "no pii here"
    assert out.n_email.tolist() == [1, 0]


def test_curate_with_scrub_stages(tmp_path):
    """curate(redact=True, remove_spans=N) composes the scrub stages
    ahead of scoring/dedup: PII placeholders appear in the output, the
    shared span is gone, and non-text columns survive the rewrite."""
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from ocm_ray.pipelines.pretraining import curate

    rng = np.random.default_rng(8)
    vocab = [f"tok{i}" for i in range(300)]
    shared = " ".join(rng.choice(vocab, 10))
    rows = []
    for i in range(120):
        body = " ".join(rng.choice(vocab, 40))
        if i % 3 == 0:
            body += " " + shared
        if i % 5 == 0:
            body += f" mail me at user{i}@spam.example now"
        rows.append({"doc_id": f"c{i:03d}", "text": body,
                     "source": "web" if i % 2 else "code"})
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), src)

    out_dir = str(tmp_path / "curated")
    summary = curate(str(src), out_dir, quality_min=0.0,
                     redact=True, remove_spans=8)
    assert summary["n_output"] > 0
    outs = pd.concat([pd.read_parquet(f) for f in
                      glob.glob(out_dir + "/**/*.parquet", recursive=True)])
    text = " ".join(outs.text)
    assert "@spam.example" not in text and "<EMAIL>" in text
    assert shared not in text          # 10-word shared span removed
    assert set(outs.columns) >= {"doc_id", "text"}
    # partitioned layout by source proves the non-text column survived
    assert glob.glob(out_dir + "/source=web/*.parquet")


def test_hybrid_search_two_stage():
    """BM25 recall -> dense rerank: a doc lexically matching the query
    AND near-duplicating a semantically-close passage must outrank a
    purely lexical match at alpha=0.5; alpha=0 reduces to BM25 order."""
    import ray.data

    from ocm_ray.ops.retrieval import bm25_topk, hybrid_search

    rng = np.random.default_rng(12)
    filler = [f"f{i}" for i in range(500)]
    query = "vector index probe"
    rows = [{"doc_id": f"b{i:03d}",
             "text": " ".join(rng.choice(filler, 30))} for i in range(80)]
    # lexical-only match: query words buried in noise
    rows.append({"doc_id": "lex", "text":
                 "vector index probe " + " ".join(rng.choice(filler, 60))})
    # lexical + semantic match: query words and mostly query-like words
    rows.append({"doc_id": "both", "text":
                 "vector index probe vector index probe index vector"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(4)

    out = hybrid_search(ds, query, topk=5, recall_k=20, alpha=0.5)
    assert list(out.doc_id[:1]) == ["both"]
    assert {"lex", "both"} <= set(out.doc_id)
    assert (out.score.values[:-1] >= out.score.values[1:]).all()

    # alpha=0: pure (normalized) BM25 — order equals bm25_topk's ids
    out0 = hybrid_search(ds, query, topk=5, recall_k=20, alpha=0.0)
    bm = bm25_topk(ds, query.split(" "), topk=5)
    bm = bm if isinstance(bm, pd.DataFrame) else bm.to_pandas()
    assert list(out0.doc_id) == list(bm.doc_id)
