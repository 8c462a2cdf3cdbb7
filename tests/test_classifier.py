"""Naive-Bayes quality classifier (ops/classifier.py): brute-force
parity, partition invariance of training, OOV smoothing, filter stage,
model persistence."""
import math

import numpy as np
import pyarrow as pa
import pytest

import ray

POS = [
    "good clean prose with facts",
    "good tidy prose and facts",
    "clean facts good prose",
    "tidy good and clean prose",
]
NEG = [
    "spam junk click buy now",
    "junk spam buy click",
    "click buy spam junk now now",
    "buy now junk click spam",
]


def _docs_table(texts_pos=POS, texts_neg=NEG):
    texts = texts_pos + texts_neg
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "label": pa.array([True] * len(texts_pos) + [False] * len(texts_neg)),
    })


def _brute_nb(texts, labels, alpha=1.0):
    """Pure-python multinomial NB with the exact engine formula."""
    from collections import Counter

    cp, cn = Counter(), Counter()
    for t, y in zip(texts, labels):
        (cp if y else cn).update(t.split(" "))
    vocab = set(cp) | set(cn)
    tp, tn = sum(cp.values()), sum(cn.values())
    dp, dn = tp + alpha * len(vocab), tn + alpha * len(vocab)
    n_pos, n_neg = sum(labels), len(labels) - sum(labels)
    prior = math.log2(n_pos / len(labels)) - math.log2(n_neg / len(labels))
    lp = {w: math.log2((cp[w] + alpha) / dp) - math.log2((cn[w] + alpha) / dn)
          for w in vocab}
    oov = math.log2(alpha / dp) - math.log2(alpha / dn)

    def score(text):
        return prior + sum(lp.get(w, oov) for w in text.split(" "))

    return score


def test_nb_matches_bruteforce(ray_session):
    from ocm_ray.ops.classifier import nb_scores, train_quality_classifier

    tbl = _docs_table()
    ds = ray.data.from_arrow(tbl).repartition(3)
    model = train_quality_classifier(ds)
    out = (nb_scores(ds, model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    score = _brute_nb(tbl.column("text").to_pylist(),
                      tbl.column("label").to_pylist())
    expected = [round(score(t), 4) for t in tbl.column("text").to_pylist()]
    assert np.allclose(out["nb_logodds"].to_numpy(), expected, atol=1e-9)
    # separable corpus: positives above 0, negatives below
    assert out["nb_keep"].tolist() == [True] * 4 + [False] * 4


def test_nb_training_partition_invariant(ray_session):
    from ocm_ray.ops.classifier import train_quality_classifier

    tbl = _docs_table()
    m1 = train_quality_classifier(ray.data.from_arrow(tbl).repartition(1))
    m7 = train_quality_classifier(ray.data.from_arrow(tbl).repartition(7))
    assert np.array_equal(m1.keys, m7.keys)
    assert np.array_equal(m1.lp_diff, m7.lp_diff)
    assert (m1.lp_oov, m1.prior, m1.vocab_size) == \
        (m7.lp_oov, m7.prior, m7.vocab_size)


def test_nb_oov_scoring_heldout(ray_session):
    """Held-out docs with unseen words take the smoothing floor; an
    all-OOV doc scores exactly prior + n_words * lp_oov."""
    from ocm_ray.ops.classifier import nb_scores, train_quality_classifier

    model = train_quality_classifier(ray.data.from_arrow(_docs_table()))
    held = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["zzz qqq xxx", "good facts zzz"]),
    })
    out = (nb_scores(ray.data.from_arrow(held), model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "nb_logodds"] == pytest.approx(
        round(model.prior + 3 * model.lp_oov, 4), abs=1e-9)
    # two positive-class words dominate one OOV word
    assert out.loc[1, "nb_logodds"] > 0


def test_nb_filter_and_roundtrip(ray_session, tmp_path):
    from ocm_ray.ops.classifier import (NBModel, nb_filter,
                                        train_quality_classifier)

    tbl = _docs_table()
    ds = ray.data.from_arrow(tbl).repartition(2)
    model = train_quality_classifier(ds)
    kept = nb_filter(ds, model).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 1, 2, 3]
    assert set(kept.columns) == {"doc_id", "text", "label"}  # passthrough

    p = str(tmp_path / "nb.npz")
    model.save(p)
    m2 = NBModel.load(p)
    assert np.array_equal(model.keys, m2.keys)
    assert np.array_equal(model.lp_diff, m2.lp_diff)
    assert (model.lp_oov, model.prior, model.vocab_size, model.alpha,
            model.lowercase, model.n_pos_docs, model.n_neg_docs) == \
        (m2.lp_oov, m2.prior, m2.vocab_size, m2.alpha,
         m2.lowercase, m2.n_pos_docs, m2.n_neg_docs)


def test_nb_single_class_raises(ray_session):
    from ocm_ray.ops.classifier import train_quality_classifier

    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a b", "c d"]),
                    "label": pa.array([True, True])})
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(ray.data.from_arrow(tbl))


def test_curate_with_classifier_stage(ray_session, tmp_path):
    """curate(classifier=) composes the trained NB filter after the
    heuristic quality stage: junk-vocabulary docs are gone from the
    written corpus even when they pass the heuristic filter, and a
    saved-model path works the same as the in-memory model."""
    import pyarrow.parquet as pq

    from ocm_ray.ops.classifier import train_quality_classifier
    from ocm_ray.pipelines.pretraining import curate

    rng = np.random.default_rng(11)
    good_words = ["fact", "clean", "prose", "clear", "tidy", "plain"]
    junk_words = ["spam", "junk", "click", "buy", "scam", "win"]
    rows = []
    for i in range(120):
        junky = i % 3 == 0
        words = rng.choice(junk_words if junky else good_words, 30)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "source": "web" if junky else "wiki",
                     "label": not junky})
    tbl = pa.Table.from_pylist(rows)
    src = str(tmp_path / "docs.parquet")
    pa.parquet.write_table(tbl, src)

    model = train_quality_classifier(ray.data.from_arrow(tbl))
    mpath = str(tmp_path / "m.npz")
    model.save(mpath)

    out_dir = str(tmp_path / "curated")
    summary = curate(src, out_dir, quality_min=0.0,
                     near_dup_threshold=1.01, classifier=mpath)
    got = pq.read_table(out_dir).to_pandas()
    assert summary["n_input"] == 120
    assert summary["n_after_quality"] == 80  # the 40 junky docs dropped
    assert set(got["doc_id"]) == {i for i in range(120) if i % 3 != 0}


def test_nb_keep_top_fraction(ray_session):
    """Quantile-threshold curation: keep the top 25% by score. At this
    size the KLL sketch holds every value exactly, so the kept set must
    equal the brute-force top 25% (ties on the rounded grid included)."""
    from ocm_ray.ops.classifier import (nb_keep_top_fraction,
                                        train_quality_classifier)

    rng = np.random.default_rng(5)
    good, bad = ["fact", "prose", "clean", "cite"], ["spam", "click", "buy"]
    rows = []
    for i in range(200):
        n_good = int(rng.integers(0, 20))
        words = list(rng.choice(good, n_good)) + \
            list(rng.choice(bad, 20 - n_good))
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "label": n_good >= 10})
    tbl = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(tbl).repartition(5)
    model = train_quality_classifier(ds)

    kept_ds, threshold = nb_keep_top_fraction(ds, model, 0.25)
    kept = kept_ds.to_pandas()

    score = _brute_nb([r["text"] for r in rows], [r["label"] for r in rows])
    brute = np.round([score(r["text"]) for r in rows], 4)
    expect = {i for i in range(200) if brute[i] >= threshold}
    assert set(kept["doc_id"]) == expect
    # the kept fraction brackets the request (ties can push it past 25%)
    assert 0.15 <= len(kept) / 200 <= 0.40
    # threshold lands within one grid-adjacent pair of the exact quantile
    assert abs(threshold - np.quantile(brute, 0.75,
                                       method="inverted_cdf")) <= \
        np.diff(np.sort(brute)).max()

    # frac=1.0 keeps everything
    all_ds, th_all = nb_keep_top_fraction(ds, model, 1.0)
    assert all_ds.count() == 200


def test_curate_classifier_top_fraction(ray_session, tmp_path):
    """curate(classifier_top_frac=) keeps the requested share of the
    quality-filtered corpus via the sketch-discovered threshold."""
    import pyarrow.parquet as pq

    from ocm_ray.ops.classifier import train_quality_classifier
    from ocm_ray.pipelines.pretraining import curate

    rng = np.random.default_rng(3)
    good, bad = ["fact", "prose", "clean", "cite"], ["spam", "click", "buy"]
    rows = []
    for i in range(100):
        n_good = int(rng.integers(0, 21))
        words = list(rng.choice(good, n_good)) + \
            list(rng.choice(bad, 20 - n_good))
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "source": "s0", "label": n_good >= 10})
    tbl = pa.Table.from_pylist(rows)
    src = str(tmp_path / "docs.parquet")
    pa.parquet.write_table(tbl, src)
    model = train_quality_classifier(ray.data.from_arrow(tbl))

    out_dir = str(tmp_path / "curated")
    summary = curate(src, out_dir, quality_min=0.0,
                     near_dup_threshold=1.01, classifier=model,
                     classifier_top_frac=0.3)
    got = pq.read_table(out_dir).to_pandas()
    # ~30% kept (quantile grid / ties give slack), and they are the
    # highest-scoring docs: every kept score >= every dropped score
    assert 20 <= len(got) <= 40 and summary["n_after_quality"] == len(got)
    from ocm_ray.ops.classifier import nb_scores

    sc = (nb_scores(ray.data.from_arrow(tbl), model).to_pandas()
          .set_index("doc_id")["nb_logodds"])
    kept_ids = set(got["doc_id"])
    dropped = [i for i in range(100) if i not in kept_ids]
    assert sc[list(kept_ids)].min() >= sc[dropped].max()


def test_nb_lowercase_train_score_consistent(ray_session, tmp_path):
    """lowercase=True must use the SAME kernel at train and score time
    (Arrow utf8_lower) — words with special-cased codepoints ('İ') used
    to train under one form and score as OOV under the other. Also:
    save/load round-trips through a suffix-less path."""
    from ocm_ray.ops.classifier import (NBModel, nb_scores,
                                        train_quality_classifier)

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["İstanbul GOOD Facts", "GOOD istanbul facts",
                          "SPAM Junk buy", "junk SPAM BUY"]),
        "label": pa.array([True, True, False, False]),
    })
    ds = ray.data.from_arrow(tbl)
    model = train_quality_classifier(ds, lowercase=True)
    out = (nb_scores(ds, model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # every word (incl. the İ variants) must resolve to a trained
    # weight, never the OOV floor: an all-OOV doc would score exactly
    # prior + 3*lp_oov
    floor = round(model.prior + 3 * model.lp_oov, 4)
    assert (out["nb_logodds"] != floor).all()
    assert out["nb_keep"].tolist() == [True, True, False, False]

    p = str(tmp_path / "model_no_suffix")  # no .npz
    model.save(p)
    m2 = NBModel.load(p)
    assert np.array_equal(model.keys, m2.keys)


def test_curate_with_lr_classifier_stage(ray_session, tmp_path):
    """curate(classifier=<LR .npz path>) sniffs the artifact kind and
    composes the LR filter; the top-frac policy routes to the LR
    quantile path."""
    import pyarrow.parquet as pq

    from ocm_ray.ops.classifier import train_lr_classifier
    from ocm_ray.pipelines.pretraining import curate

    rng = np.random.default_rng(13)
    good_words = ["fact", "clean", "prose", "clear", "tidy", "plain"]
    junk_words = ["spam", "junk", "click", "buy", "scam", "win"]
    rows = []
    for i in range(120):
        junky = i % 3 == 0
        words = rng.choice(junk_words if junky else good_words, 30)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "source": "web" if junky else "wiki",
                     "label": not junky})
    tbl = pa.Table.from_pylist(rows)
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)

    model = train_lr_classifier(ray.data.from_arrow(tbl), dim=1 << 12,
                                epochs=30, lr=5.0)
    mpath = str(tmp_path / "lr.npz")
    model.save(mpath)

    out_dir = str(tmp_path / "curated_lr")
    summary = curate(src, out_dir, quality_min=0.0,
                     near_dup_threshold=1.01, classifier=mpath)
    got = pq.read_table(out_dir).to_pandas()
    assert summary["n_after_quality"] == 80   # the 40 junky docs dropped
    assert set(got["doc_id"]) == {i for i in range(120) if i % 3 != 0}

    # top-frac policy through the LR branch: keep ~half of the docs
    out2 = str(tmp_path / "curated_lr_frac")
    summary2 = curate(src, out2, quality_min=0.0, near_dup_threshold=1.01,
                      classifier=model, classifier_top_frac=2 / 3)
    got2 = pq.read_table(out2).to_pandas()
    # the top 2/3 by LR score are exactly the 80 non-junky docs
    assert set(got2["doc_id"]) == {i for i in range(120) if i % 3 != 0}
    assert summary2["n_after_quality"] == 80
