"""North-rule accuracy requirement: 'the conservative-update variant
demonstrably tighter than vanilla CM on skewed Zipfian token
distributions, matching ocm's own accuracy tests' — the 4-variant
comparison of BASELINE.md's rymv table, on the engine's Zipf corpus at a
heavy-collision configuration."""

import numpy as np
import pytest

from ocm_ray.data.sequences import sample_tokens
from ocm_ray.sketches.countmin import CountMin, OfflineCountMin

NP, NH, ROUNDS = 12, 5, 4  # w=4096 — heavy collisions, like the rymv config


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    stream = sample_tokens(rng, 2_000_000, vocab=50_257, s=1.1).astype(np.uint64)
    uniq, cnt = np.unique(stream, return_counts=True)
    return stream, uniq, cnt


def _metrics(est, cnt):
    return {
        "exact": float((est == cnt).mean()),
        "rmse": float(np.sqrt(((est - cnt) ** 2).mean())),
        "under": int((est < cnt).sum()),
    }


@pytest.fixture(scope="module")
def variants(corpus):
    stream, uniq, cnt = corpus
    parts = np.array_split(stream, 8)

    van = CountMin(NP, NH)
    van.update(stream)

    con = CountMin(NP, NH, conservative=True)
    for p in parts:
        s = CountMin(NP, NH, conservative=True)
        s.update(p)
        con.merge(s)

    def rounds(conservative):
        g = OfflineCountMin(NP, NH, conservative=conservative)
        for r in range(ROUNDS):
            if not conservative and r > 0:
                fc, fl = g.core.copy(), g.collision.copy()
                colls = []
                for p in parts:
                    s = OfflineCountMin(NP, NH)
                    s.collision[:] = fl
                    s.update_collision(p, r, frozen_core=fc, frozen_collision=fl)
                    colls.append(s.collision)
                g.collision = np.maximum.reduce(colls)
            g.clear_core()
            fl = g.collision.copy()
            cores, colls = [], []
            for p in parts:
                s = OfflineCountMin(NP, NH, conservative=conservative)
                s.collision[:] = fl
                if conservative:
                    s.update_count_collision(p, r, ROUNDS)
                else:
                    s.update_count(p)
                cores.append(s.core)
                colls.append(s.collision)
            g.core = np.sum(cores, axis=0).astype(g.core.dtype)
            if conservative:
                g.collision = np.maximum.reduce(colls)
        return g

    return {
        "cm_vanilla": van,
        "cm_conservative": con,
        "ocm": rounds(False),
        "occm": rounds(True),
    }


def test_all_variants_one_sided(variants, corpus):
    _, uniq, cnt = corpus
    for name, sk in variants.items():
        est = sk.estimate(uniq)
        assert (est >= cnt).all(), f"{name} underestimates"


def test_conservative_tighter_than_vanilla_on_zipf(variants, corpus):
    """The reference's measured ordering (BASELINE.md rymv table:
    conservative 60.8% vs vanilla 54.1% exact) must reproduce."""
    _, uniq, cnt = corpus
    m = {name: _metrics(sk.estimate(uniq), cnt) for name, sk in variants.items()}
    assert m["cm_conservative"]["exact"] > m["cm_vanilla"]["exact"]
    assert m["cm_conservative"]["rmse"] < m["cm_vanilla"]["rmse"]
    assert m["occm"]["exact"] >= m["cm_vanilla"]["exact"]
    assert m["occm"]["rmse"] < m["cm_vanilla"]["rmse"]
    # multi-round should not be worse than single-pass conservative on RMSE
    assert m["occm"]["rmse"] <= m["cm_conservative"]["rmse"] * 1.05


def test_epsilon_bound_all_variants(variants, corpus):
    """err ≤ εN with prob ≥ 1−δ (ε=e/w, δ=e^−nh) for every variant."""
    stream, uniq, cnt = corpus
    n = len(stream)
    eps = np.e / (1 << NP)
    delta = np.exp(-NH)
    for name, sk in variants.items():
        err = sk.estimate(uniq) - cnt
        frac_over = float((err > eps * n).mean())
        assert frac_over <= max(delta, 0.01), (name, frac_over)
