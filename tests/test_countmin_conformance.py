"""Conformance vs the compiled reference binaries (SURVEY §5.4 item 3).

Drives `cm`/`ocm` on a deterministic FASTA fixture, feeds the engine the
identical uint64 update stream (reader-quirk emulation lives in the parity
harness — ``ocm_ray.core.dna_compat`` — not the engine), and compares
sketch arrays / estimates.

Expected parity contract (SURVEY §7.4):
  * vanilla CM: bit-exact with the batched kernel at ANY partitioning;
  * conservative CM: bit-exact with the sequential kernel at parallelism=1;
    batched kernel sandwiched (true ≤ est ≤ vanilla);
  * OCM (non-conservative rounds): bit-exact with frozen-read distributed
    passes at any partitioning (verified on this fixture);
  * OCCM (fused conservative rounds): bit-exact sequentially; sandwiched
    distributed.
"""

import subprocess

import numpy as np
import pytest

from ocm_ray.core.dna_compat import kmer_stream_from_fasta
from ocm_ray.sketches.countmin import CountMin, OfflineCountMin

K, NP, NH, W, ROUNDS = 11, 12, 5, 1 << 12, 4


@pytest.fixture(scope="module")
def streams(parity_fasta):
    data = open(parity_fasta, "rb").read()
    return {
        # cm.cpp reader uses 1000-byte chunks, main.cpp 100000-byte chunks
        1000: kmer_stream_from_fasta(data, K, canonicalize=True, chunk_size=1000),
        100000: kmer_stream_from_fasta(data, K, canonicalize=True, chunk_size=100000),
    }


@pytest.fixture(scope="module")
def ref_sketches(reference_binaries, parity_fasta, tmp_path_factory):
    d = tmp_path_factory.mktemp("refsk")
    out = {}
    for name, extra in [("van", []), ("con", ["-c"])]:
        p = str(d / f"cm_{name}.bin")
        # NB reference arg parser never reads the last argv (``for i in
        # [2, argc-1)``, main.cpp:16) — append the fasta path last + pad.
        subprocess.run([reference_binaries["cm"], "count", *extra, "-k", str(K),
                        "-h", str(NH), "-w", str(W), "-o", p,
                        "-fa", parity_fasta, "pad"], check=True, capture_output=True)
        out[f"cm_{name}"] = p
    for name, extra in [("ocm", []), ("occm", ["-c"])]:
        p = str(d / f"{name}.bin")
        subprocess.run([reference_binaries["ocm"], "count", *extra, "-k", str(K),
                        "-h", str(NH), "-w", str(W), "-n", str(ROUNDS), "-o", p,
                        "-fa", parity_fasta, "pad"], check=True, capture_output=True)
        out[name] = p
    return out


def test_vanilla_cm_bit_exact_batched(streams, ref_sketches):
    cm = CountMin(NP, NH, 137, conservative=False)
    cm.update(streams[1000])
    ref = CountMin.load_reference_format(ref_sketches["cm_van"])
    assert np.array_equal(cm.core, ref.core)


def test_vanilla_cm_partition_invariant(streams, ref_sketches):
    ref = CountMin.load_reference_format(ref_sketches["cm_van"])
    for nparts in (3, 8):
        parts = np.array_split(streams[1000], nparts)
        merged = CountMin(NP, NH, 137)
        for p in parts:
            s = CountMin(NP, NH, 137)
            s.update(p)
            merged.merge(s)
        assert np.array_equal(merged.core, ref.core)


def test_conservative_cm_sequential_bit_exact(streams, ref_sketches):
    cs = CountMin(NP, NH, 137, conservative=True)
    cs.update_sequential(streams[1000])
    ref = CountMin.load_reference_format(ref_sketches["cm_con"], conservative=True)
    assert np.array_equal(cs.core, ref.core)


def test_conservative_cm_batched_sandwich(streams):
    stream = streams[1000]
    uniq, cnt = np.unique(stream, return_counts=True)
    van = CountMin(NP, NH, 137)
    van.update(stream)
    for nparts in (1, 8):
        merged = CountMin(NP, NH, 137, conservative=True)
        for p in np.array_split(stream, nparts):
            s = CountMin(NP, NH, 137, conservative=True)
            s.update(p)
            merged.merge(s)
        est = merged.estimate(uniq)
        assert (est >= cnt).all(), "one-sided error violated"
        assert (est <= van.estimate(uniq)).all(), "not tighter than vanilla"


def test_ocm_sequential_bit_exact(streams, ref_sketches):
    oc = OfflineCountMin(NP, NH, 137)
    for r in range(ROUNDS):
        if r > 0:
            oc.update_collision_sequential(streams[100000], r)
        oc.clear_core()
        oc.update_count_sequential(streams[100000])
    ref = OfflineCountMin.load_reference_format(ref_sketches["ocm"])
    assert np.array_equal(oc.core, ref.core)
    assert np.array_equal(oc.collision, ref.collision)


def test_ocm_distributed_bit_exact(streams, ref_sketches):
    """Frozen-read partitioned round passes reproduce the reference exactly
    on this fixture (sum-merge cores, max-merge collisions)."""
    stream = streams[100000]
    parts = np.array_split(stream, 8)
    glob = OfflineCountMin(NP, NH, 137)
    for r in range(ROUNDS):
        if r > 0:
            fc, fl = glob.core.copy(), glob.collision.copy()
            colls = []
            for p in parts:
                s = OfflineCountMin(NP, NH, 137)
                s.collision[:] = fl
                s.update_collision(p, r, frozen_core=fc, frozen_collision=fl)
                colls.append(s.collision)
            glob.collision = np.maximum.reduce(colls)
        glob.clear_core()
        fl = glob.collision.copy()
        cores = []
        for p in parts:
            s = OfflineCountMin(NP, NH, 137)
            s.collision[:] = fl
            s.update_count(p)
            cores.append(s.core)
        glob.core = np.sum(cores, axis=0).astype(glob.core.dtype)
    ref = OfflineCountMin.load_reference_format(ref_sketches["ocm"])
    assert np.array_equal(glob.core, ref.core)
    assert np.array_equal(glob.collision, ref.collision)
    uniq = np.unique(stream)
    assert np.array_equal(glob.estimate(uniq), ref.estimate(uniq))


def test_occm_sequential_bit_exact(streams, ref_sketches):
    """Effective OCCM semantics (SURVEY §2.1 row 20: per round, zero core +
    one fused pass; the coded r>0 collision pass is a no-op)."""
    occ = OfflineCountMin(NP, NH, 137, conservative=True)
    for r in range(ROUNDS):
        occ.clear_core()
        occ.update_count_collision_sequential(streams[100000], r, ROUNDS)
    ref = OfflineCountMin.load_reference_format(ref_sketches["occm"], conservative=True)
    assert np.array_equal(occ.core, ref.core)
    assert np.array_equal(occ.collision, ref.collision)


def test_occm_distributed_sandwich(streams):
    stream = streams[100000]
    uniq, cnt = np.unique(stream, return_counts=True)
    van = CountMin(NP, NH, 137)
    van.update(stream)
    estv = van.estimate(uniq)
    g = OfflineCountMin(NP, NH, 137, conservative=True)
    for r in range(ROUNDS):
        g.clear_core()
        fl = g.collision.copy()
        cores, colls = [], []
        for p in np.array_split(stream, 8):
            s = OfflineCountMin(NP, NH, 137, conservative=True)
            s.collision[:] = fl
            s.update_count_collision(p, r, ROUNDS)
            cores.append(s.core)
            colls.append(s.collision)
        g.core = np.sum(cores, axis=0).astype(g.core.dtype)
        g.collision = np.maximum.reduce(colls)
    est = g.estimate(uniq)
    assert (est >= cnt).all()
    assert (est <= estv).all()


def test_even_nh_odd_forcing_matches_reference(streams, reference_binaries,
                                               parity_fasta, tmp_path):
    """Second geometry + the odd-forcing edge: requesting nh=4 must yield
    the reference's nh=5 sketch bit-exactly (``nh += (nh % 2 == 0)``,
    include/ocm.h:38)."""
    import subprocess

    p = str(tmp_path / "even_nh.bin")
    subprocess.run([reference_binaries["cm"], "count", "-k", str(K), "-h", "4",
                    "-w", str(1 << 10), "-o", p, "-fa", parity_fasta, "pad"],
                   check=True, capture_output=True)
    ref = CountMin.load_reference_format(p)
    assert ref.nh == 5  # header already odd-forced
    ours = CountMin(10, 4, 137)  # engine applies the same normalization
    assert ours.nh == 5
    ours.update(streams[1000])
    assert np.array_equal(ours.core, ref.core)


def test_eof_sentinel_skips_chunk_not_stream(reference_binaries,
                                             tmp_path_factory):
    """A 0xFF byte mid-file: the reference's `if(ch==EOF)break` exits
    only the CURRENT chunk scan (ocm.h:544) and keeps emitting k-mers
    from later chunks — the stream emulation must match bit-exactly,
    not stop at the sentinel."""
    from ocm_ray.core.dna_compat import random_fasta

    data = bytearray(random_fasta(300, 400, seed=7))
    assert len(data) >= 100000
    pos = 5500  # inside chunk 5 of the cm reader (1000-byte chunks)
    while data[pos] in (0x3E, 0x0A):
        pos += 1
    data[pos] = 0xFF
    fa = str(tmp_path_factory.mktemp("ff") / "ff.fa")
    open(fa, "wb").write(bytes(data))
    out = fa + ".bin"
    subprocess.run([reference_binaries["cm"], "count", "-k", str(K),
                    "-h", str(NH), "-w", str(W), "-o", out,
                    "-fa", fa, "pad"], check=True, capture_output=True)
    ref = CountMin.load_reference_format(out)
    stream = kmer_stream_from_fasta(bytes(data), K, canonicalize=True,
                                    chunk_size=1000)
    cm = CountMin(NP, NH, 137, conservative=False)
    cm.update(stream)
    assert np.array_equal(cm.core, ref.core)
    # and the stream really continues past the sentinel's chunk
    assert len(stream) > 100000
