"""Multi-round (offline) OCM / OCCM orchestration over Ray Data.

The offline algorithm (SURVEY §2.2) requires n full re-scans of the
corpus — exactly what a Parquet-backed Dataset is good at and a true
stream cannot do. Per round r (``main.cpp:35-62`` non-conservative,
``:63-90`` conservative-effective):

    non-conservative (OCM):
        r>0: COLLISION pass — every partition marks suspect cells against
             the broadcast frozen previous-round (core, collision);
             partials merge by cell-wise max.
        zero core; COUNT pass — masked scatter-add conditioned on the
             broadcast frozen collision table; partials merge by sum.
             Bit-exact at any parallelism (conformance-tested).
    conservative (OCCM):
        zero core; one fused COUNT+COLLISION pass per partition against
        the broadcast frozen collision table; merge core=sum,
        collision=max. Order-dependent → sandwiched
        (true ≤ est ≤ vanilla-CM), tested.

Two execution modes:
  * ``files=...`` (throughput path): ONE corpus scan builds per-shard
    exact (token, count) tables cached in the object store; every pass
    of every round then folds the cached tables (grouped ≤8 pass tasks)
    — the reference's 2n−1 re-reads disappear entirely.
  * ``dataset_factory=...``: each pass re-streams a fresh Dataset via
    ``streaming_split`` accumulator tasks (the mode for corpora whose
    count tables exceed the object store).
The only cross-round state is the broadcast sketch arrays (``ray.put``
once per round, read zero-copy by every task).
"""

from __future__ import annotations

from typing import Callable, Optional

import ray
from ray.data import Dataset

from ocm_ray.engine.build import (_cap_split_pipeline_cpus,
                                  _default_parallelism, tree_merge)
from ocm_ray.engine.tokens import items_from_batch
from ocm_ray.sketches.countmin import OfflineCountMin


def _apply_pass(sk: OfflineCountMin, items, mode: str, round_no: int,
                total_round: int, frozen_core, frozen_coll) -> None:
    if mode == "collision":
        sk.update_collision(items, round_no, frozen_core=frozen_core,
                            frozen_collision=frozen_coll)
    elif mode == "count":
        sk.update_count(items, frozen_collision=frozen_coll)
    elif mode == "paper_sweep":
        # the reference's CODED r>0 "collision pass" (main.cpp:69-75): the
        # function pointer still targets update_count_collision and
        # total_round arrives as 0, so collision writes are suppressed
        # (ocm.h:338) and the core writes are wiped by clear_core()
        sk.update_count_collision(items, round_no, 0)
    else:  # fused occm
        sk.update_count_collision(items, round_no, total_round)


# half a CPU, capped count — same deadlock-proof shape as
# build._consume_split (full-CPU consumers + any stray fractional actor
# can starve the capped read task)
@ray.remote(num_cpus=0.5)
def _round_pass(it, np_bits: int, nh: int, seedseed: int, conservative: bool,
                mode: str, round_no: int, total_round: int,
                frozen_core, frozen_coll, column: str, kgram: int,
                counter_dtype: str = "int64"):
    # frozen_core / frozen_coll arrive as ObjectRef task args → Ray delivers
    # them zero-copy from the shared object store (put once per round by the
    # driver, read by every task — the broadcast pattern).
    sk = OfflineCountMin(np_bits, nh, seedseed, conservative=conservative,
                         counter_dtype=counter_dtype)
    if frozen_coll is not None:
        sk.collision[:] = frozen_coll
    for batch in it.iter_batches(batch_format="pyarrow", batch_size=None,
                                 prefetch_batches=2):
        items = items_from_batch(batch, column, kgram)
        _apply_pass(sk, items, mode, round_no, total_round, frozen_core, frozen_coll)
    return sk


@ray.remote(num_cpus=1)
def _count_table_len(tbl) -> int:
    return len(tbl[0])


@ray.remote(num_cpus=1)
def _merge_count_tables(*tables):
    """Fold several sorted (unique, count) tables into one (worker-side;
    the driver only ever holds the ObjectRef)."""
    from ocm_ray.sketches.base import merge_sorted_counts

    u, c = tables[0]
    for u2, c2 in tables[1:]:
        u, c = merge_sorted_counts(u, c, u2, c2)
    return u, c


@ray.remote(num_cpus=1)
def _round_pass_counts(shard_counts, np_bits: int, nh: int, seedseed: int,
                       conservative: bool, mode: str, round_no: int,
                       total_round: int, frozen_core, frozen_coll,
                       counter_dtype: str = "int64"):
    """One round pass over a shard's cached (unique, count) table.

    The corpus is scanned ONCE (build.shard_token_counts); every pass of
    every round then operates on the shard's exact grouped multiset —
    bit-identical for the order-free OCM passes (masked scatter-add /
    frozen-read marking are functions of the multiset), and equal to the
    documented grouped-conservative semantics for the fused OCCM pass
    (each shard's occurrences processed token-grouped). This removes the
    reference's 2n-1 re-reads entirely; at scales where the count tables
    don't fit the object store, drive ``build_ocm`` with
    ``dataset_factory=`` instead of ``files=`` — that path streams the
    corpus per pass instead of caching count tables.
    """
    # refs nested inside a list are NOT auto-resolved by Ray — fetch them
    # (zero-copy from the shared store; the tables were put once)
    if shard_counts and isinstance(shard_counts[0], ray.ObjectRef):
        shard_counts = ray.get(list(shard_counts))
    sk = OfflineCountMin(np_bits, nh, seedseed, conservative=conservative,
                         counter_dtype=counter_dtype)
    if frozen_coll is not None:
        sk.collision[:] = frozen_coll
    # shard_counts is a LIST of (uniq, cnt) tables: pass parallelism is
    # decoupled from scan parallelism — fewer, fatter pass tasks mean
    # fewer sketch-sized partials through the per-round merge
    for uniq, cnt in shard_counts:
        if mode == "collision":
            sk.update_collision(uniq, round_no, counts=cnt,
                                frozen_core=frozen_core,
                                frozen_collision=frozen_coll)
        elif mode == "count":
            sk.update_count(uniq, counts=cnt, frozen_collision=frozen_coll)
        elif mode == "paper_sweep":
            sk.update_count_collision(uniq, round_no, 0, counts=cnt)
        else:
            sk.update_count_collision(uniq, round_no, total_round, counts=cnt)
    return sk


def build_ocm(dataset_factory: Optional[Callable[[], Dataset]] = None,
              np_bits: int = 20,
              nh: int = 7, seedseed: int = 137, rounds: int = 4,
              conservative: bool = True, column: str = "tokens",
              kgram: int = 1, parallelism: Optional[int] = None,
              on_round_end: Optional[Callable] = None,
              resume_from: Optional[tuple] = None,
              materialize: bool = False,
              files: Optional[list] = None,
              partial_counter_dtype: str = "int64",
              paper_collision_pass: bool = False,
              collapse_threshold: int = 1 << 22,
              metrics: Optional[dict] = None) -> OfflineCountMin:
    """n-round offline count-min over a re-scannable Dataset.

    ``dataset_factory`` returns a FRESH lazy Dataset per pass (each pass
    re-reads the Parquet source — the streaming executor never holds the
    corpus in memory). ``on_round_end(round, sketch)`` is the checkpoint
    hook (see engine.checkpoint.RoundCheckpointer).

    ``materialize=True`` pins the token Dataset in the object store once
    and reuses it for every pass — only for corpora that fit the store
    (2n-1x fewer reads/decodes); leave False at full scale, where the
    offline algorithm's re-scans stream from Parquet.

    NOTE on ``collapse_threshold`` (ADVICE r3 #3): the bounded-vocab
    collapse changes the GROUPING the conservative/OCCM update sees —
    one global multiset vs per-shard count tables — and grouped
    conservative updates are grouping-dependent, so the same corpus can
    yield different (both valid) sketch bytes on either side of the
    threshold. Every variant keeps the one-sided sandwich
    ``true <= est <= vanilla-CM est`` (pinned by
    ``tests/test_round4.py::test_occm_collapse_vs_sharded_sandwich``);
    non-conservative OCM passes are pure multiset functions and stay
    bit-exact across the two paths. The gate is the SUM of per-shard
    table lengths (a cheap upper bound of the global distinct count):
    crossing it only ever switches between these two valid groupings.

    ``metrics`` (VERDICT r4 #2): pass a dict to receive build
    attribution — ``plan`` ("collapse" | "sharded" | "streaming"),
    ``count_tables`` (tables per pass after any collapse),
    ``table_rows`` (summed per-shard table lengths), and
    ``pass_walls`` (wall seconds per pass, in execution order) — so a
    bench artifact can attribute an anomalous occm_build number to plan
    selection vs a degraded window in one read.
    """
    import time as _time
    from ocm_ray.engine.build import _cap_consumers

    p = _cap_consumers(parallelism or _default_parallelism())
    if materialize:
        pinned = dataset_factory().materialize()
        dataset_factory = lambda: pinned  # noqa: E731
    glob = OfflineCountMin(np_bits, nh, seedseed, conservative=conservative)
    start_round = 0
    if resume_from is not None:
        # (last_completed_round, its checkpointed sketch) — e.g. from
        # RoundCheckpointer.last_completed()/load()
        last, ckpt = resume_from
        glob = ckpt.ensure_writable()
        start_round = last + 1

    count_refs = None
    if files is not None:
        from ocm_ray.engine.build import shard_token_counts

        files = sorted(files)
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        p_files = max(1, min(parallelism or n_cpu, len(files)))
        shard_groups = [files[i::p_files] for i in range(p_files)]
        # single corpus scan → cached per-shard exact count tables
        # (vocab-bounded; every subsequent pass reads these, not Parquet)
        count_refs = [shard_token_counts.remote(g, column, kgram)
                      for g in shard_groups]
        # bounded-vocab collapse: token-id domains make every shard's
        # table cover nearly the whole vocabulary, so 2n passes would
        # each pay P sketch-sized partials + a 100s-of-MB tree merge to
        # re-aggregate the SAME few-MB multiset. Fold the tables into
        # ONE global (unique, count) table worker-side (tree of sorted
        # merges) and run each pass as a single task with no merge.
        # Skipped for unbounded domains (k-grams / hashes): there the
        # global table is corpus-sized and the sharded path stands.
        sizes = ray.get([_count_table_len.remote(r) for r in count_refs])
        collapsed = sum(sizes) <= collapse_threshold
        if collapsed:
            while len(count_refs) > 1:
                count_refs = [_merge_count_tables.remote(*count_refs[i:i + 8])
                              for i in range(0, len(count_refs), 8)]
        if metrics is not None:
            metrics["plan"] = "collapse" if collapsed else "sharded"
            metrics["count_tables"] = len(count_refs)
            metrics["table_rows"] = int(sum(sizes))
    elif metrics is not None:
        metrics["plan"] = "streaming"

    def run_pass(mode: str, r: int, frozen_core, frozen_coll):
        t0 = _time.perf_counter()
        try:
            return _run_pass(mode, r, frozen_core, frozen_coll)
        finally:
            if metrics is not None:
                metrics.setdefault("pass_walls", []).append(
                    round(_time.perf_counter() - t0, 3))

    def _run_pass(mode: str, r: int, frozen_core, frozen_coll):
        core_ref = ray.put(frozen_core) if frozen_core is not None else None
        coll_ref = ray.put(frozen_coll)
        if count_refs is not None:
            # ≤8 pass tasks regardless of scan width: each folds several
            # cached count tables before emitting one partial sketch
            fan = max(1, (len(count_refs) + 7) // 8)
            groups_of_refs = [count_refs[i:i + fan]
                              for i in range(0, len(count_refs), fan)]
            refs = [_round_pass_counts.remote(grp, np_bits, nh, seedseed,
                                              conservative, mode, r, rounds,
                                              core_ref, coll_ref,
                                              partial_counter_dtype)
                    for grp in groups_of_refs]
        else:
            pass_ds = dataset_factory()
            # hold the read-budget cap until the consumers drain the
            # stream (the tree merge blocks on them), then restore
            with _cap_split_pipeline_cpus(pass_ds, p):
                splits = pass_ds.streaming_split(p, equal=False)
                refs = [_round_pass.remote(it, np_bits, nh, seedseed,
                                           conservative, mode, r, rounds,
                                           core_ref, coll_ref, column,
                                           kgram, partial_counter_dtype)
                        for it in splits]
                return (tree_merge_collision(refs) if mode == "collision"
                        else tree_merge(refs))
        if mode == "collision":
            merged = tree_merge_collision(refs)
        else:
            merged = tree_merge(refs)
        return merged

    for r in range(start_round, rounds):
        if not conservative and r > 0:
            merged = run_pass("collision", r, glob.core.copy(), glob.collision.copy())
            glob.collision = merged.collision
        if conservative and paper_collision_pass and r > 0:
            # The reference's CODED conservative schedule runs an extra
            # pre-pass per round (2n−1 total passes, main.cpp:68-86) that
            # is algorithmically a no-op (SURVEY §2.1 row 20): its
            # collision writes are suppressed by total_round=0 and its
            # core writes die in clear_core(). Exposed for conformance
            # demonstration; default off saves a corpus pass per round.
            merged = run_pass("paper_sweep", r, None, glob.collision.copy())
            glob.collision = merged.collision  # provably unchanged
        glob.clear_core()
        mode = "fused" if conservative else "count"
        merged = run_pass(mode, r, None, glob.collision.copy())
        glob.core = merged.core.astype(glob.core.dtype, copy=False)
        glob.n_items = merged.n_items
        if conservative:
            glob.collision = merged.collision
        if on_round_end is not None:
            on_round_end(r, glob)
    return glob


@ray.remote
def _merge_collision_task(*sketches):
    acc = sketches[0].ensure_writable()
    for s in sketches[1:]:
        acc.merge_collision(s)
    return acc


def tree_merge_collision(refs, fanin: int = 8):
    refs = list(refs)
    while len(refs) > 1:
        refs = [_merge_collision_task.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return ray.get(refs[0]).ensure_writable()
