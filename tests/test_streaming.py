"""Streamed (windowed) read pool: bounded host RSS, identical results.

VERDICT round-2 item 3: feed count/mercy/iterate/mapping from bounded
batches instead of a resident pool (reference AsyncSequenceReader
2^28-base double buffer, async_sequence_reader.h:46-47). Here the pool
stays 2-bit packed ON DISK inside the lib npz and every scan reads
word windows (io/lib.py PackedPool)."""

import resource

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph.counter import count_canonical_kmers
from megahit_tpu.io.lib import PackedPool, SequenceLib

RNG = np.random.default_rng(7)


def _make_lib(tmp_path, n_seqs=3000, length=300):
    seqs = [RNG.integers(0, 4, size=length).astype(np.uint8)
            for _ in range(n_seqs)]
    flat, starts = packing.pack_many(seqs)
    lib = SequenceLib(flat, starts, [(0, n_seqs, False)])
    path = str(tmp_path / "lib.npz")
    lib.save(path)
    return path, flat, starts


def test_windowed_pool_roundtrip(tmp_path):
    path, flat, starts = _make_lib(tmp_path, n_seqs=200)
    ram = SequenceLib.load(path, mode="ram")
    win = SequenceLib.load(path, mode="window")
    assert not win.pool.in_ram
    np.testing.assert_array_equal(ram.flat_codes, flat)
    np.testing.assert_array_equal(win.flat_codes, flat)
    # windows + sparse base access agree with the codes
    w = win.pool.window_padded(3, 10)
    np.testing.assert_array_equal(w, ram.pool.window_padded(3, 10))
    pos = RNG.integers(0, len(flat), 100)
    np.testing.assert_array_equal(win.pool.bases_at(pos), flat[pos])


def test_windowed_count_matches_ram(tmp_path):
    path, flat, starts = _make_lib(tmp_path, n_seqs=500)
    win = SequenceLib.load(path, mode="window")
    k1, mc = 22, 2
    k_ram, c_ram = count_canonical_kmers(flat, starts, k1, mc)
    k_win, c_win = count_canonical_kmers(win.pool, win.starts, k1, mc)
    np.testing.assert_array_equal(k_ram, k_win)
    np.testing.assert_array_equal(c_ram, c_win)


def test_windowed_bucketed_build_bounds_rss(tmp_path):
    """The full out-of-core graph build over a DISK-windowed pool must
    keep host RSS far below the window multiset (which only ever
    exists in the spill files) - the reference CX1 memory guarantee
    (base_engine.cpp:54-141) extended to the read pool itself.

    The in-memory counter is exempt by design: it returns all distinct
    keys, so its footprint is O(distinct); bounded-memory counting IS
    the bucketed builder (mult_mode="count")."""
    from megahit_tpu.graph.bucketed import (BuildStats, PoolSource,
                                            build_sdbg_bucketed)

    # ~12 Mbp pool generated with minimal footprint (one flat array;
    # no per-seq lists), so the pre-build RSS high-water stays low and
    # the assertion cannot pass vacuously
    n_seqs, length = 60_000, 200
    flat = RNG.integers(0, 4, n_seqs * length).astype(np.uint8)
    starts = (np.arange(n_seqs + 1, dtype=np.int64) * length)
    lib = SequenceLib(flat, starts, [(0, n_seqs, False)])
    path = str(tmp_path / "big.npz")
    lib.save(path)
    del lib, flat
    win = SequenceLib.load(path, mode="window")
    assert not win.pool.in_ram

    k1 = 22
    # both-strand multiset = ~24M rows x 12 B = ~280 MB, on disk only
    multiset_bytes = 2 * (n_seqs * (length - k1 + 1)) * 12
    budget_rows = 1 << 20  # 12 MB rounds

    # warm-up mini-build through the same code paths: the jax runtime +
    # XLA:CPU jit executables alone cost O(100 MB) of RSS on first use,
    # which would otherwise be charged to `grow` when this test runs in
    # isolation (in-suite, earlier tests pre-pay it)
    wflat = RNG.integers(0, 4, 50 * length).astype(np.uint8)
    wstarts = np.arange(51, dtype=np.int64) * length
    wlib = SequenceLib(wflat, wstarts, [(0, 50, False)])
    wpath = str(tmp_path / "warm.npz")
    wlib.save(wpath)
    wwin = SequenceLib.load(wpath, mode="window")
    build_sdbg_bucketed(
        [PoolSource(wwin.pool, wwin.starts, np.ones(50, np.int32))],
        k1, budget_rows, str(tmp_path / "wspill"),
        stats=BuildStats(), mult_mode="count", min_count=2,
        batch_windows=1 << 20,
    )
    del wlib, wwin, wflat

    import tracemalloc

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    stats = BuildStats()
    tracemalloc.start()
    sdbg = build_sdbg_bucketed(
        [PoolSource(win.pool, win.starts,
                    np.ones(n_seqs, np.int32))],
        k1, budget_rows, str(tmp_path / "spill"),
        stats=stats, mult_mode="count", min_count=2,
        batch_windows=1 << 20,
    )
    _, traced_peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    assert stats.total_spilled_rows * 12 >= multiset_bytes * 0.95
    assert stats.max_round_rows <= budget_rows
    # random 22-mers at 1x coverage are almost all below min_count=2,
    # so the final graph is tiny; what must NOT be resident is the
    # multiset (~280 MB) or the unpacked pool (12 MB). The strict
    # bound is the traced numpy high-water (per-batch transients are
    # O(batch_windows), not O(multiset)); RSS is only a lenient
    # backstop because allocator arenas + the jax runtime make
    # ru_maxrss deltas noisy across environments.
    assert traced_peak < multiset_bytes * 0.55, (
        traced_peak, multiset_bytes)
    grow = rss1 - rss0
    assert grow < multiset_bytes, (grow, multiset_bytes)
    assert sdbg.num_valid() < 1_000_000


def test_assemble_never_materializes_candidate_tables(tmp_path):
    """VERDICT round-2 item 4: cleaning must not materialize global
    (E, 4) candidate tables. A full assemble over a real graph must
    leave the lazy table views untouched, and the resident navigation
    core must stay small per edge."""
    from megahit_tpu.graph.sdbg import build_sdbg
    from megahit_tpu.pipeline.assemble import AssembleOptions, assemble

    genome = RNG.integers(0, 4, size=60_000).astype(np.uint8)
    reads = [genome[s:s + 100] for s in range(0, len(genome) - 100, 3)]
    # add errors to create tips/bubbles so every cleaning pass runs
    for i in range(0, len(reads), 5):
        r = reads[i].copy()
        p = RNG.integers(0, len(r))
        r[p] = (r[p] + 1) % 4
        reads[i] = r
    flat, starts = packing.pack_many(reads)
    sdbg = build_sdbg(flat, starts, np.ones(len(reads), np.int32), 22)
    res = assemble(sdbg, AssembleOptions(min_standalone=200,
                                         careful_bubble=True))
    assert len(res.contigs) > 0
    # the (E,4) views must never have materialized during assembly
    assert sdbg._oc_t is None and sdbg._ic_t is None
    assert sdbg._oc_s is None and sdbg._ic_s is None
    # resident navigation core: keys + mult + valid + rc + run_start +
    # nxt_link + rvc (+ ref_rank once computed)
    parts = [sdbg.keys, sdbg.mult, sdbg.valid, sdbg._rc,
             sdbg._run_start, sdbg._nxt_link]
    if sdbg._rvc is not None:
        parts.append(sdbg._rvc)
    if sdbg._ref_rank is not None:
        parts.append(sdbg._ref_rank)
    per_edge = sum(a.nbytes for a in parts) / max(sdbg.size, 1)
    assert per_edge <= 36, per_edge  # vs ~93 B/edge with eager tables
