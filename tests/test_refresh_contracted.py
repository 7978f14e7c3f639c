"""Contracted (chain-level) refresh vs the full edge-level rebuild.

The contracted path must reproduce the full rebuild's vertex arrays,
vid mapping, canonical orientation/order, and reconstructed strings on
arbitrary graphs and mark patterns."""

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph import unitig as ug
from megahit_tpu.graph.output import unitig_codes
from megahit_tpu.graph.sdbg import build_sdbg

RNG = np.random.default_rng(99)


def _random_graph(n_seqs=30, length=120, k=12, dup=2):
    seqs = []
    for _ in range(n_seqs):
        s = RNG.integers(0, 4, size=length).astype(np.uint8)
        seqs.append(s)
        for _ in range(dup - 1):
            # mutated copy creates branches/bubbles
            t = s.copy()
            for _ in range(RNG.integers(1, 4)):
                p = RNG.integers(0, length)
                t[p] = (t[p] + 1) % 4
            seqs.append(t)
    flat, starts = packing.pack_many(seqs)
    sdbg = build_sdbg(flat, starts, np.ones(len(seqs), np.int32), k)
    return ug.build_unitig_graph(sdbg)


def _copy_sdbg(s):
    import copy

    c = copy.copy(s)
    c.valid = s.valid.copy()
    return c


def _snapshot(g):
    """Compacted view: alive rows in slot order (== the reference's
    stable compaction); vid normalized to compact ids at VALID edges
    and NULL elsewhere (dead edges keep stale slot vids by design)."""
    alive = np.flatnonzero(g.alive)
    remap = np.full(g.size, -1, np.int32)
    remap[alive] = np.arange(len(alive), dtype=np.int32)
    okv = (g.vid >= 0) & g.sdbg.valid
    vid = np.where(okv, remap[np.maximum(g.vid, 0)], -1)
    return dict(
        start=g.start[alive], end=g.end[alive],
        rc_start=g.rc_start[alive], rc_end=g.rc_end[alive],
        length=g.length[alive], total_depth=g.total_depth[alive],
        is_loop=g.is_loop[alive], is_palindrome=g.is_palindrome[alive],
        vid=vid, changed=g.changed[alive],
    )


def _assert_equal_graphs(a, b):
    sa, sb = _snapshot(a), _snapshot(b)
    for key in sa:
        np.testing.assert_array_equal(sa[key], sb[key], err_msg=key)
    if a.n_alive() == 0:
        return
    # chain bookkeeping must agree for VALID non-loop members
    memb = (a.vid >= 0) & a.sdbg.valid
    chain_memb = memb & ~a.is_loop[np.maximum(a.vid, 0)]
    np.testing.assert_array_equal(
        a.chain_start[chain_memb], b.chain_start[chain_memb],
        err_msg="chain_start",
    )
    np.testing.assert_array_equal(
        a.edge_pos[chain_memb], b.edge_pos[chain_memb],
        err_msg="edge_pos",
    )
    ca = unitig_codes(a)
    cb = unitig_codes(b)
    assert len(ca) == len(cb)
    for va, vb in zip(sorted(ca), sorted(cb)):
        np.testing.assert_array_equal(ca[va], cb[vb],
                                      err_msg=f"v{va}/{vb}")


def _apply_both(g, mark_fn, set_changed):
    s_full = _copy_sdbg(g.sdbg)
    s_cont = _copy_sdbg(g.sdbg)

    import copy as _copy

    g_full = _copy.copy(g)
    g_full.sdbg = s_full
    g_full.to_delete = g.to_delete.copy()
    g_full.to_disconnect_fwd = g.to_disconnect_fwd.copy()
    g_full.to_disconnect_rc = g.to_disconnect_rc.copy()
    g_full.changed = g.changed.copy()
    g_cont = _copy.copy(g)
    g_cont.sdbg = s_cont
    g_cont.to_delete = g.to_delete.copy()
    g_cont.to_disconnect_fwd = g.to_disconnect_fwd.copy()
    g_cont.to_disconnect_rc = g.to_disconnect_rc.copy()
    g_cont.changed = g.changed.copy()
    mark_fn(g_full)
    # identical marks on both graphs (mark_fn may be randomized)
    g_cont.to_delete = g_full.to_delete.copy()
    g_cont.to_disconnect_fwd = g_full.to_disconnect_fwd.copy()
    g_cont.to_disconnect_rc = g_full.to_disconnect_rc.copy()

    delete, dfw, drc = ug._classify_marks(g_full)
    ref = ug._refresh_full(g_full, delete, dfw, drc, set_changed)
    delete, dfw, drc = ug._classify_marks(g_cont)
    # skip patterns the dispatcher would route to the full path anyway
    if ((dfw | drc) & (g_cont.is_palindrome | g_cont.is_loop)).any():
        pytest.skip("pattern routed to full rebuild")
    out = ug._refresh_contracted(g_cont, delete, dfw, drc, set_changed)
    _assert_equal_graphs(out, ref)
    return out, ref


@pytest.mark.parametrize("trial", range(12))
def test_random_marks_match_full_rebuild(trial):
    rng = np.random.default_rng(1000 + trial)
    g = _random_graph(n_seqs=10 + trial, k=11 + 2 * (trial % 3))
    if g.size == 0:
        pytest.skip("degenerate")

    def mark(gg):
        v = gg.size
        gg.to_delete |= rng.random(v) < 0.15
        eligible = ~gg.is_palindrome & ~gg.is_loop
        gg.to_disconnect_fwd |= (rng.random(v) < 0.1) & eligible
        gg.to_disconnect_rc |= (rng.random(v) < 0.1) & eligible

    _apply_both(g, mark, set_changed=bool(trial % 2))


def test_chained_refreshes_match(tmp_path):
    """Two rounds of marks: the contracted graph must stay internally
    consistent (nxt/prv/edge_pos are reused by the second round)."""
    rng = np.random.default_rng(5)
    g = _random_graph(n_seqs=20, k=13)

    def mark1(gg):
        v = gg.size
        gg.to_delete |= rng.random(v) < 0.2

    import copy as _copy

    g2c = _copy.copy(g)
    g2c.sdbg = _copy_sdbg(g.sdbg)
    g2f = _copy.copy(g)
    g2f.sdbg = _copy_sdbg(g.sdbg)

    mark1(g2c)
    g2f.to_delete = g2c.to_delete.copy()
    delete, dfw, drc = ug._classify_marks(g2c)
    g2c = ug._refresh_contracted(g2c, delete, dfw, drc, False)
    delete, dfw, drc = ug._classify_marks(g2f)
    g2f = ug._refresh_full(g2f, delete, dfw, drc, False)

    rng2 = np.random.default_rng(6)
    # g2c is slot-space: its alive slots in ascending order correspond
    # 1:1 to g2f's dense rows
    v = g2f.size
    assert g2c.n_alive() == v
    slots = np.flatnonzero(g2c.alive)
    del2 = rng2.random(v) < 0.1
    eligible = ~g2f.is_palindrome & ~g2f.is_loop
    disc2 = (np.random.default_rng(7).random(v) < 0.15) & eligible
    g2f.to_delete |= del2
    g2f.to_disconnect_fwd |= disc2
    g2c.to_delete[slots] |= del2
    g2c.to_disconnect_fwd[slots] |= disc2
    delete, dfw, drc = ug._classify_marks(g2c)
    if ((dfw | drc) & (g2c.is_palindrome | g2c.is_loop)).any():
        pytest.skip("pattern routed to full rebuild")
    out = ug._refresh_contracted(g2c, delete, dfw, drc, True)
    delete, dfw, drc = ug._classify_marks(g2f)
    ref = ug._refresh_full(g2f, delete, dfw, drc, True)
    _assert_equal_graphs(out, ref)


def test_cycle_formation():
    """Deleting the tail of a lollipop can close a cycle; the contracted
    path must produce the same loop vertex as the full rebuild."""
    # circular genome with a linear tail sharing the junction
    circ = RNG.integers(0, 4, size=80).astype(np.uint8)
    k = 11
    genome = np.concatenate([circ, circ[: k + 4]])  # wrap for cycle
    tail = np.concatenate(
        [circ[:20], RNG.integers(0, 4, size=40).astype(np.uint8)]
    )
    flat, starts = packing.pack_many([genome, tail])
    sdbg = build_sdbg(flat, starts, np.ones(2, np.int32), k)
    g = ug.build_unitig_graph(sdbg)
    # delete every vertex not belonging to the circle
    codes_by_v = unitig_codes(g)
    # all rotations of the circle (unitig strings may start anywhere)
    circ2 = packing.decode(np.concatenate([circ, circ, circ]))

    def mark(gg):
        for v in range(gg.size):
            sv = packing.decode(codes_by_v[v])
            rcv = packing.decode(
                packing.revcomp_codes(codes_by_v[v])
            )
            if sv not in circ2 and rcv not in circ2:
                gg.to_delete[v] = True

    out, ref = _apply_both(g, mark, set_changed=False)
    assert out.is_loop.any() == ref.is_loop.any()
