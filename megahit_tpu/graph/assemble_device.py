"""Device-resident unitig-graph cleaning (VERDICT r3 item 3).

The host cleaning passes (graph/cleaning.py) are numpy frontier sweeps
over (V, 2, 4) tables with a host refresh between passes - fine on the
CPU backend, but a TPU-backend assemble would ping-pong V- and E-sized
arrays through the host on every pass. This module keeps the WHOLE
cleaning loop on device: the SdBG navigation core (run_start /
nxt_link / rc / ref_rank / mult) uploads once, every mark kernel and
every refresh is a jitted pass over device arrays, and per-pass host
traffic is scalars (mark counts) plus the tiny per-instance payloads
of careful-bubble records. One download at output time materializes
the host UnitigGraph.

Semantics are the host path's, bit for bit (asserted by the parity
tests in tests/test_device_cleaning.py, which force this path on the
CPU backend):

- refresh reproduces the reference Refresh's STABLE slot semantics
  (unitig_graph.cpp:210-355 at -t 1, see unitig._reference_order): a
  merged chain claims the slot of its min-old-slot end vertex oriented
  so that vertex is the head (ties: the disconnect-adjusted stored
  start edge, then the flip of the ref_rank build orientation); a
  cycle claims its min-old-slot member's slot anchored at that
  member's adjusted begin edge.
- tie-breaks in the mark kernels use the same canonical EDGE ids
  (min(ref_rank[start], ref_rank[rc_start])) as the host passes.

Precision note: per-chain depth accumulates and is stored in int32 on
device (jax x64 is disabled); sums are exact below 2^31. Per-edge mult
caps at KMAX_MUL=65535, so overflow needs a single chain with >2^15
max-mult edges; pipeline.assemble guards the sound sufficient condition
(total valid multiplicity < 2^31 implies every partial chain sum fits)
and falls back to host cleaning otherwise. Mark kernels cast depth to
float32 only at the point of ratio/threshold math, matching the host
path's float comparisons.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .sdbg import Sdbg
from .unitig import NULL, UnitigGraph

I32 = jnp.int32


def use_device_cleaning() -> bool:
    """Device path when the backend is an accelerator on a co-located
    (latency-cheap) link; override with MEGAHIT_TPU_DEVICE_CLEAN=1/0
    (tests force 1 on the CPU backend). Cleaning is latency-bound
    (many small dispatches), so a remote/tunneled device - hundreds of
    ms per round trip - routes to the host engine instead
    (utils/devlink.py); throughput stages are unaffected."""
    env = os.environ.get("MEGAHIT_TPU_DEVICE_CLEAN")
    if env is not None:
        return env == "1"
    if jax.default_backend() == "cpu":
        return False
    from ..utils.devlink import latency_bound_link

    return not latency_bound_link()


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DevStatic:
    """Per-SdBG immutable device arrays (uploaded once)."""

    run_start: jnp.ndarray  # (E,) i32
    nxt_link: jnp.ndarray   # (E,) i32
    rc: jnp.ndarray         # (E,) i32
    ref_rank: jnp.ndarray   # (E,) i32
    mult: jnp.ndarray       # (E,) i32
    last_base: jnp.ndarray  # (E,) u8  (last char of each edge key)
    e: int                  # real edge count
    rounds: int             # pointer-doubling rounds = ceil(log2 E)
    k: int                  # EDGE length (megahit k + 1)


@dataclass(frozen=True)
class DevState:
    """Mutable graph state, all on device."""

    valid: jnp.ndarray        # (E,) bool
    vid: jnp.ndarray          # (E,) i32 slot of each edge's vertex
    nxt: jnp.ndarray          # (E,) i32 simple-path successor
    prv: jnp.ndarray          # (E,) i32
    chain_start: jnp.ndarray  # (E,) i32
    edge_pos: jnp.ndarray     # (E,) i32
    # vertex arrays, slot-indexed at fixed capacity Vc
    start: jnp.ndarray        # (Vc,) i32
    end: jnp.ndarray          # (Vc,) i32
    length: jnp.ndarray       # (Vc,) i32
    depth: jnp.ndarray        # (Vc,) i32 total depth (exact < 2^31)
    is_loop: jnp.ndarray      # (Vc,) bool
    is_pal: jnp.ndarray       # (Vc,) bool
    alive: jnp.ndarray        # (Vc,) bool
    changed: jnp.ndarray      # (Vc,) bool


_STATE_FIELDS = ("valid", "vid", "nxt", "prv", "chain_start",
                 "edge_pos", "start", "end", "length", "depth",
                 "is_loop", "is_pal", "alive", "changed")

jax.tree_util.register_pytree_node(
    DevState,
    lambda s: (tuple(getattr(s, f) for f in _STATE_FIELDS), None),
    lambda _, ch: DevState(*ch),
)


def _upload_static(sdbg: Sdbg, put=jnp.asarray) -> DevStatic:
    from .output import _last_base

    e = sdbg.size
    return DevStatic(
        run_start=put(sdbg.run_start.astype(np.int32)),
        nxt_link=put(sdbg.nxt_link.astype(np.int32)),
        rc=put(sdbg.rc.astype(np.int32)),
        ref_rank=put(sdbg.ref_rank.astype(np.int32)),
        mult=put(sdbg.mult.astype(np.int32)),
        last_base=put(_last_base(sdbg.keys, sdbg.k)),
        e=e,
        rounds=max(1, int(np.ceil(np.log2(max(e, 2))))),
        k=sdbg.k,
    )


def _upload_state(g: UnitigGraph, vc: int, put=jnp.asarray) -> DevState:
    def vpad(a, fill, dtype):
        out = np.full(vc, fill, dtype)
        out[: g.size] = a
        return put(out)

    return DevState(
        valid=put(np.asarray(g.sdbg.valid)),
        vid=put(g.vid.astype(np.int32)),
        nxt=put(g.nxt.astype(np.int32)),
        prv=put(g.prv.astype(np.int32)),
        chain_start=put(g.chain_start.astype(np.int32)),
        edge_pos=put(g.edge_pos.astype(np.int32)),
        start=vpad(g.start, 0, np.int32),
        end=vpad(g.end, 0, np.int32),
        length=vpad(g.length, 0, np.int32),
        depth=vpad(g.total_depth.astype(np.int32), 0, np.int32),
        is_loop=vpad(g.is_loop, False, bool),
        is_pal=vpad(g.is_palindrome, False, bool),
        alive=vpad(g.alive, False, bool),
        changed=vpad(g.changed, False, bool),
    )


# ---------------------------------------------------------------------------
# jitted navigation helpers
# ---------------------------------------------------------------------------


def _run4_dev(starts, run_start, valid, e: int):
    """(N,) run-start rows -> ((N,4) rows, (N,4) present): the <= 4
    consecutive members of each run that are valid (sdbg._run4 +
    validity)."""
    safe = jnp.maximum(starts, 0)
    idx = safe[:, None] + jnp.arange(4, dtype=I32)[None, :]
    clip = jnp.minimum(idx, e - 1)
    ok = (starts >= 0)[:, None] & (idx < e) \
        & (run_start[clip] == safe[:, None]) & valid[clip]
    return clip, ok


def _nbr_tables(st: DevStatic, valid, vid, vstart, last0, last1, alive):
    """Successor tables for both traversal strands: (Vc,2,4) neighbour
    slots / entry strands / presence (unitig.next_vertices)."""
    out = []
    for last in (last0, last1):
        cand, ok = _run4_dev(st.nxt_link[jnp.maximum(last, 0)],
                             st.run_start, valid, st.e)
        ok &= alive[:, None]
        nbr = jnp.where(ok, vid[cand], NULL)
        nbr_safe = jnp.maximum(nbr, 0)
        enter_fwd = cand == vstart[nbr_safe]
        strand = jnp.where(enter_fwd, 0, 1).astype(jnp.int8)
        out.append((nbr, strand, ok))
    nbr = jnp.stack([out[0][0], out[1][0]], axis=1)     # (Vc,2,4)
    strand = jnp.stack([out[0][1], out[1][1]], axis=1)
    present = jnp.stack([out[0][2], out[1][2]], axis=1)
    return nbr, strand, present


@functools.partial(jax.jit, static_argnames=("e",))
def _tables_jit(run_start, nxt_link, valid, vid, vstart, end0, end1,
                alive, e: int):
    st = DevStatic(run_start, nxt_link, None, None, None, None, e, 0, 0)
    return _nbr_tables(st, valid, vid, vstart, end0, end1, alive)


# ---------------------------------------------------------------------------
# jitted refresh (kill edges -> rebuild -> reference slot order)
# ---------------------------------------------------------------------------


def _list_rank_dev(nxt, prv, rounds: int):
    e = nxt.shape[0]
    idx = jnp.arange(e, dtype=I32)
    n = jnp.where(nxt >= 0, nxt, idx)
    p = jnp.where(prv >= 0, prv, idx)
    d_end = (nxt >= 0).astype(I32)
    d_start = (prv >= 0).astype(I32)
    mn = idx

    def body(_, s):
        n, p, d_end, d_start, mn = s
        return (n[n], p[p], d_end + d_end[n], d_start + d_start[p],
                jnp.minimum(mn, mn[n]))

    n, p, d_end, d_start, mn = jax.lax.fori_loop(
        0, rounds, body, (n, p, d_end, d_start, mn))
    return n, d_end, p, d_start, mn


def _simple_links_dev(st: DevStatic, valid):
    from .sdbg import simple_path_links

    return simple_path_links(st.run_start, st.nxt_link, st.rc, valid)


@functools.partial(
    jax.jit, static_argnames=("e", "rounds", "vc", "set_changed"))
def _refresh_jit(run_start, nxt_link, rc, ref_rank, mult,
                 valid, vid_old, nxt_old, start_old, end_old,
                 length_old, depth_old, loop_old, pal_old, alive_old,
                 changed_old,
                 to_delete, to_dfwd, to_drc,
                 e: int, rounds: int, vc: int, set_changed: bool):
    """Apply marks, rebuild chains, restore reference slot semantics.

    Mirrors unitig._refresh_full + _reference_order + _propagate_changed
    exactly (the full-rebuild path; the host contracted path is
    byte-equivalent to it by round-3's tests)."""
    st = DevStatic(run_start, nxt_link, rc, ref_rank, mult, None,
                   e, rounds, 0)
    idx = jnp.arange(e, dtype=I32)
    vidx = jnp.arange(vc, dtype=I32)

    # ---- classify marks (unitig._classify_marks)
    n_marks = to_dfwd.astype(I32) + to_drc.astype(I32)
    kill_whole = (~to_delete) & (n_marks > 0) & (length_old <= n_marks)
    delete = (to_delete | kill_whole) & alive_old
    disc_f = to_dfwd & ~to_delete & ~kill_whole & alive_old
    disc_r = to_drc & ~to_delete & ~kill_whole & alive_old

    # ---- kill edges (unitig._kill_edge_indices)
    kill = jnp.zeros(e + 1, dtype=bool)
    kill = kill.at[jnp.where(disc_f, start_old, e)].set(True)
    rc_start_old = rc[jnp.maximum(end_old, 0)]  # rc chain start
    kill = kill.at[jnp.where(disc_r, rc_start_old, e)].set(True)
    kill = kill[:e]
    member_del = (vid_old >= 0) & delete[jnp.maximum(vid_old, 0)]
    kill |= member_del
    kill |= kill[rc]
    valid_new = valid & ~kill

    # ---- rebuild chains
    nxt, prv = _simple_links_dev(st, valid_new)
    endr, d_end, startr, d_start, mn = _list_rank_dev(nxt, prv, rounds)
    in_cycle = valid_new & (nxt[endr] >= 0)
    chain_start = jnp.where(in_cycle, mn, startr).astype(I32)
    chain_end = jnp.where(in_cycle, prv[mn], endr).astype(I32)
    pos = d_start

    seg = jnp.where(valid_new, chain_start, e)
    len_per_start = jnp.zeros(e + 1, I32).at[seg].add(1)[:e]
    dep_per_start = jnp.zeros(e + 1, I32).at[seg].add(mult)[:e]

    # disconnect-adjusted old start per old slot (_reference_order)
    adj_start = jnp.where(
        disc_f, nxt_old[jnp.maximum(start_old, 0)], start_old
    ).astype(I32)

    is_rep = valid_new & (chain_start == idx)

    # per-chain min old slot (for cycles; h/t for chains)
    vid_seg = jnp.where(valid_new & (vid_old >= 0), vid_old, vc)
    mslot = jnp.full(e + 1, vc, I32).at[seg].min(vid_seg)[:e]

    h = vid_old[idx]                         # old slot of first edge
    t = vid_old[jnp.maximum(chain_end, 0)]   # old slot of last edge
    pair_start = chain_start[rc[jnp.maximum(chain_end, 0)]]

    # chain orientation winner (see module docstring): min-old-slot
    # head; tie: adjusted start edge; tie: flip of the ref_rank build
    # orientation
    r2_is_adj = pair_start == adj_start[jnp.maximum(h, 0)]
    self_is_adj = idx == adj_start[jnp.maximum(h, 0)]
    build_flip = ref_rank[jnp.maximum(chain_end, 0)] \
        > ref_rank[rc[idx]]
    win_chain = (h < t) | (
        (h == t) & (self_is_adj | (~r2_is_adj & build_flip))
    )
    # palindrome (pair == self): single rep, wins
    is_self_pair = pair_start == idx
    win_chain |= is_self_pair

    # cycle winner: the strand cycle containing the min-slot member's
    # adjusted start edge, anchored there
    cyc_anchor = adj_start[jnp.maximum(mslot, 0)]
    win_cycle = chain_start[jnp.maximum(cyc_anchor, 0)] == idx

    win = is_rep & jnp.where(in_cycle, win_cycle, win_chain)
    slot = jnp.where(in_cycle, mslot, jnp.minimum(h, t))

    new_start = jnp.where(in_cycle, cyc_anchor, idx).astype(I32)
    new_end = jnp.where(
        in_cycle, prv[jnp.maximum(cyc_anchor, 0)], chain_end
    ).astype(I32)

    # ---- scatter winners into vertex slots (slot-space: dead slots
    # keep stale values); writes ride a vc+1 pad row for masked rows
    wslot = jnp.where(win, slot, vc)
    alive_new = jnp.zeros(vc + 1, bool).at[wslot].set(True)[:vc]

    def scat2(base, val, fill):
        padded = jnp.concatenate(
            [base, jnp.full((1,), fill, base.dtype)])
        return padded.at[wslot].set(
            jnp.where(win, val, padded[wslot]))[:vc]

    start_new = scat2(start_old, new_start, 0)
    end_new = scat2(end_old, new_end, 0)
    length_new = scat2(length_old, len_per_start, 0)
    depth_new = scat2(depth_old, dep_per_start, 0)
    loop_new = scat2(loop_old, in_cycle, False)
    pal_new = scat2(pal_old, is_self_pair, False)

    # ---- changed propagation (_propagate_changed)
    nfo = vid_old[jnp.maximum(new_start, 0)]
    same = (nfo >= 0) \
        & (length_old[jnp.maximum(nfo, 0)] == len_per_start) \
        & (vid_old[jnp.maximum(new_end, 0)] == nfo)
    prev_changed = (nfo >= 0) & changed_old[jnp.maximum(nfo, 0)]
    if set_changed:
        ch_val = (~same) | prev_changed
    else:
        ch_val = same & prev_changed
    changed_new = scat2(changed_old, ch_val, False)

    # ---- per-edge vid
    slot_of_start = jnp.full(e + 1, NULL, I32)
    slot_of_start = slot_of_start.at[jnp.where(win, idx, e)].set(
        jnp.where(win, slot, NULL))
    slot_of_start = slot_of_start.at[
        jnp.where(win, pair_start, e)].set(jnp.where(win, slot, NULL))
    vid_new = jnp.where(
        valid_new, slot_of_start[jnp.minimum(chain_start, e - 1)], NULL
    ).astype(I32)

    return DevState(
        valid=valid_new, vid=vid_new, nxt=nxt, prv=prv,
        chain_start=chain_start, edge_pos=pos,
        start=start_new, end=end_new, length=length_new,
        depth=depth_new, is_loop=loop_new, is_pal=pal_new,
        alive=alive_new, changed=changed_new,
    )


# ---------------------------------------------------------------------------
# jitted mark kernels (translations of graph/cleaning.py, same
# tie-breaks; each returns mark masks + a scalar count)
# ---------------------------------------------------------------------------


def _degrees(present):
    return present.sum(-1)  # (Vc, 2)


@functools.partial(jax.jit, static_argnames=("e",))
def _tips_marks_jit(run_start, nxt_link, valid, vid, vstart, end0,
                    end1, alive, length, depth, is_loop, thre, e: int):
    """cleaning.remove_tips body for one threshold."""
    depth = depth.astype(jnp.float32)
    st = DevStatic(run_start, nxt_link, None, None, None, None, e, 0, 0)
    nbr, _, present = _nbr_tables(st, valid, vid, vstart, end0, end1,
                                  alive)
    outdeg = _degrees(present)
    ind, outd = outdeg[:, 1], outdeg[:, 0]
    short = (length < thre) & alive
    avg = depth / jnp.maximum(length, 1)
    delete = short & ~is_loop & (ind + outd == 0)
    for strand in (0, 1):
        one_out = short & ~is_loop & (outdeg[:, strand] == 1) & (
            outdeg[:, 1 - strand] == 0)
        nb = nbr[:, strand, :]
        sel = jnp.max(jnp.where(present[:, strand, :], nb, -1), -1)
        ok = one_out & (sel >= 0)
        nb_avg = jnp.where(ok, avg[jnp.maximum(sel, 0)], 0)
        delete |= ok & (nb_avg > 8 * avg)
    return delete, delete.sum()


@functools.partial(jax.jit, static_argnames=("e", "vc"))
def _weak_marks_jit(run_start, nxt_link, valid, vid, vstart, end0,
                    end1, alive, depth, length, is_loop, is_pal,
                    local_ratio, e: int, vc: int):
    """cleaning.disconnect_weak_links marks."""
    depth = depth.astype(jnp.float32)
    st = DevStatic(run_start, nxt_link, None, None, None, None, e, 0, 0)
    nbr, nstr, present = _nbr_tables(st, valid, vid, vstart, end0,
                                     end1, alive)
    outdeg = _degrees(present)
    standalone = (~is_loop) & (outdeg[:, 0] == 0) & (outdeg[:, 1] == 0)
    skip = standalone | is_pal | is_loop
    avg = depth / jnp.maximum(length, 1)
    dfwd = jnp.zeros(vc + 1, bool)
    drc = jnp.zeros(vc + 1, bool)
    # num reproduces the HOST counting exactly (cleaning.py
    # disconnect_weak_links): each (strand, j) batch adds its selected
    # entries minus those whose target was already marked BEFORE the
    # batch - duplicates within one batch count multiply, as in the
    # host's len(targets) - before
    num = jnp.int32(0)
    for strand in (0, 1):
        deg = outdeg[:, strand]
        act = (~skip) & (deg > 1) & alive
        pres = present[:, strand, :] & act[:, None]
        nb = jnp.maximum(nbr[:, strand, :], 0)
        depths = jnp.where(pres, avg[nb], 0.0)
        total = depths.sum(-1, keepdims=True)
        weak = pres & (depths <= local_ratio * total)
        for j in range(4):
            sel = weak[:, j]
            tgt = nbr[:, strand, j]
            ts = nstr[:, strand, j]
            m0 = sel & (ts == 0)
            m1 = sel & (ts == 1)
            safe_t = jnp.maximum(tgt, 0)
            before = (m0 & dfwd[safe_t]).sum() \
                + (m1 & drc[safe_t]).sum()
            num += (m0.sum() + m1.sum() - before).astype(jnp.int32)
            dfwd = dfwd.at[jnp.where(m0, tgt, vc)].set(True)
            drc = drc.at[jnp.where(m1, tgt, vc)].set(True)
    dfwd, drc = dfwd[:vc], drc[:vc]
    return dfwd, drc, num


@functools.partial(jax.jit, static_argnames=("e",))
def _lld_marks_jit(run_start, nxt_link, valid, vid, vstart, end0,
                   end1, alive, depth, length, is_loop,
                   min_depth, max_len, local_width, local_ratio,
                   e: int):
    """cleaning.remove_local_low_depth marks + is_changed."""
    depth = depth.astype(jnp.float32)
    st = DevStatic(run_start, nxt_link, None, None, None, None, e, 0, 0)
    nbr, _, present = _nbr_tables(st, valid, vid, vstart, end0, end1,
                                  alive)
    outdeg = _degrees(present)
    ind, outd = outdeg[:, 1], outdeg[:, 0]
    standalone = (~is_loop) & (ind == 0) & (outd == 0)
    cand = alive & (~standalone) & (length <= max_len)
    cand &= ind + outd > 0
    cand &= ((ind <= 1) & (outd <= 1)) | (ind == 0) | (outd == 0)
    avg = depth / jnp.maximum(length, 1)
    # _local_depth
    total = jnp.zeros(length.shape[0], jnp.float32)
    edges = jnp.zeros(length.shape[0], jnp.float32)
    for strand in (0, 1):
        pres = present[:, strand, :]
        nb = jnp.maximum(nbr[:, strand, :], 0)
        ln = jnp.where(pres, length[nb], 0)
        short = ln <= local_width
        contrib_e = jnp.where(short, ln, local_width) * pres
        contrib_d = jnp.where(
            short, jnp.where(pres, depth[nb], 0),
            avg[nb] * local_width * pres)
        edges += contrib_e.sum(-1)
        total += contrib_d.sum(-1)
    mean = jnp.where(edges > 0, total / jnp.maximum(edges, 1), 0.0)
    threshold = jnp.minimum(min_depth, mean * local_ratio)
    remove = cand & (avg < threshold)
    is_changed = (cand & (min_depth < mean * local_ratio)).any() \
        | remove.any()
    return remove, remove.sum(), is_changed


@jax.jit
def _low_depth_marks_jit(alive, depth, length, min_depth):
    avg = depth.astype(jnp.float32) / jnp.maximum(length, 1)
    remove = (avg < min_depth) & alive
    return remove, remove.sum()


@functools.partial(jax.jit, static_argnames=("e",))
def _bubble_shape_jit(run_start, nxt_link, rc, ref_rank, valid, vid,
                      vstart, vend, end0, end1, alive, length, depth,
                      is_loop, max_len, e: int):
    """cleaning._find_bubble_instances, both strands at once.

    Returns per-(vertex, strand): ok, right slot, right strand, and
    the (4,) middle slots / strands / presence SORTED by the
    reference keep order (avg depth desc, canonical edge id asc)."""
    depth = depth.astype(jnp.float32)
    st = DevStatic(run_start, nxt_link, None, None, None, None, e, 0, 0)
    nbr, nstr, present = _nbr_tables(st, valid, vid, vstart, end0,
                                     end1, alive)
    outdeg = _degrees(present)
    standalone = (~is_loop) & (outdeg[:, 0] == 0) & (outdeg[:, 1] == 0)
    base = (outdeg > 1).any(axis=1) & ~is_loop & ~standalone & alive
    avg = depth / jnp.maximum(length, 1)
    rr = ref_rank
    cid = jnp.minimum(
        rr[jnp.maximum(vstart, 0)],
        rr[rc[jnp.maximum(vend, 0)]],
    ).astype(I32)

    oks, rights, rstrands, midss, mstrss, presss = [], [], [], [], [], []
    for strand in (0, 1):
        degree = outdeg[:, strand]
        active = base & (degree > 1)
        mids = nbr[:, strand]
        mstr = nstr[:, strand]
        pres = present[:, strand]
        safe = jnp.maximum(mids, 0)
        ok = active & ~(pres & (length[safe] > max_len)).any(axis=1)
        od_fwd = jnp.take_along_axis(
            outdeg[safe], mstr[..., None].astype(I32), axis=2)[..., 0]
        od_rev = jnp.take_along_axis(
            outdeg[safe], (1 - mstr)[..., None].astype(I32),
            axis=2)[..., 0]
        ok &= ~(pres & ((od_fwd != 1) | (od_rev != 1))).any(axis=1)

        r_nbr = jnp.take_along_axis(
            nbr[safe],
            mstr[..., None, None].astype(I32).repeat(4, -1),
            axis=2)[:, :, 0, :]
        r_str = jnp.take_along_axis(
            nstr[safe],
            mstr[..., None, None].astype(I32).repeat(4, -1),
            axis=2)[:, :, 0, :]
        rv = r_nbr.max(-1)
        rs = jnp.take_along_axis(
            r_str, r_nbr.argmax(-1)[..., None], axis=-1)[..., 0]
        first_slot = pres.argmax(axis=1)
        rv0 = jnp.take_along_axis(rv, first_slot[:, None], 1)[:, 0]
        rs0 = jnp.take_along_axis(rs, first_slot[:, None], 1)[:, 0]
        ok &= ~(pres & ((rv != rv0[:, None]) | (rs != rs0[:, None]))
                ).any(axis=1)
        safe_r = jnp.maximum(rv0, 0)
        r_deg = jnp.take_along_axis(
            outdeg[safe_r], (1 - rs0)[:, None].astype(I32), 1)[:, 0]
        ok &= (rv0 >= 0) & (cid[safe_r] >= cid) & (r_deg == degree)

        # sort middles by (avg desc, cid asc); absents last
        safe2 = jnp.maximum(mids, 0)
        avgm = jnp.where(pres, avg[safe2], -jnp.inf)
        midv = jnp.where(pres, cid[safe2], jnp.iinfo(jnp.int32).max)
        order = jnp.lexsort((midv, -avgm), axis=1)
        midss.append(jnp.take_along_axis(mids, order, 1))
        mstrss.append(jnp.take_along_axis(mstr, order, 1))
        presss.append(jnp.take_along_axis(pres, order, 1))
        oks.append(ok)
        rights.append(rv0)
        rstrands.append(rs0)
    return (jnp.stack(oks, 1), jnp.stack(rights, 1),
            jnp.stack(rstrands, 1), jnp.stack(midss, 1),
            jnp.stack(mstrss, 1), jnp.stack(presss, 1), avg, cid)


@functools.partial(jax.jit, static_argnames=("vc",))
def _naive_bubble_marks_jit(ok2, mids2, pres2, vc: int):
    """Union of non-keep present middles over all instances (order-free:
    marking is a monotone set union; the host's sequential scan order
    only affects record emission, which the naive path has none of)."""
    tgt = jnp.where(ok2[:, :, None] & pres2[:, :, 1:],
                    mids2[:, :, 1:], vc)
    return jnp.zeros(vc + 1, bool).at[tgt.reshape(-1)].set(True)[:vc]


@functools.partial(jax.jit, static_argnames=("lmax",))
def _walk_tails_jit(nxt, last_base, starts, lens, lmax: int):
    """(P,) chain start edges -> (P, lmax) tail bases: base j is the
    last char of the (j+1)-th edge (unitig_codes tail semantics; also
    correct for loop vertices, whose nxt cycle is intact)."""
    p = starts.shape[0]
    out = jnp.zeros((p, lmax), jnp.uint8)

    def body(j, carry):
        cur, out = carry
        cur2 = jnp.where(j < lens - 1, nxt[jnp.maximum(cur, 0)], cur)
        out = out.at[:, j].set(last_base[jnp.maximum(cur2, 0)])
        return cur2, out

    _, out = jax.lax.fori_loop(0, lmax, body, (starts, out))
    return out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class DeviceCleaner:
    """Holds the device state and runs cleaning passes.

    Mirrors the graph/cleaning.py API; construct from a freshly built
    host graph (the initial build + reference ordering happen once on
    host), then every pass is device-side.
    """

    def __init__(self, g: UnitigGraph, mesh=None):
        self.sdbg = g.sdbg
        self.k = g.k  # megahit-k + 1 (edge length)
        self.vc = max(16, 1 << int(np.ceil(np.log2(max(g.size, 2)))))
        # mesh-sharded cleaning (VERDICT r4 item 1): E- and Vc-sized
        # arrays shard over the mesh's one axis; every kernel is jit
        # over sharded operands, so XLA's partitioner runs the
        # elementwise mark math shard-local and inserts collectives
        # for the cross-shard gathers/scatters (the scaling-book
        # recipe: annotate shardings, let XLA place collectives).
        # Depth sums are int32 scatter-adds - order-free, so results
        # stay byte-identical to single-device execution.
        self.mesh = None
        if mesh is not None:
            nd = mesh.size
            if (nd > 1 and self.sdbg.size % nd == 0
                    and self.vc % nd == 0 and self.sdbg.size >= nd):
                self.mesh = mesh
        if self.mesh is not None:
            from jax.sharding import PartitionSpec

            from ..parallel.multihost import put_global

            spec = PartitionSpec(self.mesh.axis_names[0])

            def put(a):
                return put_global(np.asarray(a), self.mesh, spec)
        else:
            put = jnp.asarray
        self.static = _upload_static(g.sdbg, put)
        self.state = _upload_state(g, self.vc, put)
        self._host_graph_template = g

    # -- helpers ----------------------------------------------------

    def _vstart(self):
        return self.state.start

    def _ends(self):
        s = self.state
        st = self.static
        end0 = s.end
        end1 = st.rc[jnp.maximum(s.start, 0)]  # rc_end = rc[start]
        return end0, end1

    def tables(self):
        s, st = self.state, self.static
        end0, end1 = self._ends()
        return _tables_jit(st.run_start, st.nxt_link, s.valid, s.vid,
                           s.start, end0, end1, s.alive, st.e)

    def _refresh(self, to_delete, to_dfwd, to_drc, set_changed: bool):
        s, st = self.state, self.static
        self.state = _refresh_jit(
            st.run_start, st.nxt_link, st.rc, st.ref_rank, st.mult,
            s.valid, s.vid, s.nxt, s.start, s.end, s.length, s.depth,
            s.is_loop, s.is_pal, s.alive, s.changed,
            to_delete, to_dfwd, to_drc,
            e=st.e, rounds=st.rounds, vc=self.vc,
            set_changed=set_changed,
        )

    # -- cleaning passes (graph/cleaning.py API) --------------------

    def _zeros_v(self):
        return jnp.zeros(self.vc, bool)

    def remove_tips(self, max_tip_len: int) -> int:
        s, st = self.state, self.static
        num = 0
        thre = 2
        while thre < max_tip_len:
            s = self.state
            end0, end1 = self._ends()
            delete, n = _tips_marks_jit(
                st.run_start, st.nxt_link, s.valid, s.vid, s.start,
                end0, end1, s.alive, s.length, s.depth, s.is_loop,
                jnp.int32(thre), st.e)
            n = int(n)
            num += n
            if n:
                self._refresh(delete, self._zeros_v(), self._zeros_v(),
                              set_changed=False)
            thre = min(thre * 2, max_tip_len)
            if thre >= max_tip_len:
                break
        return num

    def disconnect_weak_links(self, local_ratio: float = 0.1) -> int:
        s, st = self.state, self.static
        end0, end1 = self._ends()
        dfwd, drc, n = _weak_marks_jit(
            st.run_start, st.nxt_link, s.valid, s.vid, s.start,
            end0, end1, s.alive, s.depth, s.length, s.is_loop,
            s.is_pal, jnp.float32(local_ratio), st.e, self.vc)
        n = int(n)
        if n:
            self._refresh(self._zeros_v(), dfwd, drc,
                          set_changed=False)
        return n

    def remove_local_low_depth(self, min_depth: float, max_len: int,
                               local_width: int, local_ratio: float,
                               permanent: bool) -> tuple[int, bool]:
        s, st = self.state, self.static
        end0, end1 = self._ends()
        remove, n, is_changed = _lld_marks_jit(
            st.run_start, st.nxt_link, s.valid, s.vid, s.start,
            end0, end1, s.alive, s.depth, s.length, s.is_loop,
            jnp.float32(min_depth), jnp.int32(max_len),
            jnp.int32(local_width), jnp.float32(local_ratio), st.e)
        n = int(n)
        if n:
            self._refresh(remove, self._zeros_v(), self._zeros_v(),
                          set_changed=not permanent)
        return n, bool(is_changed)

    def iterate_local_low_depth(self, min_depth: float, min_len: int,
                                local_width: int, local_ratio: float,
                                permanent: bool) -> int:
        from .counter import KMAX_MUL

        total = 0
        while min_depth < KMAX_MUL:
            n, changed = self.remove_local_low_depth(
                min_depth, min_len, local_width, local_ratio, permanent)
            if not changed:
                break
            total += n
            min_depth *= 1.1
        return total

    def remove_low_depth(self, min_depth: float) -> int:
        s = self.state
        remove, n = _low_depth_marks_jit(
            s.alive, s.depth, s.length, jnp.float32(min_depth))
        n = int(n)
        # host path always refreshes here (set_changed=False), but
        # refresh with no marks is the identity
        if n:
            self._refresh(remove, self._zeros_v(), self._zeros_v(),
                          set_changed=False)
        return n

    # -- bubbles ----------------------------------------------------

    def _vertex_codes(self, vs: np.ndarray) -> list[np.ndarray]:
        """Host base codes of the given vertex slots (forward chain
        orientation), via a device chain walk (O(P * Lmax) device work,
        small downloads only)."""
        s, st = self.state, self.static
        if len(vs) == 0:
            return []
        start = np.asarray(s.start)[vs].astype(np.int32)
        lens = np.asarray(s.length)[vs].astype(np.int32)
        k = st.k
        lmax = max(int(lens.max()) - 1, 1)
        lmax = 1 << int(np.ceil(np.log2(max(lmax, 1))))  # compile reuse
        p = 1 << int(np.ceil(np.log2(max(len(vs), 1))))
        starts_p = np.zeros(p, np.int32)
        starts_p[: len(vs)] = start
        lens_p = np.zeros(p, np.int32)
        lens_p[: len(vs)] = lens
        tails = np.asarray(_walk_tails_jit(
            s.nxt, st.last_base, jnp.asarray(starts_p),
            jnp.asarray(lens_p), lmax))
        from ..core import packing

        heads = self.sdbg.keys[start]  # (P0, W) host gather, small
        out = []
        for i in range(len(vs)):
            head = packing.unpack_words(heads[i], k)
            out.append(np.concatenate(
                [head, tails[i, : lens[i] - 1]]).astype(np.uint8))
        return out

    def pop_bubbles(self, max_len: int, permanent: bool,
                    similarity: float | None = None,
                    careful_threshold: float | None = None,
                    bubble_records: list | None = None) -> int:
        from ..core import packing

        s, st = self.state, self.static
        end0, end1 = self._ends()
        ok2, right2, rstr2, mids2, mstr2, pres2, avg_d, cid_d = \
            _bubble_shape_jit(
                st.run_start, st.nxt_link, st.rc, st.ref_rank,
                s.valid, s.vid, s.start, s.end, end0, end1, s.alive,
                s.length, s.depth, s.is_loop, jnp.int32(max_len), st.e)

        need_host = (similarity is not None
                     or careful_threshold is not None)
        ok2_np = np.asarray(ok2)  # (Vc, 2) bool download
        n_inst = int(ok2_np.sum())
        if n_inst == 0:
            # host path refreshes with set_changed=not permanent even
            # with no instances; no marks -> identity, but changed
            # semantics: host refresh() with no marks returns graph
            # unchanged, so nothing to do
            return 0

        if not need_host:
            # fully device marking: union of non-keep present middles
            delete = _naive_bubble_marks_jit(ok2, mids2, pres2, self.vc)
            n = int(delete.sum())
            if n:
                self._refresh(delete, self._zeros_v(), self._zeros_v(),
                              set_changed=not permanent)
            return n

        # host sequential part over the (small) instance list, in the
        # reference scan order (left slot asc, strand asc)
        lv, sv = np.nonzero(ok2_np)
        order = np.lexsort((sv, lv))
        lv, sv = lv[order], sv[order]
        mids = np.asarray(mids2)[lv, sv]     # (I, 4)
        mstrs = np.asarray(mstr2)[lv, sv]
        press = np.asarray(pres2)[lv, sv]
        rights = np.asarray(right2)[lv, sv]
        rstrs = np.asarray(rstr2)[lv, sv]
        avg = np.asarray(avg_d)
        length = np.asarray(s.length)
        is_loop_v = np.asarray(s.is_loop)
        rr_start = np.asarray(st.ref_rank)[np.asarray(s.start)]
        rr_rcs = np.asarray(st.ref_rank)[
            np.asarray(st.rc)[np.asarray(s.end)]]
        clen = length + self.k - 1
        keeps = mids[:, 0]

        # batch-extract every string the pass could need
        used = np.unique(np.concatenate(
            [lv, rights, mids[press]]).astype(np.int64))
        codes_of = dict(zip(used.tolist(), self._vertex_codes(used)))

        def vstring(v, strand):
            c = codes_of[int(v)]
            if strand == 1:
                c = packing.revcomp_codes(c)
            return c

        sim_ok = np.ones(len(lv), dtype=bool)
        if similarity is not None:
            from .cleaning import banded_similarity_batch

            pair_i, pair_a, pair_b = [], [], []
            for i in range(len(lv)):
                a_len = clen[keeps[i]]
                for j in range(1, 4):
                    if not press[i, j]:
                        continue
                    v = mids[i, j]
                    b_len = clen[v]
                    if not (b_len * similarity <= a_len
                            and a_len * similarity <= b_len):
                        sim_ok[i] = False
                        break
                    pair_i.append(i)
                    pair_a.append(vstring(keeps[i], mstrs[i, 0]))
                    pair_b.append(vstring(v, mstrs[i, j]))
            if pair_i:
                sims = banded_similarity_batch(pair_a, pair_b,
                                               similarity)
                bad = sims < similarity
                for idx2, i in enumerate(pair_i):
                    if bad[idx2]:
                        sim_ok[i] = False

        flip = rr_rcs < rr_start

        def cstring(v):
            return packing.decode(vstring(v, 1 if flip[v] else 0))

        marked = np.zeros(self.vc, dtype=bool)
        num_removed = 0
        for i in range(len(lv)):
            if not sim_ok[i]:
                continue
            keep_v = int(keeps[i])
            careful_any = False
            for j in range(1, 4):
                if not press[i, j]:
                    continue
                v = int(mids[i, j])
                if not marked[v]:
                    marked[v] = True
                    num_removed += 1
                if (careful_threshold is not None
                        and bubble_records is not None
                        and avg[v] >= avg[keep_v] * careful_threshold):
                    bubble_records.append((cstring(v), float(avg[v])))
                    careful_any = True
            if careful_any:
                bubble_records.append(
                    (cstring(int(lv[i])), float(avg[lv[i]])))
                bubble_records.append(
                    (cstring(int(rights[i])), float(avg[rights[i]])))
        if num_removed:
            self._refresh(jnp.asarray(marked), self._zeros_v(),
                          self._zeros_v(), set_changed=not permanent)
        return num_removed

    def pop_complex_bubbles(self, merge_level: int, similarity: float,
                            permanent: bool,
                            careful_threshold: float | None = None,
                            bubble_records: list | None = None) -> int:
        max_len = int(round(merge_level * (self.k - 1) / similarity))
        if max_len * (1 - similarity) < 1:
            return 0
        return self.pop_bubbles(
            max_len, permanent, similarity=similarity,
            careful_threshold=careful_threshold,
            bubble_records=bubble_records)

    def to_host(self) -> UnitigGraph:
        """Materialize the host UnitigGraph (and sync sdbg validity)."""
        s = self.state
        g0 = self._host_graph_template
        valid = np.asarray(s.valid)
        sdbg = self.sdbg
        sdbg.valid = valid.copy()
        sdbg._rvc = None
        vc = self.vc
        start = np.asarray(s.start).astype(np.int32)
        end = np.asarray(s.end).astype(np.int32)
        g = UnitigGraph(
            g0.k, sdbg,
            start, end,
            sdbg.rc[end].astype(np.int32),
            sdbg.rc[start].astype(np.int32),
            np.asarray(s.length).astype(np.int32),
            np.asarray(s.depth).astype(np.int64),
            np.asarray(s.is_loop), np.asarray(s.is_pal),
            np.asarray(s.vid).astype(np.int32),
            chain_start=np.asarray(s.chain_start).astype(np.int32),
            edge_pos=np.asarray(s.edge_pos).astype(np.int32),
            nxt=np.asarray(s.nxt).astype(np.int32),
            prv=np.asarray(s.prv).astype(np.int32),
        )
        g.alive = np.asarray(s.alive)
        g.changed = np.asarray(s.changed)
        # slot-space arrays are Vc-capacity; host consumers mask alive
        return g
