"""Unitig graph construction by parallel pointer doubling.

The reference builds unitigs with per-edge try-locks and a spinlocked
vertex vector (src/assembly/unitig_graph.cpp:13-138). On TPU there are no
locks: the simple-path successor relation next[e] (mutual by construction)
makes the valid subgraph a disjoint union of chains and pure cycles, so
list ranking by pointer doubling (log2 E rounds of gathers) yields every
chain's start, end, length and member positions deterministically.

A unitig VERTEX pairs a chain with its reverse-complement chain
(rc image of chain [s..t] is chain [rc(t)..rc(s)]); palindromes are
self-paired; cycles become loop vertices (unitig_graph.cpp:86-123).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.log import get_logger
from .sdbg import Sdbg, simple_path_links

NULL = np.int32(-1)


@functools.partial(jax.jit, static_argnames=("rounds",))
def _list_rank(nxt, prv, rounds: int):
    """Pointer-double both directions.

    Returns (end, dist_to_end, start, pos, min_reach):
      end[e]   = last edge of e's chain (self-stable for cycles)
      start[e] = first edge of e's chain
      pos[e]   = distance from start (undefined for cycles)
      min_reach[e] = min edge index in e's forward orbit (cycle rep)
    """
    e = nxt.shape[0]
    idx = jnp.arange(e, dtype=jnp.int32)
    n = jnp.where(nxt >= 0, nxt, idx)
    p = jnp.where(prv >= 0, prv, idx)
    d_end = (nxt >= 0).astype(jnp.int32)
    d_start = (prv >= 0).astype(jnp.int32)
    mn = idx

    def body(_, state):
        n, p, d_end, d_start, mn = state
        d_end = d_end + d_end[n]
        d_start = d_start + d_start[p]
        mn = jnp.minimum(mn, mn[n])
        n = n[n]
        p = p[p]
        return n, p, d_end, d_start, mn

    n, p, d_end, d_start, mn = jax.lax.fori_loop(
        0, rounds, body, (n, p, d_end, d_start, mn)
    )
    return n, d_end, p, d_start, mn


@dataclass
class UnitigGraph:
    """Struct-of-arrays unitig graph (reference UnitigGraphVertex,
    src/assembly/unitig_graph_vertex.h:17-49)."""

    k: int
    sdbg: Sdbg
    # per-vertex arrays
    start: np.ndarray  # (V,) int32 first edge of forward chain
    end: np.ndarray  # (V,) int32 last edge of forward chain
    rc_start: np.ndarray  # (V,) int32 = rc[end]
    rc_end: np.ndarray  # (V,) int32 = rc[start]
    length: np.ndarray  # (V,) int32 number of edges
    total_depth: np.ndarray  # (V,) int64 sum of member edge multiplicities
    is_loop: np.ndarray  # (V,) bool
    is_palindrome: np.ndarray  # (V,) bool
    # per-edge arrays (over the whole sdbg)
    vid: np.ndarray  # (E,) int32 vertex id of each valid edge (-1 else)
    chain_start: np.ndarray = field(default=None)  # (E,) int32
    edge_pos: np.ndarray = field(default=None)  # (E,) int32 (chains only)
    nxt: np.ndarray = field(default=None)  # (E,) int32 simple-path successor
    # mutable marks
    to_delete: np.ndarray = field(default=None)
    to_disconnect_fwd: np.ndarray = field(default=None)
    to_disconnect_rc: np.ndarray = field(default=None)
    changed: np.ndarray = field(default=None)

    def __post_init__(self):
        v = len(self.start)
        if self.to_delete is None:
            self.to_delete = np.zeros(v, dtype=bool)
        if self.to_disconnect_fwd is None:
            self.to_disconnect_fwd = np.zeros(v, dtype=bool)
        if self.to_disconnect_rc is None:
            self.to_disconnect_rc = np.zeros(v, dtype=bool)
        if self.changed is None:
            self.changed = np.zeros(v, dtype=bool)

    @property
    def size(self) -> int:
        return len(self.start)

    def avg_depth(self) -> np.ndarray:
        return self.total_depth / np.maximum(self.length, 1)

    def contig_len(self) -> np.ndarray:
        """Base-pair length of each unitig string (k + edges - 1)."""
        return self.length + self.k - 1

    # ---------------- neighbour queries (vectorized over all vertices)

    def next_vertices(self, strand: int):
        """For every vertex, its successors when traversed on `strand`
        (0 = forward chain, 1 = rc chain).

        Returns (nbr_vid (V,4), nbr_strand (V,4), present (V,4)):
        candidate j enters neighbour `nbr_vid` in orientation
        `nbr_strand` (0 = its forward chain, 1 = its rc chain).
        """
        s = self.sdbg
        last_edge = self.end if strand == 0 else self.rc_end
        cand = s.oc_t[last_edge]  # (V,4)
        safe = np.maximum(cand, 0)
        present = (cand >= 0) & s.valid[safe]
        nbr = np.where(present, self.vid[safe], NULL)
        # orientation: forward if candidate edge is the neighbour's
        # forward-chain start
        nbr_safe = np.maximum(nbr, 0)
        enter_fwd = safe == self.start[nbr_safe]
        # loops/palindromes: entering edge may be mid-chain; treat as fwd
        nbr_strand = np.where(enter_fwd, 0, 1)
        return nbr, nbr_strand, present

    def in_out_degree(self):
        """(indegree, outdegree) per vertex, forward orientation."""
        _, _, out_present = self.next_vertices(0)
        _, _, in_present = self.next_vertices(1)
        return in_present.sum(-1), out_present.sum(-1)

    def is_standalone(self) -> np.ndarray:
        ind, outd = self.in_out_degree()
        return (~self.is_loop) & (ind == 0) & (outd == 0)


def build_unitig_graph(sdbg: Sdbg) -> UnitigGraph:
    """Assemble all maximal simple paths and loops into a unitig graph."""
    log = get_logger()
    e = sdbg.size
    if e == 0:
        z = np.zeros(0, dtype=np.int32)
        return UnitigGraph(sdbg.k, sdbg, z, z.copy(), z.copy(), z.copy(),
                           z.copy(), np.zeros(0, np.int64),
                           np.zeros(0, bool), np.zeros(0, bool),
                           np.full(0, NULL, np.int32),
                           chain_start=z.copy(), edge_pos=z.copy(),
                           nxt=z.copy())

    valid = jnp.asarray(sdbg.valid)
    nxt, prv = simple_path_links(
        jnp.asarray(sdbg.oc_t), jnp.asarray(sdbg.ic_t),
        jnp.asarray(sdbg.oc_s), jnp.asarray(sdbg.ic_s), valid
    )
    rounds = max(1, int(np.ceil(np.log2(max(e, 2)))))
    end, d_end, start, pos, mn = _list_rank(nxt, prv, rounds)
    nxt = np.asarray(nxt)
    prv = np.asarray(prv)
    end = np.asarray(end)
    start = np.asarray(start)
    pos = np.asarray(pos)
    mn = np.asarray(mn)
    validn = sdbg.valid

    # cycles: chains whose "end" still has a successor
    in_cycle = validn & (nxt[end] >= 0)
    chain_start = np.where(in_cycle, mn, start).astype(np.int32)
    chain_end_arr = np.where(in_cycle, prv[mn], end).astype(np.int32)

    # one representative row per chain: the chain-start edge
    is_rep = validn & (chain_start == np.arange(e, dtype=np.int32))
    rep_idx = np.flatnonzero(is_rep).astype(np.int32)  # chain list

    # aggregates per chain via bincount keyed by chain_start
    seg = chain_start[validn]
    length_per_start = np.bincount(seg, minlength=e).astype(np.int64)
    depth_per_start = np.bincount(
        seg, weights=sdbg.mult[validn], minlength=e
    ).astype(np.int64)

    c_start = rep_idx
    c_end = chain_end_arr[rep_idx]
    c_loop = in_cycle[rep_idx]
    c_len = length_per_start[rep_idx]
    c_depth = depth_per_start[rep_idx]

    # pair chains with their rc chains: rc image of chain [s..t] is the
    # chain containing rc(t); use that chain's canonical start so cycles
    # pair by their min-index representative.
    pair_start = chain_start[sdbg.rc[c_end]]
    # canonical keep rule: start <= rc-chain-start (palindrome: equal)
    keep = c_start <= pair_start
    v_start = c_start[keep]
    v_end = c_end[keep]
    v_pair_start = pair_start[keep]
    v_rc_start = sdbg.rc[v_end]  # traversal anchor for the rc strand
    v_rc_end = sdbg.rc[v_start]
    v_len = c_len[keep].astype(np.int32)
    v_depth = c_depth[keep]
    v_loop = c_loop[keep]
    v_pal = v_start == v_pair_start

    # per-edge vertex id: row index by canonical chain start (both chains)
    row_of_start = np.full(e, NULL, dtype=np.int32)
    row_of_start[v_start] = np.arange(len(v_start), dtype=np.int32)
    row_of_start[v_pair_start] = np.arange(len(v_start), dtype=np.int32)
    vid = np.full(e, NULL, dtype=np.int32)
    vid[validn] = row_of_start[chain_start[validn]]

    g = UnitigGraph(
        sdbg.k, sdbg, v_start.astype(np.int32), v_end.astype(np.int32),
        v_rc_start.astype(np.int32), v_rc_end.astype(np.int32),
        v_len, v_depth, v_loop, v_pal, vid,
        chain_start=chain_start, edge_pos=pos.astype(np.int32), nxt=nxt,
    )
    log.debug(
        "unitig graph: %d vertices (%d loops, %d palindromes) from %d edges",
        g.size, int(v_loop.sum()), int(v_pal.sum()), int(validn.sum()),
    )
    return g


# ---------------------------------------------------------------------------
# refresh = apply marks to the sdbg, then rebuild
# ---------------------------------------------------------------------------


def refresh(graph: UnitigGraph, set_changed: bool = False) -> UnitigGraph:
    """Apply to_delete / to_disconnect marks to the underlying SdBG and
    rebuild the unitig graph (reference UnitigGraph::Refresh,
    unitig_graph.cpp:210-355, redesigned as a full deterministic rebuild).
    """
    s = graph.sdbg
    if not (graph.to_delete.any() or graph.to_disconnect_fwd.any()
            or graph.to_disconnect_rc.any()):
        # nothing marked: the rebuild would reproduce this graph
        # exactly (and `changed` is already correct for both modes) -
        # skip the full pointer-doubling rebuild
        return graph
    # weak-link disconnect: drop the first edge of the marked strand
    # (reference RefreshDisconnected, unitig_graph.cpp:141-208)
    n_marks = (graph.to_disconnect_fwd.astype(int)
               + graph.to_disconnect_rc.astype(int))
    kill_whole = (~graph.to_delete) & (n_marks > 0) & (
        graph.length <= n_marks
    )
    disc_fwd = graph.to_disconnect_fwd & ~graph.to_delete & ~kill_whole
    disc_rc = graph.to_disconnect_rc & ~graph.to_delete & ~kill_whole

    kill_edges = np.zeros(s.size, dtype=bool)
    if disc_fwd.any():
        kill_edges[graph.start[disc_fwd]] = True
    if disc_rc.any():
        kill_edges[graph.rc_start[disc_rc]] = True

    # full deletions
    delete = graph.to_delete | kill_whole
    if delete.any():
        member = (graph.vid >= 0) & delete[np.maximum(graph.vid, 0)]
        kill_edges |= member

    old_changed_vid = None
    if set_changed:
        old_changed_vid = (graph.vid.copy(), graph.changed.copy(),
                           graph.length.copy())

    if kill_edges.any():
        s.invalidate(kill_edges)
    g2 = build_unitig_graph(s)

    # changed tracking: a new vertex is "changed" if it is not identical
    # (same edge membership) to an old unchanged vertex
    old_vid = graph.vid
    old_len = graph.length
    new_first_old = np.where(
        g2.start >= 0, old_vid[g2.start], NULL
    )
    same = (new_first_old >= 0) & (
        old_len[np.maximum(new_first_old, 0)] == g2.length
    )
    # also verify the end edge belonged to the same old vertex
    same &= old_vid[g2.end] == new_first_old
    prev_changed = np.zeros(g2.size, dtype=bool)
    if graph.changed.any():
        ok = new_first_old >= 0
        prev_changed[ok] = graph.changed[new_first_old[ok]]
    if set_changed:
        g2.changed = (~same) | prev_changed
    else:
        g2.changed = same & prev_changed
    return g2
