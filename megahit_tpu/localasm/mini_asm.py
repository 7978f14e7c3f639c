"""Batched multi-k mini-assembly for local (gap-filling) assembly.

Reference: the embedded single-threaded IDBA subsystem
(src/idba/hash_graph.cpp Assemble, contig_graph.cpp RemoveDeadEnd /
RemoveBubble / IterateCoverage) run once per contig end
(src/localasm/local_assemble.cpp LaunchIDBA, k = 11..41 step 6).

TPU redesign: instead of thousands of tiny sequential hash-graph runs,
ALL contig-end read groups are assembled together in ONE graph per k:
every (k+1)-mer key is prefixed with one uint32 group-id word, so
groups stay disconnected inside a single sorted key array, and the
existing unitig/cleaning machinery (pointer doubling, frontier passes)
runs on the union. The group word rides along as 16 phantom bases -
base arithmetic in neighbour queries is offset by 16.

Cleaning per k (IDBA semantics): dead-end trimming with doubling
length schedule (Trim, contig_graph.cpp:91-123), naive bubble popping
(RemoveBubble ~ lens bubbles of branch length <= k+2), then escalating
low-coverage removal against a per-group threshold = the coverage
histogram percentile 1 - local_range/num_vertices (LaunchIDBA,
local_assemble.cpp:56-58; IterateCoverage factor 1.1).
"""

from __future__ import annotations

import numpy as np

from ..core import kmerops, packing
from ..graph import cleaning
from ..graph.counter import pack_flat, window_valid_mask
from ..graph.sdbg import NULL, Sdbg
from ..graph.unitig import UnitigGraph, build_unitig_graph, refresh
from ..utils.log import get_logger

import jax
import jax.numpy as jnp

GROUP_BASES = 16  # one uint32 word of group id = 16 phantom bases


def _grouped_neighbor_tables(full_keys: np.ndarray, k: int):
    """rc + 4 candidate tables for keys laid out as
    [group_word | kmer_words], matching only within the same group
    (the shared sort-join with one group word)."""
    from ..graph.sdbg import _neighbor_tables

    rc_idx, oc_t, ic_t, oc_s, ic_s = _neighbor_tables(
        jnp.asarray(full_keys), k, n_group_words=1
    )
    return (np.asarray(rc_idx), np.asarray(oc_t), np.asarray(ic_t),
            np.asarray(oc_s), np.asarray(ic_s))


def grouped_sdbg(
    group_ids: np.ndarray, keys: np.ndarray, counts: np.ndarray, k: int
) -> Sdbg:
    """Build one Sdbg over many disconnected per-group subgraphs.

    keys: (N, W) canonical k-mers (deduplicated per group), counts: per
    key. The stored Sdbg has k_fat = k + 16 with the group id occupying
    the first 16 phantom bases (unitig reconstruction strips them)."""
    w = keys.shape[1] if keys.ndim == 2 else kmerops.words_per_kmer(k)
    if len(keys) == 0:
        z4 = np.zeros((0, 4), dtype=np.int32)
        return Sdbg(k + GROUP_BASES, np.zeros((0, w + 1), np.uint32),
                    np.zeros(0, np.int32), np.zeros(0, np.int32),
                    z4, z4.copy(), z4.copy(), z4.copy(),
                    np.zeros(0, bool))
    rc = np.asarray(kmerops.revcomp_kmers(jnp.asarray(keys), k))
    both_g = np.concatenate([group_ids, group_ids]).astype(np.uint32)
    both_k = np.concatenate([keys, rc], axis=0)
    both_m = np.concatenate([counts, counts]).astype(np.int32)
    full = np.concatenate([both_g[:, None], both_k], axis=1)

    order = np.lexsort(tuple(full[:, i] for i in range(w, -1, -1)))
    full, both_m = full[order], both_m[order]
    head = np.ones(len(full), dtype=bool)
    head[1:] = (full[1:] != full[:-1]).any(axis=1)
    gid = np.cumsum(head) - 1
    gmax = np.zeros(head.sum(), dtype=np.int64)
    np.maximum.at(gmax, gid, both_m)
    edges = full[head]
    mult = gmax.astype(np.int32)

    rc_idx, oc_t, ic_t, oc_s, ic_s = _grouped_neighbor_tables(edges, k)
    assert (rc_idx >= 0).all()

    # pad to power-of-two capacity with inert rows (compile reuse
    # across refreshes; see graph.sdbg._finalize_sdbg)
    from ..graph.counter import _pow2_pad

    e = len(edges)
    cap = _pow2_pad(max(e, 16))
    padn = cap - e

    def padi(a, fill):
        return np.concatenate(
            [a, np.full((padn,) + a.shape[1:], fill, a.dtype)]
        ) if padn else a

    keys_p = padi(edges, 0xFFFFFFFF)
    rc_p = np.concatenate(
        [rc_idx, np.arange(e, cap, dtype=rc_idx.dtype)]
    ) if padn else rc_idx
    return Sdbg(
        k=k + GROUP_BASES, keys=keys_p, mult=padi(mult, 0), rc=rc_p,
        oc_t=padi(oc_t, np.int32(NULL)), ic_t=padi(ic_t, np.int32(NULL)),
        oc_s=padi(oc_s, np.int32(NULL)), ic_s=padi(ic_s, np.int32(NULL)),
        valid=np.concatenate([np.ones(e, bool), np.zeros(padn, bool)]),
    )


def _count_group_kmers(
    groups_reads: list[list[np.ndarray]], k1: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(group_ids, canonical keys, counts) over all groups' reads."""
    seqs: list[np.ndarray] = []
    gid_of_seq: list[int] = []
    for g, reads in enumerate(groups_reads):
        for r in reads:
            if len(r) >= k1:
                seqs.append(r)
                gid_of_seq.append(g)
    w = kmerops.words_per_kmer(k1)
    if not seqs:
        return (np.zeros(0, np.uint32), np.zeros((0, w), np.uint32),
                np.zeros(0, np.int32))
    flat, starts = packing.pack_many(seqs)
    n_bases = int(starts[-1])
    packed = np.concatenate([pack_flat(flat), np.zeros(w + 1, np.uint32)])
    keys = np.asarray(
        kmerops.extract_all_kmers(jnp.asarray(packed), k1)
    )[:n_bases]
    canon, _ = kmerops.canonical_kmers(jnp.asarray(keys), k1)
    canon = np.asarray(canon)
    vm = window_valid_mask(starts, k1, n_bases)
    lengths = np.diff(starts)
    gid_at = np.repeat(np.array(gid_of_seq, np.int64), lengths)
    canon, gid_at = canon[vm], gid_at[vm]

    full = np.concatenate(
        [gid_at[:, None].astype(np.uint32), canon], axis=1
    )
    order = np.lexsort(tuple(full[:, i] for i in range(w, -1, -1)))
    full = full[order]
    head = np.ones(len(full), dtype=bool)
    head[1:] = (full[1:] != full[:-1]).any(axis=1)
    seg = np.cumsum(head) - 1
    counts = np.bincount(seg).astype(np.int32)
    return (full[head][:, 0], full[head][:, 1:], counts)


def _vertex_groups(g: UnitigGraph) -> np.ndarray:
    """Group id of each unitig = group word of its first edge key."""
    if g.size == 0:
        return np.zeros(0, np.int64)
    return g.sdbg.keys[g.start, 0].astype(np.int64)


def _trim_dead_ends(g: UnitigGraph, min_len: int) -> UnitigGraph:
    """IDBA RemoveDeadEnd (contig_graph.cpp:91-123): doubling schedule
    of Trim(l) = remove unitigs with a free end, total degree <= 1 and
    length (edges) < l; palindromic single-k vertices are kept."""
    def trim(graph: UnitigGraph, L: int) -> UnitigGraph:
        t = cleaning.NbrTables(graph)
        ind, outd = t.outdeg[:, 1], t.outdeg[:, 0]
        kill = (
            ((ind == 0) | (outd == 0))
            & (ind + outd <= 1)
            & (graph.length < L)
            & ~(graph.is_palindrome & (graph.length == 1))
        )
        if kill.any():
            graph.to_delete |= kill
            graph = refresh(graph)
        return graph

    L = 1
    while L != min_len:
        L = min(2 * L, min_len)
        g = trim(g, L)
    return trim(g, min_len)


def _remove_low_coverage_grouped(
    g: UnitigGraph, thresholds: np.ndarray, min_len: int
) -> UnitigGraph:
    """IDBA IterateCoverage (contig_graph.cpp:184-216): escalate
    min_cover from 1 by x1.1 up to each group's threshold, removing
    short weakly-connected unitigs below it."""
    cover = 1.0
    max_thr = float(thresholds.max()) if len(thresholds) else 0.0
    while cover < max_thr:
        vg = _vertex_groups(g)
        thr = np.minimum(cover, thresholds[vg]) if g.size else np.zeros(0)
        t = cleaning.NbrTables(g)
        ind, outd = t.outdeg[:, 1], t.outdeg[:, 0]
        weak = ((ind <= 1) & (outd <= 1)) | (ind == 0) | (outd == 0)
        kill = weak & (g.length < min_len) & (g.avg_depth() < thr)
        if kill.any():
            g.to_delete |= kill
            g = refresh(g)
        cover *= 1.1
    return g


def mini_assemble(
    groups_reads: list[list[np.ndarray]],
    contig_ends: list[np.ndarray],
    mink: int = 11,
    maxk: int = 41,
    step: int = 6,
) -> dict[int, list[np.ndarray]]:
    """Assemble each group's reads + its contig end; returns
    {group: [contig codes]} (reference LaunchIDBA,
    local_assemble.cpp:28-81)."""
    log = get_logger()
    n_groups = len(groups_reads)
    out: dict[int, list[np.ndarray]] = {g: [] for g in range(n_groups)}
    if n_groups == 0:
        return out
    max_read_len = max(
        (len(r) for reads in groups_reads for r in reads), default=0
    )
    active = np.ones(n_groups, dtype=bool)

    for k in range(mink, min(maxk, max_read_len) + 1, step):
        k1 = k + 1
        gi, keys, counts = _count_group_kmers(
            [reads if active[g] else [] for g, reads in
             enumerate(groups_reads)], k1
        )
        if len(keys) == 0:
            break
        # per-group coverage threshold from the reads-only histogram
        n_vert = np.bincount(gi.astype(np.int64), minlength=n_groups)
        thresholds = np.zeros(n_groups)
        for g in range(n_groups):
            if n_vert[g] == 0:
                continue
            cnts = np.sort(counts[gi == g])
            lr = len(contig_ends[g])
            q = max(0.0, 1.0 - lr / n_vert[g])
            thresholds[g] = cnts[min(int(q * len(cnts)), len(cnts) - 1)]

        # contig end + previous round contigs join the edge set
        extra_g, extra_k, extra_c = _count_group_kmers(
            [([contig_ends[g]] + out[g]) if active[g] else []
             for g in range(n_groups)], k1
        )
        gi = np.concatenate([gi, extra_g])
        keys = np.concatenate([keys, extra_k], axis=0)
        counts = np.concatenate([counts, extra_c])

        sdbg = grouped_sdbg(gi, keys, counts, k1)
        g = build_unitig_graph(sdbg)
        g = _trim_dead_ends(g, 2 * k)
        g, _ = cleaning.pop_bubbles(g, k + 2, permanent=True)
        g = _remove_low_coverage_grouped(g, thresholds, 2 * k)

        # harvest contigs per group
        from ..graph.output import unitig_codes

        codes = unitig_codes(g)
        vg = _vertex_groups(g)
        for grp in range(n_groups):
            if active[grp]:
                out[grp] = []
        for v, c in codes.items():
            grp = int(vg[v])
            if active[grp]:
                out[grp].append(c[GROUP_BASES:])
        for grp in range(n_groups):
            if active[grp] and len(out[grp]) == 1:
                active[grp] = False  # converged (LaunchIDBA early break)
    log.info(
        "mini-assembly: %d groups, %d contigs",
        n_groups, sum(len(v) for v in out.values()),
    )
    return out
