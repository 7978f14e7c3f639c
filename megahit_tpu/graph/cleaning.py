"""Unitig-graph cleaning: tips, bubbles, weak links, low-depth pruning.

Vectorized re-expressions of reference src/assembly/{tip_remover,
bubble_remover, weak_link_remover, low_depth_remover}.cpp. The unitig
graph after collapse is orders of magnitude smaller than the edge graph,
so these run as host numpy frontier passes over (V, 2, 4) neighbour
tables; every pass ends in a full deterministic rebuild (refresh) of the
unitig graph from the updated SdBG validity mask.

The reference's racy `is_changed` shortcut in RemoveLocalLowDepth
(low_depth_remover.cpp:61-66) is replaced by a deterministic two-phase
evaluation with the same fixpoint.
"""

from __future__ import annotations

import numpy as np

from ..core import packing
from ..utils.log import get_logger
from .counter import KMAX_MUL
from .output import unitig_codes
from .sdbg import Sdbg
from .unitig import UnitigGraph, refresh


# ---------------------------------------------------------------------------
# depth inference (reference sdbg_pruning.cpp:36-59 + utils/histgram.h)
# ---------------------------------------------------------------------------


def first_local_minimum(values: np.ndarray, counts: np.ndarray) -> int:
    """Reference Histgram::FirstLocalMinimum (histgram.h:143-156):
    running minimum over increasing keys, stop after 4 rises."""
    if len(values) == 0:
        return 0
    smoothing = 4
    order = np.argsort(values)
    v, c = values[order], counts[order]
    min_i, rises = 0, 0
    for i in range(len(v)):
        if c[i] <= c[min_i]:
            min_i, rises = i, 0
        else:
            rises += 1
            if rises >= smoothing:
                break
    if v[min_i] == v[-1]:
        return 0
    return int(v[min_i])


def _median_from_hist(values, counts):
    total = counts.sum()
    cum = np.cumsum(counts)
    return values[np.searchsorted(cum, (total + 1) // 2)]


def infer_min_depth(sdbg: Sdbg) -> float:
    """Reference sdbg_pruning::InferMinDepth."""
    mult = sdbg.mult[sdbg.valid]
    if len(mult) == 0:
        return 1.0
    values, counts = np.unique(mult, return_counts=True)
    cov = float(first_local_minimum(values, counts))
    v, c = values, counts
    for _ in range(100):
        keep = v >= np.round(cov)  # TrimLow
        v, c = v[keep], c[keep]
        if len(v) == 0:
            return 1.0
        cov1 = float(np.sqrt(_median_from_hist(v, c)))
        if abs(cov - cov1) < 1e-2:
            return cov
        cov = cov1
    get_logger().warning("Cannot detect min depth: unconverged")
    return 1.0


# ---------------------------------------------------------------------------
# neighbour tables
# ---------------------------------------------------------------------------


class NbrTables:
    """(V, 2, 4) successor tables: for each vertex and traversal strand,
    the up-to-4 successor vertices, their entry strands, and presence."""

    def __init__(self, g: UnitigGraph):
        nbr0, str0, pre0 = g.next_vertices(0)
        nbr1, str1, pre1 = g.next_vertices(1)
        self.nbr = np.stack([nbr0, nbr1], axis=1)  # (V,2,4)
        self.strand = np.stack([str0, str1], axis=1)
        self.present = np.stack([pre0, pre1], axis=1)
        self.outdeg = self.present.sum(-1)  # (V,2)

    def indeg(self, strand):
        return self.outdeg[:, 1 - strand]


# ---------------------------------------------------------------------------
# tips (reference tip_remover.cpp:8-53)
# ---------------------------------------------------------------------------


def remove_tips(g: UnitigGraph, max_tip_len: int) -> tuple[UnitigGraph, int]:
    num_removed = 0
    thre = 2
    while thre < max_tip_len:
        t = NbrTables(g)
        ind, outd = t.outdeg[:, 1], t.outdeg[:, 0]
        short = g.length < thre
        avg = g.avg_depth()

        delete = short & g.is_standalone()
        delete |= short & ~g.is_loop & (ind + outd == 0)

        for strand in (0, 1):
            one_out = short & ~g.is_loop & (t.outdeg[:, strand] == 1) & (
                t.outdeg[:, 1 - strand] == 0
            )
            nb = t.nbr[:, strand, :]
            sel = np.where(t.present[:, strand, :], nb, -1).max(-1)
            ok = one_out & (sel >= 0)
            nb_avg = np.where(ok, avg[np.maximum(sel, 0)], 0)
            delete |= ok & (nb_avg > 8 * avg)

        g.to_delete |= delete
        num_removed += int(delete.sum())
        g = refresh(g, set_changed=False)
        thre = min(thre * 2, max_tip_len)
        if thre >= max_tip_len:
            break
    return g, num_removed


# ---------------------------------------------------------------------------
# bubbles (reference bubble_remover.cpp)
# ---------------------------------------------------------------------------


def _banded_similarity(a: str, b: str, min_similarity: float) -> float:
    """Banded edit-distance similarity (reference GetSimilarity,
    bubble_remover.cpp:10-54)."""
    n, m = len(a), len(b)
    max_indel = int(max(n, m) * (1 - min_similarity))
    if abs(n - m) > max_indel or max_indel < 1:
        return 0.0
    width = 2 * max_indel + 1
    big = 0x3F3F3F3F
    prev = np.full(width, big, dtype=np.int64)
    # dp[j - i + max_indel] at row i
    for j in range(0, max_indel + 1):
        prev[j + max_indel] = j
    for i in range(1, n + 1):
        cur = np.full(width, big, dtype=np.int64)
        if i - max_indel <= 0:
            cur[0 - i + max_indel] = i
        jlo = max(i - max_indel, 1)
        jhi = min(m, i + max_indel)
        for j in range(jlo, jhi + 1):
            idx = j - i + max_indel
            best = prev[idx] + (a[i - 1] != b[j - 1])  # diag (j-1, i-1)
            if j > i - max_indel:
                best = min(best, cur[idx - 1] + 1)
            if j < i + max_indel:
                best = min(best, prev[idx + 1] + 1)
            cur[idx] = best
        prev = cur
    return 1 - prev[m - n + max_indel] * 1.0 / max(n, m)


def pop_bubbles(
    g: UnitigGraph,
    max_len: int,
    permanent: bool,
    similarity: float | None = None,
    careful_threshold: float | None = None,
    bubble_records: list | None = None,
) -> tuple[UnitigGraph, int]:
    """One bubble-popping pass over all vertices and strands.

    Bubble shape (reference SearchAndPopBubble, bubble_remover.cpp:58-152):
    left -> {middle_j} -> right where every middle has in/out degree 1,
    length <= max_len; keep the deepest middle, delete the rest.
    similarity: if set, complex-bubble checker (length-similar + banded
    edit similarity >= similarity).
    careful_threshold: if set, record removed branches with depth >=
    threshold * kept depth into bubble_records (the .bubble_seq.fa list).
    """
    t = NbrTables(g)
    avg = g.avg_depth()
    num_removed = 0
    strings_cache: dict[int, str] = {}

    def vstring(v: int, strand: int) -> str:
        if v not in strings_cache:
            strings_cache[v] = packing.decode(unitig_codes(g, [v])[v])
        s = strings_cache[v]
        if strand == 1:
            s = packing.decode(
                packing.revcomp_codes(packing.encode(s))
            )
        return s

    clen = g.contig_len()
    standalone = g.is_standalone()
    candidates = np.flatnonzero(
        (t.outdeg > 1).any(axis=1) & ~g.is_loop & ~standalone
    )

    if len(candidates) and (similarity is not None
                            or careful_threshold is not None):
        # batch-reconstruct every string the scan below could need
        # (candidates + two neighbour hops): per-vertex unitig_codes
        # calls cost O(E) each in full-graph mask building
        hop1 = t.nbr[candidates][t.present[candidates]]
        hop1 = np.unique(hop1[hop1 >= 0])
        hop2 = t.nbr[hop1][t.present[hop1]] if len(hop1) else hop1
        hop2 = np.unique(hop2[hop2 >= 0]) if len(hop1) else hop1
        want = np.unique(np.concatenate([candidates, hop1, hop2]))
        for v, codes in unitig_codes(g, want).items():
            strings_cache[v] = packing.decode(codes)

    for left in candidates:
        left = int(left)
        for lstrand in (0, 1):
            degree = int(t.outdeg[left, lstrand])
            if degree <= 1:
                continue
            mids = t.nbr[left, lstrand]
            mstrs = t.strand[left, lstrand]
            pres = t.present[left, lstrand]
            mid_list = [
                (int(mids[j]), int(mstrs[j]))
                for j in range(4)
                if pres[j]
            ]
            if any(g.length[v] > max_len for v, _ in mid_list):
                continue
            ok = True
            right = None
            for j, (v, s) in enumerate(mid_list):
                if t.outdeg[v, 1 - s] != 1 or t.outdeg[v, s] != 1:
                    ok = False
                    break
                rj = (int(t.nbr[v, s, :].max()),
                      int(t.strand[v, s, np.argmax(t.nbr[v, s, :])]))
                if j == 0:
                    right = rj
                    if right[0] < left or t.outdeg[right[0], 1 - right[1]] \
                            != degree:
                        ok = False
                        break
                elif rj != right:
                    ok = False
                    break
            if not ok:
                continue
            # sort middles by (avg depth desc, id asc)
            mid_list.sort(key=lambda vs: (-avg[vs[0]], vs[0]))
            keep_v = mid_list[0][0]
            if similarity is not None:
                sim_ok = True
                a_len = clen[keep_v]
                sa = vstring(keep_v, mid_list[0][1])
                for v, s in mid_list[1:]:
                    b_len = clen[v]
                    if not (b_len * similarity <= a_len
                            and a_len * similarity <= b_len):
                        sim_ok = False
                        break
                    if _banded_similarity(
                        sa, vstring(v, s), similarity
                    ) < similarity:
                        sim_ok = False
                        break
                if not sim_ok:
                    continue
            careful_any = False
            for v, s in mid_list[1:]:
                if g.to_delete[v]:
                    continue
                g.to_delete[v] = True
                num_removed += 1
                if (careful_threshold is not None
                        and bubble_records is not None
                        and avg[v] >= avg[keep_v] * careful_threshold):
                    bubble_records.append((vstring(v, s), float(avg[v])))
                    careful_any = True
            if careful_any:
                bubble_records.append(
                    (vstring(left, lstrand), float(avg[left]))
                )
                bubble_records.append(
                    (vstring(right[0], right[1]), float(avg[right[0]]))
                )
    g = refresh(g, set_changed=not permanent)
    return g, num_removed


def pop_complex_bubbles(
    g: UnitigGraph,
    merge_level: int,
    similarity: float,
    permanent: bool,
    careful_threshold: float | None = None,
    bubble_records: list | None = None,
) -> tuple[UnitigGraph, int]:
    """Reference ComplexBubbleRemover::PopBubbles
    (bubble_remover.cpp:154-170). Uses the megahit-level k = edge
    length - 1."""
    max_len = int(round(merge_level * (g.k - 1) / similarity))
    if max_len * (1 - similarity) < 1:
        return g, 0
    return pop_bubbles(
        g, max_len, permanent, similarity=similarity,
        careful_threshold=careful_threshold, bubble_records=bubble_records,
    )


# ---------------------------------------------------------------------------
# weak links (reference weak_link_remover.cpp:8-37)
# ---------------------------------------------------------------------------


def disconnect_weak_links(
    g: UnitigGraph, local_ratio: float = 0.1
) -> tuple[UnitigGraph, int]:
    t = NbrTables(g)
    avg = g.avg_depth()
    skip = g.is_standalone() | g.is_palindrome | g.is_loop
    num = 0
    for strand in (0, 1):
        deg = t.outdeg[:, strand]
        act = (~skip) & (deg > 1)
        pres = t.present[:, strand, :] & act[:, None]
        nb = np.maximum(t.nbr[:, strand, :], 0)
        depths = np.where(pres, avg[nb], 0.0)
        total = depths.sum(-1, keepdims=True)
        weak = pres & (depths <= local_ratio * total)
        # mark the neighbour on its ENTRY strand
        for j in range(4):
            sel = weak[:, j]
            if not sel.any():
                continue
            targets = t.nbr[sel, strand, j]
            tstrands = t.strand[sel, strand, j]
            fwd = targets[tstrands == 0]
            rcs = targets[tstrands == 1]
            before = (g.to_disconnect_fwd[fwd].sum()
                      + g.to_disconnect_rc[rcs].sum())
            g.to_disconnect_fwd[fwd] = True
            g.to_disconnect_rc[rcs] = True
            num += len(targets) - int(before)
    g = refresh(g, set_changed=False)
    return g, num


# ---------------------------------------------------------------------------
# low depth (reference low_depth_remover.cpp)
# ---------------------------------------------------------------------------


def _local_depth(g: UnitigGraph, t: NbrTables, local_width: int
                 ) -> np.ndarray:
    """Depth of the neighbourhood of each vertex (LocalDepth,
    low_depth_remover.cpp:10-35), vectorized over all vertices."""
    avg = g.avg_depth()
    total = np.zeros(g.size)
    edges = np.zeros(g.size)
    for strand in (0, 1):
        pres = t.present[:, strand, :]
        nb = np.maximum(t.nbr[:, strand, :], 0)
        ln = np.where(pres, g.length[nb], 0)
        short = ln <= local_width
        contrib_e = np.where(short, ln, local_width) * pres
        contrib_d = np.where(
            short, np.where(pres, g.total_depth[nb], 0),
            avg[nb] * local_width * pres,
        )
        edges += contrib_e.sum(-1)
        total += contrib_d.sum(-1)
    return np.where(edges > 0, total / np.maximum(edges, 1), 0.0)


def remove_local_low_depth(
    g: UnitigGraph,
    min_depth: float,
    max_len: int,
    local_width: int,
    local_ratio: float,
    permanent: bool,
) -> tuple[UnitigGraph, int, bool]:
    t = NbrTables(g)
    ind, outd = t.outdeg[:, 1], t.outdeg[:, 0]
    cand = (~g.is_standalone()) & (g.length <= max_len)
    cand &= ind + outd > 0
    cand &= ((ind <= 1) & (outd <= 1)) | (ind == 0) | (outd == 0)
    mean = _local_depth(g, t, local_width)
    threshold = np.minimum(min_depth, mean * local_ratio)
    depth = g.avg_depth()
    remove = cand & (depth < threshold)
    is_changed = bool((cand & (min_depth < mean * local_ratio)).any()
                      or remove.any())
    n = int(remove.sum())
    if n:
        g.to_delete |= remove
        g = refresh(g, set_changed=not permanent)
    return g, n, is_changed


def iterate_local_low_depth(
    g: UnitigGraph,
    min_depth: float,
    min_len: int,
    local_width: int,
    local_ratio: float,
    permanent: bool,
) -> tuple[UnitigGraph, int]:
    total = 0
    while min_depth < KMAX_MUL:
        g, n, changed = remove_local_low_depth(
            g, min_depth, min_len, local_width, local_ratio, permanent
        )
        if not changed:
            break
        total += n
        min_depth *= 1.1
    return g, total


def remove_low_depth(g: UnitigGraph, min_depth: float
                     ) -> tuple[UnitigGraph, int]:
    remove = g.avg_depth() < min_depth
    n = int(remove.sum())
    if n:
        g.to_delete |= remove
    g = refresh(g, set_changed=False)
    return g, n
