"""Multi-k iteration: seed (k+step+1)-mer edges from reads spanning
contig junctions.

Reference: ContigFlankIndex (src/iterate/contig_flank_index.h) + the
`iterate` subprogram (src/main_iterate.cpp). Semantics: index the first
(k+1)-mer of each contig strand ("flank") together with up to step-1
following bases ("extension") and the contig's multiplicity; scan every
read, marking node positions whose (k+1)-mer is a flank (either strand)
or is validated by a flank's extension; every run of step+1 consecutive
marked positions emits the read's (k+step+1)-mer over that run with the
averaged multiplicity - these junction-spanning edges connect contigs
in the next-k graph.

TPU redesign: flanks live in a sorted multi-word key array; reads are
processed as one dense pool - gather-free (k+1)-mer extraction, batched
binary-search membership, and step-bounded vectorized extension
matching; runs found with one cumulative sum. No hash set, no per-read
loop.

The reference queries the index only at positions not already marked
by a previous extension (a greedy left-to-right skip); this is
reproduced exactly by the host emulation below (:232-251), verified
against a reference edge-file dump - no deviation remains here.

Junction-edge multiplicity is 0, matching the reference exactly: its
FeedBatchContigs receives the contig mul but never stores it
(contig_flank_index.h:64 constructs FlankInfo{ext_seq, ext_len},
zero-initializing .mul), so the windowed average always rounds to 0
(verified against a reference 41.edges.0 dump).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmerops, packing
from ..utils.log import get_logger
from .counter import KMAX_MUL, pack_flat

NULL = np.int32(-1)


@dataclass
class FlankIndex:
    k: int
    step: int
    keys: np.ndarray  # (F, W1) sorted (k+1)-mer keys
    ext_bases: np.ndarray  # (F, step-1) uint8, 255 = unused
    ext_len: np.ndarray  # (F,) int32
    mul: np.ndarray  # (F,) float32

    @property
    def size(self) -> int:
        return len(self.keys)


def build_flank_index(
    contigs: list[np.ndarray],
    muls: list[float] | np.ndarray,
    k: int,
    step: int,
) -> FlankIndex:
    """Index both-strand flank (k+1)-mers of contigs.

    Keeps, per distinct flank k-mer, the longest extension (ties: the
    larger packed extension value - reference FeedBatchContigs,
    contig_flank_index.h:63-74).
    """
    k1 = k + 1
    w = kmerops.words_per_kmer(k1)
    ext_cap = max(step - 1, 1)
    rows_k: list[np.ndarray] = []
    rows_e: list[np.ndarray] = []
    rows_l: list[int] = []
    rows_m: list[float] = []
    for codes, m in zip(contigs, muls):
        L = len(codes)
        if L < k1:
            continue
        for strand in (0, 1):
            s = codes if strand == 0 else packing.revcomp_codes(codes)
            flank = s[:k1]
            rc = packing.revcomp_codes(flank)
            if np.array_equal(flank, rc):
                continue  # palindrome flanks are skipped
            ext_len = min(step - 1, L - k1)
            ext = np.full(ext_cap, 255, dtype=np.uint8)
            ext[:ext_len] = s[k1 : k1 + ext_len]
            rows_k.append(packing.pack_codes(flank)[:w])
            rows_e.append(ext)
            rows_l.append(ext_len)
            rows_m.append(float(m))
            if L == k1:
                break
    if not rows_k:
        return FlankIndex(
            k, step, np.zeros((0, w), np.uint32),
            np.zeros((0, ext_cap), np.uint8), np.zeros(0, np.int32),
            np.zeros(0, np.float32),
        )
    keys = np.stack(rows_k).astype(np.uint32)
    ext_b = np.stack(rows_e)
    ext_l = np.array(rows_l, dtype=np.int32)
    mul = np.array(rows_m, dtype=np.float32)

    # dedup: per key keep (max ext_len, then max packed ext value)
    ext_val = np.zeros(len(keys), dtype=np.uint64)
    for j in range(ext_cap):
        b = np.where(ext_b[:, j] == 255, 0, ext_b[:, j]).astype(np.uint64)
        ext_val |= b << np.uint64(2 * j)
    order = np.lexsort(
        (-ext_val.astype(np.int64), -ext_l,)
        + tuple(keys[:, i] for i in range(w - 1, -1, -1))
    )
    keys, ext_b, ext_l, mul = (
        keys[order], ext_b[order], ext_l[order], mul[order]
    )
    head = np.ones(len(keys), dtype=bool)
    head[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    return FlankIndex(
        k, step, keys[head], ext_b[head], ext_l[head], mul[head]
    )


@functools.partial(jax.jit, static_argnames=("k1",))
def _flank_hits(packed, flank_keys, k1):
    """For the (k+1)-mer at every offset: index row of a forward hit
    and of an rc hit (-1 = none)."""
    kmers = kmerops.extract_all_kmers(packed, k1)
    idx_f, found_f = kmerops.searchsorted_keys(flank_keys, kmers)
    rc = kmerops.revcomp_kmers(kmers, k1)
    idx_r, found_r = kmerops.searchsorted_keys(flank_keys, rc)
    return (
        jnp.where(found_f, idx_f, NULL),
        jnp.where(found_r, idx_r, NULL),
    )


def find_next_kmers(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    index: FlankIndex,
    chunk_bases: int = 1 << 22,
) -> tuple[np.ndarray, np.ndarray]:
    """Scan the read pool against the flank index.

    Returns (keys (M, W2) canonical (k+step+1)-mers deduplicated with
    max multiplicity, muls (M,) int32).
    """
    chunk_bases = max(1 << 16, (chunk_bases + 15) & ~15)
    log = get_logger()
    k, step = index.k, index.step
    k1, k2 = k + 1, k + step + 1
    w2 = kmerops.words_per_kmer(k2)
    n_bases = int(starts[-1])
    if n_bases < k2 or index.size == 0:
        return (np.zeros((0, w2), np.uint32), np.zeros(0, np.int32))

    from .counter import as_pool

    w1 = kmerops.words_per_kmer(k1)
    pool = as_pool(flat_codes)
    packed_np = np.concatenate(
        [pool.window_padded(0, pool.n_words),
         np.zeros(max(w1, w2) + 1, dtype=np.uint32)]
    )
    packed = jnp.asarray(packed_np)
    fkeys = jnp.asarray(index.keys)

    # native rolling-window scan: fwd + rc probes with a bitmap
    # prefilter per position, threaded over read ranges; hits arrive
    # position-sorted (the ascending-hpos invariant the greedy-skip
    # emulation depends on) and window-inside-read by construction
    from ..native import SCAN_BOTH, seed_scan

    scan = seed_scan(packed_np, starts, k1, index.keys, SCAN_BOTH)
    if scan is not None:
        hpos, hrid, hfv, hrv, _ = scan
        hpos = hpos.astype(np.int64)
        hrid = hrid.astype(np.int64)
    else:
        # fallback (no toolchain): chunked device scan, SPARSE from
        # the start - only hit positions leave the chunk loop
        n_dense = (len(packed_np) - w1) * 16
        pos_parts, hf_parts, hr_parts = [], [], []
        for lo in range(0, n_bases, chunk_bases):
            hi = min(n_dense, lo + chunk_bases)
            lo_w = lo // 16
            size = min((hi + 15) // 16 + w1 + 1, len(packed_np)) - lo_w
            sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
            hf, hr = _flank_hits(sub, fkeys, k1)
            hf, hr = np.asarray(hf), np.asarray(hr)
            # clamp to [lo, hi): the word-aligned slice covers up to 16
            # extra positions that belong to the NEXT chunk - emitting
            # them twice would duplicate hit rows and break the
            # ascending-hpos invariant
            span = min(min(hi, n_bases) - lo, len(hf))
            loc = np.flatnonzero((hf[:span] >= 0) | (hr[:span] >= 0))
            pos_parts.append(loc + lo)
            hf_parts.append(hf[loc])
            hr_parts.append(hr[loc])
            if hi >= n_dense:
                break
        hpos = np.concatenate(pos_parts)
        hfv = np.concatenate(hf_parts)
        hrv = np.concatenate(hr_parts)
        # the (k+1)-window must lie inside one read
        hrid = np.searchsorted(starts, hpos, side="right") - 1
        ok = hpos + k1 <= starts[hrid + 1]
        hpos, hfv, hrv, hrid = hpos[ok], hfv[ok], hrv[ok], hrid[ok]

    # NOTE on multiplicity: the reference's flank index never stores
    # the contig mul it is handed (contig_flank_index.h:64 constructs
    # FlankInfo{ext_seq, ext_len}, zero-initializing the .mul field
    # FeedBatchContigs was passed), so its windowed-average formula
    # (contig_flank_index.h:202-209) always rounds to 0 and every
    # junction edge is written with multiplicity 0. We mirror that:
    # junction edges carry mul 0 into seq2sdbg (verified against a
    # reference 41.edges.0 dump - all 305 muls were 0).

    read_start_h = starts[hrid]
    read_end_h = starts[hrid + 1]

    # forward-extension match length per fwd-hit row: m = number of
    # consecutive read bases at p+k1+j equal to the flank's ext base j
    n_hits = len(hpos)
    m_fwd = np.zeros(n_hits, dtype=np.int32)
    rows = np.flatnonzero(hfv >= 0)
    for j in range(step - 1):
        rows = rows[hpos[rows] + k1 + j < read_end_h[rows]]
        if len(rows) == 0:
            break
        h = hfv[rows]
        rows = rows[
            (pool.bases_at(hpos[rows] + k1 + j) == index.ext_bases[h, j])
            & (j < index.ext_len[h])
        ]
        m_fwd[rows] = j + 1

    # the reference scans each read LEFT-TO-RIGHT and skips lookups at
    # positions covered by an earlier forward extension (next_pos
    # advances past matched bases, contig_flank_index.h:113-170); a
    # skipped position's own extensions never run. Emulate the greedy
    # cover exactly: a hit is PERFORMED iff its position is not inside
    # a previously-performed hit's forward-extension jump. (hpos is
    # ascending, so this is a linear pass over the sparse hit rows.)
    performed = np.zeros(n_hits, dtype=bool)
    skip_until = -1
    for r, (p, rs, hf, m) in enumerate(zip(
        hpos.tolist(), read_start_h.tolist(),
        (hfv >= 0).tolist(), m_fwd.tolist(),
    )):
        if rs > skip_until:
            skip_until = -1  # new read resets the jump
        if p <= skip_until:
            continue
        performed[r] = True
        if hf:
            skip_until = p + m

    # marked positions (sparse): performed hits + their extension
    # targets (forward: p+1..p+m; rc: p-1-j for matched prefix bases)
    mark_parts = [hpos[performed]]
    frows0 = np.flatnonzero((hfv >= 0) & performed)
    rrows0 = np.flatnonzero((hrv >= 0) & performed)

    rows = frows0
    for j in range(step - 1):
        rows = rows[hpos[rows] + k1 + j < read_end_h[rows]]
        if len(rows) == 0:
            break
        h = hfv[rows]
        rows = rows[
            (pool.bases_at(hpos[rows] + k1 + j) == index.ext_bases[h, j])
            & (j < index.ext_len[h])
        ]
        tgt = hpos[rows] + j + 1
        mark_parts.append(tgt[tgt + k1 <= read_end_h[rows]])

    rows = rrows0
    for j in range(step - 1):
        rows = rows[hpos[rows] - 1 - j >= read_start_h[rows]]
        if len(rows) == 0:
            break
        h = hrv[rows]
        rows = rows[
            ((3 - pool.bases_at(hpos[rows] - 1 - j)) == index.ext_bases[h, j])
            & (j < index.ext_len[h])
        ]
        mark_parts.append(hpos[rows] - 1 - j)

    marks = np.unique(np.concatenate(mark_parts))
    if len(marks) == 0:
        return (np.zeros((0, w2), np.uint32), np.zeros(0, np.int32))

    # runs of step+1 consecutive marked positions -> emit the read's
    # (k+step+1)-mer at every window covering a full run stretch
    brk = np.flatnonzero(
        np.concatenate([[True], np.diff(marks) != 1])
    )
    run_s = marks[brk]
    run_e = marks[np.concatenate([brk[1:] - 1, [len(marks) - 1]])]
    n_win = run_e - run_s - step + 1  # windows [s, e-step]
    keep = n_win > 0
    run_s, n_win = run_s[keep], n_win[keep]
    if len(run_s) == 0:
        return (np.zeros((0, w2), np.uint32), np.zeros(0, np.int32))
    total = int(n_win.sum())
    a_list = np.repeat(run_s, n_win) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(n_win) - n_win, n_win)
    )
    # the emitted (k2)-window must lie inside one read
    arid = np.searchsorted(starts, a_list, side="right") - 1
    a_list = a_list[a_list + k2 <= starts[arid + 1]]
    if len(a_list) == 0:
        return (np.zeros((0, w2), np.uint32), np.zeros(0, np.int32))
    mul_list = np.zeros(len(a_list), dtype=np.int32)

    # gather + canonicalize the emitted (k2)-mers (emissions are sparse
    # relative to positions: a targeted gather beats dense extraction)
    pos = jnp.asarray(a_list.astype(np.int32))
    keys = kmerops.extract_kmers(packed, pos, k2)
    canon, _ = kmerops.canonical_kmers(keys, k2)
    keys_all = np.asarray(canon)

    order = np.lexsort(
        (-mul_list,) + tuple(keys_all[:, i] for i in range(w2 - 1, -1, -1))
    )
    keys_all, mul_list = keys_all[order], mul_list[order]
    head = np.ones(len(keys_all), dtype=bool)
    head[1:] = (keys_all[1:] != keys_all[:-1]).any(axis=1)
    log.info(
        "iterate k=%d+%d: %d junction windows -> %d distinct edges",
        k, step, len(a_list), int(head.sum()),
    )
    return keys_all[head], mul_list[head]
