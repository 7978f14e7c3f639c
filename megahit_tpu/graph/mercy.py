"""Mercy k-mer rescue.

Reference semantics (SeqToSdbg::GenMercyEdges, seq_to_sdbg.cpp:171-357):
for every candidate read, each node position i (k-mer = read[i:i+k]) is
flagged has_in if some solid edge ends with that k-mer (any c: c+kmer
solid) and has_out if some solid edge starts with it (any c: kmer+c
solid). Scanning left to right, a maximal run of positions between the
latest in-only position `a` and the next position `b` carrying a flag,
with status(b) = out-only, donates the read's (k+1)-mers at windows
[a, b) as multiplicity-1 "mercy" edges - rescuing single-coverage gaps
bridged by real reads.

TPU redesign: instead of per-read binary searches with early-exit
canonical tricks, all node k-mers of all reads are extracted densely
(gather-free), the 8 neighbour-membership queries run as batched
multi-word binary searches over the sorted solid-edge array, and the
gap state machine becomes two prefix scans + a range paint on host.

Deviation (documented): the reference pre-filters candidate reads using
per-edge-occurrence prev/next-char tallies gathered during counting
(kmer_counter.cpp:283-369). We scan all reads; the flag/gap logic is
identical, so the emitted mercy set is the same superset the filter was
approximating (the filter only skips reads that cannot produce gaps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmerops
from ..utils.log import get_logger
from .counter import pack_flat, window_valid_mask


@functools.partial(jax.jit, static_argnames=("k", "k1"))
def _neighbor_flags(packed, solid_keys, k, k1):
    """has_in/has_out for the k-mer at every base offset of `packed`
    (device path for k > 31: 8 canonical membership queries)."""
    kmers = kmerops.extract_all_kmers(packed, k)
    q = kmers.shape[0]
    has_in = jnp.zeros(q, dtype=bool)
    has_out = jnp.zeros(q, dtype=bool)
    for c in range(4):
        q_in, _ = kmerops.canonical_kmers(
            kmerops.prepend_base(kmers, c, k1), k1
        )
        q_out, _ = kmerops.canonical_kmers(
            kmerops.mask_tail(kmerops.set_base(kmers, k, c), k1), k1
        )
        _, f_in = kmerops.searchsorted_keys(solid_keys, q_in)
        _, f_out = kmerops.searchsorted_keys(solid_keys, q_out)
        has_in = has_in | f_in
        has_out = has_out | f_out
    return has_in, has_out


def _node_sets_u64(solid_keys: np.ndarray, k1: int):
    """Union table of the k-prefixes and k-suffixes of both strands of
    the solid edge set, with a per-row 2-bit flag (1 = prefix, 2 =
    suffix). has_out(kmer) == flag bit 1 (some solid edge starts with
    it); has_in(kmer) == flag bit 2. ONE binary search + one flag
    gather per query replaces both the 8-canonical-candidate scheme
    and separate prefix/suffix searches - and the queries need no
    canonicalization at all."""
    import jax.numpy as jnp

    k = k1 - 1
    keys = jnp.asarray(solid_keys)
    both = jnp.concatenate([keys, kmerops.revcomp_kmers(keys, k1)], axis=0)
    prefixes = kmerops.mask_tail(both, k)
    suffixes = kmerops.mask_tail(kmerops.drop_first_base(both, k1), k)
    p = np.unique(kmerops.keys_to_u64(np.asarray(prefixes), k))
    s = np.unique(kmerops.keys_to_u64(np.asarray(suffixes), k))
    table = np.unique(np.concatenate([p, s]))
    flags = np.zeros(len(table), dtype=np.uint8)
    flags[np.searchsorted(table, p)] |= 1
    flags[np.searchsorted(table, s)] |= 2
    return table, flags


def _flags_mt(table: np.ndarray, flags: np.ndarray, q: np.ndarray,
              pool) -> np.ndarray:
    """Per-query node flags: flags[idx] where table[idx] == q, else 0
    (multithreaded over query slices)."""
    n = len(q)
    out = np.zeros(n, dtype=np.uint8)
    if len(table) == 0 or n == 0:
        return out

    def one(sl):
        i = np.searchsorted(table, q[sl])
        i = np.minimum(i, len(table) - 1)
        return sl, np.where(table[i] == q[sl], flags[i], 0)

    from ..utils.threads import num_threads

    parts = max(1, min(8, num_threads(), n // (1 << 18)))
    if parts == 1 or pool is None:
        sl = slice(0, n)
        _, out[sl] = one(sl)
        return out
    step = -(-n // parts)
    for sl, f in pool.map(
        one, [slice(a, min(n, a + step)) for a in range(0, n, step)]
    ):
        out[sl] = f
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _extract_u64le(packed, k):
    """All k-mers as little-endian (N, 2) u32 pairs [low, high]; the
    host views the fetched buffer as uint64 at zero cost (k <= 32)."""
    kmers = kmerops.extract_all_kmers(packed, k)
    hi = kmers[:, 0]
    lo = kmers[:, 1] if kmers.shape[1] > 1 else jnp.zeros_like(hi)
    return jnp.stack([lo, hi], axis=-1)


def _flags_host_u64(
    packed, packed_np, solid_keys, k, k1, n_bases, chunk_bases
):
    """Host fast path (k <= 31): dense k-mers -> u64 -> np.searchsorted
    membership in the prefix/suffix node sets."""
    from concurrent.futures import ThreadPoolExecutor

    table, tflags = _node_sets_u64(solid_keys, k1)
    w = kmerops.words_per_kmer(k1)
    has_in = np.zeros(n_bases, dtype=bool)
    has_out = np.zeros(n_bases, dtype=bool)
    n_dense = (len(packed_np) - w) * 16
    from ..utils.threads import num_threads

    with ThreadPoolExecutor(max_workers=min(8, num_threads())) as pool:
        for lo in range(0, n_bases, chunk_bases):
            hi = min(n_dense, lo + chunk_bases)
            lo_w = lo // 16
            size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
            sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
            pairs = np.ascontiguousarray(_extract_u64le(sub, k))
            u = pairs.view(np.uint64).ravel()
            span = min(min(hi, n_bases) - lo, len(u))
            f = _flags_mt(table, tflags, u[:span], pool)
            has_out[lo : lo + span] = (f & 1) != 0
            has_in[lo : lo + span] = (f & 2) != 0
            if hi >= n_dense:
                break
    return has_in, has_out


def _candidate_reads(packed, packed_np, rare_keys, k1, starts,
                     valid_all, chunk_bases, pool) -> np.ndarray:
    """Reads containing at least one NON-solid (k1)-window.

    A fully-solid read cannot host a mercy gap (every interior node has
    both flags; the final in-only node has nothing after it), so these
    are exactly the reads worth scanning - the exact version of the
    reference's candidate-read tracking (kmer_counter.cpp:307-369)."""
    n_reads = len(starts) - 1
    cand = np.zeros(n_reads, dtype=bool)
    if len(rare_keys) == 0:
        return cand
    from ..native import SCAN_CANON, seed_scan

    scan = seed_scan(packed_np, starts, k1, rare_keys, SCAN_CANON)
    if scan is not None:
        _, rid, _, _, _ = scan
        cand[rid] = True
        return cand
    rare_u64 = kmerops.keys_to_u64(rare_keys, k1)
    w = kmerops.words_per_kmer(k1)
    n_bases = int(starts[-1])
    n_dense = (len(packed_np) - w) * 16
    for lo in range(0, n_bases, chunk_bases):
        hi = min(n_dense, lo + chunk_bases)
        lo_w = lo // 16
        size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
        sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
        span = min(min(hi, n_bases) - lo, (size - w) * 16)
        vm = np.zeros((size - w) * 16, dtype=bool)
        vm[:span] = valid_all[lo : lo + span]
        from .counter import _extract_canonical_u64le

        pairs = np.ascontiguousarray(
            _extract_canonical_u64le(sub, jnp.asarray(vm), k1)
        )
        u = pairs.view(np.uint64).ravel()[:span]
        _, found = kmerops.member_sorted_mt(rare_u64, u, pool)
        loc = np.flatnonzero(found)
        if len(loc):
            rid = np.searchsorted(starts, loc + lo, side="right") - 1
            cand[rid] = True
        if hi >= n_dense:
            break
    return cand


def find_mercy_edges(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    solid_keys: np.ndarray,
    k1: int,
    chunk_bases: int = 1 << 22,
    rare_keys: np.ndarray | None = None,
) -> np.ndarray:
    """Return (M, W) canonical mercy (k1)-mers (deduplicated).

    flat_codes/starts: the read pool. solid_keys: sorted canonical
    solid (k1)-mers. k1 = edge length = megahit k + 1. rare_keys
    (optional): the counter's NON-solid distinct keys; when given,
    the node-flag scan runs only over candidate reads (those with a
    non-solid window) instead of the whole pool.
    """
    chunk_bases = max(1 << 16, (chunk_bases + 15) & ~15)
    log = get_logger()
    k = k1 - 1
    w = kmerops.words_per_kmer(k1)
    n_bases = int(starts[-1])
    if n_bases < k1 or len(solid_keys) == 0:
        return np.zeros((0, w), dtype=np.uint32)

    from .counter import as_pool

    pool = as_pool(flat_codes)
    packed_np = np.concatenate(
        [pool.window_padded(0, pool.n_words),
         np.zeros(w + 1, dtype=np.uint32)])
    packed = jnp.asarray(packed_np)

    n_dense = (len(packed_np) - w) * 16
    if k <= 31 and rare_keys is not None:
        return _mercy_candidate_reads_path(
            packed, packed_np, flat_codes, starts, solid_keys,
            rare_keys, k, k1, chunk_bases, log,
        )
    # dense has_in / has_out over every base offset, chunked
    if k <= 31:
        has_in, has_out = _flags_host_u64(
            packed, packed_np, solid_keys, k, k1, n_bases, chunk_bases
        )
    else:
        solid = jnp.asarray(solid_keys)
        has_in = np.zeros(n_bases, dtype=bool)
        has_out = np.zeros(n_bases, dtype=bool)
        for lo in range(0, n_bases, chunk_bases):
            hi = min(n_dense, lo + chunk_bases)
            lo_w = lo // 16
            size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
            sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
            hi_c, ho_c = _neighbor_flags(sub, solid, k, k1)
            hi_c = np.asarray(hi_c)
            ho_c = np.asarray(ho_c)
            span = min(min(hi, n_bases) - lo, len(hi_c))
            has_in[lo : lo + span] = hi_c[:span]
            has_out[lo : lo + span] = ho_c[:span]
            if hi >= n_dense:
                break

    # positions whose k-window crosses a read boundary act as hard
    # resets (status "both"), so one global scan handles all reads;
    # reads shorter than k+2 are skipped entirely (reference
    # seq_to_sdbg.cpp:202 `read_len < opt_.k + 2`)
    valid_k = window_valid_mask(starts, k, n_bases)
    lengths = np.diff(starts)
    status = has_in.astype(np.int8) | (has_out.astype(np.int8) << 1)
    status[~valid_k] = 3
    status[np.repeat(lengths < k1 + 1, lengths)] = 3

    return _emit_gap_edges(
        np.flatnonzero(status == 1), np.flatnonzero(status == 2),
        np.flatnonzero(status >= 2), starts, packed, k1, w, log,
    )


def _mercy_candidate_reads_path(
    packed, packed_np, flat_codes, starts, solid_keys, rare_keys,
    k, k1, chunk_bases, log,
) -> np.ndarray:
    """Node-flag scan restricted to candidate reads (sparse positions;
    identical output to the dense scan - non-candidate reads are
    fully solid and provably gap-free)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..utils.threads import num_threads

    w = kmerops.words_per_kmer(k1)
    n_bases = int(starts[-1])
    valid_all = window_valid_mask(starts, k1, n_bases)
    lengths = np.diff(starts)
    with ThreadPoolExecutor(max_workers=min(8, num_threads())) as pool:
        cand = _candidate_reads(packed, packed_np, rare_keys, k1,
                                starts, valid_all, chunk_bases, pool)
        # reads shorter than k+2 are skipped entirely (reference
        # seq_to_sdbg.cpp:202 `read_len < opt_.k + 2`)
        cand &= lengths >= k1 + 1
        n_cand = int(cand.sum())
        if n_cand == 0:
            return np.zeros((0, w), dtype=np.uint32)
        log.debug("mercy: %d/%d candidate reads", n_cand, len(cand))
        rs = starts[:-1][cand]
        re_ = starts[1:][cand]
        seg = (re_ - rs).astype(np.int64)
        total = int(seg.sum())
        # ALL positions of every candidate read, ascending (each
        # read's k-window-invalid tail provides the cross-read stop)
        pos = np.repeat(rs, seg) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(seg) - seg, seg)
        )
        read_end = np.repeat(re_, seg)
        table, tflags = _node_sets_u64(solid_keys, k1)
        # chunked: candidate positions can approach the whole pool on
        # low-coverage data; keep the gather + flag working set at
        # chunk_bases positions like the dense path
        f = np.empty(total, dtype=np.uint8)
        for lo in range(0, total, chunk_bases):
            hi = min(total, lo + chunk_bases)
            keys_k = np.asarray(kmerops.extract_kmers(
                packed, jnp.asarray(pos[lo:hi].astype(np.int32)), k
            ))
            f[lo:hi] = _flags_mt(
                table, tflags, kmerops.keys_to_u64(keys_k, k), pool
            )
    status = ((f >> 1) & 1) | ((f & 1) << 1)  # 1 in-only, 2 out-only
    status[pos + k > read_end] = 3
    return _emit_gap_edges(
        pos[status == 1], pos[status == 2], pos[status >= 2],
        starts, packed, k1, w, log,
    )


def _emit_gap_edges(one_list, b_list, stop_list, starts, packed, k1,
                    w, log) -> np.ndarray:
    """Gap windows from (in-only, out-only, stop) position lists.

    The latest in-only position before each b, cancelled by any later
    stop (status 2 or 3). Sparse formulation: dense cummax over 25M+
    positions costs seconds of ufunc.accumulate on a weak host; the
    in-only/stop position LISTS are small, so two searchsorted calls
    at the b positions give the same answers."""
    if len(b_list) == 0 or len(one_list) == 0:
        return np.zeros((0, w), dtype=np.uint32)
    # last in-only strictly before b (status[b] == 2, so <= b == < b)
    ia = np.searchsorted(one_list, b_list)
    a_list = np.where(ia > 0, one_list[np.maximum(ia - 1, 0)], -1)
    # last stop strictly before b
    is_ = np.searchsorted(stop_list, b_list)
    prev_stop_b = np.where(is_ > 0, stop_list[np.maximum(is_ - 1, 0)],
                           -1)
    live = (a_list >= 0) & (a_list > prev_stop_b) & (b_list > 0)
    a_list, b_list = a_list[live], b_list[live]
    if len(a_list) == 0:
        return np.zeros((0, w), dtype=np.uint32)

    # emit window positions SPARSELY (gaps are rare; no dense mask, no
    # second full-pool extraction pass): ranges [a, b) unrolled via the
    # repeat + within-group-arange trick
    seg = (b_list - a_list).astype(np.int64)
    total = int(seg.sum())
    if total == 0:
        return np.zeros((0, w), dtype=np.uint32)
    pos = np.repeat(a_list, seg) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(seg) - seg, seg)
    )
    # a mercy window must itself be a full (k1)-window of its read
    rid = np.searchsorted(starts, pos, side="right") - 1
    pos = pos[pos + k1 <= starts[rid + 1]]
    n_mercy_windows = len(pos)
    if n_mercy_windows == 0:
        return np.zeros((0, w), dtype=np.uint32)

    # targeted gather + canonicalize of just the mercy (k1)-mers
    keys = kmerops.extract_kmers(
        packed, jnp.asarray(pos.astype(np.int32)), k1
    )
    canon, _ = kmerops.canonical_kmers(keys, k1)
    mercy = np.asarray(canon)
    mercy = np.unique(mercy, axis=0)
    log.info(
        "mercy: %d gap windows -> %d distinct mercy edges",
        n_mercy_windows, len(mercy),
    )
    return mercy
