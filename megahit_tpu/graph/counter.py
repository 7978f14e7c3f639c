"""Canonical k-mer counting on device.

TPU-native replacement for the reference `count` subprogram
(src/sorting/kmer_counter.cpp + the CX1 engine src/sorting/base_engine.cpp):
instead of a 65,536-bucket external two-level sort with per-thread offset
arrays, we extract all canonical (k+1)-mers as multi-word keys with one
funnel-shift gather kernel, sort them on device with a multi-operand
lexicographic sort, and run-length-count with segment reductions. Static
shapes come from padding the window count to a power of two with sentinel
keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmerops
from ..utils.log import get_logger

KMAX_MUL = 65535  # reference kBitsPerMul=16 (src/definitions.h)


def _pow2_pad(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def window_positions(starts: np.ndarray, k: int) -> np.ndarray:
    """Flat base offsets of every length-k window fully inside one sequence."""
    lengths = np.diff(starts)
    n_win = np.maximum(lengths - k + 1, 0)
    total = int(n_win.sum())
    pos = np.zeros(total, dtype=np.int32)
    out = 0
    for s, n in zip(starts[:-1], n_win):
        if n > 0:
            pos[out : out + n] = np.arange(s, s + n, dtype=np.int32)
            out += n
    return pos


def window_valid_mask(starts: np.ndarray, k: int, n_pos: int) -> np.ndarray:
    """valid[p] = the k-window at flat offset p lies inside one sequence.

    Companion to kmerops.extract_all_kmers: marks which of the dense
    all-offset keys are real windows. Built with a +1/-1 range paint.
    """
    # same-width int32 cumsum: numpy's widening accumulate paths
    # (int8->, int32->int64) fall off the SIMD fast path and run
    # 10-25x slower on this host; the running sum is bounded by the
    # number of overlapping ranges (<= num seqs), so int32 is safe
    delta = np.zeros(n_pos + 1, dtype=np.int32)
    lengths = np.diff(starts)
    s = starts[:-1][lengths >= k]
    e = s + (lengths[lengths >= k] - k + 1)
    np.add.at(delta, s, 1)
    np.add.at(delta, np.minimum(e, n_pos), -1)
    return np.cumsum(delta[:-1], dtype=np.int32) > 0


def window_valid_range(starts: np.ndarray, k: int, lo: int, hi: int
                       ) -> np.ndarray:
    """window_valid_mask for positions [lo, hi) only - O(range), so
    chunked scans never materialize a whole-pool mask.

    Invalid positions are exactly the per-read tails [end - k + 1, end)
    (whole read when shorter than k), which are disjoint ascending
    ranges - painting them is ~50x cheaper than per-position
    searchsorted over a 10^8-position chunk.

    Precondition: hi <= starts[-1] (= total pool bases). Positions at
    or beyond starts[-1] are outside every sequence; this painter
    reports them VALID (unlike window_valid_mask, which reports them
    invalid) because no read tail covers them. All callers scan pool
    chunks clamped to n_bases, so the case is unreachable there."""
    assert hi <= int(starts[-1]), (hi, int(starts[-1]))
    n = hi - lo
    if n <= 0:
        return np.zeros(0, dtype=bool)
    out = np.ones(n, dtype=bool)
    j0 = max(int(np.searchsorted(starts, lo, side="right")) - 1, 0)
    j1 = int(np.searchsorted(starts, hi, side="left"))
    s = starts[j0:j1].astype(np.int64)
    e = starts[j0 + 1 : j1 + 1].astype(np.int64)
    inv_s = np.maximum(np.maximum(e - k + 1, s), lo)
    inv_e = np.minimum(e, hi)
    seg = np.maximum(inv_e - inv_s, 0)
    total = int(seg.sum())
    if total:
        idx = (np.repeat(inv_s - lo, seg)
               + np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(seg) - seg, seg))
        out[idx] = False
    return out


def num_windows(starts: np.ndarray, k: int) -> int:
    """Total k-windows inside sequences (== window_valid_mask.sum())."""
    return int(np.maximum(np.diff(starts) - k + 1, 0).sum())


def as_pool(pool_or_codes):
    """Accept either a PackedPool or raw u8 base codes (tests/legacy)."""
    from ..io.lib import PackedPool

    if isinstance(pool_or_codes, PackedPool):
        return pool_or_codes
    return PackedPool.from_codes(pool_or_codes)


def pack_flat(flat_codes: np.ndarray) -> np.ndarray:
    n = len(flat_codes)
    chunk = 1 << 27  # bound the 4 B/base widening transient (~0.5 GB)
    if n <= chunk:
        pad = (-n) % 16
        padded = np.concatenate(
            [flat_codes, np.zeros(pad, dtype=np.uint8)]
        ) if pad else flat_codes
        return np.asarray(kmerops.pack_flat_codes(jnp.asarray(padded)))
    out = np.empty((n + 15) // 16, np.uint32)
    for lo in range(0, n, chunk):  # chunk is a multiple of 16
        hi = min(n, lo + chunk)
        out[lo // 16:(hi + 15) // 16] = pack_flat(flat_codes[lo:hi])
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _extract_canonical_dense(packed, k):
    """Canonical keys at every base offset (gather-free hot path)."""
    keys = kmerops.extract_all_kmers(packed, k)
    canon, _ = kmerops.canonical_kmers(keys, k)
    return canon


@functools.partial(jax.jit, static_argnames=("k",))
def _extract_canonical_u64le(packed, vm, k):
    """Canonical keys at every offset as little-endian (N, 2) u32 pairs
    [low word, high word], invalid windows masked to all-ones.

    The host views the fetched buffer as uint64 at ZERO cost
    (np.view), so the whole CPU-backend count becomes: one fused XLA
    pass -> np.sort(u64) -> run-length diff. Only valid for k <= 32.
    All-ones can never collide with a real key: a canonical key is
    min(key, rc), and the all-T key's rc is all-A, so all-T is never
    canonical; for k < 32 the masked tail bits are zero anyway.
    """
    keys = kmerops.extract_all_kmers(packed, k)
    canon, _ = kmerops.canonical_kmers(keys, k)
    sent = jnp.uint32(0xFFFFFFFF)
    hi = jnp.where(vm, canon[:, 0], sent)
    lo = jnp.where(vm, canon[:, 1] if canon.shape[1] > 1
                   else jnp.zeros_like(hi), sent)
    return jnp.stack([lo, hi], axis=-1)


@functools.partial(jax.jit, static_argnames=("k1", "cap"))
def _count_device_fused(packed, pm, k1, cap):
    """Single-shot on-device count with device-side compaction.

    The production TPU path: extract+canonicalize (pallas), sort, count
    and scatter-compact the DISTINCT rows into a cap-sized buffer - the
    host receives ~E rows instead of all N sorted keys (E << N for
    high-coverage data). Returns (keys (cap, W) sentinel-padded, counts
    (cap,), n_distinct); caller falls back when n_distinct > cap."""
    from ..core.pallas_kernels import (
        canonical_all_kmers_pallas, count_sorted_runs_device,
        narrow_tail_plane, widen_tail_plane)

    cols = canonical_all_kmers_pallas(packed, k1)
    w = cols.shape[0]
    sent = jnp.uint32(0xFFFFFFFF)
    masked = tuple(jnp.where(pm, cols[i], sent) for i in range(w))
    # tail key word rides as u16 when it uses <= 16 bits: the sort
    # (dominant cost) moves 25% fewer bytes; widened back after
    ops = narrow_tail_plane(masked, k1)
    out = jax.lax.sort(ops + (pm,), num_keys=w, is_stable=False)
    svalid = out[w]
    # fused single-pass run-count (Pallas on TPU; jnp SoA fallback) +
    # per-column compaction: never materializes the (N, W) stack
    head, counts = count_sorted_runs_device(out[:w], svalid)
    out = widen_tail_plane(out[:w]) + (svalid,)
    pos = jnp.cumsum(head.astype(jnp.int32)) - 1
    tgt = jnp.where(head & (pos < cap), pos, cap)
    out_keys = jnp.stack(
        [jnp.full(cap + 1, sent, jnp.uint32)
         .at[tgt].set(out[i], mode="drop")[:cap] for i in range(w)],
        axis=-1,
    )
    out_counts = jnp.zeros(cap + 1, jnp.int32) \
        .at[tgt].set(counts, mode="drop")[:cap]
    return out_keys, out_counts, jnp.sum(head)


_count_sorted_runs = jax.jit(kmerops.count_sorted_runs)


def count_canonical_kmers(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    k1: int,
    min_count: int,
    batch_windows: int = 1 << 22,
    return_rare: bool = False,
) -> tuple[np.ndarray, ...]:
    """Count all canonical k1-mers of the sequence pool.

    Returns (keys (E, W) uint32 sorted, counts (E,) int32) with
    counts >= min_count, counts clipped to KMAX_MUL.

    With return_rare=True, also returns the (R, W) NON-solid distinct
    keys (count < min_count) - the exact basis for mercy's candidate-
    read filter (the reference tracks candidate reads approximately
    via per-read solid-offset CAS loops, kmer_counter.cpp:307-369; a
    read can host a mercy gap only if it contains a non-solid window).

    Equivalent to reference KmerCounter::Run minus mercy bookkeeping
    (kmer_counter.cpp:114-156, 254-381).
    """
    log = get_logger()
    pool = as_pool(flat_codes)
    w = kmerops.words_per_kmer(k1)
    n_bases = int(starts[-1])
    n = n_bases - k1 + 1

    def ret(keys, counts, rare):
        return (keys, counts, rare) if return_rare else (keys, counts)

    empty = (np.zeros((0, w), dtype=np.uint32),
             np.zeros(0, dtype=np.int32),
             np.zeros((0, w), dtype=np.uint32))
    if n <= 0:
        return ret(*empty)
    n = num_windows(starts, k1)
    if n == 0:
        return ret(*empty)
    total_words = pool.n_words + w + 1

    # dense extraction over word-range chunks, host-compacted by
    # validity; on TPU the fused pallas kernel produces phase-grouped
    # (W, M) columns (order is irrelevant: everything is sorted next)
    use_pallas = jax.default_backend() not in ("cpu",)
    n_dense = (total_words - w) * 16
    # chunk starts must be word-aligned (lo // 16 assumes 16 | lo)
    chunk = max(1 << 16, (batch_windows + 15) & ~15)

    if use_pallas and n_bases <= chunk:
        # single-shot fused device path: the host receives only the
        # ~E distinct rows instead of all N sorted keys
        from ..core.pallas_kernels import phase_grouped_mask

        packed = jnp.asarray(pool.window_padded(0, total_words))
        q = total_words - w
        vm = np.zeros(q * 16, dtype=bool)
        span = min(q * 16, n_bases)
        vm[:span] = window_valid_range(starts, k1, 0, span)
        pm = phase_grouped_mask(vm)
        cap = _pow2_pad(max(n // 4, 1 << 16))
        keys_c, counts_c, nd = _count_device_fused(
            packed, jnp.asarray(pm), k1, cap
        )
        nd = int(nd)
        if nd <= cap:
            out_keys = np.asarray(keys_c[:nd])
            out_counts = np.asarray(counts_c[:nd])
            keep = out_counts >= min_count
            log.debug(
                "count (fused): %d windows -> %d distinct, %d solid",
                n, nd, int(keep.sum()),
            )
            return ret(
                out_keys[keep],
                np.minimum(out_counts[keep], KMAX_MUL).astype(np.int32),
                out_keys[~keep],
            )
        log.debug("fused count capacity %d < distinct %d; falling back",
                  cap, nd)
    if not use_pallas and k1 <= 32:
        # host fast path (CPU backend, keys fit u64): one fused XLA
        # pass emits [lo, hi]-interleaved u32 pairs with invalid
        # windows masked to the u64-max sentinel; the host views them
        # as uint64 for free, sorts once, and run-length counts -
        # ~5x the old XLA-CPU multi-operand sort + boolean compaction
        u_chunks = []
        n_inv = 0
        for lo in range(0, n_bases, chunk):
            hi = min(n_dense, lo + chunk)
            lo_w, hi_w = lo // 16, (hi + 15) // 16
            size = min(hi_w + w + 1, total_words) - lo_w
            sub = jnp.asarray(pool.window_padded(lo_w, size))
            span = min(min(hi, n_bases) - lo, (size - w) * 16)
            vm = np.zeros((size - w) * 16, dtype=bool)
            vm[:span] = window_valid_range(starts, k1, lo, lo + span)
            n_inv += int(len(vm) - vm.sum())
            # fetched buffers may be non-contiguous views (tunneled
            # TPU backend); .view(uint64) needs a contiguous last axis
            pairs = np.ascontiguousarray(
                _extract_canonical_u64le(sub, jnp.asarray(vm), k1)
            )
            u_chunks.append(pairs.view(np.uint64).ravel())
            if hi >= n_dense:
                break
        # single-chunk fetches can be zero-copy views of the XLA
        # buffer (read-only); in-place sort needs ownership
        u = np.concatenate(u_chunks) if len(u_chunks) > 1 \
            else np.array(u_chunks[0])
        del u_chunks
        # default introsort: numpy's SIMD qsort does 131M u64 in ~2.4s
        # where kind="stable" (timsort on u64) takes ~18s; equal u64
        # values are indistinguishable, so stability buys nothing
        u.sort()
        u = u[: len(u) - n_inv]  # sentinels sort to the tail
        assert len(u) == n, (len(u), n)
        head = np.empty(len(u), dtype=bool)
        head[0] = True
        np.not_equal(u[1:], u[:-1], out=head[1:])
        idx = np.flatnonzero(head)
        counts = np.diff(np.append(idx, len(u))).astype(np.int32)
        distinct = u[idx]
        keep = counts >= min_count

        def u64_to_keys(d):
            ks = np.empty((len(d), w), np.uint32)
            ks[:, 0] = (d >> np.uint64(32)).astype(np.uint32)
            if w == 2:
                ks[:, 1] = (d & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            return ks

        out_keys = u64_to_keys(distinct[keep])
        out_counts = np.minimum(counts[keep], KMAX_MUL).astype(np.int32)
        log.debug(
            "count (host u64): %d windows -> %d distinct, %d solid",
            n, len(idx), len(out_keys),
        )
        return ret(out_keys, out_counts, u64_to_keys(distinct[~keep]))

    chunks = []
    for lo in range(0, n_bases, chunk):
        hi = min(n_dense, lo + chunk)
        lo_w, hi_w = lo // 16, (hi + 15) // 16
        size = min(hi_w + w + 1, total_words) - lo_w
        sub = jnp.asarray(pool.window_padded(lo_w, size))
        span = min(min(hi, n_bases) - lo, (size - w) * 16)
        vm = np.zeros((size - w) * 16, dtype=bool)
        vm[:span] = window_valid_range(starts, k1, lo, lo + span)
        if use_pallas:
            from ..core.pallas_kernels import (
                canonical_all_kmers_pallas, phase_grouped_mask,
            )

            cols = np.asarray(canonical_all_kmers_pallas(sub, k1))
            pm = phase_grouped_mask(vm)
            chunks.append(np.ascontiguousarray(cols.T[pm]))
        else:
            canon = np.asarray(_extract_canonical_dense(sub, k1))
            chunks.append(canon[: len(vm)][vm])
        if hi >= n_dense:
            break
    keys = np.concatenate(chunks, axis=0)
    assert len(keys) == n, (len(keys), n)

    # pad to power of two with sentinel (all ones) keys
    npad = _pow2_pad(n)
    pad_rows = npad - n
    if pad_rows:
        sentinel = np.full((pad_rows, w), 0xFFFFFFFF, dtype=np.uint32)
        keys = np.concatenate([keys, sentinel], axis=0)
    valid = np.zeros(npad, dtype=bool)
    valid[:n] = True

    (skeys,) = kmerops.sort_keys_with_payload(jnp.asarray(keys))
    head, counts = _count_sorted_runs(skeys, jnp.asarray(valid))
    skeys = np.asarray(skeys)
    head = np.asarray(head)
    counts = np.asarray(counts)

    keep = head & (counts >= min_count)
    # drop the sentinel group if it is a pure-padding artifact
    if pad_rows:
        is_sentinel = (skeys == 0xFFFFFFFF).all(axis=1)
        # counts already exclude padding rows via the validity mask,
        # but an all-T key with zeroed tail can never equal the sentinel
        # unless k1 % 16 == 0; in that case the padding was excluded by
        # `valid` anyway, so only drop groups whose remaining count is 0.
        keep &= ~(is_sentinel & (counts == 0))
    keep &= counts > 0

    out_keys = skeys[keep]
    out_counts = np.minimum(counts[keep], KMAX_MUL).astype(np.int32)
    rare = skeys[head & (counts > 0) & (counts < min_count)]
    log.debug(
        "count: %d windows -> %d distinct canonical %d-mers, %d solid (>=%d)",
        n,
        int(head[: n and npad].sum()),
        k1,
        len(out_keys),
        min_count,
    )
    return ret(out_keys, out_counts, rare)
