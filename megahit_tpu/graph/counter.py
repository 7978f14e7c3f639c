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


def pack_flat(flat_codes: np.ndarray) -> np.ndarray:
    pad = (-len(flat_codes)) % 16
    padded = np.concatenate(
        [flat_codes, np.zeros(pad, dtype=np.uint8)]
    ) if pad else flat_codes
    return np.asarray(kmerops.pack_flat_codes(jnp.asarray(padded)))


@functools.partial(jax.jit, static_argnames=("k",))
def _extract_canonical(packed, positions, k):
    keys = kmerops.extract_kmers(packed, positions, k)
    canon, _ = kmerops.canonical_kmers(keys, k)
    return canon


@functools.partial(jax.jit, static_argnames=())
def _count_sorted_runs(skeys, valid_in):
    """Given lexicographically sorted (N, W) keys and a validity mask,
    return (head mask, per-head run counts scattered to head rows)."""
    n = skeys.shape[0]
    prev = jnp.concatenate([skeys[:1], skeys[:-1]], axis=0)
    head = jnp.any(skeys != prev, axis=-1)
    head = head.at[0].set(True)
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    ones = valid_in.astype(jnp.int32)
    counts_per_seg = jax.ops.segment_sum(ones, seg, num_segments=n)
    counts = counts_per_seg[seg] * head  # counts on head rows, 0 elsewhere
    return head, counts


def count_canonical_kmers(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    k1: int,
    min_count: int,
    batch_windows: int = 1 << 22,
) -> tuple[np.ndarray, np.ndarray]:
    """Count all canonical k1-mers of the sequence pool.

    Returns (keys (E, W) uint32 sorted, counts (E,) int32) with
    counts >= min_count, counts clipped to KMAX_MUL.

    Equivalent to reference KmerCounter::Run minus mercy bookkeeping
    (kmer_counter.cpp:114-156, 254-381).
    """
    log = get_logger()
    w = kmerops.words_per_kmer(k1)
    positions = window_positions(starts, k1)
    n = len(positions)
    if n == 0:
        return np.zeros((0, w), dtype=np.uint32), np.zeros(0, dtype=np.int32)
    packed = jnp.asarray(pack_flat(flat_codes))

    # extract in batches to bound peak memory, accumulate on device
    chunks = []
    for lo in range(0, n, batch_windows):
        hi = min(n, lo + batch_windows)
        npad = _pow2_pad(hi - lo)
        pos = np.zeros(npad, dtype=np.int32)
        pos[: hi - lo] = positions[lo:hi]
        canon = _extract_canonical(packed, jnp.asarray(pos), k1)
        chunks.append(np.asarray(canon[: hi - lo]))
    keys = np.concatenate(chunks, axis=0)

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
    log.debug(
        "count: %d windows -> %d distinct canonical %d-mers, %d solid (>=%d)",
        n,
        int(head[: n and npad].sum()),
        k1,
        len(out_keys),
        min_count,
    )
    return out_keys, out_counts
