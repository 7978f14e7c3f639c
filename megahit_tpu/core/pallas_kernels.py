"""Pallas TPU kernels for the k-mer hot path.

`canonical_all_kmers_pallas` fuses dense k-mer extraction (16 funnel-
shift variants of the packed pool) with canonicalization (revcomp +
lexicographic select) into one kernel: XLA's unfused chain materializes
several (N, W) intermediates; the fused kernel touches HBM once for
the input words and once for the canonical output.

Output layout is SoA - one (N,) uint32 array per key word - exactly
what the downstream `lax.sort` consumes, saving the stack/unstack too.

Falls back transparently to the jnp implementation on CPU (pallas
interpret mode would be slower than XLA there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kmerops

U32 = jnp.uint32


def _reverse_bases_in_word(x):
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    return (x << U32(16)) | (x >> U32(16))


def _canon_kernel(*refs, k: int, w: int, block_q: int):
    """One grid step: canonical keys for block_q word-aligned window
    starts x 16 offsets = block_q*16 consecutive positions. Inputs are
    w+1 pre-shifted views of the packed pool (aligned block loads; a
    single ref with per-word offsets hits Mosaic's misaligned-vector-
    load limitation)."""
    a = [refs[i][:] for i in range(w + 1)]
    out_ref = refs[w + 1]

    used = k - (w - 1) * 16
    tail_mask = U32(0xFFFFFFFF) << U32(32 - 2 * used) if used < 16 \
        else U32(0xFFFFFFFF)
    pad = w * 16 - k
    sh = 2 * pad

    for r in range(16):
        # forward key words at offset r
        if r == 0:
            fwd = [a[i] for i in range(w)]
        else:
            fwd = [
                (a[i] << U32(2 * r)) | (a[i + 1] >> U32(32 - 2 * r))
                for i in range(w)
            ]
        fwd[w - 1] = fwd[w - 1] & tail_mask

        # reverse complement: per-word 2-bit reversal of complement,
        # word order reversed, then global left shift by 2*pad bits
        rev = [_reverse_bases_in_word(~fwd[w - 1 - i]) for i in range(w)]
        if sh == 0:
            rc = rev
        else:
            rc = [
                (rev[i] << U32(sh))
                | ((rev[i + 1] >> U32(32 - sh)) if i + 1 < w else U32(0))
                for i in range(w)
            ]
        rc[w - 1] = rc[w - 1] & tail_mask

        # canonical = min(fwd, rc) lexicographically
        lt = jnp.zeros_like(fwd[0], dtype=jnp.bool_)
        eq = jnp.ones_like(fwd[0], dtype=jnp.bool_)
        for i in range(w):
            lt = lt | (eq & (rc[i] < fwd[i]))
            eq = eq & (rc[i] == fwd[i])
        for i in range(w):
            out_ref[i, pl.ds(r * block_q, block_q)] = jnp.where(
                lt, rc[i], fwd[i]
            )


def phase_grouped_mask(mask, block_q: int = 2048):
    """Reorder a per-position mask/array into the kernel's phase-grouped
    layout (position q*16+r -> block, r, q_local)."""
    import numpy as np

    n = len(mask)
    q = n // 16
    q_pad = -(-q // block_q) * block_q
    if q_pad * 16 > n:
        mask = np.concatenate(
            [mask, np.zeros(q_pad * 16 - n, dtype=mask.dtype)]
        )
    m = mask.reshape(q_pad // block_q, block_q, 16)
    return m.transpose(0, 2, 1).reshape(-1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def canonical_all_kmers_pallas(packed: jnp.ndarray, k: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Canonical k-mer keys at every base offset; returns (W, N) uint32
    with N = (len(packed) - W) * 16, GROUPED BY OFFSET PHASE: position
    p = r * (N//16) + q holds the key at base offset q*16 + r. Order is
    irrelevant to counting (everything is sorted next); use
    kmerops.extract_all_kmers when positional order matters."""
    w = kmerops.words_per_kmer(k)
    p = packed.shape[0]
    q = p - w
    block_q = 2048
    # pad the window count up to a block multiple (tail windows read
    # real padding words appended by the caller)
    q_pad = -(-q // block_q) * block_q
    if q_pad + w > p:
        packed = jnp.concatenate(
            [packed, jnp.zeros(q_pad + w - p, dtype=U32)]
        )
    grid = (q_pad // block_q,)
    shifted = [
        jax.lax.dynamic_slice_in_dim(packed, i, q_pad)
        for i in range(w + 1)
    ]
    out = pl.pallas_call(
        functools.partial(_canon_kernel, k=k, w=w, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((w, q_pad * 16), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q,), lambda j: (j,),
                         memory_space=pltpu.VMEM)
            for _ in range(w + 1)
        ],
        out_specs=pl.BlockSpec(
            (w, block_q * 16), lambda j: (0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*shifted)
    return out


def canonical_all_kmers_reference(packed: jnp.ndarray, k: int,
                                  block_q: int = 2048) -> jnp.ndarray:
    """jnp reference implementation with the same phase-grouped output
    layout (for correctness checks and the CPU fallback)."""
    w = kmerops.words_per_kmer(k)
    p = packed.shape[0]
    q = p - w
    q_pad = -(-q // block_q) * block_q
    if q_pad + w > p:
        packed = jnp.concatenate(
            [packed, jnp.zeros(q_pad + w - p, dtype=U32)]
        )
    keys = kmerops.extract_all_kmers(packed[: q_pad + w], k)  # (q*16, W)
    # rows ordered q-major: position q*16+r at row q*16+r; regroup to
    # phase-major blocks of block_q
    keys = keys.reshape(q_pad // block_q, block_q, 16, w)
    keys = keys.transpose(0, 2, 1, 3).reshape(q_pad * 16, w)
    canon, _ = kmerops.canonical_kmers(keys, k)
    return canon.T


def narrow_tail_plane(cols, k: int):
    """Shrink the last key word to uint16 when the key's trailing word
    uses <= 16 bits (left-aligned 2-bit layout: used bits sit in the
    TOP of the word). Sorting (u32.., u16) moves 25% fewer bytes than
    (u32.., u32) through lax.sort - the dominant cost of the count hot
    path - with identical lexicographic order, since the dropped low
    16 bits are structurally zero. Returns cols unchanged when the
    trailing word is wider."""
    w = kmerops.words_per_kmer(k)
    used = k - (w - 1) * 16  # chars in the last word
    if used > 8 or len(cols) != w:
        return tuple(cols)
    return tuple(cols[:-1]) + (
        (cols[-1] >> jnp.uint32(16)).astype(jnp.uint16),
    )


def widen_tail_plane(cols):
    """Inverse of narrow_tail_plane on sorted output columns."""
    if cols[-1].dtype != jnp.uint16:
        return tuple(cols)
    return tuple(cols[:-1]) + (
        cols[-1].astype(jnp.uint32) << jnp.uint32(16),
    )


_I32 = jnp.int32
_CNT_BR = 256  # block rows; one block = _CNT_BR * 128 elements


def _count_kernel(*refs, ncols: int, n: int, nb: int):
    """One reverse-order grid step of the fused run-count.

    Blocks are visited LAST-first (index maps reverse the grid), so the
    SMEM carry holds the inclusive suffix-min of head positions over
    all later blocks when this block runs - the cross-block half of the
    next-head computation that the jnp path pays several full HBM
    passes for (cummin_reverse + shifts + wheres)."""
    cols = refs[:ncols]
    bh_ref = refs[ncols]        # (nb,) SMEM i32: block-boundary heads
    ninv_ref = refs[ncols + 1]  # (1,) SMEM i32: number of invalid rows
    head_ref = refs[ncols + 2]  # out (BR, 128) i8
    cnt_ref = refs[ncols + 3]   # out (BR, 128) i32
    carry = refs[ncols + 4]     # SMEM (1,) i32 scratch

    br = _CNT_BR
    j = pl.program_id(0)
    b = nb - 1 - j

    @pl.when(j == 0)
    def _():
        carry[0] = n

    r0 = jax.lax.broadcasted_iota(_I32, (br, 128), 0)
    c0 = jax.lax.broadcasted_iota(_I32, (br, 128), 1)

    # head = any word differs from the row-major predecessor; all
    # shifts are full-shape rolls + masked selects (mosaic rejects
    # narrow-column concats/slices)
    head = None
    for cref in cols:
        xc = cref[:]
        if xc.dtype != jnp.uint32:
            # 16-bit vector compares are unsupported on this target;
            # upcast after the (u16) load - HBM traffic is unchanged
            xc = xc.astype(jnp.uint32)
        same_row = jnp.roll(xc, 1, axis=1)     # [r, c-1] at c>0
        prev_row = jnp.roll(same_row, 1, axis=0)  # [r-1, 127] at c==0
        prev = jnp.where(c0 == 0, prev_row, same_row)
        h = xc != prev
        head = h if head is None else (head | h)
    first = (r0 == 0) & (c0 == 0)
    # merge the block-boundary head flag in i32 (mosaic rejects
    # scalar-bool -> vector-i1 selects)
    head = jnp.where(first, bh_ref[b], head.astype(_I32)) != 0

    lin = b * (br * 128) + r0 * 128 + c0
    hp = jnp.where(head, lin, n)
    # within-row inclusive suffix-min (row-major: later columns)
    s = hp
    t = 1
    while t < 128:
        shifted = jnp.where(
            c0 >= 128 - t, n, jnp.roll(s, -t, axis=1)
        )
        s = jnp.minimum(s, shifted)
        t *= 2
    # per-row min broadcast across lanes, then an inclusive suffix-min
    # over rows, again with full-shape rolls
    rinc = jnp.broadcast_to(
        jnp.min(s, axis=1, keepdims=True), (br, 128)
    )
    t = 1
    while t < br:
        shifted = jnp.where(
            r0 >= br - t, n, jnp.roll(rinc, -t, axis=0)
        )
        rinc = jnp.minimum(rinc, shifted)
        t *= 2
    rows_after = jnp.where(
        r0 == br - 1, n, jnp.roll(rinc, -1, axis=0)
    )
    s = jnp.minimum(s, rows_after)  # block-inclusive suffix-min
    cin = carry[0]
    s = jnp.minimum(s, cin)         # global inclusive suffix-min
    carry[0] = jnp.min(s)           # == s[0, 0] (inclusive suffix)
    # nh = row-major shift-left-by-one of s, tail fed by the carry
    left = jnp.roll(s, -1, axis=1)            # [r, c+1]; at c==127: s[r, 0]
    down = jnp.roll(left, -1, axis=0)         # at c==127: s[r+1, 0]
    nh = jnp.where(c0 == 127, down, left)
    nh = jnp.where((r0 == br - 1) & (c0 == 127), cin, nh)
    cnt = nh - lin
    cnt = jnp.where(nh == n, cnt - ninv_ref[0], cnt)
    cnt = jnp.where(head, cnt, 0)
    head_ref[:] = (head & (cnt > 0)).astype(jnp.int8)
    cnt_ref[:] = cnt


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_sorted_runs_pallas(cols, n_inv, interpret: bool = False):
    """Fused run-length count over sorted SoA columns (TPU).

    Same contract as kmerops.count_sorted_runs_soa (invalid rows carry
    sentinel keys sorted to the tail; n_inv = their number), but one
    Pallas pass instead of ~8 elementwise/scan HBM round trips: reads
    each key plane once, writes head + counts once. Requires len(cols
    [0]) divisible by the 32K block; callers fall back to the jnp path
    otherwise (count_sorted_runs_device does this dispatch)."""
    n = int(cols[0].shape[0])
    block = _CNT_BR * 128
    assert n % block == 0 and n > 0
    nb = n // block
    ncols = len(cols)

    # block-boundary head flags WITHOUT gathers (even a 512-element
    # gather from a 16.7M array costs ~13ms on TPU): boundary elements
    # are strided column slices of the (nb, block) view
    bh = jnp.zeros(nb, dtype=bool)
    for c in cols:
        c2 = c.reshape(nb, block)
        bh = bh.at[1:].set(bh[1:] | (c2[1:, 0] != c2[:-1, -1]))
    bh = bh.at[0].set(True).astype(_I32)
    ninv = jnp.asarray(n_inv, _I32).reshape(1)

    rev = lambda j: (nb - 1 - j, 0)  # noqa: E731
    head8, counts = pl.pallas_call(
        functools.partial(_count_kernel, ncols=ncols, n=n, nb=nb),
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int8),
            jax.ShapeDtypeStruct((n // 128, 128), _I32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_CNT_BR, 128), rev, memory_space=pltpu.VMEM)
            for _ in range(ncols)
        ] + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_CNT_BR, 128), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((_CNT_BR, 128), rev, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((1,), _I32)],
        interpret=interpret,
    )(*[c.reshape(n // 128, 128) for c in cols], bh, ninv)
    return head8.reshape(n) != 0, counts.reshape(n)


def count_sorted_runs_device(cols, valid, interpret: bool = False):
    """Dispatch: fused Pallas count on TPU-friendly shapes, jnp SoA
    fallback elsewhere (CPU backend, or n not a block multiple)."""
    n = cols[0].shape[0]
    on_tpu = jax.default_backend() not in ("cpu",) or interpret
    if on_tpu and n % (_CNT_BR * 128) == 0:
        n_inv = jnp.sum(~valid, dtype=_I32)
        return count_sorted_runs_pallas(
            tuple(cols), n_inv, interpret=interpret
        )
    return kmerops.count_sorted_runs_soa(cols, valid)
