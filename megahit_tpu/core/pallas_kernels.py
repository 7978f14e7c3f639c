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
