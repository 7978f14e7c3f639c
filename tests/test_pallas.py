"""Pallas kernel logic vs the jnp reference (interpret mode on CPU;
the compiled path is exercised on real TPU by bench.py and the
pipeline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from megahit_tpu.core import pallas_kernels as pk

RNG = np.random.default_rng(99)


@pytest.mark.parametrize("k", [15, 22, 31, 42])
def test_canonical_kernel_matches_reference(k):
    n_words = 4096 + 3
    packed = jnp.asarray(
        RNG.integers(0, 2**32, n_words, dtype=np.uint32)
    )
    ref = np.asarray(pk.canonical_all_kmers_reference(packed, k))
    got = np.asarray(
        pk.canonical_all_kmers_pallas(packed, k, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_phase_grouped_mask_roundtrip():
    n = 5 * 2048 * 16 + 7 * 16
    mask = RNG.random(n) < 0.3
    pm = pk.phase_grouped_mask(mask)
    assert pm.sum() == mask.sum()
    # the permutation maps position q*16+r to block-phase layout
    vals = np.arange(n, dtype=np.int64)
    pv = pk.phase_grouped_mask(vals)
    q_pad = -(-(n // 16) // 2048) * 2048
    # spot-check a few positions
    for p in (0, 17, 16 * 2048 - 1, n - 1):
        blk, ql = divmod(p // 16, 2048)
        r = p % 16
        out_idx = blk * 2048 * 16 + r * 2048 + ql
        assert pv[out_idx] == p


@pytest.mark.parametrize("n,dup,ninv", [
    (32768, 1, 0), (98304, 40, 333), (65536, 65536, 9), (32768, 3, 1),
])
def test_count_kernel_matches_soa(n, dup, ninv):
    from megahit_tpu.core import kmerops

    hi = np.sort(RNG.integers(0, dup, n)).astype(np.uint32)
    lo = RNG.integers(0, 2**16, n).astype(np.uint16)
    valid = np.ones(n, bool)
    if ninv:
        hi[-ninv:] = 0xFFFFFFFF
        lo[-ninv:] = 0xFFFF
        valid[-ninv:] = False
    order = np.lexsort((lo, hi))
    hi, lo, valid = hi[order], lo[order], valid[order]
    cols = (jnp.asarray(hi), jnp.asarray(lo))
    h0, c0 = kmerops.count_sorted_runs_soa(cols, jnp.asarray(valid))
    h1, c1 = pk.count_sorted_runs_pallas(
        cols, jnp.int32(ninv), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


@pytest.mark.parametrize("k", [22, 24, 31, 42, 56])
def test_narrow_tail_plane_order_preserving(k):
    from megahit_tpu.core import kmerops

    w = kmerops.words_per_kmer(k)
    keys = RNG.integers(0, 2**32, (256, w), dtype=np.uint32)
    keys = np.asarray(kmerops.mask_tail(jnp.asarray(keys), k))
    cols = tuple(jnp.asarray(keys[:, i]) for i in range(w))
    nar = pk.narrow_tail_plane(cols, k)
    used = k - (w - 1) * 16
    if used <= 8:
        assert nar[-1].dtype == jnp.uint16
        wid = pk.widen_tail_plane(nar)
        for i in range(w):
            np.testing.assert_array_equal(
                np.asarray(wid[i]), keys[:, i]
            )
        # sort order identical through the narrow planes
        o1 = np.lexsort(tuple(np.asarray(c) for c in cols[::-1]))
        o2 = np.lexsort(tuple(np.asarray(c) for c in nar[::-1]))
        k1s = keys[o1]
        k2s = keys[o2]
        np.testing.assert_array_equal(k1s, k2s)
    else:
        assert nar[-1].dtype == jnp.uint32
