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
