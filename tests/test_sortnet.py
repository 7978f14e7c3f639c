"""Tests for the Pallas odd-even merge sort (core/sortnet.py).

Runs on the CPU backend with interpret-mode pallas_call; the same
kernels were verified on the real chip (2^24 keys byte-identical to
lax.sort, incl. a duplicate-heavy skewed distribution). Kept as
regression coverage for the measured-roofline artifact.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from megahit_tpu.core import sortnet  # noqa: E402

rng = np.random.default_rng(7)


def mk(n, dup=False):
    hi = rng.integers(0, 2**32, n, dtype=np.uint32)
    lo = (rng.integers(0, 2**12, n, dtype=np.uint32) << 4).astype(np.uint16)
    if dup:
        hi = (hi % 7).astype(np.uint32)
        lo = ((lo.astype(np.uint32) % 3) << 4).astype(np.uint16)
    return hi, lo


def key64(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << 16) | np.asarray(lo)


def sorted_runs(n, run, dup=False):
    hi, lo = mk(n, dup)
    k = np.sort(key64(hi, lo).reshape(-1, run), axis=1).reshape(-1)
    return (jnp.asarray((k >> 16).astype(np.uint32)),
            jnp.asarray((k & 0xFFFF).astype(np.uint16)), k)


def test_oddeven_merge_block():
    for sz in (128, 512, 2048):
        a = np.sort(rng.integers(0, 500, sz).astype(np.uint32))
        b = np.sort(rng.integers(0, 500, sz).astype(np.uint32))
        lo = jnp.zeros((2 * sz // 128, 128), jnp.uint32)
        cat = jnp.asarray(np.concatenate([a, b])).reshape(-1, 128)
        mh, _ = sortnet.oddeven_merge_block(cat, lo)
        assert (np.asarray(mh).reshape(-1)
                == np.sort(np.concatenate([a, b]))).all()


def test_bitonic_sort_block():
    hi, lo = mk(16 * 128, dup=True)
    oh, ol = sortnet.bitonic_sort_block(
        jnp.asarray(hi).reshape(16, 128),
        jnp.asarray(lo.astype(np.uint32)).reshape(16, 128))
    got = key64(np.asarray(oh).reshape(-1),
                np.asarray(ol).reshape(-1).astype(np.uint16))
    assert (got == np.sort(key64(hi, lo))).all()


def test_flat_roll_left():
    hi, _ = mk(16 * 128)
    x = jnp.asarray(hi).reshape(16, 128)
    for h in (0, 1, 127, 128, 1000, 2047):
        r = sortnet._flat_roll_left(x, jnp.int32(h), max_rows=16)
        assert (np.asarray(r).reshape(-1) == np.roll(hi, -h)).all(), h


def test_merge_path_splits_vs_literal():
    n, run, tile = 4096, 1024, 256
    hi, lo, k = sorted_runs(n, run, dup=True)
    a_from, a_to, pair_start, q_lo = sortnet._merge_path_splits(
        hi, lo, run, tile, n)
    a_from, a_to = np.asarray(a_from), np.asarray(a_to)
    ps, ql = np.asarray(pair_start), np.asarray(q_lo)
    for t in range(n // tile):
        A = k[ps[t]:ps[t] + run]
        B = k[ps[t] + run:ps[t] + 2 * run]
        src, i, j = [], 0, 0
        for _ in range(2 * run):
            if j >= run or (i < run and A[i] <= B[j]):
                src.append(0)
                i += 1
            else:
                src.append(1)
                j += 1
        assert a_from[t] == src[:ql[t]].count(0)
        assert a_to[t] == src[:ql[t] + tile].count(0)


@pytest.mark.parametrize("dup", [False, True])
def test_sort_planes_interpret(dup):
    n = 8192
    hi, lo = mk(n, dup)
    oh, ol = sortnet.sort_planes(jnp.asarray(hi), jnp.asarray(lo),
                                 init_run=512, max_tile=1024,
                                 interpret=True)
    assert (key64(oh, ol) == np.sort(key64(hi, lo))).all()


def test_sort_planes_fallback_non_pow2():
    hi, lo = mk(1000)
    oh, ol = sortnet.sort_planes(jnp.asarray(hi), jnp.asarray(lo))
    assert (key64(oh, ol) == np.sort(key64(hi, lo))).all()
