"""Mesh-sharded k-mer counting vs the single-device counter."""

import jax
import numpy as np
from jax.sharding import Mesh

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.parallel.shuffle import sharded_count_kmers

RNG = np.random.default_rng(7)


def _random_reads(n, length):
    return [RNG.integers(0, 4, size=length).astype(np.uint8)
            for _ in range(n)]


def test_sharded_count_matches_single_device():
    reads = _random_reads(64, 80)
    flat, starts = packing.pack_many(reads)
    k1 = 22
    ref_keys, ref_counts = counter.count_canonical_kmers(
        flat, starts, k1, min_count=1
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    keys, counts = sharded_count_kmers(flat, starts, k1, 1, mesh)
    assert keys.shape == ref_keys.shape
    np.testing.assert_array_equal(keys, ref_keys)
    np.testing.assert_array_equal(counts, ref_counts)


def test_sharded_count_min_count_filter():
    reads = _random_reads(16, 60)
    reads = reads + [reads[0].copy() for _ in range(3)]
    flat, starts = packing.pack_many(reads)
    k1 = 22
    ref_keys, ref_counts = counter.count_canonical_kmers(
        flat, starts, k1, min_count=2
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    keys, counts = sharded_count_kmers(flat, starts, k1, 2, mesh)
    np.testing.assert_array_equal(keys, ref_keys)
    np.testing.assert_array_equal(counts, ref_counts)


def test_sharded_count_return_rare_matches_single_device():
    """Mesh rare keys (mercy candidate-filter basis) == single-device
    counter's, sorted (VERDICT r3 item 7: mesh mercy fast path)."""
    reads = _random_reads(20, 70)
    reads = reads + [reads[1].copy() for _ in range(2)]
    flat, starts = packing.pack_many(reads)
    k1 = 22
    ref_keys, ref_counts, ref_rare = counter.count_canonical_kmers(
        flat, starts, k1, min_count=2, return_rare=True
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    keys, counts, rare = sharded_count_kmers(
        flat, starts, k1, 2, mesh, return_rare=True
    )
    np.testing.assert_array_equal(keys, ref_keys)
    np.testing.assert_array_equal(counts, ref_counts)
    assert len(rare) > 0
    np.testing.assert_array_equal(rare, ref_rare)


def test_graft_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
