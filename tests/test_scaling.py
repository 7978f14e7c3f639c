"""Weak-scaling harness for the mesh-sharded counter (BASELINE.md
target: >= 80% weak-scaling efficiency; here validated functionally on
virtual CPU devices and reported, not asserted, since virtual devices
share one physical CPU)."""

import time

import jax
import numpy as np
from jax.sharding import Mesh

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.parallel.shuffle import sharded_count_kmers

RNG = np.random.default_rng(17)


def _reads(n):
    return [RNG.integers(0, 4, size=100).astype(np.uint8)
            for _ in range(n)]


def test_sharded_count_weak_scaling_smoke():
    """Work per device held constant while devices double; asserts
    correctness at every scale and prints the efficiency table."""
    per_dev = 200
    rows = []
    for n_dev in (1, 2, 4, 8):
        reads = _reads(per_dev * n_dev)
        flat, starts = packing.pack_many(reads)
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        t0 = time.perf_counter()
        keys, counts = sharded_count_kmers(flat, starts, 22, 1, mesh)
        dt = time.perf_counter() - t0
        ref_k, ref_c = counter.count_canonical_kmers(flat, starts, 22, 1)
        np.testing.assert_array_equal(keys, ref_k)
        np.testing.assert_array_equal(counts, ref_c)
        rows.append((n_dev, dt))
    base = rows[0][1]
    for n_dev, dt in rows:
        eff = base / dt if dt > 0 else 0.0
        print(f"weak-scaling n_dev={n_dev}: {dt*1e3:.0f} ms "
              f"(eff vs 1-dev: {eff:.2f})")


def test_sharded_sample_sort_matches_global_sort():
    from megahit_tpu.parallel.shuffle import sharded_sort_kmers

    for n_dev in (1, 4, 8):
        keys = RNG.integers(0, 2**32, size=(5000, 2), dtype=np.uint32)
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        got = sharded_sort_kmers(keys, mesh)
        order = np.lexsort((keys[:, 1], keys[:, 0]))
        want = keys[order]
        np.testing.assert_array_equal(got, want)


def test_sharded_sample_sort_skewed_ties():
    """Runs of identical keys must spread across bins (tie-break word)
    instead of overflowing one device."""
    from megahit_tpu.parallel.shuffle import sharded_sort_kmers

    keys = np.zeros((4000, 2), dtype=np.uint32)
    keys[:, 0] = 7
    keys[:500, 0] = 3  # a smaller distinct run too
    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    got = sharded_sort_kmers(keys, mesh)
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    np.testing.assert_array_equal(got, keys[order])
