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


def test_weak_scaling_memory_invariant():
    """The structural property behind the >= 80% weak-scaling target
    (BASELINE.md): with constant per-device work, every device's
    all_to_all send/recv footprint stays CONSTANT as devices double
    (per-(src,dst) capacity halves while destinations double), and the
    shuffle never overflows under uniform hashing. Wall-clock cannot be
    asserted on shared-CPU virtual devices; the memory/communication
    invariant can."""
    import math

    from megahit_tpu.parallel.shuffle import make_sharded_counter

    per_dev = 4096
    footprints = []
    for n_dev in (1, 2, 4, 8):
        capacity = max(16, math.ceil(per_dev * 2.0 / n_dev))
        footprints.append(capacity * n_dev)  # rows buffered per device
    assert len(set(footprints)) == 1, footprints

    # and the routed shuffle stays overflow-free at every scale
    k1 = 22
    packed = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    for n_dev in (1, 2, 4, 8):
        n_pos = per_dev * n_dev
        pos = RNG.integers(0, 4096 * 16 - k1, n_pos).astype(np.int32)
        valid = np.ones(n_pos, dtype=bool)
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        step = make_sharded_counter(mesh, k1)
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("shard"))
        posd = jax.device_put(jnp.asarray(pos), shard)
        vald = jax.device_put(jnp.asarray(valid), shard)
        _, counts, head, n_over = step(jnp.asarray(packed), posd, vald)
        assert int(np.asarray(n_over)[0]) == 0
        total = int(np.asarray(counts)[np.asarray(head)].sum())
        assert total == n_pos


def test_weak_scaling_cpu_time_efficiency():
    """ASSERTED weak scaling (VERDICT round-2 item 6), on the honest
    metric this host can measure: virtual CPU devices share one
    physical CPU, so wall time cannot speed up - but TOTAL CPU TIME
    per unit of work measures the sharded implementation's overhead
    (hash routing, all_to_all, per-shard sort padding). Ideal weak
    scaling = CPU time grows linearly with total work; efficiency at
    N devices = N * T_cpu(1 dev, W) / T_cpu(N dev, N*W). Asserted
    >= 0.8 for 1 -> 4 devices (BASELINE.json north star), with a
    warm-up pass so jit compiles are excluded."""
    import time as _t

    per_dev = 3000  # reads per device (~300 kbp/device)
    meas = {}
    for n_dev in (1, 4):
        reads = _reads(per_dev * n_dev)
        flat, starts = packing.pack_many(reads)
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        sharded_count_kmers(flat, starts, 22, 1, mesh)  # warm-up
        best = np.inf
        for _ in range(3):
            c0 = _t.process_time()
            sharded_count_kmers(flat, starts, 22, 1, mesh)
            best = min(best, _t.process_time() - c0)
        meas[n_dev] = best
    eff = 4 * meas[1] / meas[4]
    print(f"weak-scaling cpu-time: 1-dev {meas[1]*1e3:.0f} ms, "
          f"4-dev {meas[4]*1e3:.0f} ms, efficiency {eff:.2f}")
    assert eff >= 0.8, (meas, eff)
