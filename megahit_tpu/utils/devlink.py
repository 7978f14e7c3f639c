"""Host<->device link characterization for adaptive dispatch.

The graph-cleaning passes are latency-bound: dozens of small jitted
dispatches whose operands/results are tiny, where per-dispatch
round-trip dominates. On a co-located accelerator (PCIe/ICI, ~0.1 ms)
the device engine wins; on a remote/tunneled device (hundreds of ms
RTT) the same pass pattern pays seconds per pass and the host engine
wins. Measure once per process and dispatch accordingly - the
throughput-bound stages (count/sort/finalize) are NOT routed by this:
their operands are large enough that bandwidth, not latency, decides,
and they stay on the accelerator.

MEGAHIT_TPU_LINK_MS=<float> overrides the measurement (tests and
benchmarks pin it to get deterministic routing).
"""

from __future__ import annotations

import os
import time

_cached_ms: float | None = None


def link_latency_ms() -> float:
    """Measured min round-trip of a tiny dispatch + readback on the
    default backend (cached per process). 0.0 on the CPU backend."""
    global _cached_ms
    env = os.environ.get("MEGAHIT_TPU_LINK_MS")
    if env:
        return float(env)
    if _cached_ms is None:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() == "cpu":
            _cached_ms = 0.0
        else:
            try:
                f = jax.jit(lambda a: a + 1)
                x = jnp.zeros(8, jnp.int32)
                float(f(x)[0])  # compile + first transfer
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(x)[0])
                    best = min(best, time.perf_counter() - t0)
                _cached_ms = best * 1000.0
            except Exception:
                _cached_ms = 0.0
    return _cached_ms


def latency_bound_link(threshold_ms: float = 20.0) -> bool:
    """True when per-dispatch round-trip is so high that chatty
    device passes lose to the host engine (remote/tunneled devices)."""
    return link_latency_ms() > threshold_ms
