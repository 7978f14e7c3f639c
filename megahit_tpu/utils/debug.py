"""Debug / sanitizer mode (SURVEY §7.9 hardening).

The reference ships ASan/UBSan/TSan build modes (CMakeLists.txt:59-65)
to catch memory and concurrency bugs; the TPU rebuild has no raw
memory or locks, so the equivalent failure classes are numeric (NaNs
in depth/similarity math) and STRUCTURAL (a graph whose derived
tables drift from its keys). `MEGAHIT_TPU_DEBUG=1` enables:

- `jax_debug_nans`: any NaN produced under jit raises at the op.
- full graph invariant checks after every SdBG construction (the
  default build only spot-checks 1K rows): rc closure/involution,
  strand-symmetric validity and multiplicity, and candidate-table
  consistency against the keys.

Determinism needs no mode: every kernel is deterministic by
construction (sort-joins, masked passes, no atomics/locks), unlike
the reference whose outputs vary with -t.
"""

from __future__ import annotations

import os

import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("MEGAHIT_TPU_DEBUG", "") not in ("", "0")


def enable_debug_checks() -> None:
    """Turn on jax NaN checking (call before device work)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def check_sdbg_invariants(sdbg) -> None:
    """Full structural validation of an Sdbg (debug mode only).

    Raises AssertionError with a precise message on the first broken
    invariant. O(E) host work - gated behind MEGAHIT_TPU_DEBUG.
    """
    from ..core import kmerops

    e = sdbg.real
    if e == 0:
        return
    keys = np.asarray(sdbg.keys[:e])
    k = sdbg.k
    rc = np.asarray(sdbg.rc[:e])
    valid = np.asarray(sdbg.valid[:e])
    mult = np.asarray(sdbg.mult[:e])

    rck = np.asarray(kmerops.revcomp_kmers(keys, k))
    assert (keys[rc] == rck).all(), "rc pairing broken: edges[rc] != revcomp"
    assert (rc[rc] == np.arange(e)).all(), "rc is not an involution"
    assert (valid[rc] == valid).all(), "validity not strand-symmetric"
    assert (mult[rc] == mult).all(), "multiplicity not strand-symmetric"

    # candidate tables (slots position-packed since round 3): each
    # row's candidate SET must equal the brute-force set of existing
    # neighbour k-mers derived by key surgery + dict lookup
    suffix = np.asarray(kmerops.mask_tail(
        kmerops.drop_first_base(keys, k), k - 1))
    prefix = np.asarray(kmerops.mask_tail(keys, k - 1))
    index = {kk.tobytes(): i for i, kk in enumerate(keys)}

    def brute_row(node_key, place):
        out = []
        for c in range(4):
            if place == "append":
                want = np.asarray(kmerops.set_base(
                    node_key[None], k - 1, c))[0]
            else:
                want = np.asarray(kmerops.set_base(
                    np.asarray(kmerops.shift_right_bits(
                        node_key[None], 2)), 0, c))[0]
                want = np.asarray(kmerops.mask_tail(
                    want[None], k))[0]
            hit = index.get(want.tobytes())
            if hit is not None:
                out.append(hit)
        return sorted(out)

    for name, table, node, place in (
        ("oc_t", sdbg.oc_t, suffix, "append"),
        ("ic_t", sdbg.ic_t, suffix, "prepend"),
        ("oc_s", sdbg.oc_s, prefix, "append"),
        ("ic_s", sdbg.ic_s, prefix, "prepend"),
    ):
        t = np.asarray(table[:e])
        for i in range(e):
            got = sorted(int(x) for x in t[i] if x >= 0)
            want = brute_row(node[i], place)
            assert got == want, \
                f"{name}[{i}] candidate set {got} != expected {want}"
