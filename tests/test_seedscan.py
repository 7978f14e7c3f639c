"""Native seed_scan parity vs a brute-force window oracle.

Covers the u64 fast path (k <= 32), the generic multi-word path
(k > 32), all three modes, read-boundary handling, min_read_len, and
empty inputs. The mapper/iterate integrations are covered end-to-end
by the oracle-parity tests; this pins the kernel itself.
"""

import bisect

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph.counter import pack_flat
from megahit_tpu.native import (
    SCAN_BOTH, SCAN_CANON, SCAN_FWD, get_seedscan, seed_scan,
)

pytestmark = pytest.mark.skipif(
    get_seedscan() is None, reason="native toolchain unavailable"
)


def _brute(codes_list, k, table_rows, mode, min_read_len=0):
    out = []
    tr = [tuple(r) for r in table_rows]
    w = (k + 15) // 16

    def find(q):
        j = bisect.bisect_left(tr, q)
        return j if j < len(tr) and tr[j] == q else -1

    base = 0
    for rid, codes in enumerate(codes_list):
        if len(codes) >= max(k, min_read_len):
            for i in range(len(codes) - k + 1):
                win = codes[i:i + k]
                fwd = tuple(packing.pack_codes(win)[:w])
                rc = tuple(
                    packing.pack_codes(packing.revcomp_codes(win))[:w]
                )
                if mode == SCAN_CANON:
                    q, isrc = (fwd, 0) if fwd <= rc else (rc, 1)
                    j = find(q)
                    if j >= 0:
                        out.append((base + i, rid, j, -1, isrc))
                elif mode == SCAN_FWD:
                    j = find(fwd)
                    if j >= 0:
                        out.append((base + i, rid, j, -1, 0))
                else:
                    jf, jr = find(fwd), find(rc)
                    if jf >= 0 or jr >= 0:
                        out.append((base + i, rid, jf, jr, 0))
        base += len(codes)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_seed_scan_randomized(seed):
    rng = np.random.default_rng(seed)
    for _ in range(25):
        k = int(rng.integers(2, 70))
        w = (k + 15) // 16
        n_reads = int(rng.integers(1, 12))
        codes_list = [
            rng.integers(0, 4, int(rng.integers(0, 90))).astype(np.uint8)
            for _ in range(n_reads)
        ]
        starts = np.zeros(n_reads + 1, np.int64)
        np.cumsum([len(c) for c in codes_list], out=starts[1:])
        flat = (np.concatenate(codes_list) if starts[-1]
                else np.zeros(0, np.uint8))
        packed = pack_flat(flat)
        rows = []
        for codes in codes_list:
            for i in range(0, max(len(codes) - k + 1, 0), 3):
                win = codes[i:i + k]
                if rng.random() < 0.5:
                    win = packing.revcomp_codes(win)
                rows.append(packing.pack_codes(win)[:w])
        for _ in range(5):  # absent rows exercise the prefilter
            r = np.zeros(w, np.uint32)
            r[:] = rng.integers(0, 1 << 32, w, dtype=np.uint64).astype(
                np.uint32)
            used = k - 16 * (w - 1)
            if used < 16:
                r[w - 1] &= np.uint32(0xFFFFFFFF) << np.uint32(
                    32 - 2 * used)
            rows.append(r)
        table = np.unique(np.array(rows, np.uint32).reshape(-1, w),
                          axis=0)
        mrl = int(rng.integers(0, 40))
        for mode in (SCAN_CANON, SCAN_FWD, SCAN_BOTH):
            pos, rid, ia, ib, flag = seed_scan(
                packed, starts, k, table, mode, min_read_len=mrl
            )
            want = _brute(codes_list, k, table, mode, mrl)
            ibl = ib.tolist() if ib is not None else [-1] * len(pos)
            have = list(zip(pos.tolist(), rid.tolist(), ia.tolist(),
                            ibl, flag.tolist()))
            assert have == want, (k, mode, mrl)


def test_seed_scan_empty_table():
    codes = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    packed = pack_flat(codes)
    starts = np.array([0, 6], np.int64)
    pos, rid, ia, ib, flag = seed_scan(
        packed, starts, 3, np.zeros((0, 1), np.uint32), SCAN_CANON
    )
    assert len(pos) == 0


# ---------------------------------------------------------------------------
# transform_rows / argsort_rows / row_search parity vs the numpy paths
# (advisor round-3 finding: these replace verified numpy implementations
# in correctness-critical paths but had no direct parity tests; the
# kmerops dispatch thresholds keep unit-sized inputs on the numpy path,
# so we call the native wrappers DIRECTLY here).
# ---------------------------------------------------------------------------

from megahit_tpu.core import kmerops
from megahit_tpu.native import (
    OP_DROP_FIRST, OP_REF_ORDER, OP_REVCOMP, argsort_rows, row_search,
    transform_rows,
)


def _rand_keys(rng, n, k):
    w = kmerops.words_per_kmer(k)
    keys = rng.integers(0, 1 << 32, (n, w), dtype=np.uint64).astype(
        np.uint32)
    return np.asarray(kmerops.mask_tail(keys, k)), w


def _numpy_transform(keys, k, op):
    # force the pure-numpy kmerops path by chunking below the 2^14
    # native-dispatch threshold
    fn = (kmerops.revcomp_kmers if op == OP_REVCOMP
          else kmerops.ref_order_keys)
    chunks = [fn(keys[i:i + 8192], k)
              for i in range(0, len(keys), 8192)]
    return np.concatenate(chunks) if chunks else keys


@pytest.mark.parametrize("k", [3, 16, 31, 32, 33, 64, 77, 141])
def test_transform_rows_parity(k):
    rng = np.random.default_rng(k)
    keys, w = _rand_keys(rng, 3000, k)
    for op in (OP_REVCOMP, OP_REF_ORDER):
        if op == OP_REF_ORDER and k < 2:
            continue
        out = transform_rows(keys, k, op)
        assert out is not None
        np.testing.assert_array_equal(out, _numpy_transform(keys, k, op))


@pytest.mark.parametrize("k", [3, 16, 31, 32, 33, 64, 77, 141])
def test_transform_drop_first_parity(k):
    rng = np.random.default_rng(1000 + k)
    keys, w = _rand_keys(rng, 3000, k)
    out = transform_rows(keys, k, OP_DROP_FIRST)
    assert out is not None
    want = np.asarray(kmerops.mask_tail(
        kmerops.shift_left_bits(keys, 2), k))
    np.testing.assert_array_equal(out, want)


def test_transform_rows_wide_guard():
    # W > 16 (k > 256) must fall back (fixed row buffers in C)
    keys = np.zeros((4, 17), np.uint32)
    assert transform_rows(keys, 17 * 16, OP_REVCOMP) is None


@pytest.mark.parametrize(
    "n,w", [(100, 1), (5000, 2), (3000, 4), (2000, 5), (2000, 9),
            ((1 << 20) + 17, 2),  # > 2^20: the parallel MSD branch
            ((1 << 20) + 31, 7)]  # MSD branch + W>4 tail tie-breaks
)
def test_argsort_rows_parity(n, w):
    rng = np.random.default_rng(n + w)
    # low-entropy values so duplicate keys occur
    keys = (rng.integers(0, 7, (n, w), dtype=np.uint64)
            .astype(np.uint32))
    keys[:, 0] = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(
        np.uint32)  # spread across all 256 MSD bins
    if w > 4:
        # force frequent 128-bit-prefix collisions so ordering MUST
        # come from the in-place row-tail comparator
        keys[:, 1:4] = keys[0, 1:4]
        keys[: n // 2, 0] = keys[0, 0]
    perm = argsort_rows(keys)
    assert perm is not None
    assert np.array_equal(np.sort(perm), np.arange(n))
    got = keys[perm]
    want = keys[np.lexsort(tuple(keys[:, i]
                                 for i in range(w - 1, -1, -1)))]
    np.testing.assert_array_equal(got, want)  # unstable: compare rows


@pytest.mark.parametrize("w", [1, 2, 3, 6])
def test_row_search_parity(w):
    rng = np.random.default_rng(w)
    n, q = 4000, 2500
    table = np.unique(
        rng.integers(0, 50, (n, w), dtype=np.uint64).astype(np.uint32),
        axis=0)
    queries = rng.integers(0, 60, (q, w), dtype=np.uint64).astype(
        np.uint32)
    queries[: q // 3] = table[
        rng.integers(0, len(table), q // 3)]  # guaranteed hits
    out = row_search(table, queries)
    assert out is not None
    idx, found = out
    tv = [tuple(r) for r in table]
    for j in range(q):
        qt = tuple(queries[j])
        wanted = bisect.bisect_left(tv, qt)
        assert idx[j] == wanted, j
        assert found[j] == (wanted < len(tv) and tv[wanted] == qt), j


def test_simple_links_parity():
    """native simple_links vs the numpy fallback of
    simple_path_links_host on random graphs, incl. invalidations."""
    import megahit_tpu.native as N
    from megahit_tpu.core import packing as pk
    from megahit_tpu.graph import sdbg as S
    from megahit_tpu.graph.counter import count_canonical_kmers

    rng = np.random.default_rng(31)
    for trial in range(6):
        reads = [rng.integers(0, 4, int(rng.integers(30, 200)))
                 .astype(np.uint8) for _ in range(60)]
        flat, starts = pk.pack_many(reads)
        k1 = int(rng.choice([12, 22, 33]))
        keys, counts = count_canonical_kmers(flat, starts, k1, 1)
        g = S.sdbg_from_edges(keys, counts, k1)
        if trial % 2:  # exercise invalidated graphs
            kill = rng.random(g.size) < 0.15
            g.invalidate(kill)
        nat = N.simple_links(g.run_start, g.nxt_link, g.rc, g.valid,
                             g.rvc, g.real)
        assert nat is not None
        orig = N.simple_links
        N.simple_links = lambda *a, **k: None
        try:
            want = S.simple_path_links_host(g)
        finally:
            N.simple_links = orig
        np.testing.assert_array_equal(nat[0], want[0])
        np.testing.assert_array_equal(nat[1], want[1])
