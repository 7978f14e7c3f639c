"""Mercy k-mer rescue vs a literal re-implementation of the reference
per-read scan (seq_to_sdbg.cpp:171-357)."""

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.graph.mercy import find_mercy_edges

RNG = np.random.default_rng(11)


def canon(codes):
    a = packing.decode(codes)
    b = packing.decode(packing.revcomp_codes(codes))
    return min(a, b)


def brute_mercy(reads, solid_set, k1):
    """Literal transcription of the reference gap state machine."""
    k = k1 - 1
    mercy = set()
    for r in reads:
        L = len(r)
        if L < k1:
            continue
        has_in = np.zeros(L - k + 1, bool)
        has_out = np.zeros(L - k + 1, bool)
        for i in range(L - k + 1):
            km = r[i : i + k]
            for c in range(4):
                if canon(np.concatenate([[c], km]).astype(np.uint8)) \
                        in solid_set:
                    has_in[i] = True
                if canon(np.concatenate([km, [c]]).astype(np.uint8)) \
                        in solid_set:
                    has_out[i] = True
        last_no_out = -1
        for i in range(L - k + 1):
            st = int(has_in[i]) | (int(has_out[i]) << 1)
            if st == 1:
                last_no_out = i
            elif st == 2:
                if last_no_out >= 0:
                    for j in range(last_no_out, i):
                        mercy.add(canon(r[j : j + k1]))
                last_no_out = -1
            elif st == 3:
                last_no_out = -1
    return mercy


def _solid(reads, k1, min_count):
    flat, starts = packing.pack_many(reads)
    keys, counts = counter.count_canonical_kmers(flat, starts, k1,
                                                 min_count)
    return flat, starts, keys, counts


def test_mercy_matches_reference_scan():
    k1 = 22
    genome = RNG.integers(0, 4, size=500).astype(np.uint8)
    # tiled reads overlapping by 30 bp; all duplicated except the middle
    # one, so its interior (k+1)-mers have count 1 -> a solid-coverage
    # gap that the single read bridges (the mercy scenario)
    reads = []
    tile_starts = list(range(0, 400, 70))
    for j, i in enumerate(tile_starts):
        reads.append(genome[i : i + 100].copy())
        if j != len(tile_starts) // 2:
            reads.append(genome[i : i + 100].copy())
    flat, starts, keys, counts = _solid(reads, k1, min_count=2)
    got = find_mercy_edges(flat, starts, keys, k1)
    got_set = {canon(packing.unpack_words(row, k1)) for row in got}

    solid_set = {
        canon(packing.unpack_words(row, k1)) for row in keys
    }
    want = brute_mercy(reads, solid_set, k1)
    assert got_set == want
    assert len(want) > 0  # the single-coverage gap must trigger rescue


def test_mercy_no_gap_no_edges():
    k1 = 22
    genome = RNG.integers(0, 4, size=300).astype(np.uint8)
    reads = []
    for i in range(0, 200, 2):
        reads.append(genome[i : i + 100].copy())
        reads.append(genome[i : i + 100].copy())
    flat, starts, keys, _ = _solid(reads, k1, min_count=2)
    got = find_mercy_edges(flat, starts, keys, k1)
    solid_set = {canon(packing.unpack_words(row, k1)) for row in keys}
    want = brute_mercy(reads, solid_set, k1)
    assert {canon(packing.unpack_words(r, k1)) for r in got} == want


def test_mercy_candidate_filter_matches_full_scan():
    """rare_keys candidate filtering (exact version of the reference's
    .cand mechanism, kmer_counter.cpp:307-369) must emit the same
    mercy set as the full-pool scan."""
    genome = RNG.integers(0, 4, size=800).astype(np.uint8)
    reads = []
    # two well-covered islands ...
    for s in list(range(0, 240, 3)) + list(range(450, 740, 3)):
        reads.append(genome[s : s + 60].copy())
    # ... bridged by ONE read: its middle windows are single-coverage
    # (non-solid at min_count=2) between solid flanks - a mercy gap
    reads.append(genome[260:480].copy())
    flat, starts = packing.pack_many(reads)
    k1 = 22
    keys, counts, rare = counter.count_canonical_kmers(
        flat, starts, k1, 2, return_rare=True
    )
    full = find_mercy_edges(flat, starts, keys, k1)
    filt = find_mercy_edges(flat, starts, keys, k1, rare_keys=rare)
    assert len(full) > 0  # the scenario must actually exercise mercy
    assert np.array_equal(full, filt)
